package graft

/** `graft.artifact.dir` is the one-conf escape hatch that moves every
  * Spark-written artifact (LSH labels, IVF index, A-series scratch) off
  * node-local /tmp and onto cluster-shared storage. This spec pins the
  * contract: with the conf set, the label artifact materializes under
  * the configured root (and is served from there — content identical to
  * the fixpoint); with it unset, behavior is unchanged (tmpdir). */
class ArtifactRootSpec extends SparkSpecBase {

  test("label artifact lands under the configured graft.artifact.dir") {
    val root = tmpDir("graft_artroot")
    spark.conf.set(operators.ArtifactRoot.ConfKey, root)
    try {
      val n = Extensions.lshComponentsArtifact(spark, sfDir).count()
      assert(n > 0)
      val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val arts = Option(new java.io.File(s"$root/graft_$tag").listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.startsWith("lsh_components_"))
      assert(arts.nonEmpty, s"no artifact under configured root $root")
      assert(new java.io.File(arts.head, "_SUCCESS").exists(),
        "artifact under configured root lacks its commit marker")
      assert(!arts.exists(_.getName.contains("__tmp_")),
        "uncommitted tmp tree left under configured root")
    } finally spark.conf.unset(operators.ArtifactRoot.ConfKey)
  }

  test("scratch dirs follow the configured root too") {
    val root = tmpDir("graft_artroot2")
    spark.conf.set(operators.ArtifactRoot.ConfKey, root)
    try {
      assert(Cdc.scratch("probe", sfDir, spark).startsWith(root))
    } finally spark.conf.unset(operators.ArtifactRoot.ConfKey)
    assert(Cdc.scratch("probe", sfDir, spark)
      .startsWith(System.getProperty("java.io.tmpdir")))
  }
}
