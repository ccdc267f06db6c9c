package graft.operators

import org.apache.spark.sql.SparkSession

/** Root directory for Spark-written, content-keyed artifacts (the LSH
  * component labels, the e09c IVF index, the A-series scratch layouts).
  *
  * Default is `java.io.tmpdir` — correct for single-JVM local runs (tests,
  * bench, the sandbox driver). On a real cluster a node-local root is
  * invisible to other executors/drivers and every session silently
  * recomputes its own copy, so a deployment sets `graft.artifact.dir` to a
  * shared filesystem (HDFS / object store / NFS) and every artifact
  * becomes compute-once for the whole cluster — the same one-conf escape
  * hatch [[RoundCheckpointer]] provides for fixpoint checkpoints via
  * `graft.checkpoint.dir`. All artifact writers go through the Hadoop
  * FileSystem API, so any Hadoop-supported URI works.
  *
  * NOT routed through this conf: the ≤5-file media fixtures (PNG/WAV/…)
  * that exist so the DuckDB oracle can re-read the exact bytes from an
  * absolute local path — those are verification fixtures, not production
  * artifacts, and the oracle process only runs on the driver host.
  */
object ArtifactRoot {
  val ConfKey = "graft.artifact.dir"

  /** The configured shared root, else the local tmpdir. */
  def resolve(spark: SparkSession): String =
    Option(spark.conf.get(ConfKey, null)).filter(_.nonEmpty)
      .getOrElse(System.getProperty("java.io.tmpdir"))
}
