package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** Large-star/small-star components (the e21 scale path, executed):
  * correct on the LSH candidate graph (equals the oracle-checked e21
  * min-label propagation) and logarithmic-round on the topology that
  * defeats propagation — a long path. */
class ConnectedComponentsSpec extends SparkSpecBase {

  test("a 64-node path converges in O(log n) rounds, not O(diameter)") {
    val n = 64L
    val nodes = spark.range(n).select(col("id").as("node"))
    val edges = spark.range(n - 1)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val (labels, rounds) = ConnectedComponents.run(nodes, edges)
    val comps = labels.select("comp").distinct().collect().map(_.getLong(0))
    assert(comps.toSeq === Seq(0L), s"path must collapse to component 0, got ${comps.toSeq}")
    // min-label propagation needs ~63 rounds here; large/small-star is
    // logarithmic (assert a safe log-scale bound)
    assert(rounds <= 10, s"took $rounds rounds — not the O(log n) algorithm")
  }

  test("isolated nodes are their own components; disjoint cliques stay disjoint") {
    val nodes = spark.range(10).select(col("id").as("node"))
    // clique {0,1,2}, pair {5,6}; 3,4,7,8,9 isolated
    val edges = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(0L, 1L), org.apache.spark.sql.Row(1L, 2L),
      org.apache.spark.sql.Row(0L, 2L), org.apache.spark.sql.Row(5L, 6L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType))))
    val (labels, _) = ConnectedComponents.run(nodes, edges)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L, 9L -> 9L))
  }

  test("agrees with the e21 min-label propagation on the LSH candidate graph") {
    val expected = SparkEntry.queries("e21_dedup_components")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild the same graph e21 uses: nodes = sampled docs, edges = LSH pairs
    val tok = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t"))
      .withColumn("h", Extensions.tokenHash(col("t")))
    val P = 2147483647L
    val A = Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)
    val B = Seq(3L, 5L, 59L, 61L, 67L, 71L, 73L, 79L)
    val sigs = A.zip(B).zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % P).as(s"sig$i")
    }
    val sig = tok.groupBy(col("doc_id")).agg(sigs.head, sigs.tail: _*)
    val bands = sig.select(col("doc_id"), explode(array(
      (0 until 4).map(j => struct(lit(j).as("band"),
        (col(s"sig${2 * j}") * P + col(s"sig${2 * j + 1}")).as("bucket"))): _*
    )).as("bb")).select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val edges = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    val (labels, _) = ConnectedComponents.run(
      sig.select(col("doc_id").as("node")), edges)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("graft.checkpoint.dir conf switches rounds to reliable checkpoints, same answer") {
    // the conf hook is how fixed-signature query closures opt in — no
    // API change, one conf, every fixpoint becomes executor-loss-proof
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    val n = 32L
    val nodes = spark.range(n).select(col("id").as("node"))
    val edges = spark.range(n - 1)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val (localLabels, localRounds) = ConnectedComponents.run(nodes, edges)
    val localMap = localLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set(graft.operators.RoundCheckpointer.ConfKey, dir)
    try {
      val (relLabels, relRounds) = ConnectedComponents.run(nodes, edges)
      val relMap = relLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(relMap === localMap)
      assert(relRounds === localRounds)
      def rddDirs(f: java.io.File): Int =
        Option(f.listFiles).toSeq.flatten.map(c =>
          (if (c.getName.startsWith("rdd-")) 1 else 0) + rddDirs(c)).sum
      assert(rddDirs(new java.io.File(dir)) > 0, s"no checkpoint files under $dir")
    } finally spark.conf.unset(graft.operators.RoundCheckpointer.ConfKey)
  }
}
