package graft

import graft.functions.KmvAgg
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import scala.util.Random

/** KMV cardinality sketch (e26/e26b): buffer semantics, merge correctness
  * under arbitrary partitioning, equivalence of composed and native forms,
  * and the estimator's accuracy bound on the fixture. */
class KmvSketchSpec extends SparkSpecBase {

  private def naiveKmv(xs: Seq[Long]): Seq[Long] =
    xs.distinct.sorted.take(KmvAgg.K)

  test("buffer keeps exactly the k smallest distinct values (randomized)") {
    val rnd = new Random(42)
    for (trial <- 1 to 50) {
      // domains straddling k: below, at, and far above the sketch size
      val n = 1 + rnd.nextInt(if (trial % 2 == 0) 40 else 400)
      val xs = Seq.fill(n)(rnd.nextLong(1L << 60))
      val withDups = rnd.shuffle(xs ++ xs.take(rnd.nextInt(n)))
      val buf = new KmvAgg.Buffer(new Array[Long](KmvAgg.K), 0)
      withDups.foreach(buf.insert)
      assert(buf.arr.take(buf.n).toSeq === naiveKmv(withDups))
    }
  }

  test("merge of split buffers equals the single-pass sketch") {
    val rnd = new Random(7)
    val xs = Seq.fill(500)(rnd.nextLong(1L << 60))
    val whole = new KmvAgg.Buffer(new Array[Long](KmvAgg.K), 0)
    xs.foreach(whole.insert)
    // split into uneven chunks, sketch each, merge pairwise in a skewed order
    val parts = xs.grouped(37).map { chunk =>
      val b = new KmvAgg.Buffer(new Array[Long](KmvAgg.K), 0)
      chunk.foreach(b.insert)
      b
    }.toSeq
    val agg = KmvAgg(org.apache.spark.sql.catalyst.expressions.Literal(0L))
    val merged = parts.reduceLeft(agg.merge)
    assert(merged.arr.take(merged.n).toSeq === whole.arr.take(whole.n).toSeq)
  }

  test("serialize/deserialize round-trips a partial buffer") {
    val agg = KmvAgg(org.apache.spark.sql.catalyst.expressions.Literal(0L))
    val b = new KmvAgg.Buffer(new Array[Long](KmvAgg.K), 0)
    Seq(5L, 3L, 5L, 9L).foreach(b.insert)
    val back = agg.deserialize(agg.serialize(b))
    assert(back.n === 3 && back.arr.take(3).toSeq === Seq(3L, 5L, 9L))
  }

  test("composed (e26) and native (e26b) sketches are identical, any partitioning") {
    val composed = SparkEntry.queries("e26_kmv_cardinality")(spark, sfDir).collect()
    val native = SparkEntry.queries("e26b_kmv_native")(spark, sfDir).collect()
    assert(composed.toSeq === native.toSeq)
    // and the native agg is partitioning-insensitive: same result from a
    // pathological 17-way repartition of the input
    KmvAgg.register(spark)
    val ev = Tables.events(spark, sfDir)
    def run(df: org.apache.spark.sql.DataFrame): Seq[Row] =
      df.select(col("event_type"),
          conv(substring(md5(concat(col("user_id").cast("string"), lit("|"),
            expr("ts_ns div 86400000000000").cast("string"))), 1, 15), 16, 10)
            .cast("long").as("h"))
        .groupBy("event_type").agg(KmvAgg.kmv(col("h")).as("sk"))
        .orderBy("event_type").collect().toSeq
    assert(run(ev.repartition(17)) === run(ev.coalesce(1)))
  }

  test("the sketch aggregates incrementally as streaming state (complete mode)") {
    // distinct-user sketch per event type over an unbounded stream: the
    // TypedImperativeAggregate buffer IS the streaming state (≤ 64 longs
    // per group), updated per micro-batch — the shape of a live
    // distinct-count dashboard at 100 TB/day ingest
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    KmvAgg.register(spark)
    val input = MemoryStream[(String, Long)]
    val q = input.toDF().toDF("etype", "uid")
      .select(col("etype"),
        conv(substring(md5(col("uid").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy("etype").agg(KmvAgg.kmv(col("h")).as("sk"))
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    val rnd = new Random(11)
    val all = Seq.fill(300)(("t" + rnd.nextInt(3), rnd.nextInt(150).toLong))
    all.grouped(75).foreach { chunk => input.addData(chunk); q.processAllAvailable() }
    q.stop()
    // final complete-mode state == the one-shot batch sketch
    val streamed = spark.table("kmv_stream")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val batch = all.toDF("etype", "uid")
      .select(col("etype"),
        conv(substring(md5(col("uid").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy("etype").agg(KmvAgg.kmv(col("h")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(streamed === batch)
  }

  test("estimator is within 4 standard errors of the exact count") {
    // stderr of KMV ≈ 1/sqrt(k-2); fixture groups are ~160 distinct at k=64
    val rows = SparkEntry.queries("e26_kmv_cardinality")(spark, sfDir).collect()
    val tol = 4.0 / math.sqrt(KmvAgg.K - 2)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("est_distinct")
      assert(exact >= KmvAgg.K, "fixture group must exercise the estimator")
      assert(math.abs(est - exact) / exact <= tol,
        s"${r.getAs[String]("event_type")}: est $est vs exact $exact")
    }
  }
}
