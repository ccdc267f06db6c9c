package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** e115's windowless decile map must be NTILE(10)-exact on BOTH of its
  * paths: the dense-id map-side arithmetic (what the documents fixture
  * exercises) and the sparse-id bucket-rank fallback (which the fixture
  * never triggers) — each differentialed against Spark's own
  * ntile(10) over a global window, across sizes that hit every
  * remainder class (N%10 = 0, small N<10, N with remainder). */
class NtileDecilesSpec extends SparkSpecBase {
  import spark.implicits._

  private def reference(ids: Seq[Long]): Map[Long, Int] =
    ids.toDF("doc_id")
      .select(col("doc_id"), ntile(10).over(Window.orderBy("doc_id")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def got(ids: Seq[Long]): Map[Long, Int] =
    Extensions.ntileDecilesOf(spark, ids.toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("dense ids: map-side arithmetic matches ntile for all remainder classes") {
    for (n <- Seq(7, 10, 100, 103, 250, 999)) {
      val ids = (5L until 5L + n) // dense but not zero-based
      assert(got(ids) === reference(ids), s"n=$n")
    }
  }

  test("sparse ids: bucket-rank fallback matches ntile") {
    val rnd = new scala.util.Random(42)
    // gaps force the sparse path; collisions impossible (strictly increasing)
    var cur = 0L
    val ids = (0 until 503).map { _ => cur += 1 + rnd.nextInt(1000); cur }
    assert(ids.distinct.size === ids.size)
    assert(got(ids) === reference(ids))
  }

  test("sparse ids smaller than the bucket count") {
    val ids = Seq(3L, 900L, 17L, 44L, 100000L, 7L, 123456789L)
    assert(got(ids) === reference(ids))
  }

  test("empty input returns an empty decile map (no NPE on NULL min/max)") {
    val out = Extensions.ntileDecilesOf(spark, Seq.empty[Long].toDF("doc_id"))
    assert(out.columns.toSeq === Seq("doc_id", "decile"))
    assert(out.count() === 0L)
  }

  test("ids spanning nearly the full Long range: span arithmetic must not " +
    "overflow into the dense path or wrap the bucket assignment") {
    val rnd = new scala.util.Random(7)
    val extremes = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      Long.MaxValue - 1, Long.MaxValue)
    val ids = (extremes ++ (0 until 96).map(_ =>
      rnd.nextLong())).distinct.sorted
    assert(got(ids) === reference(ids))
  }

  test("nb=2 full-Long-span overflow: exactly two ids at the Long extremes " +
    "must not reverse bucket order (the toLong width wrap)") {
    // n=2 → nb=2 and span=2^64: ceil(span/2)=2^63, whose bare toLong is
    // Long.MinValue — a NEGATIVE width reverses `doc_id DIV width` and the
    // deciles come out inverted. The clamp caps width at Long.MaxValue
    // (buckets merely collapse — still rank-exact).
    assert(got(Seq(Long.MinValue, Long.MaxValue)) ===
      reference(Seq(Long.MinValue, Long.MaxValue)))
    // a few more tiny extreme-span sets exercise nb ∈ {2,3,4}
    assert(got(Seq(Long.MinValue, 0L, Long.MaxValue)) ===
      reference(Seq(Long.MinValue, 0L, Long.MaxValue)))
    assert(got(Seq(Long.MinValue, -7L, 9L, Long.MaxValue)) ===
      reference(Seq(Long.MinValue, -7L, 9L, Long.MaxValue)))
    // and the PURE-TIE sub-split's wId (the same clamp at level 2): two
    // equal scores whose doc_ids sit at the Long extremes, hotCap=1 forces
    // the id-based sub-split
    val rows = Seq((Long.MinValue, 5.0), (Long.MaxValue, 5.0), (7L, 9.0))
    val out = Extensions.ntileDecilesByScoreOf(
      rows.toDF("doc_id", "score"), hotCap = 1L)
      .select("doc_id", "decile")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ref = rows.toDF("doc_id", "score")
      .select(col("doc_id"),
        ntile(10).over(Window.orderBy(col("score"), col("doc_id"))).as("d"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === ref)
  }

  // ---- score-ordered form (e105b's engine) --------------------------------

  private def scoreReference(rows: Seq[(Long, Double)]): Map[Long, Int] =
    rows.toDF("doc_id", "score")
      .select(col("doc_id"),
        ntile(10).over(Window.orderBy(col("score"), col("doc_id"))).as("d"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def scoreGot(rows: Seq[(Long, Double)]): Map[Long, Int] =
    Extensions.ntileDecilesByScoreOf(rows.toDF("doc_id", "score"))
      .select("doc_id", "decile")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("score deciles: histogram-rank matches ntile over (score, doc_id) " +
    "on randomized floats with heavy ties") {
    val rnd = new scala.util.Random(11)
    for (n <- Seq(9, 10, 257, 1000)) {
      // quantized scores force cross-doc ties; negatives and a hot value
      // stress both the range arithmetic and the tie-break
      val rows = (0L until n.toLong).map(i =>
        i -> (math.floor(rnd.nextGaussian() * 8) / 4.0 - 1.5))
      assert(scoreGot(rows) === scoreReference(rows), s"n=$n")
    }
  }

  test("score deciles: skewed mass (90% of rows share one range) stays exact") {
    val rnd = new scala.util.Random(3)
    val rows = (0L until 500L).map { i =>
      i -> (if (i % 10 == 0) rnd.nextDouble() * 1e6 else 0.25 + rnd.nextDouble() * 1e-9)
    }
    assert(scoreGot(rows) === scoreReference(rows))
  }

  test("score deciles: a tiny hotCap forces the two-level split on BOTH " +
    "hot-range kinds (score spread and pure tie) and stays NTILE-exact") {
    val rnd = new scala.util.Random(19)
    // one hot SPREAD range (90% of mass in a narrow but non-degenerate
    // score band), one hot pure-TIE range (everything at exactly 7.5),
    // plus background — with hotCap=8 both must sub-split
    val rows = (0L until 600L).map { i =>
      val s =
        if (i < 300) 0.25 + rnd.nextDouble() * 1e-9 // spread inside one range
        else if (i < 540) 7.5                        // one pure tie
        else rnd.nextGaussian() * 100
      (i * 37 % 1201) -> s // shuffled, non-dense ids
    }
    assert(rows.map(_._1).distinct.size === rows.size)
    val got = Extensions.ntileDecilesByScoreOf(
        rows.toDF("doc_id", "score"), hotCap = 8L)
      .select("doc_id", "decile")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === scoreReference(rows))
    // and the split actually engaged: the plan's rank window partitions
    // by (bkt, sub), not bkt alone
    val phys = Extensions.ntileDecilesByScoreOf(
        rows.toDF("doc_id", "score"), hotCap = 8L)
      .queryExecution.executedPlan.toString
    assert(phys.contains("sub"), phys.take(2000))
  }

  test("score deciles: all-equal scores reduce to the doc_id order; empty in, empty out") {
    val rows = Seq(42L, 7L, 19L, 3L, 100L, 55L, 61L, 2L, 88L, 13L, 29L)
      .map(_ -> 0.125)
    assert(scoreGot(rows) === scoreReference(rows))
    assert(Extensions.ntileDecilesByScoreOf(
      Seq.empty[(Long, Double)].toDF("doc_id", "score")).count() === 0L)
  }

  test("score deciles: payload columns ride through (no join-back needed)") {
    val df = Seq((1L, 0.5, "a"), (2L, 0.1, "b"), (3L, 0.9, "c"))
      .toDF("doc_id", "score", "payload")
    val out = Extensions.ntileDecilesByScoreOf(df)
    assert(out.columns.toSet === Set("doc_id", "score", "payload", "decile"))
    assert(out.select("payload").collect().map(_.getString(0)).toSet
      === Set("a", "b", "c"))
  }

  test("e105b's plan has no single-partition exchange and no global window") {
    val df = SparkEntry.queries("e105b_quality_deciles_scalable")(spark, sfDir)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("SinglePartition"), phys)
    // the only Window is row_number partitioned by the score range
    assert(!phys.contains("ntile"), phys)
  }

  test("e115's fixture path is the dense one (no window in the plan)") {
    val df = Extensions.ntileDecilesByDocId(spark, sfDir)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("Window"), phys)
    assert(!phys.contains("SinglePartition"), phys)
    // and it is still NTILE-exact on the real table
    val ref = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"),
        ntile(10).over(Window.orderBy("doc_id")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val g = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(g === ref)
  }
}
