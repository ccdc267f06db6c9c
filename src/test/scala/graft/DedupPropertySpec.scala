package graft

import org.apache.spark.sql.functions._

/** Properties of the dedup-signature machinery on the real corpus: exact
  * duplicates are indistinguishable to every signature, and the MinHash
  * signature-match rate tracks true Jaccard (the estimator property that
  * makes LSH banding work). */
class DedupPropertySpec extends SparkSpecBase {

  private def sigs(df: org.apache.spark.sql.DataFrame) = {
    val tok = df.select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t"))
      .withColumn("h", Extensions.tokenHash(col("t")))
    val P = 2147483647L
    val A = Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)
    val B = Seq(3L, 5L, 59L, 61L, 67L, 71L, 73L, 79L)
    val aggs = A.zip(B).zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % P).as(s"sig$i") }
    tok.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  test("e47's distinct-name collapse recovers row-level pair counts exactly") {
    // the identity that makes the value-domain rewrite safe: for every
    // block, same-name pairs C(cnt,2) + cross-name Σ cnt_a·cnt_b equals the
    // count of row-level (k1 < k2) pairs — checked against the naive
    // row-level self-join on a corpus slice with heavy name repetition
    val p = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_name"),
        substring(col("p_name"), 1, 1).as("blk")) // coarse blocks → big groups
    val naive = p.select(col("blk"), col("p_partkey").as("k1"), col("p_name").as("n1"))
      .join(p.select(col("blk"), col("p_partkey").as("k2"), col("p_name").as("n2")),
        Seq("blk"))
      .filter(col("k1") < col("k2"))
      .withColumn("lev", levenshtein(col("n1"), col("n2")))
      .filter(col("lev") <= 3)
      .groupBy(col("blk")).agg(count(lit(1)).as("n_pairs"),
        sum(when(col("lev") === 0, 1L).otherwise(0L)).as("n_exact"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val g = p.groupBy(col("blk"), col("p_name")).agg(count(lit(1)).as("cnt"))
    val exact = g.groupBy(col("blk"))
      .agg(sum(expr("cnt * (cnt - 1) div 2")).as("n_exact"))
    val cross = g.select(col("blk"), col("p_name").as("n1"), col("cnt").as("c1"))
      .join(g.select(col("blk"), col("p_name").as("n2"), col("cnt").as("c2")), Seq("blk"))
      .filter(col("n1") < col("n2") && levenshtein(col("n1"), col("n2")) <= 3)
      .groupBy(col("blk")).agg(sum(col("c1") * col("c2")).as("n_cross"))
    val collapsed = exact.join(cross, Seq("blk"), "left")
      .select(col("blk"),
        (coalesce(col("n_cross"), lit(0L)) + col("n_exact")).as("n_pairs"),
        col("n_exact"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(collapsed.filter(_._2._1 > 0) === naive,
      "group-size arithmetic must equal the row-level pair counts")
  }

  test("an exact duplicate gets an identical MinHash signature") {
    val docs = Tables.load(spark, sfDir, "documents").limit(20)
    val dups = docs.select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val all = sigs(docs.select("doc_id", "text").union(dups))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val origs = all.filter(_._1 < 100000).toSeq.sortBy(_._1)
    assert(origs.size === 20)
    origs.foreach { case (id, sig) =>
      assert(all(id + 100000) === sig,
        s"dup of doc $id has a different signature")
    }
  }

  test("MinHash match rate estimates Jaccard (mean |err| < 0.2 over pairs)") {
    import spark.implicits._
    val base = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") < 60)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("tk"))
    val sg = sigs(Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 60))
    val s1 = sg.columns.tail
    val pairs = base.as("a").join(base.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        (size(array_intersect(col("a.tk"), col("b.tk"))).cast("double") /
          size(array_union(col("a.tk"), col("b.tk")))).as("true_j"))
    val sa = sg.select(col("doc_id").as("d1") +: s1.map(c => col(c).as(s"a_$c")): _*)
    val sb = sg.select(col("doc_id").as("d2") +: s1.map(c => col(c).as(s"b_$c")): _*)
    val est = s1.map(c => when(col(s"a_$c") === col(s"b_$c"), 1.0).otherwise(0.0))
      .reduce(_ + _) / s1.length
    val err = pairs.join(sa, "d1").join(sb, "d2")
      .select(abs(est - col("true_j")).as("err"))
      .agg(avg(col("err"))).head().getDouble(0)
    assert(err < 0.2, s"mean |estimate - jaccard| = $err")
  }

  test("e56 fixed-point PageRank conserves rank mass and respects the teleport floor") {
    val rows = SparkEntry.queries("e56_pagerank")(spark, sfDir).collect()
    val SCALE = 1000000000000L
    val n = rows.length
    assert(n > 0)
    val total = rows.map(_.getLong(1)).sum
    // floor division can only LOSE mass, and per iteration loses at most
    // ~1 unit per contribution — negligible against the 1e12 scale
    assert(total <= SCALE, s"rank mass grew: $total > $SCALE")
    assert(total >= (SCALE / 10) * 9, s"rank mass leaked: $total of $SCALE")
    // every node keeps at least the damped teleport share
    val base = 15L * SCALE / (100L * n)
    assert(rows.forall(_.getLong(1) >= base), "rank below the teleport floor")
  }
}
