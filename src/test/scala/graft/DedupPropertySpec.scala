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
}
