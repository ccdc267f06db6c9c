package graft

import org.apache.spark.sql.functions._
import graft.functions.CharCounts

/** The e46 histogram kernel's exactness contract: `graft_char_counts`
  * must reproduce, count for count, the composed
  * explode(transform(sequence(1, length(s)), i -> substr(s, i, 1))) +
  * groupBy form it replaced — including multi-byte code points, repeated
  * characters, and the real fixture corpus. */
class CharCountsSpec extends SparkSpecBase {

  private def composed(df: org.apache.spark.sql.DataFrame) = df
    .filter(length(col("text")) >= 1)
    .select(col("id"),
      explode(transform(sequence(lit(1), length(col("text"))),
        i => col("text").substr(i, lit(1)))).as("ch"))
    .groupBy(col("id"), col("ch")).agg(count(lit(1)).as("c"))

  private def kernel(df: org.apache.spark.sql.DataFrame) = df
    .filter(length(col("text")) >= 1)
    .select(col("id"), explode(CharCounts(col("text"))).as("e"))
    .select(col("id"), col("e.ch").as("ch"), col("e.c").as("c"))

  test("char-count kernel matches the explode+groupBy form on edge cases") {
    import spark.implicits._
    val df = Seq(
      1L -> "aaa",
      2L -> "abcabc x",
      3L -> "héllo wörld héllo", // 2-byte code points
      4L -> "日本語 テスト 日本", // 3-byte code points
      5L -> "mixed é日x é",
      6L -> "  leading and  double  spaces ",
      7L -> "x"
    ).toDF("id", "text")
    val want = composed(df).collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = kernel(df).collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("char-count kernel matches on the fixture corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("id"), col("text"))
    val want = composed(docs).collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = kernel(docs).collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.size == want.size)
    assert(got == want)
  }
}
