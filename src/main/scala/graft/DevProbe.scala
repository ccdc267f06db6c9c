package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage decomposition probe for optimization work: times named
  * sub-stages of hot queries (noop-materialized) so wall-clock attributes to
  * stages instead of whole queries. Not part of the driver contract. */
object DevProbe {
  private def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  private def mat(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args(1) else "e113"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the codepath once end-to-end at the smallest SF
    val warm = "/root/testdata/sf0.001"
    what match {
      case "e113" =>
        mat(SparkEntry.queries("e113_leakage_safe_split")(spark, warm))
        spark.catalog.clearCache()
        (1 to 2).foreach { i =>
          println(s"--- pass $i ---")
          val sh = t("shingleSets3+ckpt") {
            Extensions.shingleSets3(spark, d).localCheckpoint()
          }
          val verified = t("exactShinglePairs+ckpt") {
            Extensions.exactShinglePairs(spark, sh).localCheckpoint()
          }
          t("CC.run") {
            val (comp, rounds) = operators.ConnectedComponents.run(
              Tables.load(spark, d, "documents")
                .select(col("doc_id").as("node")), verified)
            mat(comp)
            println(s"[probe]   rounds=$rounds verified=${verified.count()}")
          }
          t("full e113") {
            mat(SparkEntry.queries("e113_leakage_safe_split")(spark, d))
          }
          t("full e113b") {
            mat(SparkEntry.queries("e113b_leakage_split_lsh")(spark, d))
          }
          t("full e113c") {
            mat(SparkEntry.queries("e113c_lsh_recall")(spark, d))
          }
          spark.catalog.clearCache()
          System.gc()
        }
      case "e21" =>
        mat(SparkEntry.queries("e21_dedup_components")(spark, warm))
        spark.catalog.clearCache()
        (1 to 2).foreach { i =>
          println(s"--- pass $i ---")
          t("full e21") {
            mat(SparkEntry.queries("e21_dedup_components")(spark, d))
          }
          spark.catalog.clearCache()
          System.gc()
        }
      case "hash" =>
        // md5-hex-conv chain vs raw xxhash64 on the same token stream:
        // how much of the shingle builds is the cross-engine hash itself
        val tok = Tables.load(spark, d, "documents")
          .select(explode(split(col("text"), " ")).as("t"))
          .localCheckpoint()
        println(s"[probe] tokens=${tok.count()}")
        (1 to 3).foreach { i =>
          t(s"md5-conv chain p$i") {
            mat(tok.select(conv(substring(md5(col("t")), 1, 8), 16, 10)
              .cast("long").as("h")).agg(sum(pmod(col("h"), lit(1000000007L)))))
          }
          t(s"xxhash64 p$i") {
            mat(tok.select(xxhash64(col("t")).as("h")).agg(sum(pmod(col("h"), lit(1000000007L)))))
          }
        }
      case q =>
        mat(SparkEntry.queries(q)(spark, warm))
        spark.catalog.clearCache()
        (1 to 2).foreach { i =>
          t(s"full $q pass$i") { mat(SparkEntry.queries(q)(spark, d)) }
          spark.catalog.clearCache()
          System.gc()
        }
    }
    spark.stop()
  }
}
