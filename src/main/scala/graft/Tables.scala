package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the driver-provided parquet corpus (TESTDATA.md) plus the
  * menagerie fixtures the reference seeds (reference: menagerie-db/cr_pet_tbl.sql:5-13,
  * cr_event_tbl.sql:5-11). All reads use explicit paths under the supplied
  * scale-factor directory; schemas are fixed by the parquet footers (the
  * reference likewise declares every schema up front — main.tf:202,213).
  *
  * Scale note: at 100 TB these reads become multi-file partitioned parquet
  * directories; `spark.read.parquet(dir)` is unchanged, and every query below
  * relies on Catalyst pushdown (filters + column pruning reach the scan), so
  * the same code scales by partition count alone.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** A1 real-source branch: the same catalog interface over a live JDBC
    * source (the reference's snapshot reads MySQL — README.md:64-67,136).
    * Offline fixtures use [[load]]; a deployment passes the source URL here
    * and every downstream operator is unchanged. See
    * graft.sources.JdbcSnapshot for the partitioned backfill form. */
  def loadJdbc(spark: SparkSession, url: String, name: String,
               options: Map[String, String] = Map.empty): DataFrame =
    graft.sources.JdbcSnapshot.read(spark, url, name, options)

  /** The events fixture carries parquet TIMESTAMP(NANOS), which Spark cannot
    * represent (TimestampType is microseconds). With
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by every entry point)
    * the column arrives as a raw epoch-nanosecond Long — which is also what
    * DuckDB's `epoch_ns(ts)` yields, so all event-time arithmetic is exact
    * integer math on both engines. `ts` is re-derived at microsecond
    * precision for operators that need a real TimestampType (windows,
    * watermarks). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events").withColumnRenamed("ts", "ts_ns")
    raw.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts_ns div 1000")))
  }

  /** Register every fixture table as a temp view (SURVEY §2 A9: the
    * reference's DDL/catalog surface — cr_pet_tbl.sql:3, main.tf:122-125). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

/** One-off schema/read probe used during development. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { n =>
      val df = Tables.load(spark, dir, n)
      println(s"== $n rows=${df.count()}")
      df.printSchema()
      df.show(3, truncate = 40)
    }
    spark.stop()
  }
}
