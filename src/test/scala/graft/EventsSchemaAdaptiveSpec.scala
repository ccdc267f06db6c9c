package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** The events fixture's physical timestamp type is a contract the engine does
  * not own: the generator has already shipped both TIMESTAMP(NANOS) (read as
  * epoch-nano Long under nanosAsLong) and TIMESTAMP(MICROS). Tables.events
  * must normalize either representation to one schema — `ts` TimestampType,
  * `ts_ns` LongType, identical column order — so a fixture regeneration is a
  * no-op for the 60+ downstream event queries. This spec materializes BOTH
  * representations from the same rows and drives them through Tables.events
  * and through real envelope queries, asserting identical schemas AND values.
  */
class EventsSchemaAdaptiveSpec extends SparkSpecBase {

  /** Builds a full fixture dir (all tables symlinked from sf0.001) whose
    * events.parquet has `ts` in the given physical representation. */
  private def fixtureDir(variant: String): String = {
    val dir = tmpDir(s"events-$variant-")
    Tables.names.filterNot(_ == "events").foreach { n =>
      Files.createSymbolicLink(
        Paths.get(dir, s"$n.parquet"), Paths.get(sfDir, s"$n.parquet"))
    }
    val raw = Tables.load(spark, sfDir, "events")
    // source of truth: exact epoch nanos, from whichever shape sf0.001 has
    val canonical = raw.schema("ts").dataType match {
      case LongType => raw
      case _ => raw.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
    val out = variant match {
      case "nslong" => canonical // Long column named ts == nanosAsLong read
      case "usts"   => canonical.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
    }
    out.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val nsDir = fixtureDir("nslong")
  private lazy val usDir = fixtureDir("usts")

  test("Tables.events normalizes both physical representations to one schema") {
    val ns = Tables.events(spark, nsDir)
    val us = Tables.events(spark, usDir)
    assert(ns.schema === us.schema) // names, types, AND order
    assert(ns.schema("ts").dataType === TimestampType)
    assert(ns.schema("ts_ns").dataType === LongType)
    val key = Seq("event_id")
    val nsRows = ns.orderBy(key.map(col): _*).collect()
    val usRows = us.orderBy(key.map(col): _*).collect()
    assert(nsRows.length === usRows.length)
    assert(nsRows.sameElements(usRows))
  }

  test("envelope queries are representation-independent") {
    // one per envelope family that routes through Tables.events
    val names = Seq("b1_insert_append", "b4_merge_aggform", "d3_tumbling_window",
      "c25_json")
    names.foreach { q =>
      val fn = SparkEntry.queries(q)
      val a = fn(spark, nsDir)
      val b = fn(spark, usDir)
      assert(a.schema === b.schema, s"$q schema drifted across representations")
      val ka = a.columns.sorted.toSeq
      val ra = a.orderBy(ka.map(col): _*).collect()
      val rb = b.orderBy(ka.map(col): _*).collect()
      assert(ra.sameElements(rb), s"$q values drifted across representations")
      spark.catalog.clearCache()
    }
  }
}
