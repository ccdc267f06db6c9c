package graft

import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.CdcStream

/** The reference's own demo flow, end-to-end (reference README.md:212-224
  * "Changing Data — Some example SQL cmds to generate some data" — the part
  * its broken Dataflow merge never replicated): snapshot the 9 menagerie
  * pets, then stream the demo mutations (a new pet insert, a death-date
  * update, a delete) and assert the replica converges to the expected
  * pets table. */
class MenagerieCdcSpec extends SparkSpecBase {

  private val petSchema = StructType(Seq(
    StructField("op", StringType), StructField("tbl", StringType),
    StructField("pos", LongType), StructField("ts_ns", LongType),
    StructField("name", StringType), StructField("owner", StringType),
    StructField("species", StringType)))

  test("snapshot + demo mutations merge into the expected pets replica") {
    // snapshot: the 9 loaded pets as op=INSERT, pos=0 (B6 backfill semantics)
    val pets = Cdc.queries("a2_tsv_load")(spark, sfDir)
      .select(lit("INSERT").as("op"), lit("pets").as("tbl"),
        lit(0L).as("pos"), lit(0L).as("ts_ns"),
        col("name"), col("owner"), col("species"))
    // demo mutations (README.md:215-224 shape): insert Alfred, re-home
    // Buffy, remove Bowser
    val changes = spark.createDataFrame(java.util.Arrays.asList(
      Row("INSERT", "pets", 1L, 1000L, "Alfred", "Diane", "dog"),
      Row("UPDATE", "pets", 2L, 2000L, "Buffy", "Benny", "dog"),
      Row("DELETE", "pets", 3L, 3000L, "Bowser", null, null)), petSchema)

    val merged = Cdc.merge(pets.unionByName(changes), Seq("name"))
      .select("name", "owner", "species")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap

    assert(merged.size === 9) // 9 pets + Alfred - Bowser
    assert(merged("Alfred") === (("Diane", "dog")))
    assert(merged("Buffy") === (("Benny", "dog")))   // updated owner
    assert(!merged.contains("Bowser"))               // deleted
    assert(merged("Puffball") === (("Diane", "hamster"))) // untouched snapshot row
  }

  test("same flow through the streaming merge (file batches)") {
    val in = tmpDir("men_in"); val replica = tmpDir("men_rep") + "/r"
    // envelope with user_id←a numeric pet key (hash of name) to reuse the
    // generic pipeline; payload value carries nothing
    def rows(batch: Seq[(String, Long, String)]): java.util.List[Row] =
      java.util.Arrays.asList(batch.map { case (op, pos, name) =>
        Row(op, "pets", pos, pos * 1000,
          name.hashCode.toLong, 0.0, name)
      }: _*)
    val snapshot = Cdc.queries("a2_tsv_load")(spark, sfDir)
      .collect().map(_.getString(0)).zipWithIndex
      .map { case (n, _) => ("INSERT", 0L, n) }
    spark.createDataFrame(rows(snapshot.toSeq), CdcStream.envelopeSchema)
      .coalesce(1).write.mode(SaveMode.Append).parquet(in)
    spark.createDataFrame(rows(Seq(
      ("INSERT", 1L, "Alfred"), ("UPDATE", 2L, "Buffy"), ("DELETE", 3L, "Bowser"))),
      CdcStream.envelopeSchema)
      .coalesce(1).write.mode(SaveMode.Append).parquet(in)

    val q = CdcStream.applyToReplica(
      CdcStream.fileChangelogStream(spark, in), replica,
      tmpDir("men_st"), tmpDir("men_dlq"), tmpDir("men_ck"))
    q.awaitTermination()

    val live = CdcStream.liveReplica(spark, replica)
      .select("event_type").collect().map(_.getString(0)).toSet
    assert(live.contains("Alfred") && !live.contains("Bowser"))
    assert(live.size === 9)
  }

  test("one stream fans out to per-table replicas (pets AND events, like the reference's merge job)") {
    val in = tmpDir("mt_in"); val root = tmpDir("mt_rep") + "/r"
    // one changelog carrying BOTH menagerie tables' changes, interleaved —
    // the event_type column carries the row key name for assertion
    def ev(op: String, tbl: String, pos: Long, key: Long, name: String) =
      Row(op, tbl, pos, pos * 1000, key, 0.0, name)
    spark.createDataFrame(java.util.Arrays.asList(
      ev("INSERT", "pets", 1L, 1L, "Fluffy"),
      ev("INSERT", "events", 2L, 1L, "litter"),
      ev("INSERT", "pets", 3L, 2L, "Bowser"),
      ev("INSERT", "events", 4L, 2L, "kennel")), CdcStream.envelopeSchema)
      .coalesce(1).write.mode(SaveMode.Append).parquet(in)
    spark.createDataFrame(java.util.Arrays.asList(
      ev("DELETE", "pets", 5L, 2L, "Bowser"),        // pet dies...
      ev("UPDATE", "events", 6L, 2L, "vet")), CdcStream.envelopeSchema)
      .coalesce(1).write.mode(SaveMode.Append).parquet(in)

    val q = CdcStream.applyToReplicasByTable(
      CdcStream.fileChangelogStream(spark, in), root,
      tmpDir("mt_st"), tmpDir("mt_dlq"), tmpDir("mt_ck"))
    q.awaitTermination()

    val pets = CdcStream.liveReplicaFor(spark, root, "pets")
      .collect().map(r => r.getLong(4) -> r.getString(6)).toMap
    val events = CdcStream.liveReplicaFor(spark, root, "events")
      .collect().map(r => r.getLong(4) -> r.getString(6)).toMap
    // the pets delete removed key 2 from pets ONLY; events key 2 updated
    assert(pets === Map(1L -> "Fluffy"))
    assert(events === Map(1L -> "litter", 2L -> "vet"))
  }

  test("a null table name dead-letters instead of crashing the multi-table stream") {
    val in = tmpDir("nt_in"); val root = tmpDir("nt_rep") + "/r"
    val dlq = tmpDir("nt_dlq")
    def ev(op: String, tbl: String, pos: Long, key: Long, name: String) =
      Row(op, tbl, pos, pos * 1000, key, 0.0, name)
    spark.createDataFrame(java.util.Arrays.asList(
      ev("INSERT", "pets", 1L, 1L, "Fluffy"),
      ev("INSERT", null, 2L, 2L, "orphaned"),   // no replica can own this row
      ev("INSERT", "events", 3L, 3L, "litter")), CdcStream.envelopeSchema)
      .coalesce(1).write.mode(SaveMode.Append).parquet(in)

    val q = CdcStream.applyToReplicasByTable(
      CdcStream.fileChangelogStream(spark, in), root,
      tmpDir("nt_st"), dlq, tmpDir("nt_ck"))
    q.awaitTermination() // D9 contract: the stream must complete, not NPE

    val pets = CdcStream.liveReplicaFor(spark, root, "pets").count()
    val events = CdcStream.liveReplicaFor(spark, root, "events").count()
    assert(pets === 1 && events === 1)
    val dead = spark.read.parquet(dlq).collect()
    assert(dead.length === 1 && dead.head.getString(6) === "orphaned",
      "the null-tbl row must land in the DLQ, not vanish")
  }
}
