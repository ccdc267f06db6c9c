package graft.streaming

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exactly-once CDC upsert into a JDBC warehouse table — the serving-table
  * half of the reference pipeline (its Dataflow job MERGEs staged changes
  * into the BigQuery serving table; reference README.md:204-205). The
  * replica ([[BucketedReplica]]) stays the system of record; this sink
  * mirrors a changelog into any JDBC database with the same latest-wins,
  * tombstone-aware semantics, surviving crashes and replays.
  *
  * Protocol (the staging-promote pattern — the scalable shape for
  * parallel writers against a transactional store):
  *  1. executors append the batch to `<table>_staging` in parallel (plain
  *     INSERTs through Spark's JDBC writer — append-only, restart-safe);
  *  2. the driver promotes in ONE transaction: insert `batchId` into
  *     `<table>_ledger` (PRIMARY KEY — a replayed or racing promote loses
  *     on the duplicate key and rolls back, which IS the exactly-once
  *     guarantee), supersede-delete target rows an equal-or-newer staged
  *     position beats, insert the staged winners — tombstones INCLUDED,
  *     so out-of-order batches cannot resurrect deleted keys — and clear
  *     the staging slice.
  *
  * A crash between (1) and (2) leaves orphan staging rows: the replay
  * deletes its own `batch_id` slice before re-staging, then promotes —
  * target content is identical to the no-crash run. Serving reads filter
  * `op <> 'DELETE'` ([[liveSql]]); tombstone GC is the same
  * watermark-gated maintenance as [[BucketedReplica.compactTombstones]]
  * (one DELETE the operator schedules, not this sink's concern).
  *
  * Scale: stage-append parallelism = batch partitions; the promote is
  * 4 statements of O(batch) work inside the database, never O(table) —
  * exactly the bounded-maintenance contract of the replica's commit. */
class JdbcSink(url: String, table: String, pk: String = "user_id",
               posCol: String = "pos", opCol: String = "op",
               driver: String = "org.apache.derby.jdbc.EmbeddedDriver") {

  private val staging = s"${table}_staging"
  private val ledger = s"${table}_ledger"

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def sqlType(dt: DataType): String = dt match {
    case StringType => "VARCHAR(1024)"
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(
      s"JdbcSink cannot map column type $other — flatten the envelope first")
  }

  private def exists(c: Connection, name: String): Boolean = {
    val rs = c.getMetaData.getTables(null, null, name.toUpperCase, null)
    try rs.next() finally rs.close()
  }

  /** Provision target + staging + ledger for `schema` (the changelog
    * envelope; must include pk, pos, op). Idempotent. */
  def ensureTables(schema: StructType): Unit = {
    Seq(pk, posCol, opCol).foreach(cn => require(schema.fieldNames.contains(cn),
      s"JdbcSink envelope needs column '$cn'; batch has ${schema.fieldNames.mkString(",")}"))
    val cols = schema.fields.map(f => s"${f.name} ${sqlType(f.dataType)}").mkString(", ")
    withConn { c =>
      val st = c.createStatement()
      if (!exists(c, table))
        st.execute(s"CREATE TABLE $table ($cols, PRIMARY KEY ($pk))")
      if (!exists(c, staging))
        st.execute(s"CREATE TABLE $staging ($cols, batch_id BIGINT)")
      if (!exists(c, ledger))
        st.execute(s"CREATE TABLE $ledger (batch_id BIGINT PRIMARY KEY)")
    }
  }

  /** Has `batchId` already been promoted? (The replay fast path; a
    * never-provisioned ledger means nothing was.) */
  def committed(batchId: Long): Boolean = withConn { c =>
    if (!exists(c, ledger)) return false
    val ps = c.prepareStatement(s"SELECT 1 FROM $ledger WHERE batch_id = ?")
    ps.setLong(1, batchId)
    val rs = ps.executeQuery()
    try rs.next() finally rs.close()
  }

  /** Apply one micro-batch exactly once. Returns false iff `batchId` was
    * already promoted (replay no-op). Safe to call concurrently and to
    * re-call after any crash point. */
  def applyBatch(batch: DataFrame, batchId: Long): Boolean = {
    ensureTables(batch.schema)
    if (committed(batchId)) return false
    // replay hygiene: a crashed attempt's staging slice is replaced whole
    withConn { c =>
      val ps = c.prepareStatement(s"DELETE FROM $staging WHERE batch_id = ?")
      ps.setLong(1, batchId); ps.executeUpdate()
    }
    // within-batch latest-wins (one row per key) BEFORE staging: the
    // promote's supersede logic then needs no per-batch ordering
    val w = Window.partitionBy(col(pk)).orderBy(col(posCol).desc)
    val deduped = batch.filter(col(pk).isNotNull)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn").withColumn("batch_id", lit(batchId))
    deduped.write.mode("append")
      .option("driver", driver)
      .jdbc(url, staging, new java.util.Properties())

    val colList = batch.schema.fieldNames.mkString(", ")
    withConn { c =>
      c.setAutoCommit(false)
      try {
        val led = c.prepareStatement(s"INSERT INTO $ledger VALUES (?)")
        led.setLong(1, batchId)
        led.executeUpdate() // duplicate key here = lost the race → rollback
        val del = c.prepareStatement(
          s"""DELETE FROM $table WHERE EXISTS (
             |  SELECT 1 FROM $staging s
             |  WHERE s.batch_id = ? AND s.$pk = $table.$pk
             |    AND s.$posCol >= $table.$posCol)""".stripMargin)
        del.setLong(1, batchId); del.executeUpdate()
        val ins = c.prepareStatement(
          s"""INSERT INTO $table ($colList)
             |SELECT $colList FROM $staging s
             |WHERE s.batch_id = ? AND NOT EXISTS (
             |  SELECT 1 FROM $table t WHERE t.$pk = s.$pk)""".stripMargin)
        ins.setLong(1, batchId); ins.executeUpdate()
        val cln = c.prepareStatement(s"DELETE FROM $staging WHERE batch_id = ?")
        cln.setLong(1, batchId); cln.executeUpdate()
        c.commit()
        true
      } catch {
        case t: Throwable => c.rollback()
          // a duplicate-key loss on the ledger means someone else promoted
          // this batch — that is success-by-another-hand, not failure
          if (committed(batchId)) false else throw t
      } finally c.setAutoCommit(true)
    }
  }

  /** The serving read (the reference's analyst view): live rows only. */
  def liveSql: String = s"SELECT * FROM $table WHERE $opCol <> 'DELETE'"
}
