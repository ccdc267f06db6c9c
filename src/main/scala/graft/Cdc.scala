package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.AvroChangeFiles

/** SURVEY §2 groups A (scans/sources/sinks) and B (DML/changelog — the CDC
  * core). The reference assembles MySQL binlog → Datastream → GCS (Avro/JSON)
  * → Pub/Sub → Dataflow merge → BigQuery replica (reference: README.md:126-208,
  * main.tf:103-215); this module re-expresses each stage Spark-first.
  *
  * The `events` fixture plays the ordered changelog (FIXTURES.md:70): pos =
  * event_id (binlog position analog, reference README.md:116 replication
  * grants exist to read the ordered log), primary key = user_id, op derived
  * from event_type. The same derivation is inlined in every DuckDB oracle so
  * both engines see the identical changelog.
  *
  * Scale design: the merge (B3) is a window/agg over the pk — one shuffle by
  * key, partial-aggregatable in the max_by form (B4), AQE-skew-safe. At
  * 100 TB the replica would be bucketed by pk so repeated merges reuse the
  * partitioning instead of reshuffling.
  */
object Cdc {
  import Tables.load

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** The changelog derived from the events fixture — op mapping documented in
    * the module doc; flat envelope (op, tbl, pos, ts_ns, user_id, value,
    * event_type). */
  def changelog(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      when(col("event_type") === "signup", "INSERT")
        .when(col("event_type") === "error", "DELETE")
        .otherwise("UPDATE").as("op"),
      lit("users").as("tbl"),
      col("event_id").as("pos"),
      col("ts_ns"),
      col("user_id"),
      col("value"),
      col("event_type"))

  /** Datastream wire-shape form of [[changelog]] (SURVEY §1.2): nested
    * `payload` + `source_metadata{op, tbl, source_ts_ns, log_file, pos}`
    * structs, the envelope the real Datastream Avro/JSON objects carry.
    * `log_file` models binlog file rotation (one file per 1000 positions). */
  def nestedChangelog(spark: SparkSession, dir: String): DataFrame =
    changelog(spark, dir).select(
      struct(col("user_id"), col("value"), col("event_type")).as("payload"),
      struct(col("op"), col("tbl"), col("ts_ns").as("source_ts_ns"),
        concat(lit("binlog."), lpad(expr("pos div 1000").cast(StringType),
          6, "0")).as("log_file"),
        col("pos")).as("source_metadata"))

  /** DuckDB twin of the nested envelope's log_file derivation. */
  val logFileSql: String = "'binlog.' || lpad((pos // 1000)::VARCHAR, 6, '0')"

  /** SQL twin of [[changelog]] for the DuckDB oracles. */
  val changelogSql: String =
    """SELECT CASE WHEN event_type = 'signup' THEN 'INSERT'
      |            WHEN event_type = 'error' THEN 'DELETE'
      |            ELSE 'UPDATE' END AS op,
      |       'users' AS tbl, event_id AS pos, epoch_ns(ts) AS ts_ns,
      |       user_id, value, event_type
      |FROM events""".stripMargin

  /** B3 — CDC apply / latest-wins upsert (the Cloud_Datastream_to_BigQuery
    * merge the reference's own pipeline failed to run, README.md:8):
    * latest event per primary key by binlog position wins; DELETE tombstones
    * drop the row (unless keepTombstones, for B5 soft-delete replicas). */
  def merge(changes: DataFrame, pkCols: Seq[String], posCol: String = "pos",
            opCol: String = "op", keepTombstones: Boolean = false): DataFrame = {
    val w = Window.partitionBy(pkCols.map(col): _*).orderBy(col(posCol).desc)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    if (keepTombstones) latest.withColumn("is_deleted", col(opCol) === "DELETE")
    else latest.filter(col(opCol) =!= "DELETE")
  }

  /** B14 — primary-key-change (re-key) normalization. A pk UPDATE cannot be
    * applied as an in-place upsert: the replica would keep the old key as a
    * ghost row forever. CDC readers therefore emit a pk change as two
    * events — DELETE(old pk) then INSERT(new pk) — and this operator
    * performs that expansion for sources that deliver pk changes as single
    * UPDATEs. Position space doubles (pos → 2·pos) so the synthetic INSERT
    * can totally order strictly after its DELETE (2·pos + 1) without
    * colliding with any real position; downstream latest-wins merge then
    * needs no special case. Pure row-local map + union — no shuffle added
    * beyond the merge that follows anyway. */
  def rekeySplit(changes: DataFrame, isRekey: Column, newKey: Column,
                 pk: String = "user_id", posCol: String = "pos"): DataFrame = {
    // evaluate the flag and target key against the ORIGINAL row, then scale
    val flagged = changes.withColumn("__rk", isRekey).withColumn("__nk", newKey)
      .withColumn(posCol, col(posCol) * 2)
    val normal = flagged.filter(!col("__rk"))
    val del = flagged.filter(col("__rk")).withColumn("op", lit("DELETE"))
    val ins = flagged.filter(col("__rk")).withColumn("op", lit("INSERT"))
      .withColumn(pk, col("__nk")).withColumn(posCol, col(posCol) + 1)
    normal.unionByName(del).unionByName(ins).drop("__rk", "__nk")
  }

  /** B9 — SCD Type 2 historization of a changelog: instead of latest-wins
    * (the replica the reference's merge job maintains, SCD1), keep EVERY
    * change as a validity interval [valid_from_pos, valid_to_pos), closed by
    * the key's next change; the open interval (valid_to_pos NULL, op not
    * DELETE) is the current row. One window pass per key — the same single
    * pk-shuffle cost class as [[merge]], AQE-skew-safe. */
  def scd2(changes: DataFrame, pkCols: Seq[String],
           posCol: String = "pos"): DataFrame = {
    val w = Window.partitionBy(pkCols.map(col): _*).orderBy(col(posCol))
    changes
      .withColumn("valid_from_pos", col(posCol))
      .withColumn("valid_to_pos", lead(col(posCol), 1).over(w))
      .withColumn("is_current",
        col("valid_to_pos").isNull && col("op") =!= "DELETE")
  }

  /** Deterministic per-query scratch dir (A3/A6/A7 write-then-read;
    * shared with Relational's c52 partitioned layout). Root resolves via
    * [[graft.operators.ArtifactRoot]] off the CALLER'S session, passed
    * explicitly — local tmpdir by default, `graft.artifact.dir` for
    * cluster-shared storage. Every consumer of a layout resolves from the
    * same session object, so the writing plan and any later reader can
    * never silently name different roots (the getActiveSession-at-call-time
    * version could: a thread without an active session fell back to
    * tmpdir while the write had honored the session conf). */
  private[graft] def scratch(name: String, dir: String,
                             s: org.apache.spark.sql.SparkSession): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"${operators.ArtifactRoot.resolve(s)}/graft_$tag/$name"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 snapshot scan — full read of a source table (offline stand-in for the
    // JDBC backfill; reference README.md:136). Pushdown: only 3 columns read.
    "a1_snapshot_scan" -> { (s, d) =>
      load(s, d, "customer")
        .filter(col("c_acctbal") > 0)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },
    // A2 TSV bulk load — LOAD DATA LOCAL INFILE semantics: tab-separated,
    // \N = NULL (reference load_pet_tbl.sql:5, pet.txt) + the puffball insert
    // (ins_puff_rec.sql:1).
    "a2_tsv_load" -> { (s, d) =>
      val schema = StructType(Seq(
        StructField("name", StringType), StructField("owner", StringType),
        StructField("species", StringType), StructField("sex", StringType),
        StructField("birth", DateType), StructField("death", DateType)))
      val pets = s.read.schema(schema)
        .option("sep", "\t").option("nullValue", "\\N").option("mode", "PERMISSIVE")
        .csv("/root/repo/fixtures/menagerie/pet.txt")
      val puffball = s.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(
          "Puffball", "Diane", "hamster", "f",
          java.sql.Date.valueOf("1999-03-30"), null: java.sql.Date)), schema)
      pets.union(puffball).orderBy("name")
    },
    // A2b ragged TSV rows — MySQL LOAD DATA accepts rows with missing trailing
    // columns (reference event.txt kennel rows); PERMISSIVE mode yields NULL.
    "a2b_tsv_ragged" -> { (s, d) =>
      val schema = StructType(Seq(
        StructField("name", StringType), StructField("date", DateType),
        StructField("type", StringType), StructField("remark", StringType)))
      s.read.schema(schema)
        .option("sep", "\t").option("nullValue", "\\N").option("mode", "PERMISSIVE")
        .csv("/root/repo/fixtures/menagerie/event.txt")
        .orderBy("name", "date", "type")
    },
    // A3 Avro change-file roundtrip — changelog → Avro container files →
    // distributed decode → summary (format choice: reference README.md:168).
    "a3_avro_roundtrip" -> { (s, d) =>
      val path = scratch("a3_avro", d, s)
      AvroChangeFiles.write(changelog(s, d), path)
      AvroChangeFiles.read(s, path)
        .groupBy(col("op"))
        .agg(count(lit(1)).as("n"), max(col("pos")).as("max_pos"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .orderBy("op")
    },
    // A3b Avro via the DataSourceV2 connector — same files through
    // format("graft.sources.AvroChangeSource"): one object = one
    // InputPartition, PartitionReader decode in the executor.
    "a3b_avro_dsv2" -> { (s, d) =>
      val path = scratch("a3b_avro", d, s)
      AvroChangeFiles.write(changelog(s, d), path)
      s.read.format("graft.sources.AvroChangeSource").load(path)
        .groupBy(col("op"))
        .agg(count(lit(1)).as("n"), max(col("pos")).as("max_pos"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .orderBy("op")
    },
    // A3c nested Datastream envelope over Avro — the wire shape the real
    // Datastream objects carry (payload record + source_metadata record,
    // SURVEY §1.2): write nested Avro, distributed decode with structs
    // preserved, then extract from the nested form (binlog-file rotation
    // stats per op).
    "a3c_nested_avro" -> { (s, d) =>
      val path = scratch("a3c_avro", d, s)
      AvroChangeFiles.writeNested(nestedChangelog(s, d), path)
      AvroChangeFiles.readNested(s, path)
        .groupBy(col("source_metadata.op").as("op"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("source_metadata.log_file")).as("n_log_files"),
          max(col("source_metadata.pos")).as("max_pos"),
          sum(dec(col("payload.value"))).cast(DoubleType).as("sum_value"))
        .orderBy("op")
    },
    // A4b nested Datastream envelope over JSON — same wire shape through the
    // inputFileFormat=json path (reference README.md:202): serialize the
    // nested envelope to JSON, parse back with the nested schema, extract
    // payload and metadata fields; per-binlog-file change profile.
    "a4b_nested_json" -> { (s, d) =>
      nestedChangelog(s, d)
        .select(to_json(struct(col("payload"), col("source_metadata"))).as("j"))
        .select(from_json(col("j"), AvroChangeFiles.nestedSparkSchema).as("e"))
        .groupBy(col("e.source_metadata.log_file").as("log_file"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("e.payload.user_id")).as("n_users"),
          max(col("e.source_metadata.pos")).as("max_pos"),
          sum(dec(col("e.payload.value"))).cast(DoubleType).as("sum_value"))
        .orderBy("log_file")
    },
    // A4 JSON change events — serialize envelope to JSON strings, parse back
    // with an explicit schema (reference README.md:202 inputFileFormat=json).
    "a4_json_roundtrip" -> { (s, d) =>
      val env = StructType(Seq(
        StructField("op", StringType), StructField("pos", LongType),
        StructField("user_id", LongType), StructField("value", DoubleType)))
      changelog(s, d)
        .select(to_json(struct(col("op"), col("pos"), col("user_id"), col("value"))).as("j"))
        .select(from_json(col("j"), env).as("e"))
        .select(col("e.op").as("op"), col("e.pos").as("pos"),
          col("e.user_id").as("user_id"), col("e.value").as("value"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), max(col("pos")).as("max_pos"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .orderBy("user_id")
    },
    // A6 warehouse sink roundtrip — replica written with a declared schema and
    // read back (reference main.tf:197-215, pets.schema.json).
    "a6_sink_roundtrip" -> { (s, d) =>
      val path = scratch("a6_sink", d, s)
      merge(changelog(s, d), Seq("user_id"))
        .select("user_id", "pos", "value", "event_type")
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path).orderBy("user_id")
    },
    // A7 staging sink — append-only changelog (outputStagingDatasetTemplate,
    // reference README.md:204): two batches appended, then read as one log.
    "a7_staging_append" -> { (s, d) =>
      val path = scratch("a7_staging", d, s)
      val ch = changelog(s, d)
      val cut = 500L
      ch.filter(col("pos") < cut).write.mode("overwrite").parquet(path)
      ch.filter(col("pos") >= cut).write.mode("append").parquet(path)
      s.read.parquet(path)
        .groupBy(col("op"))
        .agg(count(lit(1)).as("n"), min(col("pos")).as("min_pos"),
          max(col("pos")).as("max_pos"))
        .orderBy("op")
    },
    // A8 dead-letter split — unparseable events are routed aside, not failed
    // (deadLetterQueueDirectory, reference README.md:206). Corruption is
    // synthesized deterministically (every 10th event loses its JSON brace).
    "a8_dlq_split" -> { (s, d) =>
      val env = StructType(Seq(StructField("op", StringType), StructField("pos", LongType)))
      val raw = changelog(s, d).select(col("pos"),
        when(col("pos") % 10 === 0, concat(lit("corrupt::"),
          to_json(struct(col("op"), col("pos")))))
          .otherwise(to_json(struct(col("op"), col("pos")))).as("j"))
      val parsed = raw.select(col("pos"), from_json(col("j"), env).as("e"))
      // from_json yields a null struct (or null fields) on corrupt input →
      // route rows with null op to the DLQ side.
      val tagged = parsed.select(col("pos"),
        when(col("e.op").isNull, "dlq").otherwise("ok").as("route"))
      tagged.groupBy(col("route"))
        .agg(count(lit(1)).as("n"), max(col("pos")).as("max_pos"))
        .orderBy("route")
    },
    // A10 ORC roundtrip — second columnar format through the same sink/scan
    // path (Spark-native ORC reader/writer).
    "a10_orc_roundtrip" -> { (s, d) =>
      val path = scratch("a10_orc", d, s)
      changelog(s, d).write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy(col("op"))
        .agg(count(lit(1)).as("n"), min(col("pos")).as("min_pos"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .orderBy("op")
    },
    // A11 partitioned sink + partition pruning — replica written
    // partitionBy(op); the read filters one partition and the scan's
    // PartitionFilters prune the other directories without touching them
    // (at 100 TB this is the difference between reading 1/k and k/k of the
    // table).
    "a11_partitioned_sink" -> { (s, d) =>
      val path = scratch("a11_part", d, s)
      changelog(s, d).write.mode("overwrite").partitionBy("op").parquet(path)
      s.read.parquet(path)
        .filter(col("op") === "UPDATE") // prunes to the op=UPDATE directory
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), max(col("pos")).as("max_pos"))
        .orderBy("user_id")
    },
    // A12 JSON-lines sink/source roundtrip — the inputFileFormat=json path
    // (reference README.md:202) as actual files, schema-first read.
    "a12_json_sink" -> { (s, d) =>
      val path = scratch("a12_json", d, s)
      changelog(s, d).write.mode("overwrite").json(path)
      s.read.schema(graft.streaming.CdcStream.envelopeSchema).json(path)
        .groupBy(col("op"))
        .agg(count(lit(1)).as("n"), max(col("pos")).as("max_pos"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .orderBy("op")
    },
    // A13 staging compaction — the many-small-change-files problem: a
    // fragmented staging log is rewritten into few right-sized files
    // (repartition + overwrite), contents provably unchanged. At 100 TB this
    // runs per closed partition.
    "a13_compaction" -> { (s, d) =>
      val frag = scratch("a13_frag", d, s)
      val compacted = scratch("a13_compact", d, s)
      changelog(s, d).repartition(16).write.mode("overwrite").parquet(frag)
      val staged = s.read.parquet(frag)
      staged.repartition(2).write.mode("overwrite").parquet(compacted)
      val nFiles = (dir: String) => new java.io.File(dir).listFiles()
        .count(_.getName.endsWith(".parquet")).toLong
      require(nFiles(compacted) < nFiles(frag),
        s"compaction must reduce file count: ${nFiles(frag)} -> ${nFiles(compacted)}")
      s.read.parquet(compacted)
        .groupBy(col("op"))
        .agg(count(lit(1)).as("n"), min(col("pos")).as("min_pos"),
          max(col("pos")).as("max_pos"))
        .orderBy("op")
    },
    // A14 schema evolution on read — a long-lived change-file bucket holds
    // generations of producer schemas side by side (the reference's sink
    // declares every column NULLABLE for exactly this reason,
    // main.tf:197-215): older files lacking `value` read as NULL under
    // mergeSchema, one unified scan. The oracle recomputes the same
    // union-by-name semantics from the source changelog.
    "a14_schema_evolution" -> { (s, d) =>
      val dir = scratch("a14_evo", d, s)
      val ch = changelog(s, d).select("op", "tbl", "pos", "value")
      // generation 1: producer without the value column
      ch.filter(col("pos") % 2 === 0).drop("value")
        .write.mode("overwrite").parquet(dir)
      // generation 2: current producer, appended to the same bucket
      ch.filter(col("pos") % 2 === 1)
        .write.mode("append").parquet(dir)
      s.read.option("mergeSchema", "true").parquet(dir)
        .groupBy(col("op"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .orderBy("op")
    },
    // A15 quoted/multiline CSV roundtrip — the delimiter-collision corner
    // of A2's text-load path: a field carrying the delimiter, a quote, AND
    // a newline must survive write→read intact (RFC-4180 quoting). The
    // read uses multiLine, which makes a CSV file unsplittable — the scale
    // note is that quoted-newline CSV parallelizes per FILE, so a 100 TB
    // feed must arrive as many files (it does: one object per change
    // batch), never one giant one.
    "a15_csv_quoted" -> { (s, d) =>
      val path = scratch("a15_csv", d, s)
      val df = changelog(s, d).select(col("op"), col("pos"), col("user_id"),
        col("value"),
        concat(col("event_type"), lit(",\"q\"\n"), col("op")).as("tricky"))
      df.write.mode("overwrite").option("header", "true").csv(path)
      s.read.schema(df.schema).option("header", "true")
        .option("multiLine", "true").csv(path)
        .orderBy("pos")
    },
    // A16 XML change-file roundtrip — the third text interchange format
    // beside JSON (a4/a12) and CSV/TSV (a2/a15), via Spark 4's built-in XML
    // source. Rows nest as <change> elements under <changelog>; the read
    // declares the envelope schema explicitly (no inference, per the
    // reference's declared-schema discipline) and nulls round-trip as
    // absent elements. Same aggregate gate as the other roundtrips, so a
    // value corrupted in transit fails the oracle hash.
    "a16_xml_roundtrip" -> { (s, d) =>
      val path = scratch("a16_xml", d, s)
      val df = changelog(s, d)
        .select(col("op"), col("pos"), col("user_id"), col("value"),
          col("event_type"))
      df.write.mode("overwrite").format("xml")
        .option("rootTag", "changelog").option("rowTag", "change")
        .save(path)
      s.read.schema(df.schema).format("xml")
        .option("rowTag", "change").load(path)
        .groupBy(col("op"))
        .agg(count(lit(1)).as("n"), max(col("pos")).as("max_pos"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .orderBy("op")
    },
    // A17 raw binary-file source — the real ingest surface of the
    // multimodal path (E5): `binaryFile` reads opaque payloads (images,
    // audio) as (path, length, content) rows with no decode; content
    // addressing via md5 proves byte-exact transport. The fixture files are
    // derived deterministically from document text so the DuckDB twin can
    // recompute every digest from the fixture alone. Driver-side write is
    // fixture-scale only (binaryFile is a read-only source); at 100 TB the
    // files simply exist on object storage and the same read distributes
    // one file per task.
    "a17_binary_files" -> { (s, d) =>
      val path = scratch("a17_blob", d, s)
      val dir = new java.io.File(path); dir.mkdirs()
      Option(dir.listFiles).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".bin")).foreach(_.delete())
      load(s, d, "documents").filter(col("doc_id").isin(0L, 10L, 20L))
        .select(col("doc_id"), md5(col("text")).as("h")).collect()
        .foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(path, s"blob_${r.getLong(0)}.bin"),
            r.getString(1).getBytes("UTF-8"))
        }
      s.read.format("binaryFile").load(path)
        .select(
          regexp_extract(col("path"), "blob_(\\d+)\\.bin$", 1)
            .cast(LongType).as("doc_id"),
          col("length"), md5(col("content")).as("digest"))
        .orderBy("doc_id")
    },
    // A18 JDBC warehouse sink — the reference's serving-table landing
    // (Dataflow MERGEs staged changes into BigQuery; README.md:204-205)
    // against a real transactional store: the changelog arrives in two
    // micro-batches through streaming/JdbcSink's exactly-once
    // staging-promote protocol (ledger-gated, crash/replay-safe — the
    // protocol properties are pinned in JdbcSinkSpec), then the serving
    // read comes BACK through the JDBC scan. The roundtripped live view
    // must equal global latest-wins — the same oracle shape as b8's
    // incremental merge, proving the two-batch JDBC path loses nothing.
    "a18_jdbc_sink" -> { (s, d) =>
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val url = s"jdbc:derby:memory:graft_a18_$tag;create=true"
      val sink = new graft.streaming.JdbcSink(url, "users")
      // idempotent re-run (bench warm-up + timed run share the JVM): the
      // in-memory db persists, so reset the three protocol tables
      {
        val c = java.sql.DriverManager.getConnection(url)
        try {
          Seq("users", "users_staging", "users_ledger").foreach { t =>
            try { c.createStatement().execute(s"DROP TABLE $t"); () }
            catch { case _: java.sql.SQLException => () } // absent on first run
          }
        } finally c.close()
      }
      val ch = changelog(s, d)
      val mid = ch.agg(expr("percentile(pos, 0.5)")).collect()(0).getDouble(0).toLong
      sink.applyBatch(ch.filter(col("pos") <= mid), 0L)
      sink.applyBatch(ch.filter(col("pos") > mid), 1L)
      s.read.format("jdbc")
        .option("url", url)
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .option("query", sink.liveSql)
        .load()
        .select(col("user_id"), col("pos").as("last_pos"),
          col("value").as("last_value"), col("event_type").as("last_event"))
        .orderBy("user_id")
    },
    // A9 DDL / catalog registration — CREATE OR REPLACE TEMP VIEW + SQL over
    // the registered name (reference cr_pet_tbl.sql:3, main.tf:122-125).
    "a9_catalog_ddl" -> { (s, d) =>
      s.sql(s"CREATE OR REPLACE TEMP VIEW cat_orders USING parquet OPTIONS (path '$d/orders.parquet')")
      s.sql(
        """SELECT o_orderstatus, count(*) AS n
          |FROM cat_orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    },
    // B1 insert/append — the INSERT workload (reference README.md:99-110,
    // ins_puff_rec.sql): appended inserts per key.
    "b1_insert_append" -> { (s, d) =>
      changelog(s, d).filter(col("op") === "INSERT")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_inserts"),
          sum(dec(col("value"))).cast(DoubleType).as("inserted_value"))
        .orderBy("user_id")
    },
    // B2 delete — DELETE FROM semantics over the changelog (reference
    // load_pet_tbl.sql:2): keys whose latest op is a tombstone.
    "b2_delete_applied" -> { (s, d) =>
      merge(changelog(s, d), Seq("user_id"), keepTombstones = true)
        .filter(col("is_deleted"))
        .select(col("user_id"), col("pos").as("deleted_at_pos"))
        .orderBy("user_id")
    },
    // B3 CDC apply / upsert MERGE — the flagship: latest-wins fold of the
    // ordered changelog into a current-state replica (reference README.md:195-206).
    "b3_cdc_merge" -> { (s, d) =>
      merge(changelog(s, d), Seq("user_id"))
        .select(col("user_id"), col("pos").as("last_pos"),
          col("value").as("last_value"), col("event_type").as("last_event"))
        .orderBy("user_id")
    },
    // B4 ordered-log semantics, agg form — same replica via max_by(pos):
    // partial-aggregatable (map-side combine), shuffles |keys| rows instead of
    // windowing all rows; the plan of choice under heavy key skew at 100 TB.
    "b4_merge_aggform" -> { (s, d) =>
      changelog(s, d)
        .groupBy(col("user_id"))
        .agg(max(col("pos")).as("last_pos"),
          max_by(col("value"), col("pos")).as("last_value"),
          max_by(col("op"), col("pos")).as("last_op"))
        .filter(col("last_op") =!= "DELETE")
        .drop("last_op")
        .orderBy("user_id")
    },
    // B5 soft-delete projection — tombstones retained as is_deleted (the
    // menagerie models this in-domain with the nullable death date,
    // reference cr_pet_tbl.sql:12, pets.schema.json:32-37).
    "b5_soft_delete" -> { (s, d) =>
      merge(changelog(s, d), Seq("user_id"), keepTombstones = true)
        .select(col("user_id"), col("pos").as("last_pos"), col("is_deleted"))
        .orderBy("user_id")
    },
    // B7 salted two-phase merge — same replica as B3/B4 via salt-partial →
    // final reduce: under a pathologically hot key at 100 TB, the first
    // aggregation spreads one key over 8 reducers and the second combines 8
    // partials; output is provably identical to the unsalted merge.
    // Measured (RandomizedCdcSpec, 80%-hot key): the naive window merge
    // reads the whole hot key in one task; Spark 4's WindowGroupLimit
    // rescues the rn=1 window form specifically, while this salted shape
    // bounds the reducer for ANY algebraic aggregate — the form to reach
    // for when the merge logic outgrows "latest row wins".
    "b7_merge_salted" -> { (s, d) =>
      val partial = changelog(s, d)
        .groupBy(col("user_id"), pmod(col("pos"), lit(8)).as("salt"))
        .agg(max(col("pos")).as("p_pos"),
          max_by(col("value"), col("pos")).as("p_value"),
          max_by(col("op"), col("pos")).as("p_op"))
      partial.groupBy(col("user_id"))
        .agg(max(col("p_pos")).as("last_pos"),
          max_by(col("p_value"), col("p_pos")).as("last_value"),
          max_by(col("p_op"), col("p_pos")).as("last_op"))
        .filter(col("last_op") =!= "DELETE")
        .drop("last_op")
        .orderBy("user_id")
    },
    // B8 incremental bucketed merge — the same replica as B3 built the way
    // the streaming path builds it: two change batches committed through the
    // BucketedReplica (hash-bucketed by pk, touched-bucket-only rewrite,
    // atomic pointer commit). Proves the incremental storage path and the
    // one-shot merge agree on the same changelog.
    "b8_incremental_merge" -> { (s, d) =>
      val root = scratch("b8_replica", d, s)
      // 8 buckets: sized so each bucket file is right-sized at fixture SF
      // (the layout knob the 100 TB story turns the other way)
      val rep = new graft.streaming.BucketedReplica(root, nBuckets = 8)
      rep.destroy() // fresh replica per run (scratch persists across runs)
      val ch = changelog(s, d)
      rep.commit(ch.filter(col("pos") % 2 === 0)) // out-of-order halves:
      rep.commit(ch.filter(col("pos") % 2 === 1)) // tombstone retention matters
      rep.live(s)
        .select(col("user_id"), col("pos").as("last_pos"),
          col("value").as("last_value"), col("event_type").as("last_event"))
        .orderBy("user_id")
    },
    // B6 snapshot + incremental unification — backfill rows (op=INSERT,
    // pos=-1, reference README.md:157-160) unioned with the binlog tail, then
    // one merge produces the consistent replica.
    "b6_snapshot_union" -> { (s, d) =>
      val snapshot = load(s, d, "customer")
        .filter(col("c_custkey") < 15)
        .select(lit("INSERT").as("op"), lit("users").as("tbl"),
          lit(-1L).as("pos"), lit(0L).as("ts_ns"),
          col("c_custkey").as("user_id"), col("c_acctbal").as("value"),
          lit("snapshot").as("event_type"))
      merge(snapshot.union(changelog(s, d)), Seq("user_id"))
        .select(col("user_id"), col("pos").as("last_pos"),
          col("value").as("last_value"), col("event_type").as("last_event"))
        .orderBy("user_id")
    },
    // B9 SCD Type 2 — the history-table alternative to the latest-wins
    // replica: every change becomes a validity interval, the open interval is
    // the current row. See [[scd2]].
    "b9_scd2_history" -> { (s, d) =>
      scd2(changelog(s, d), Seq("user_id"))
        .select(col("user_id"), col("valid_from_pos"), col("op"), col("value"),
          col("valid_to_pos"), col("is_current"))
        .orderBy("user_id", "valid_from_pos")
    },
    // B10 change feed — CDC read back OUT of the replica: commit the
    // changelog's first half (by position) as version 1 and the rest as
    // version 2, then diff the two retained versions into the INSERT/UPDATE/
    // DELETE set a downstream consumer would apply. Exercises the
    // BucketedReplica's time travel (readAt) + full-outer keyed diff.
    "b10_change_feed" -> { (s, d) =>
      val root = scratch("b10_replica", d, s)
      val rep = new graft.streaming.BucketedReplica(root, nBuckets = 8)
      rep.destroy() // fresh replica per run (scratch persists across runs)
      val ch = changelog(s, d)
      val cut = ch.agg(max(col("pos"))).head().getLong(0) / 2
      rep.commit(ch.filter(col("pos") <= cut)) // version 1
      rep.commit(ch.filter(col("pos") > cut))  // version 2
      rep.changeFeed(s, 1L, 2L)
        .select(col("user_id"), col("change"), col("pos"))
        .orderBy("user_id")
    },
    // B11 incremental SCD2 — b9's history built the way the STREAM builds
    // it: the changelog delivered as two in-order batches through
    // CdcStream.scd2Batch (closed intervals append per batch; open rows
    // live in the BucketedReplica), then the combined view must equal the
    // one-shot historization — same oracle as b9.
    "b11_incremental_scd2" -> { (s, d) =>
      val root = scratch("b11_scd2", d, s)
      val rep = new graft.streaming.BucketedReplica(s"$root/replica")
      rep.destroy()
      val hist = s"$root/history"
      def rmrf(f: java.io.File): Unit = {
        Option(f.listFiles).getOrElse(Array.empty).foreach(rmrf); f.delete(); ()
      }
      rmrf(new java.io.File(hist)) // fresh history per run
      // cached: the changelog parse feeds three actions (the cut agg and
      // each batch's dedup fill) — without the cache each re-scans events
      val ch = changelog(s, d).persist()
      try {
        val cut = ch.agg(max(col("pos"))).head().getLong(0) / 2
        graft.streaming.CdcStream.scd2Batch(
          ch.filter(col("pos") <= cut), 0L, s"$root/replica", hist, nBuckets = 8)
        graft.streaming.CdcStream.scd2Batch(
          ch.filter(col("pos") > cut), 1L, s"$root/replica", hist, nBuckets = 8)
      } finally { ch.unpersist(); () }
      graft.streaming.CdcStream.historyWithOpen(s, s"$root/replica", hist)
        .select(col("user_id"), col("valid_from_pos"), col("op"), col("value"),
          col("valid_to_pos"), col("is_current"))
        .orderBy("user_id", "valid_from_pos")
    },
    // B12 binlog gap detection — the operational monitor a CDC pipeline
    // runs continuously: positions are a dense per-table sequence at the
    // source, so a hole in the applied stream (here: the rows A8's split
    // dead-lettered) is data loss in flight. One lag window per table —
    // same single-shuffle class as the merge.
    "b12_gap_detection" -> { (s, d) =>
      val applied = changelog(s, d).filter(col("pos") % 10 =!= 0)
      // pin: the fixture derives tbl from a literal, so FoldablePropagation
      // would erase the (semantically real) partition key and the window
      // would execute — and WARN — partition-less; graft_pin keeps it
      val w = Window.partitionBy(graft.functions.PinnedKey.pin(col("tbl")))
        .orderBy(col("pos"))
      applied.select(col("tbl"), col("pos"))
        .withColumn("prev", lag(col("pos"), 1).over(w))
        .filter(col("prev").isNotNull && col("pos") - col("prev") > 1)
        .select(col("tbl"), col("prev").as("after_pos"), col("pos").as("next_pos"),
          (col("pos") - col("prev") - 1).as("n_missing"))
        .orderBy("tbl", "after_pos")
    },
    // B13 incremental aggregate-view maintenance — the reference's
    // reporting query (count/sum per type over the replica,
    // main.tf:188-195) kept fresh per micro-batch by state-diffing only the
    // batch's keys around the replica commit, never rescanning the replica.
    // Three interleaved out-of-order batches (pos mod 3) must converge to
    // the from-scratch aggregate — same final answer as a full recompute.
    "b13_incremental_agg" -> { (s, d) =>
      val root = scratch("b13_agg", d, s)
      val rep = new graft.streaming.BucketedReplica(s"$root/replica", nBuckets = 8)
      rep.destroy()
      val agg = new graft.streaming.IncrementalAgg(rep, s"$root/agg")
      agg.destroy()
      val ch = changelog(s, d)
      // the EXACTLY-ONCE overload (batch-id fence + crash-gap self-heal)
      // is the production streaming path — the scored query exercises it
      (0 until 3).foreach(i =>
        agg.applyBatch(ch.filter(col("pos") % 3 === i), i.toLong))
      agg.read(s)
        .select(col("event_type"), col("n_live"),
          col("sum_value").cast(DoubleType).as("sum_value"))
        .orderBy("event_type")
    },
    // B14 re-key apply — pk-change UPDATEs (synthesized: every 97th
    // position) expand to DELETE(old)+INSERT(new) before the merge, so the
    // replica carries the moved key and no ghost. (Fixture keys are reused
    // by later events, so an old pk can legitimately reappear as a fresh
    // row afterward — exactly what a real stream shows on key reuse.)
    "b14_rekey_apply" -> { (s, d) =>
      val split = rekeySplit(changelog(s, d),
        col("op") === "UPDATE" && col("pos") % 97 === 0,
        col("user_id") + 100000L)
      merge(split, Seq("user_id"))
        .select(col("user_id"), col("pos").as("last_pos"),
          col("value").as("last_value"), col("event_type").as("last_event"))
        .orderBy("user_id")
    },
    // B3 composite-key form — MERGE keyed by (user_id, event_type): the
    // multi-column primary key every real warehouse table eventually has.
    // Same single hash shuffle as b3, now on both key columns (the shuffle
    // key is the tuple, so co-hashing holds and skew spreads across the
    // composite domain); latest position per composite key wins, DELETEs
    // drop that key's row only.
    "b15_composite_merge" -> { (s, d) =>
      merge(changelog(s, d), Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type"),
          col("pos").as("last_pos"), col("value").as("last_value"))
        .orderBy("user_id", "event_type")
    },
    // B16 cross-table consistent cut — the transactional-consistency read
    // the per-table appliers (D8 fan-out) cannot give on their own: each
    // table's writer finalizes binlog-derived files independently (the
    // reference's Datastream writes per-table file streams, README.md:163-168),
    // so a table's trustworthy watermark is the max position in its COMPLETE
    // files (the newest file is still open). The consistent cut is
    // min(watermark) across tables; merging each table's log only up to the
    // cut yields replicas that all reflect the same source instant — the
    // snapshot a cross-table join must read to avoid torn transactions.
    // Scale shape: watermarks are table-count-sized aggregates (broadcast);
    // the merge is the ordinary single pk shuffle per table, with the cut
    // filter pushed below it.
    "b16_consistent_cut" -> { (s, d) =>
      val log = changelog(s, d)
        .withColumn("tbl", when(col("user_id") % 2 === 0, "users_even")
          .otherwise("users_odd"))
        // 200-position files so even the smallest fixture has several
        // complete (finalized) files — the cut must never be vacuous
        .withColumn("file", expr("pos div 200"))
      val maxf = log.groupBy(col("tbl")).agg(max(col("file")).as("maxf"))
      val wm = log.join(broadcast(maxf), "tbl")
        .filter(col("file") < col("maxf"))
        .groupBy(col("tbl")).agg(max(col("pos")).as("wm"))
      val cut = wm.agg(min(col("wm")).as("cut"))
      val w = Window.partitionBy(col("tbl"), col("user_id"))
        .orderBy(col("pos").desc)
      log.crossJoin(broadcast(cut)).filter(col("pos") <= col("cut"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .filter(col("op") =!= "DELETE")
        .groupBy(col("tbl"), col("cut"))
        .agg(count(lit(1)).as("n_rows"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .orderBy("tbl")
    },
    // B17 point-in-time (temporal) join — the canonical warehouse pattern
    // the SCD2 history exists FOR: each fact row joins the dimension
    // VERSION valid at the fact's position, i.e. the interval
    // [valid_from, valid_to) containing fact_pos — never the current row
    // (that's the SCD1 lookup), never more than one version per fact.
    // Plan shape: equi-join on the key with the interval predicate as a
    // post-filter — the join hashes on user_id exactly like the merge, so
    // skew/AQE behavior is the proven b3 class; per key the version list
    // is the pos-ordered change history, so matched-row work is
    // |facts| + |versions|, not their product. At 100 TB the history side
    // is partition-pruned to the fact's key range first.
    "b17_temporal_join" -> { (s, d) =>
      val hist = scd2(changelog(s, d), Seq("user_id"))
        .select(col("user_id").as("h_user"), col("valid_from_pos"),
          col("valid_to_pos"), col("op").as("version_op"),
          col("value").as("dim_value"))
      val fact = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("fact_pos"),
          col("value").as("amount"))
      fact.join(hist, col("user_id") === col("h_user") &&
          col("valid_from_pos") <= col("fact_pos") &&
          (col("valid_to_pos").isNull || col("fact_pos") < col("valid_to_pos")))
        .select(col("user_id"), col("fact_pos"), col("amount"),
          col("valid_from_pos").as("version_pos"), col("version_op"),
          col("dim_value"))
        .orderBy("user_id", "fact_pos")
    },
    // B18 op-legality audit — the CDC contract checker beside b12's gap
    // monitor: a well-formed per-key op sequence is INSERT (UPDATE|...)*
    // DELETE; anything else (INSERT on a live key, UPDATE/DELETE on a
    // dead or never-born key) means lost or reordered events upstream.
    // One lag window per key — the same single pk-shuffle class as the
    // merge — rolled up to a per-violation-type summary with first/last
    // offending positions for triage.
    "b18_op_legality" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("pos"))
      changelog(s, d)
        .withColumn("prev_op", lag(col("op"), 1).over(w))
        .withColumn("violation",
          when(col("op") === "INSERT" && col("prev_op").isNotNull
            && col("prev_op") =!= "DELETE", "insert_on_live")
          .when(col("op") === "UPDATE" && (col("prev_op").isNull
            || col("prev_op") === "DELETE"), "update_on_dead")
          .when(col("op") === "DELETE" && (col("prev_op").isNull
            || col("prev_op") === "DELETE"), "delete_on_dead"))
        .filter(col("violation").isNotNull)
        .groupBy(col("violation"))
        .agg(count(lit(1)).as("n"), min(col("pos")).as("first_pos"),
          max(col("pos")).as("last_pos"))
        .orderBy("violation")
    },
    // B19 version retention — changelog compaction keeping the last K=2
    // versions per key (the storage policy behind b10's two-version time
    // travel: anything older can never be read again and is reclaimable).
    // One row_number window per key (merge-class shuffle); the report
    // proves the policy: per op-of-retained-version counts plus how many
    // rows compaction drops.
    "b19_version_retention" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("pos").desc)
      val ranked = changelog(s, d)
        .withColumn("rn", row_number().over(w))
      val kept = ranked.filter(col("rn") <= 2)
      val total = ranked.agg(count(lit(1)).as("n_total"))
      // total kept is a 1-row aggregate broadcast onto the ≤3-row per-op
      // report (a partition-less window over the aggregate would do the
      // same work but leave a misleading "No Partition Defined" warning)
      val keptTotal = kept.agg(count(lit(1)).as("n_kept_total"))
      kept.groupBy(col("op"))
        .agg(count(lit(1)).as("n_kept"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_kept_value"))
        .crossJoin(broadcast(total))
        .crossJoin(broadcast(keptTotal))
        .withColumn("n_dropped_total", col("n_total") - col("n_kept_total"))
        .select(col("op"), col("n_kept"), col("sum_kept_value"),
          col("n_dropped_total"))
        .orderBy("op")
    },
    // B20 ANSI MERGE INTO — the analyst-facing SQL form of the b3/b8
    // replica maintenance (reference main.tf:197-215 MERGEs staged changes
    // into the serving table by SQL). The first half of the changelog
    // builds the replica programmatically; the second half arrives as a
    // deduped staged batch applied by a literal MERGE statement through
    // graft.plans.GraftMergeInto (resolution-rule interception; the rewrite
    // stays bucket-bounded). The live view must equal global latest-wins —
    // the same oracle shape as b8.
    "b20_merge_into_sql" -> { (s, d) =>
      val root = scratch("b20_replica", d, s)
      val rep = new graft.streaming.BucketedReplica(root, nBuckets = 8)
      rep.destroy()
      val ch = changelog(s, d)
      val mid = ch.agg(expr("percentile(pos, 0.5)")).collect()(0).getDouble(0).toLong
      rep.commit(ch.filter(col("pos") <= mid))
      val w = Window.partitionBy(col("user_id")).orderBy(col("pos").desc)
      ch.filter(col("pos") > mid)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
        .createOrReplaceTempView("b20_staged")
      graft.plans.GraftMergeInto.register(s, "b20_replica_view", rep)
      s.sql(
        """MERGE INTO b20_replica_view t USING b20_staged s ON t.user_id = s.user_id
          |WHEN MATCHED AND s.op = 'DELETE' AND s.pos > t.pos THEN DELETE
          |WHEN MATCHED AND s.pos > t.pos THEN UPDATE SET *
          |WHEN NOT MATCHED AND s.op != 'DELETE' THEN INSERT *
          |""".stripMargin)
      graft.plans.GraftMergeInto.unregister("b20_replica_view")
      rep.live(s)
        .select(col("user_id"), col("pos").as("last_pos"),
          col("value").as("last_value"), col("event_type").as("last_event"))
        .orderBy("user_id")
    },
    // B21 durable catalog identity — the reference's replica is a warehouse
    // table analysts address BY NAME from any session (reference
    // main.tf:197-215: menagerie_reporting.pets exists independently of the
    // job that wrote it). Same half-commit + MERGE flow as b20, but with NO
    // register() call: the session carries only the two catalog confs, the
    // name resolves through graft.plans.GraftCatalog from the store's own
    // durable metadata, the MERGE routes through the same bucket-bounded
    // GraftMergeCommand, and the final read is a literal
    // SELECT … FROM <catalog>.cdc.users executing as a native parquet scan.
    "b21_catalog_table" -> { (s, d) =>
      val wh = scratch("b21_warehouse", d, s)
      // one catalog name per fixture dir: the session's CatalogManager
      // caches catalog instances by name, so a warm-up at another SF must
      // not pin this SF's root
      val cat = "graft_" + d.replaceAll("[^A-Za-z0-9]", "_")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.plans.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", wh)
      val rep = new graft.streaming.BucketedReplica(s"$wh/cdc/users", nBuckets = 8)
      rep.destroy()
      val ch = changelog(s, d)
      val mid = ch.agg(expr("percentile(pos, 0.5)")).collect()(0).getDouble(0).toLong
      rep.commit(ch.filter(col("pos") <= mid))
      val w = Window.partitionBy(col("user_id")).orderBy(col("pos").desc)
      ch.filter(col("pos") > mid)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
        .createOrReplaceTempView("b21_staged")
      s.sql(
        s"""MERGE INTO $cat.cdc.users t USING b21_staged s ON t.user_id = s.user_id
           |WHEN MATCHED AND s.op = 'DELETE' AND s.pos > t.pos THEN DELETE
           |WHEN MATCHED AND s.pos > t.pos THEN UPDATE SET *
           |WHEN NOT MATCHED AND s.op != 'DELETE' THEN INSERT *
           |""".stripMargin)
      s.sql(
        s"""SELECT user_id, pos AS last_pos, value AS last_value,
           |  event_type AS last_event
           |FROM $cat.cdc.users ORDER BY user_id""".stripMargin)
    },
    // B22 ANSI DELETE FROM — the third analyst DML verb on the durable
    // catalog surface (plans/GraftDeleteUpdate): the replica materializes
    // from the full changelog, then a literal DELETE statement tombstones
    // every live row the predicate names. The WHERE is arbitrary (not
    // key-bounded) so the subject probe honestly costs one scan, but the
    // write rewrites only the touched buckets. The live view afterwards
    // must equal latest-wins minus the predicate — and because deletes are
    // position-keeping tombstones, this composes with b3's out-of-order
    // guarantees (pinned in DeleteUpdateSqlSpec).
    "b22_delete_sql" -> { (s, d) =>
      val wh = scratch("b22_warehouse", d, s)
      val cat = "graftbdel_" + d.replaceAll("[^A-Za-z0-9]", "_")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.plans.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", wh)
      val rep = new graft.streaming.BucketedReplica(s"$wh/cdc/users", nBuckets = 8)
      rep.destroy()
      rep.commit(changelog(s, d))
      s.sql(s"DELETE FROM $cat.cdc.users WHERE event_type = 'click' OR value < 20")
      s.sql(
        s"""SELECT user_id, pos AS last_pos, value AS last_value,
           |  event_type AS last_event
           |FROM $cat.cdc.users ORDER BY user_id""".stripMargin)
    },
    // B23 ANSI UPDATE — the fourth analyst DML verb: in-place rewrite of
    // the subject rows (SET on the primary key or the op envelope column
    // is refused — a pk change is rekeySplit's DELETE+INSERT). Same
    // probe-then-rewrite economics as b22; the double arithmetic in SET is
    // one IEEE multiply-add, bit-identical cross-engine.
    "b23_update_sql" -> { (s, d) =>
      val wh = scratch("b23_warehouse", d, s)
      val cat = "graftbupd_" + d.replaceAll("[^A-Za-z0-9]", "_")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.plans.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", wh)
      val rep = new graft.streaming.BucketedReplica(s"$wh/cdc/users", nBuckets = 8)
      rep.destroy()
      rep.commit(changelog(s, d))
      s.sql(
        s"""UPDATE $cat.cdc.users
           |SET value = value * 2 + 1, event_type = concat('adj_', event_type)
           |WHERE value >= 50""".stripMargin)
      s.sql(
        s"""SELECT user_id, pos AS last_pos, value AS last_value,
           |  event_type AS last_event
           |FROM $cat.cdc.users ORDER BY user_id""".stripMargin)
    },
    // B24 DDL evolution — ALTER TABLE ADD COLUMN on the catalog replica
    // (GraftCatalog.alterTable → BucketedReplica.widenSchema): a
    // metadata-only version flip appends the nullable column (zero data
    // I/O — stored rows read NULL for it via the parquet reader's
    // null-fill), then the next INSERT lands it physically. The read
    // must show every pre-ALTER key with the column NULL beside the one
    // post-ALTER row that carries it — the all-NULLABLE monotone
    // evolution model of the reference's sink schemas (main.tf:197-215).
    "b24_alter_evolution" -> { (s, d) =>
      val wh = scratch("b24_warehouse", d, s)
      val cat = "graftbalt_" + d.replaceAll("[^A-Za-z0-9]", "_")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.plans.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", wh)
      val rep = new graft.streaming.BucketedReplica(s"$wh/cdc/users", nBuckets = 8)
      rep.destroy()
      rep.commit(changelog(s, d))
      s.sql(s"ALTER TABLE $cat.cdc.users ADD COLUMN origin STRING")
      s.sql(
        s"""INSERT INTO $cat.cdc.users VALUES
           |('UPSERT', 'users', 1000000000000000, 1000000000000000,
           | 999999999, 42.5, 'signup', 'backfill')""".stripMargin)
      s.sql(
        s"""SELECT user_id, pos AS last_pos, value AS last_value,
           |  event_type AS last_event, origin
           |FROM $cat.cdc.users ORDER BY user_id""".stripMargin)
    },
    // B25 CREATE TABLE AS SELECT — the last DDL verb on the durable
    // catalog (plans/GraftCtas): one statement materializes a SELECT over
    // the raw changelog as a new replica, the query result landing as the
    // table's first latest-wins commit. The statement IS the "materialize
    // this query as a serving table" flow the reference's analysts run;
    // the oracle is the same global-latest-wins shape as b21 because
    // CTAS-from-changelog and commit-then-read must be the same thing.
    "b25_ctas" -> { (s, d) =>
      val wh = scratch("b25_warehouse", d, s)
      val cat = "graftbcts_" + d.replaceAll("[^A-Za-z0-9]", "_")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.plans.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", wh)
      new graft.streaming.BucketedReplica(s"$wh/cdc/snap", nBuckets = 8).destroy()
      changelog(s, d).createOrReplaceTempView("b25_changelog")
      s.sql(
        s"""CREATE TABLE $cat.cdc.snap
           |TBLPROPERTIES ('pk' = 'user_id', 'nBuckets' = '8')
           |AS SELECT * FROM b25_changelog""".stripMargin)
      s.sql(
        s"""SELECT user_id, pos AS last_pos, value AS last_value,
           |  event_type AS last_event
           |FROM $cat.cdc.snap ORDER BY user_id""".stripMargin)
    }
  )

  val oracleSql: Map[String, String] = Map(
    "a1_snapshot_scan" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_acctbal > 0 ORDER BY c_custkey""".stripMargin,
    "a2_tsv_load" ->
      """SELECT * FROM (VALUES
        |  ('Bowser','Diane','dog','m',DATE '1979-08-31',DATE '1995-07-29'),
        |  ('Buffy','Harold','dog','f',DATE '1989-05-13',NULL),
        |  ('Chirpy','Gwen','bird','f',DATE '1998-09-11',NULL),
        |  ('Claws','Gwen','cat','m',DATE '1994-03-17',NULL),
        |  ('Fang','Benny','dog','m',DATE '1990-08-27',NULL),
        |  ('Fluffy','Harold','cat','f',DATE '1993-02-04',NULL),
        |  ('Puffball','Diane','hamster','f',DATE '1999-03-30',NULL),
        |  ('Slim','Benny','snake','m',DATE '1996-04-29',NULL),
        |  ('Whistler','Gwen','bird',NULL,DATE '1997-12-09',NULL)
        |) AS t(name, owner, species, sex, birth, death) ORDER BY name""".stripMargin,
    "a2b_tsv_ragged" ->
      """SELECT * FROM (VALUES
        |  ('Bowser',DATE '1991-10-12','kennel',NULL),
        |  ('Buffy',DATE '1993-06-23','litter','5 puppies, 2 female'),
        |  ('Buffy',DATE '1994-06-19','litter','3 puppies, 3 female'),
        |  ('Chirpy',DATE '1999-03-21','vet','needed beak straightened'),
        |  ('Claws',DATE '1998-03-17','birthday','Gave him a new flea collar'),
        |  ('Fang',DATE '1991-10-12','kennel',NULL),
        |  ('Fang',DATE '1998-08-28','birthday','Gave him a new chew toy'),
        |  ('Fluffy',DATE '1995-05-15','litter','4 kittens, 3 female'),
        |  ('Slim',DATE '1997-08-03','vet','broken rib'),
        |  ('Whistler',DATE '1998-12-09','birthday','First birthday')
        |) AS t(name, "date", "type", remark) ORDER BY name, "date", "type"""".stripMargin,
    "a3_avro_roundtrip" ->
      s"""WITH ch AS ($changelogSql)
         |SELECT op, COUNT(*) AS n, MAX(pos) AS max_pos,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM ch GROUP BY op ORDER BY op""".stripMargin,
    "a3b_avro_dsv2" ->
      s"""WITH ch AS ($changelogSql)
         |SELECT op, COUNT(*) AS n, MAX(pos) AS max_pos,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM ch GROUP BY op ORDER BY op""".stripMargin,
    "a3c_nested_avro" ->
      s"""WITH ch AS ($changelogSql)
         |SELECT op, COUNT(*) AS n,
         |  COUNT(DISTINCT $logFileSql) AS n_log_files,
         |  MAX(pos) AS max_pos,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM ch GROUP BY op ORDER BY op""".stripMargin,
    "a4b_nested_json" ->
      s"""WITH ch AS ($changelogSql)
         |SELECT $logFileSql AS log_file, COUNT(*) AS n,
         |  COUNT(DISTINCT user_id) AS n_users, MAX(pos) AS max_pos,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM ch GROUP BY 1 ORDER BY log_file""".stripMargin,
    "a4_json_roundtrip" ->
      s"""WITH ch AS ($changelogSql)
         |SELECT user_id, COUNT(*) AS n, MAX(pos) AS max_pos,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM ch GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a6_sink_roundtrip" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn FROM ch)
         |SELECT user_id, pos, value, event_type FROM r
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
    "a7_staging_append" ->
      s"""WITH ch AS ($changelogSql)
         |SELECT op, COUNT(*) AS n, MIN(pos) AS min_pos, MAX(pos) AS max_pos
         |FROM ch GROUP BY op ORDER BY op""".stripMargin,
    "a8_dlq_split" ->
      """SELECT CASE WHEN event_id % 10 = 0 THEN 'dlq' ELSE 'ok' END AS route,
        |  COUNT(*) AS n, MAX(event_id) AS max_pos
        |FROM events GROUP BY 1 ORDER BY route""".stripMargin,
    "a10_orc_roundtrip" ->
      s"""WITH ch AS ($changelogSql)
         |SELECT op, COUNT(*) AS n, MIN(pos) AS min_pos,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM ch GROUP BY op ORDER BY op""".stripMargin,
    "a11_partitioned_sink" ->
      s"""WITH ch AS ($changelogSql)
         |SELECT user_id, COUNT(*) AS n, MAX(pos) AS max_pos
         |FROM ch WHERE op = 'UPDATE' GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a12_json_sink" ->
      s"""WITH ch AS ($changelogSql)
         |SELECT op, COUNT(*) AS n, MAX(pos) AS max_pos,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM ch GROUP BY op ORDER BY op""".stripMargin,
    "a16_xml_roundtrip" ->
      s"""WITH ch AS ($changelogSql)
         |SELECT op, COUNT(*) AS n, MAX(pos) AS max_pos,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM ch GROUP BY op ORDER BY op""".stripMargin,
    "a13_compaction" ->
      s"""WITH ch AS ($changelogSql)
         |SELECT op, COUNT(*) AS n, MIN(pos) AS min_pos, MAX(pos) AS max_pos
         |FROM ch GROUP BY op ORDER BY op""".stripMargin,
    "a17_binary_files" ->
      """SELECT doc_id, 32::BIGINT AS length, md5(md5(text)) AS digest
        |FROM documents WHERE doc_id IN (0, 10, 20) ORDER BY doc_id""".stripMargin,
    "a9_catalog_ddl" ->
      """SELECT o_orderstatus, count(*) AS n FROM orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // the two-batch exactly-once JDBC roundtrip must land on global
    // latest-wins — deliberately the same oracle shape as b8/b20
    "a18_jdbc_sink" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn FROM ch)
         |SELECT user_id, pos AS last_pos, value AS last_value, event_type AS last_event
         |FROM r WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
    "b1_insert_append" ->
      s"""WITH ch AS ($changelogSql)
         |SELECT user_id, COUNT(*) AS n_inserts,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS inserted_value
         |FROM ch WHERE op = 'INSERT' GROUP BY user_id ORDER BY user_id""".stripMargin,
    "b2_delete_applied" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn FROM ch)
         |SELECT user_id, pos AS deleted_at_pos FROM r
         |WHERE rn = 1 AND op = 'DELETE' ORDER BY user_id""".stripMargin,
    "b3_cdc_merge" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn FROM ch)
         |SELECT user_id, pos AS last_pos, value AS last_value, event_type AS last_event
         |FROM r WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
    "b4_merge_aggform" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn FROM ch)
         |SELECT user_id, pos AS last_pos, value AS last_value
         |FROM r WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
    "b5_soft_delete" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn FROM ch)
         |SELECT user_id, pos AS last_pos, (op = 'DELETE') AS is_deleted
         |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "b7_merge_salted" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn FROM ch)
         |SELECT user_id, pos AS last_pos, value AS last_value
         |FROM r WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
    "b8_incremental_merge" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn FROM ch)
         |SELECT user_id, pos AS last_pos, value AS last_value, event_type AS last_event
         |FROM r WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
    "b9_scd2_history" ->
      s"""WITH ch AS ($changelogSql)
         |SELECT user_id, pos AS valid_from_pos, op, value,
         |  lead(pos) OVER (PARTITION BY user_id ORDER BY pos) AS valid_to_pos,
         |  (lead(pos) OVER (PARTITION BY user_id ORDER BY pos) IS NULL
         |     AND op <> 'DELETE') AS is_current
         |FROM ch ORDER BY user_id, valid_from_pos""".stripMargin,
    "b10_change_feed" ->
      s"""WITH ch AS ($changelogSql),
         |m1 AS (SELECT user_id, pos FROM (SELECT user_id, pos, op,
         |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn
         |        FROM ch WHERE pos <= (SELECT max(pos) // 2 FROM ch))
         |       WHERE rn = 1 AND op <> 'DELETE'),
         |m2 AS (SELECT user_id, pos FROM (SELECT user_id, pos, op,
         |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn
         |        FROM ch)
         |       WHERE rn = 1 AND op <> 'DELETE')
         |SELECT COALESCE(m2.user_id, m1.user_id) AS user_id,
         |  CASE WHEN m1.user_id IS NULL THEN 'INSERT'
         |       WHEN m2.user_id IS NULL THEN 'DELETE' ELSE 'UPDATE' END AS change,
         |  COALESCE(m2.pos, m1.pos) AS pos
         |FROM m1 FULL OUTER JOIN m2 ON m1.user_id = m2.user_id
         |WHERE m1.user_id IS NULL OR m2.user_id IS NULL OR m1.pos <> m2.pos
         |ORDER BY user_id""".stripMargin,
    "b11_incremental_scd2" ->
      s"""WITH ch AS ($changelogSql)
         |SELECT user_id, pos AS valid_from_pos, op, value,
         |  lead(pos) OVER (PARTITION BY user_id ORDER BY pos) AS valid_to_pos,
         |  (lead(pos) OVER (PARTITION BY user_id ORDER BY pos) IS NULL
         |     AND op <> 'DELETE') AS is_current
         |FROM ch ORDER BY user_id, valid_from_pos""".stripMargin,
    "a14_schema_evolution" ->
      s"""WITH ch AS ($changelogSql),
         |v1 AS (SELECT op, NULL::DOUBLE AS value FROM ch WHERE pos % 2 = 0),
         |v2 AS (SELECT op, value FROM ch WHERE pos % 2 = 1),
         |u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
         |SELECT op, COUNT(*) AS n,
         |  SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_value,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM u GROUP BY op ORDER BY op""".stripMargin,
    "b12_gap_detection" ->
      s"""WITH ch AS ($changelogSql),
         |applied AS (SELECT tbl, pos FROM ch WHERE pos % 10 <> 0),
         |l AS (SELECT tbl, pos,
         |        lag(pos) OVER (PARTITION BY tbl ORDER BY pos) AS prev
         |      FROM applied)
         |SELECT tbl, prev AS after_pos, pos AS next_pos,
         |  pos - prev - 1 AS n_missing
         |FROM l WHERE prev IS NOT NULL AND pos - prev > 1
         |ORDER BY tbl, after_pos""".stripMargin,
    "b14_rekey_apply" ->
      s"""WITH ch AS ($changelogSql),
         |flagged AS (SELECT *, (op = 'UPDATE' AND pos % 97 = 0) AS rk FROM ch),
         |split AS (
         |  SELECT op, tbl, pos * 2 AS pos, ts_ns, user_id, value, event_type
         |  FROM flagged WHERE NOT rk
         |  UNION ALL
         |  SELECT 'DELETE', tbl, pos * 2, ts_ns, user_id, value, event_type
         |  FROM flagged WHERE rk
         |  UNION ALL
         |  SELECT 'INSERT', tbl, pos * 2 + 1, ts_ns, user_id + 100000, value, event_type
         |  FROM flagged WHERE rk),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn
         |      FROM split)
         |SELECT user_id, pos AS last_pos, value AS last_value, event_type AS last_event
         |FROM r WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
    "a15_csv_quoted" ->
      s"""WITH ch AS ($changelogSql)
         |SELECT op, pos, user_id, value,
         |  event_type || ',"q"' || chr(10) || op AS tricky
         |FROM ch ORDER BY pos""".stripMargin,
    "b15_composite_merge" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
         |                                   ORDER BY pos DESC) AS rn FROM ch)
         |SELECT user_id, event_type, pos AS last_pos, value AS last_value
         |FROM r WHERE rn = 1 AND op <> 'DELETE'
         |ORDER BY user_id, event_type""".stripMargin,
    "b16_consistent_cut" ->
      s"""WITH ch0 AS ($changelogSql),
         |ch AS (SELECT *, CASE WHEN user_id % 2 = 0 THEN 'users_even'
         |                      ELSE 'users_odd' END AS tbl2,
         |              pos // 200 AS file FROM ch0),
         |maxf AS (SELECT tbl2, max(file) AS maxf FROM ch GROUP BY tbl2),
         |wm AS (SELECT ch.tbl2, max(pos) AS wm
         |       FROM ch JOIN maxf USING (tbl2) WHERE file < maxf GROUP BY ch.tbl2),
         |cut AS (SELECT min(wm) AS cut FROM wm),
         |r AS (SELECT ch.*, cut.cut,
         |        ROW_NUMBER() OVER (PARTITION BY tbl2, user_id
         |                           ORDER BY pos DESC) AS rn
         |      FROM ch, cut WHERE pos <= cut.cut)
         |SELECT tbl2 AS tbl, cut, COUNT(*) AS n_rows,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM r WHERE rn = 1 AND op <> 'DELETE'
         |GROUP BY tbl2, cut ORDER BY tbl2""".stripMargin,
    "b17_temporal_join" ->
      s"""WITH ch AS ($changelogSql),
         |hist AS (SELECT user_id, pos AS valid_from_pos,
         |           lead(pos) OVER (PARTITION BY user_id ORDER BY pos)
         |             AS valid_to_pos,
         |           op AS version_op, value AS dim_value
         |         FROM ch),
         |fact AS (SELECT user_id, event_id AS fact_pos, value AS amount
         |         FROM events WHERE event_type = 'purchase')
         |SELECT f.user_id, f.fact_pos, f.amount,
         |  h.valid_from_pos AS version_pos, h.version_op, h.dim_value
         |FROM fact f JOIN hist h ON f.user_id = h.user_id
         |  AND h.valid_from_pos <= f.fact_pos
         |  AND (h.valid_to_pos IS NULL OR f.fact_pos < h.valid_to_pos)
         |ORDER BY f.user_id, f.fact_pos""".stripMargin,
    "b18_op_legality" ->
      s"""WITH ch AS ($changelogSql),
         |lg AS (SELECT op, pos,
         |         lag(op) OVER (PARTITION BY user_id ORDER BY pos) AS prev_op
         |       FROM ch),
         |v AS (SELECT pos,
         |        CASE
         |          WHEN op = 'INSERT' AND prev_op IS NOT NULL
         |            AND prev_op <> 'DELETE' THEN 'insert_on_live'
         |          WHEN op = 'UPDATE' AND (prev_op IS NULL
         |            OR prev_op = 'DELETE') THEN 'update_on_dead'
         |          WHEN op = 'DELETE' AND (prev_op IS NULL
         |            OR prev_op = 'DELETE') THEN 'delete_on_dead'
         |        END AS violation
         |      FROM lg)
         |SELECT violation, COUNT(*) AS n, MIN(pos) AS first_pos,
         |  MAX(pos) AS last_pos
         |FROM v WHERE violation IS NOT NULL
         |GROUP BY violation ORDER BY violation""".stripMargin,
    "b19_version_retention" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
         |        ORDER BY pos DESC) AS rn FROM ch),
         |kept AS (SELECT * FROM r WHERE rn <= 2),
         |tot AS (SELECT count(*) AS n_total FROM r),
         |g AS (SELECT op, count(*) AS n_kept,
         |        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         |          AS sum_kept_value
         |      FROM kept GROUP BY op)
         |SELECT op, n_kept, sum_kept_value,
         |  (n_total - SUM(n_kept) OVER ())::BIGINT AS n_dropped_total
         |FROM g CROSS JOIN tot ORDER BY op""".stripMargin,
    // the half-commit + SQL-MERGE composition must land on global
    // latest-wins — deliberately the same oracle shape as b8
    "b20_merge_into_sql" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn FROM ch)
         |SELECT user_id, pos AS last_pos, value AS last_value, event_type AS last_event
         |FROM r WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
    // the catalog-addressed MERGE + SELECT must land on the same global
    // latest-wins as the registered-view form — identical oracle to b20
    "b21_catalog_table" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn FROM ch)
         |SELECT user_id, pos AS last_pos, value AS last_value, event_type AS last_event
         |FROM r WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
    // CTAS-from-changelog ≡ commit-then-read: global latest-wins
    "b25_ctas" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn FROM ch)
         |SELECT user_id, pos AS last_pos, value AS last_value, event_type AS last_event
         |FROM r WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
    // SQL DELETE tombstones every live latest-wins row the predicate names
    "b22_delete_sql" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn FROM ch)
         |SELECT user_id, pos AS last_pos, value AS last_value, event_type AS last_event
         |FROM r WHERE rn = 1 AND op <> 'DELETE'
         |  AND NOT (event_type = 'click' OR value < 20)
         |ORDER BY user_id""".stripMargin,
    // post-ALTER read: every pre-evolution live row with the new column
    // NULL, plus the one inserted row that carries it
    "b24_alter_evolution" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn FROM ch)
         |SELECT user_id, pos AS last_pos, value AS last_value,
         |  event_type AS last_event, CAST(NULL AS VARCHAR) AS origin
         |FROM r WHERE rn = 1 AND op <> 'DELETE'
         |UNION ALL
         |SELECT 999999999, 1000000000000000, 42.5, 'signup', 'backfill'
         |ORDER BY user_id""".stripMargin,
    // SQL UPDATE rewrites the subject rows in place; one IEEE multiply-add
    "b23_update_sql" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn FROM ch),
         |live AS (SELECT * FROM r WHERE rn = 1 AND op <> 'DELETE')
         |SELECT user_id, pos AS last_pos,
         |  CASE WHEN value >= 50 THEN value * 2 + 1 ELSE value END AS last_value,
         |  CASE WHEN value >= 50 THEN 'adj_' || event_type ELSE event_type END AS last_event
         |FROM live ORDER BY user_id""".stripMargin,
    "b13_incremental_agg" ->
      s"""WITH ch AS ($changelogSql),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn FROM ch),
         |live AS (SELECT * FROM r WHERE rn = 1 AND op <> 'DELETE')
         |SELECT event_type, COUNT(*) AS n_live,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM live GROUP BY event_type ORDER BY event_type""".stripMargin,
    "b6_snapshot_union" ->
      s"""WITH snap AS (
         |  SELECT 'INSERT' AS op, 'users' AS tbl, -1::BIGINT AS pos, 0::BIGINT AS ts_ns,
         |         c_custkey AS user_id, c_acctbal AS value, 'snapshot' AS event_type
         |  FROM customer WHERE c_custkey < 15),
         |ch AS ($changelogSql),
         |allch AS (SELECT * FROM snap UNION ALL SELECT * FROM ch),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn FROM allch)
         |SELECT user_id, pos AS last_pos, value AS last_value, event_type AS last_event
         |FROM r WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin
  )
}
