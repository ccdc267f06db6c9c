package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, File}

/** Avro change-file source/sink (SURVEY §2 A3).
  *
  * The reference's CDC stream lands change events as Avro objects in a bucket
  * (reference: README.md:168 — "Avro is a very compact file format and allows
  * for fast reads"). This container ships only the Avro core library (no
  * spark-avro connector jar), so reading is implemented as a distributed scan:
  * `binaryFiles` partitions the file list across executors and each task
  * decodes its files with Avro's DataFileStream. One file never spans tasks —
  * the same parallelism model the reference's bucket gives Dataflow (one
  * object = one work item). At production scale you would drop in the
  * org.apache.spark:spark-avro connector and keep this schema contract.
  */
object AvroChangeFiles {

  /** Avro twin of the CDC envelope (FIXTURES.md §2, flat payload fields). */
  val avroSchemaJson: String =
    """{"type":"record","name":"ChangeEvent","fields":[
      |{"name":"op","type":"string"},
      |{"name":"tbl","type":"string"},
      |{"name":"pos","type":"long"},
      |{"name":"ts_ns","type":"long"},
      |{"name":"user_id","type":"long"},
      |{"name":"value","type":"double"},
      |{"name":"event_type","type":"string"}
      |]}""".stripMargin

  val sparkSchema: StructType = StructType(Seq(
    StructField("op", StringType), StructField("tbl", StringType),
    StructField("pos", LongType), StructField("ts_ns", LongType),
    StructField("user_id", LongType), StructField("value", DoubleType),
    StructField("event_type", StringType)))

  /** Write a changelog DataFrame as one Avro container file per input
    * partition — each executor task encodes and writes its own object, the
    * distributed shape of Datastream landing one object per work item.
    * (Targets a task-visible filesystem; an object-store deployment swaps
    * the File sink for the store client or the spark-avro connector.) */
  def write(df: DataFrame, dir: String): Unit = {
    val out = new File(dir)
    if (out.exists()) out.listFiles().foreach(_.delete()) else out.mkdirs()
    val schemaJson = avroSchemaJson
    val dirPath = out.getAbsolutePath
    df.select("op", "tbl", "pos", "ts_ns", "user_id", "value", "event_type")
      .rdd.mapPartitionsWithIndex { (idx, rows) =>
        if (rows.isEmpty) Iterator.empty
        else {
          val schema = new Schema.Parser().parse(schemaJson)
          val writer = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          writer.create(schema, new File(dirPath, f"part-$idx%05d.avro"))
          var n = 0L
          rows.foreach { r =>
            val rec = new GenericData.Record(schema)
            rec.put("op", r.getString(0)); rec.put("tbl", r.getString(1))
            rec.put("pos", r.getLong(2)); rec.put("ts_ns", r.getLong(3))
            rec.put("user_id", r.getLong(4)); rec.put("value", r.getDouble(5))
            rec.put("event_type", r.getString(6))
            writer.append(rec)
            n += 1
          }
          writer.close()
          Iterator.single(n)
        }
      }.count() // force the distributed write
    ()
  }

  /** Datastream wire-shape twin (SURVEY §1.2): the change event carries a
    * nested `payload` record plus a `source_metadata` record (change type,
    * source timestamp, binlog file + position) — the envelope the real
    * Datastream→GCS Avro objects use, rather than flat fields. */
  val nestedAvroSchemaJson: String =
    """{"type":"record","name":"DatastreamEvent","fields":[
      |{"name":"payload","type":{"type":"record","name":"Payload","fields":[
      |  {"name":"user_id","type":"long"},
      |  {"name":"value","type":"double"},
      |  {"name":"event_type","type":"string"}]}},
      |{"name":"source_metadata","type":{"type":"record","name":"SourceMetadata","fields":[
      |  {"name":"op","type":"string"},
      |  {"name":"tbl","type":"string"},
      |  {"name":"source_ts_ns","type":"long"},
      |  {"name":"log_file","type":"string"},
      |  {"name":"pos","type":"long"}]}}
      |]}""".stripMargin

  val nestedSparkSchema: StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("user_id", LongType), StructField("value", DoubleType),
      StructField("event_type", StringType)))),
    StructField("source_metadata", StructType(Seq(
      StructField("op", StringType), StructField("tbl", StringType),
      StructField("source_ts_ns", LongType), StructField("log_file", StringType),
      StructField("pos", LongType))))))

  /** Write the nested-envelope form (expects columns payload, source_metadata
    * as structs); one Avro object per partition, written by its task. */
  def writeNested(df: DataFrame, dir: String): Unit = {
    val out = new File(dir)
    if (out.exists()) out.listFiles().foreach(_.delete()) else out.mkdirs()
    val schemaJson = nestedAvroSchemaJson
    val dirPath = out.getAbsolutePath
    df.select("payload", "source_metadata")
      .rdd.mapPartitionsWithIndex { (idx, rows) =>
        if (rows.isEmpty) Iterator.empty
        else {
          val schema = new Schema.Parser().parse(schemaJson)
          val pSchema = schema.getField("payload").schema()
          val mSchema = schema.getField("source_metadata").schema()
          val writer = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          writer.create(schema, new File(dirPath, f"part-$idx%05d.avro"))
          var n = 0L
          rows.foreach { r =>
            val p = r.getStruct(0); val m = r.getStruct(1)
            val pRec = new GenericData.Record(pSchema)
            pRec.put("user_id", p.getLong(0)); pRec.put("value", p.getDouble(1))
            pRec.put("event_type", p.getString(2))
            val mRec = new GenericData.Record(mSchema)
            mRec.put("op", m.getString(0)); mRec.put("tbl", m.getString(1))
            mRec.put("source_ts_ns", m.getLong(2)); mRec.put("log_file", m.getString(3))
            mRec.put("pos", m.getLong(4))
            val rec = new GenericData.Record(schema)
            rec.put("payload", pRec); rec.put("source_metadata", mRec)
            writer.append(rec)
            n += 1
          }
          writer.close()
          Iterator.single(n)
        }
      }.count()
    ()
  }

  /** Distributed read of the nested envelope — structs preserved. */
  def readNested(spark: SparkSession, dir: String): DataFrame = {
    val schemaJson = nestedAvroSchemaJson
    val rdd = spark.sparkContext.binaryFiles(s"$dir/*.avro").flatMap {
      case (_, pds) =>
        val schema = new Schema.Parser().parse(schemaJson)
        val reader = new DataFileStream[GenericRecord](
          new ByteArrayInputStream(pds.toArray()),
          new GenericDatumReader[GenericRecord](schema))
        new Iterator[Row] {
          def hasNext: Boolean = reader.hasNext
          def next(): Row = {
            val r = reader.next()
            val p = r.get("payload").asInstanceOf[GenericRecord]
            val m = r.get("source_metadata").asInstanceOf[GenericRecord]
            Row(
              Row(p.get("user_id").asInstanceOf[Long],
                p.get("value").asInstanceOf[Double],
                p.get("event_type").toString),
              Row(m.get("op").toString, m.get("tbl").toString,
                m.get("source_ts_ns").asInstanceOf[Long],
                m.get("log_file").toString,
                m.get("pos").asInstanceOf[Long]))
          }
        }
    }
    spark.createDataFrame(rdd, nestedSparkSchema)
  }

  /** Distributed read: each Avro object file is decoded inside one task. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val schemaJson = avroSchemaJson
    val rdd = spark.sparkContext.binaryFiles(s"$dir/*.avro").flatMap {
      case (_, pds) =>
        val schema = new Schema.Parser().parse(schemaJson)
        val reader = new DataFileStream[GenericRecord](
          new ByteArrayInputStream(pds.toArray()),
          new GenericDatumReader[GenericRecord](schema))
        val it = new Iterator[Row] {
          def hasNext: Boolean = reader.hasNext
          def next(): Row = {
            val r = reader.next()
            Row(r.get("op").toString, r.get("tbl").toString,
              r.get("pos").asInstanceOf[Long], r.get("ts_ns").asInstanceOf[Long],
              r.get("user_id").asInstanceOf[Long], r.get("value").asInstanceOf[Double],
              r.get("event_type").toString)
          }
        }
        it
    }
    spark.createDataFrame(rdd, sparkSchema)
  }
}
