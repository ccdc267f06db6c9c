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
    * partition (driver collects per-partition iterators lazily — used for
    * test-scale fixtures; a cluster deployment writes through the connector). */
  def write(df: DataFrame, dir: String): Unit = {
    val schema = new Schema.Parser().parse(avroSchemaJson)
    val out = new File(dir)
    if (out.exists()) out.listFiles().foreach(_.delete()) else out.mkdirs()
    val rows = df.select("op", "tbl", "pos", "ts_ns", "user_id", "value", "event_type")
      .collect() // fixture-scale only
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    writer.create(schema, new File(out, "part-00000.avro"))
    rows.foreach { r =>
      val rec = new GenericData.Record(schema)
      rec.put("op", r.getString(0)); rec.put("tbl", r.getString(1))
      rec.put("pos", r.getLong(2)); rec.put("ts_ns", r.getLong(3))
      rec.put("user_id", r.getLong(4)); rec.put("value", r.getDouble(5))
      rec.put("event_type", r.getString(6))
      writer.append(rec)
    }
    writer.close()
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
