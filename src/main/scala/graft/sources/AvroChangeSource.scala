package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util

/** DataSourceV2 provider for the CDC Avro change files (SURVEY §2 A3) —
  * the connector-shaped version of AvroChangeFiles: one finalized bucket
  * object = one InputPartition, decoded by a PartitionReader inside the
  * executor (reference: README.md:168 — Datastream lands change events as
  * Avro objects; this is what reading them as a first-class source looks
  * like).
  *
  * Usage: `spark.read.format("graft.sources.AvroChangeSource").load(dir)`.
  * Fixed envelope schema (schema-first like every stage of the reference
  * pipeline). File listing is local-filesystem for this environment; a
  * cluster deployment swaps in a FileIndex over the object store — the
  * partition/reader contract is unchanged.
  */
class AvroChangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroChangeFiles.sparkSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("path option required"))
    new AvroChangeTable(path)
  }
}

private class AvroChangeTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"avro_changes($path)"
  override def schema(): StructType = AvroChangeFiles.sparkSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = AvroChangeFiles.sparkSchema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val dir = new java.io.File(path)
        val files =
          if (dir.isDirectory) {
            // listFiles() returns null on a concurrently-removed or
            // unreadable directory — surface a named error, not an NPE
            val listed = dir.listFiles()
            if (listed == null)
              throw new IllegalArgumentException(
                s"cannot list Avro change directory: $path")
            listed.filter(_.getName.endsWith(".avro"))
          } else if (dir.isFile) Array(dir)
          else throw new IllegalArgumentException(
            s"Avro change path does not exist: $path")
        files.sortBy(_.getName).map(f => AvroFilePartition(f.getAbsolutePath): InputPartition)
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new AvroChangeReaderFactory(AvroChangeFiles.avroSchemaJson)
    }
}

private case class AvroFilePartition(file: String) extends InputPartition

private class AvroChangeReaderFactory(schemaJson: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[AvroFilePartition].file
    new PartitionReader[InternalRow] {
      private val schema = new Schema.Parser().parse(schemaJson)
      private val reader = new DataFileReader[GenericRecord](
        new java.io.File(file), new GenericDatumReader[GenericRecord](schema))
      override def next(): Boolean = reader.hasNext
      override def get(): InternalRow = {
        val r = reader.next()
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(r.get("op").toString),
          UTF8String.fromString(r.get("tbl").toString),
          r.get("pos").asInstanceOf[Long],
          r.get("ts_ns").asInstanceOf[Long],
          r.get("user_id").asInstanceOf[Long],
          r.get("value").asInstanceOf[Double],
          UTF8String.fromString(r.get("event_type").toString)))
      }
      override def close(): Unit = reader.close()
    }
  }
}
