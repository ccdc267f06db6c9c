package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained IVF (inverted-file) ANN index — the streaming
  * form of the e09c materialized index: embedding vectors arrive in
  * micro-batches, each batch is assigned to its nearest centroid map-side
  * and appended under that centroid's partition; probes keep reading
  * exactly one cluster directory. The centroids are pinned at index
  * creation (they define the stored layout, like the replica's bucket
  * count): re-clustering is a full rebuild by design, not an incremental
  * op — the standard IVF operating model.
  *
  * Layout (under `root`):
  * {{{
  *   centroids/part-….parquet                      // (cid, cemb), written once
  *   index/batch_id=<n>/cid=<k>/part-….parquet     // (vec_id, embedding)
  * }}}
  *
  * Scale design:
  *  - assignment is a crossJoin against BROADCAST centroids (k×dim) + a
  *    per-vector argmax — no shuffle of the vectors;
  *  - the index append is batch_id-partitioned with overwrite, so a
  *    foreachBatch retry replaces its own output (exactly-once, the
  *    staging-sink pattern);
  *  - a probe ranks centroids against the broadcast set and scans ONE
  *    cid partition across all batch dirs — partition pruning bounds the
  *    read to 1/k of the corpus no matter how many batches have landed.
  */
final class IvfIndex(root: String) {

  private val io = new StoreIO(root, StoreIO.sessionConf())

  private def centroidsDir = s"$root/centroids"
  private def indexDir = s"$root/index"

  private val indexReadSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("cid", LongType), StructField("batch_id", LongType)))

  /** Pin the centroid set (once, at creation). `cents`: (cid, cemb). */
  def create(cents: DataFrame): Unit = {
    require(!io.exists(io.path("centroids")),
      s"IVF index at $root already has centroids — re-clustering is a rebuild")
    cents.coalesce(1).write.parquet(centroidsDir)
  }

  def centroids(spark: SparkSession): DataFrame = spark.read.parquet(centroidsDir)

  /** The stored index (cid/batch_id from the partition dirs). */
  def index(spark: SparkSession): DataFrame =
    if (!io.exists(io.path("index")))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        indexReadSchema)
    else spark.read.schema(indexReadSchema)
      .option("basePath", indexDir).parquet(indexDir)

  /** Assign `vecs` (vec_id, embedding) to their nearest pinned centroid and
    * append them under the centroid's partition. Idempotent under
    * foreachBatch retries (overwrite of this batch_id's dir). */
  def addBatch(vecs: DataFrame, batchId: Long): Unit = {
    val spark = vecs.sparkSession
    graft.functions.VectorExpressions.register(spark)
    val cents = centroids(spark)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid").asc)
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cid"),
        call_function("graft_cosine", col("embedding"), col("cemb")).as("csim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$indexDir/batch_id=$batchId")
  }

  /** Top-k neighbors of `probeVec` from its nearest centroid's partition
    * only (nprobe=1; the multi-probe lever is a cid IN (…) over the same
    * pruned layout). */
  def search(spark: SparkSession, probeVec: Array[Float], k: Int): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val pcol = typedLit(probeVec.toSeq)
    val bestCid = centroids(spark)
      .select(col("cid"),
        call_function("graft_cosine", col("cemb").cast(ArrayType(FloatType)), pcol).as("csim"))
      .orderBy(col("csim").desc, col("cid").asc)
      .limit(1).collect()(0).getLong(0) // k rows, control-plane
    index(spark)
      .filter(col("cid") === bestCid) // partition-pruned scan
      .select(col("vec_id"), col("cid"),
        call_function("graft_cosine", col("embedding"), pcol).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  def destroy(): Unit = io.delete(io.root)
}
