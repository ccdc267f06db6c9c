package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained IVF (inverted-file) ANN index — the streaming
  * form of the e09c materialized index: embedding vectors arrive in
  * micro-batches, each batch is assigned to its nearest centroid map-side
  * and appended under that centroid's partition; probes keep reading
  * exactly one cluster directory.
  *
  * The centroid set defines the stored layout (like the replica's bucket
  * count and the LSH index's banding), but it is NOT pinned forever: the
  * stored PRIMITIVE is the raw `(vec_id, embedding)` rows — centroid
  * assignment is derived — so [[recenter]] can migrate the index to a new
  * centroid set (e.g. k-means re-fit after the corpus distribution drifts)
  * without re-reading the source corpus, under the same versioned
  * write-once commit protocol as `LshIndex.reband` and
  * `BucketedReplica.rebucket`.
  *
  * Layout (under `root`):
  * {{{
  *   centroids/part-….parquet                      // generation 0 (cid, cemb)
  *   centroids_gen=<v>/part-….parquet              // generation v, from recenter
  *   index/batch_id=<n>/cid=<k>/part-….parquet     // (vec_id, embedding)
  *   _CENTROIDS-<v>                                // write-once generation commit
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
  *    read to 1/k of the corpus no matter how many batches have landed;
  *  - [[recenter]]'s one-time cost is one re-assignment pass over the
  *    stored vectors (broadcast argmax, no shuffle) + one partitioned
  *    rewrite — paid per migration, not per batch.
  */
final class IvfIndex(root: String) {

  private val io = new StoreIO(root, StoreIO.sessionConf())

  private def indexDir = s"$root/index"

  private val indexReadSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("cid", LongType), StructField("batch_id", LongType)))

  /** Current centroid generation: (centroids dir, validity cut). After a
    * [[recenter]] the cut `Some((consol, cutoff))` marks which index
    * partitions carry the current generation's assignments:
    * `batch_id <= consol` (the migration's consolidated rewrite) or
    * `batch_id > cutoff` (stream batches appended after it). Generation 0
    * (no `_CENTROIDS` commit) admits only `batch_id >= 0`, so a crashed
    * first recenter's half-written negative consol partition is invisible
    * until its commit lands. */
  private def generation: (String, Option[(Long, Long)]) = {
    val vs = io.listFiles(io.root).map(_.getName)
      .filter(_.startsWith("_CENTROIDS-"))
      .map(_.stripPrefix("_CENTROIDS-").toLong)
    if (vs.isEmpty) ("centroids", None)
    else {
      val kv = io.readString(io.path(s"_CENTROIDS-${vs.max}"))
        .linesIterator.filter(_.contains("=")).map { l =>
          val Array(k, v) = l.split("=", 2); k -> v
        }.toMap
      (kv("dir"), Some((kv("consol").toLong, kv("cutoff").toLong)))
    }
  }

  private def validIn(cut: Option[(Long, Long)]): Column = cut match {
    case Some((consol, cutoff)) =>
      col("batch_id") <= consol || col("batch_id") > cutoff
    case None => col("batch_id") >= 0
  }

  /** Pin the initial centroid set (once, at creation). `cents`: (cid, cemb). */
  def create(cents: DataFrame): Unit = {
    require(!io.exists(io.path("centroids")),
      s"IVF index at $root already has centroids — use recenter() to migrate")
    cents.coalesce(1).write.parquet(s"$root/centroids")
  }

  /** The current generation's centroid set. */
  def centroids(spark: SparkSession): DataFrame =
    spark.read.parquet(s"$root/${generation._1}")

  /** The stored index of the CURRENT centroid generation (cid/batch_id from
    * the partition dirs). */
  def index(spark: SparkSession): DataFrame =
    if (!io.exists(io.path("index")))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        indexReadSchema)
    else spark.read.schema(indexReadSchema)
      .option("basePath", indexDir).parquet(indexDir)
      .filter(validIn(generation._2))

  /** Nearest-centroid assignment of `vecs` against `cents` — broadcast
    * argmax, no shuffle of the vectors (shared by [[addBatch]] and
    * [[recenter]]). */
  private def assignTo(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    graft.functions.VectorExpressions.register(spark)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid").asc)
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cid"),
        call_function("graft_cosine", col("embedding"), col("cemb")).as("csim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
  }

  /** Assign `vecs` (vec_id, embedding) to their nearest current-generation
    * centroid and append them under the centroid's partition. Idempotent
    * under foreachBatch retries (overwrite of this batch_id's dir). */
  def addBatch(vecs: DataFrame, batchId: Long): Unit = {
    val spark = vecs.sparkSession
    assignTo(vecs, centroids(spark))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$indexDir/batch_id=$batchId")
  }

  /** Offline migration (stream paused — same contract as
    * `LshIndex.reband`): switch the index to a NEW centroid set — e.g. a
    * k-means re-fit over the stored vectors after distribution drift —
    * WITHOUT re-reading the source corpus. The stored vectors are
    * re-assigned wholesale into one consolidated negative-batch_id
    * partition, the new centroids land in a fresh generation dir, then a
    * write-once `_CENTROIDS` commit flips the generation: its validity cut
    * makes the old assignments logically dead at that instant, so the
    * trailing deletes are pure physical GC. A crash anywhere re-runs to
    * convergence (the consolidated partition is invisible until the commit,
    * and a re-run overwrites it); correctness never depends on the deletes.
    *
    * A stream resuming AFTER the migration must keep its checkpoint (so
    * batch ids continue past `cutoff`) — the same contract every versioned
    * store here shares. */
  def recenter(spark: SparkSession, newCents: DataFrame): Unit = {
    val dirIds = io.listDirs(new org.apache.hadoop.fs.Path(indexDir))
      .map(_.getName.stripPrefix("batch_id=").toLong)
    val consol = (dirIds :+ 0L).min - 1L
    val cutoff = (dirIds :+ -1L).max
    // distinct: a vector double-stored by a crash-retry window collapses here
    val vecs = index(spark).select(col("vec_id"), col("embedding")).distinct()
    assignTo(vecs, newCents)
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$indexDir/batch_id=$consol")
    val nextV = 1L + io.listFiles(io.root).map(_.getName)
      .filter(_.startsWith("_CENTROIDS-"))
      .map(_.stripPrefix("_CENTROIDS-").toLong).foldLeft(0L)(math.max)
    val genDir = s"centroids_gen=$nextV"
    newCents.coalesce(1).write.mode("overwrite").parquet(s"$root/$genDir")
    // the generation commit: readers/writers flip to the new centroids here
    io.createExclusive(io.path(s"_CENTROIDS-$nextV"),
      s"dir=$genDir\nconsol=$consol\ncutoff=$cutoff\n")
    // physical GC of the dead generation's assignment partitions
    io.listDirs(new org.apache.hadoop.fs.Path(indexDir)).filter { p =>
      val id = p.getName.stripPrefix("batch_id=").toLong
      !(id <= consol || id > cutoff)
    }.foreach(io.delete)
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
