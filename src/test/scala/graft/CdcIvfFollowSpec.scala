package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{BucketedReplica, IvfIndex}

/** The ANN twin of CdcLshFollowSpec: an embeddings table is the source of
  * truth in a BucketedReplica, and the IVF index rides its change feed —
  * each committed version streams out as a micro-batch, each batch is
  * assigned to its nearest centroid and appended through the write-once
  * OpLog. After any number of commits the stored index equals the one-shot
  * assignment of the table's LIVE vectors to the same centroids. */
class CdcIvfFollowSpec extends SparkSpecBase {

  private val vecSchema = StructType(Seq(
    StructField("op", StringType), StructField("tbl", StringType),
    StructField("pos", LongType), StructField("ts_ns", LongType),
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def commitVecs(rep: BucketedReplica, lo: Long, hi: Long,
                         pos0: Long): Unit =
    rep.commit(Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(lit("INSERT").as("op"), lit("embeddings").as("tbl"),
        (col("vec_id") + pos0).as("pos"), (col("vec_id") + pos0).as("ts_ns"),
        col("vec_id"), col("embedding")))

  test("the IVF index rides the embeddings replica's change feed; the " +
    "stored assignment equals the one-shot over live vectors") {
    graft.functions.VectorExpressions.register(spark)
    val root = tmpDir("cdc_ivf") + "/vecs"
    val rep = new BucketedReplica(root, pk = "vec_id", nBuckets = 4,
      schema = vecSchema)
    commitVecs(rep, 0, 40, 1000)

    val cents = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val idx = new IvfIndex(tmpDir("cdc_ivf_idx") + "/idx")
    idx.create(cents)

    val q = spark.readStream
      .format("graft.sources.ReplicaChangeSource")
      .option("path", root)
      .load()
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        idx.addBatch(df.filter(col("op") =!= "DELETE")
          .select(col("vec_id"), col("embedding")), id)
        ()
      }
      .start()
    try {
      q.processAllAvailable() // bootstrap snapshot
      commitVecs(rep, 40, 80, 100000)
      q.processAllAvailable()
      commitVecs(rep, 80, 120, 200000)
      q.processAllAvailable()

      val live = rep.live(spark).select(col("vec_id"), col("embedding"))
      val want = Similarity.ivfAssign(live, cents)
        .select("vec_id", "cid").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet
      val got = idx.index(spark).select("vec_id", "cid").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(got === want,
        "feed-driven IVF index diverged from the one-shot assignment")
      assert(want.size === 120, s"expected 120 assigned vectors, ${want.size}")
    } finally { q.stop(); () }
  }
}
