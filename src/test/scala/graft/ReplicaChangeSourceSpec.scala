package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import graft.streaming.{BucketedReplica, JdbcSink}

/** Streaming the replica's change feed (sources/ReplicaChangeSource):
  * versions are offsets, the first batch is the stored snapshot, each
  * later batch is exactly the stored rows that changed — so replaying the
  * stream into a twin replica (or the JDBC serving sink) reconstructs the
  * table. Pins the bootstrap, incremental diffs, tombstone flow,
  * startingVersion, the changes-compose-downstream contract end to end,
  * and the loud retention failure. */
class ReplicaChangeSourceSpec extends SparkSpecBase {

  private def env(rows: Seq[(String, Long, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("op", "pos", "user_id", "value")
      .select(col("op"), lit("users").as("tbl"), col("pos"),
        (col("pos") * 1000).as("ts_ns"), col("user_id"), col("value"),
        lit("e").as("event_type"))
  }

  private def stored(rep: BucketedReplica): Set[String] =
    rep.read(spark).collect().map(_.toString).toSet

  test("stream → twin replica reconstructs the table across commits and deletes") {
    val root = tmpDir("rcs_src") + "/rep"
    val rep = new BucketedReplica(root, nBuckets = 4)
    val twin = new BucketedReplica(tmpDir("rcs_twin") + "/rep", nBuckets = 4)
    rep.commit(env(Seq(("INSERT", 1L, 1L, 10.0), ("INSERT", 2L, 2L, 20.0))))

    val q = spark.readStream
      .format("graft.sources.ReplicaChangeSource")
      .option("path", root)
      .load()
      .writeStream
      .foreachBatch((df: DataFrame, _: Long) => { twin.commit(df); () })
      .start()
    try {
      q.processAllAvailable() // bootstrap snapshot
      assert(stored(twin) === stored(rep), "snapshot batch diverged")

      rep.commit(env(Seq(("UPDATE", 5L, 1L, 11.0), ("INSERT", 6L, 3L, 30.0))))
      q.processAllAvailable()
      assert(stored(twin) === stored(rep), "incremental diff diverged")

      rep.commit(env(Seq(("DELETE", 9L, 2L, 0.0))))
      q.processAllAvailable()
      assert(stored(twin) === stored(rep), "tombstone flow diverged")
      assert(twin.live(spark).filter(col("user_id") === 2L).isEmpty,
        "the delete must reach the twin's live view")
    } finally q.stop()
  }

  test("the feed composes into the JDBC serving sink end to end") {
    val root = tmpDir("rcs_jdbc") + "/rep"
    val rep = new BucketedReplica(root, nBuckets = 4)
    val url = "jdbc:derby:memory:rcs_serve;create=true"
    val sink = new JdbcSink(url, "users")
    rep.commit(env(Seq(("INSERT", 1L, 1L, 10.0), ("INSERT", 2L, 2L, 20.0))))
    val q = spark.readStream
      .format("graft.sources.ReplicaChangeSource")
      .option("path", root)
      .load()
      .writeStream
      .foreachBatch((df: DataFrame, id: Long) => { sink.applyBatch(df, id); () })
      .start()
    try {
      q.processAllAvailable()
      rep.commit(env(Seq(("UPDATE", 5L, 2L, 21.0), ("DELETE", 6L, 1L, 0.0))))
      q.processAllAvailable()
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery(
          sink.liveSql + " ORDER BY user_id")
        val got = Iterator.continually(rs)
          .takeWhile(_.next()).map(r => (r.getLong("user_id"),
            r.getDouble("value"))).toSet
        assert(got === Set((2L, 21.0)),
          s"serving table must mirror the replica's live view, got $got")
      } finally c.close()
    } finally q.stop()
  }

  test("startingVersion streams changes-only; a rolled-past checkpoint fails loudly") {
    val root = tmpDir("rcs_start") + "/rep"
    val rep = new BucketedReplica(root, nBuckets = 4)
    rep.commit(env(Seq(("INSERT", 1L, 1L, 10.0)))) // v1
    rep.commit(env(Seq(("INSERT", 2L, 2L, 20.0)))) // v2
    // changes-only from v1 → only user 2 (no snapshot of user 1)
    val q = spark.readStream
      .format("graft.sources.ReplicaChangeSource")
      .option("path", root).option("startingVersion", "1")
      .load()
      .writeStream.format("memory").queryName("rcs_start_mem")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("rcs_start_mem").collect()
      .map(_.getAs[Long]("user_id")).toSet
    assert(rows === Set(2L), s"startingVersion must skip the snapshot, got $rows")

    // roll retention past v1 (two more commits keep only v3+v4): a stream
    // restarted from the rolled-past checkpoint must fail loudly
    rep.commit(env(Seq(("INSERT", 3L, 3L, 30.0)))) // v3
    rep.commit(env(Seq(("INSERT", 4L, 4L, 40.0)))) // v4
    val provider = new graft.sources.ReplicaChangeSource
    val src = provider.createSource(spark.sqlContext, tmpDir("rcs_md"),
      None, "graft", Map("path" -> root))
    val e = intercept[IllegalArgumentException] {
      src.getBatch(Some(LongOffset(1)), LongOffset(4))
    }
    assert(e.getMessage.contains("not retained"),
      s"a rolled-past offset must fail with the retention message, got: ${e.getMessage}")
  }
}
