package graft

import org.apache.spark.sql.functions._
import graft.sources.AvroChangeFiles
import graft.streaming.CdcStream

/** A3 — the distributed Avro container-file reader: multiple bucket objects
  * decode in parallel tasks and union to the full changelog; and B3 with a
  * composite primary key. */
class AvroSourceSpec extends SparkSpecBase {

  test("multiple Avro objects read distributed and union to the changelog") {
    val dir = tmpDir("avro_multi")
    val ch = Cdc.changelog(spark, sfDir)
    // three separate "bucket objects"
    (0 until 3).foreach { i =>
      AvroChangeFiles.write(ch.filter(col("pos") % 3 === i), s"$dir/obj$i")
      val f = new java.io.File(s"$dir/obj$i/part-00000.avro")
      assert(f.isFile && f.length() > 0)
      f.renameTo(new java.io.File(s"$dir/part-$i.avro"))
    }
    val back = AvroChangeFiles.read(spark, dir)
    // small objects COMBINE into tasks (CombineFileInputFormat under
    // binaryFiles) — the right behavior for a bucket full of small change
    // files; a file never spans tasks
    assert(back.rdd.getNumPartitions >= 1)
    assert(back.count() === ch.count())
    val a = back.select("pos").collect().map(_.getLong(0)).sorted
    val b = ch.select("pos").collect().map(_.getLong(0)).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("merge with a composite primary key (tbl, user_id)") {
    import org.apache.spark.sql.Row
    val rows = java.util.Arrays.asList(
      Row("INSERT", "pets", 1L, 1L, 7L, 1.0, "e"),
      Row("INSERT", "users", 2L, 2L, 7L, 2.0, "e"), // same id, other table
      Row("UPDATE", "pets", 3L, 3L, 7L, 3.0, "e"),
      Row("DELETE", "users", 4L, 4L, 7L, 0.0, "e"))
    val ch = spark.createDataFrame(rows, CdcStream.envelopeSchema)
    val m = Cdc.merge(ch, Seq("tbl", "user_id"))
      .collect().map(r => (r.getString(1), r.getLong(4)) -> r.getDouble(5)).toMap
    // pets/7 survives with the update; users/7 is tombstoned
    assert(m === Map(("pets", 7L) -> 3.0))
  }
}
