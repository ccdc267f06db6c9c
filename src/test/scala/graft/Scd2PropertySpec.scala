package graft

import org.apache.spark.sql.functions._

/** Algebraic properties of the SCD2 historization (Cdc.scd2) — the
  * invariants that make a history table trustworthy, asserted over the full
  * fixture changelog:
  *  - every change becomes exactly one interval (row-count preservation);
  *  - per key, intervals TILE the position axis: sorted by start, each
  *    interval's end equals the next interval's start, no overlaps, no gaps;
  *  - exactly one open interval per key, and it is the key's max position;
  *  - the current rows (is_current) are precisely the SCD1 latest-wins
  *    merge — SCD2 is a strict generalization of the replica. */
class Scd2PropertySpec extends SparkSpecBase {

  test("intervals preserve rows and tile each key's position axis") {
    val ch = Cdc.changelog(spark, sfDir)
    val hist = Cdc.scd2(ch, Seq("user_id"))
    assert(hist.count() === ch.count(), "every change must become one interval")

    val rows = hist.select("user_id", "valid_from_pos", "valid_to_pos")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    rows.groupBy(_._1).foreach { case (uid, ivs) =>
      val sorted = ivs.sortBy(_._2)
      // chain: each closed interval ends exactly where the next starts
      sorted.sliding(2).foreach {
        case Array((_, _, to), (_, from2, _)) =>
          assert(to.contains(from2),
            s"key $uid: interval ending at $to does not meet next start $from2")
        case _ => ()
      }
      // exactly one open interval, and it is the last
      assert(sorted.init.forall(_._3.isDefined), s"key $uid: open interval not last")
      assert(sorted.last._3.isEmpty, s"key $uid: no open interval")
    }
  }

  test("current rows are exactly the SCD1 latest-wins merge") {
    val ch = Cdc.changelog(spark, sfDir)
    val current = Cdc.scd2(ch, Seq("user_id"))
      .filter(col("is_current"))
      .select(col("user_id"), col("valid_from_pos").as("pos"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val merged = Cdc.merge(ch, Seq("user_id"))
      .select(col("user_id"), col("pos"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(current === merged)
  }
}
