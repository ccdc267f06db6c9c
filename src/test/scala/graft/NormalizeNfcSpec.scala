package graft

import org.apache.spark.sql.functions._
import graft.functions.NormalizeNfc

/** The graft_nfc expression (functions/NormalizeNfc): canonical
  * composition matches the JDK reference on every path (interpreted,
  * whole-stage codegen), ASCII takes the no-copy fast path unchanged,
  * nulls pass through. The cross-engine contract is gated by e77's
  * DuckDB oracle; this pins the expression in isolation. */
class NormalizeNfcSpec extends SparkSpecBase {

  test("composes combining sequences and compatibility codepoints; ASCII unchanged; null passes") {
    import spark.implicits._
    val in = Seq(
      ("combining", "café"),
      ("angstrom", "Å"),
      ("ascii", "plain text"),
      ("composed", "caf\u00e9"))
      .toDF("k", "s")
      .unionByName(Seq(("null", null: String)).toDF("k", "s"))
    val out = in.select(col("k"), NormalizeNfc(col("s")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("combining") === "caf\u00e9", "e+U+0301 must compose to \u00e9")
    assert(out("angstrom") === "\u00c5", "U+212B must normalize to U+00C5")
    assert(out("ascii") === "plain text")
    assert(out("composed") === "caf\u00e9", "already-NFC input is identity")
    assert(out("null") === null)

    // interpreted ≡ codegen: evaluate the same rows with codegen disabled
    val expected = in.select(col("k"), NormalizeNfc(col("s")).as("n")).collect().toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = in.select(col("k"), NormalizeNfc(col("s")).as("n")).collect().toSeq
      assert(interp.map(_.toString).sorted === expected.map(_.toString).sorted)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
