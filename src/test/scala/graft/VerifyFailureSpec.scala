package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** r5 lesson: a query that throws inside Verify vanished from the
  * correctness record — the driver read absence, not error, and 62 broken
  * queries carried no err string anywhere. This pins the hardened contract:
  * a failing query leaves a `<name>._FAILED` marker plus an entry in
  * verify_failures.json; succeeding queries still dump parquet. */
class VerifyFailureSpec extends SparkSpecBase {

  test("a throwing query leaves a _FAILED marker, not silence") {
    val out = tmpDir("verify-failed-")
    val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok_probe" -> ((s, d) => Tables.load(s, d, "region")),
      "boom_probe" -> ((_, _) =>
        throw new IllegalStateException("deliberate analysis failure")))
    val failed = Verify.run(spark, sfDir, out, queries)

    assert(failed.map(_._1) === Seq("boom_probe"))
    assert(Files.exists(Paths.get(s"$out/ok_probe")))           // parquet dump
    assert(!Files.exists(Paths.get(s"$out/boom_probe")))        // no dump...
    val marker = Paths.get(s"$out/boom_probe._FAILED")          // ...but a marker
    assert(Files.exists(marker))
    assert(Files.readString(marker).contains("deliberate analysis failure"))
    val agg = Files.readString(Paths.get(s"$out/verify_failures.json"))
    assert(agg.contains("boom_probe") && agg.contains("IllegalStateException"))
  }

  test("an all-green run writes an empty failures record") {
    val out = tmpDir("verify-green-")
    val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok_probe" -> ((s, d) => Tables.load(s, d, "nation")))
    assert(Verify.run(spark, sfDir, out, queries).isEmpty)
    assert(Files.readString(Paths.get(s"$out/verify_failures.json")) === "{}")
  }
}
