package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StoreIO

/** The crash-safety contract of [[StoreIO.overwriteSafe]] /
  * [[StoreIO.readSafe]] / [[StoreIO.existsSafe]] — specifically the torn
  * side-file class the r8 advisor flagged: a crash mid-write of `.next`
  * when NO primary exists yet (first-ever overwriteSafe, e.g. a replica's
  * initial `_META`) must read as ABSENT, not as valid truncated content.
  * The completeness witness is the `\n` terminator every overwriteSafe
  * payload ends with (enforced by a require on the write side).
  */
class StoreIOSpec extends AnyFunSuite {

  private def fresh(): (StoreIO, Path) = {
    val dir = java.nio.file.Files.createTempDirectory("storeio").toString
    val io = new StoreIO("file:" + dir, new Configuration())
    (io, io.path("_META"))
  }

  test("overwriteSafe rejects content missing the terminator") {
    val (io, p) = fresh()
    intercept[IllegalArgumentException] { io.overwriteSafe(p, "k=v") }
    assert(!io.existsSafe(p))
  }

  test("roundtrip: write, flip, read — primary carries the content") {
    val (io, p) = fresh()
    io.overwriteSafe(p, "k=1\n")
    assert(io.existsSafe(p) && io.readSafe(p) == "k=1\n")
    io.overwriteSafe(p, "k=2\n")
    assert(io.readSafe(p) == "k=2\n")
    // the flip consumed the side file — no stale .next shadowing the primary
    assert(!io.exists(new Path(p.getParent, p.getName + ".next")))
  }

  test("torn first-ever .next (no primary) reads as ABSENT") {
    val (io, p) = fresh()
    // simulate a crash mid-writeString of the side file: truncated payload,
    // no terminator, and no primary was ever written
    io.writeString(new Path(p.getParent, p.getName + ".next"), "k=")
    assert(!io.existsSafe(p), "torn side file with no primary must be absent")
    intercept[java.io.IOException] { io.readSafe(p) }
  }

  test("torn .next alongside a healthy primary is ignored") {
    val (io, p) = fresh()
    io.overwriteSafe(p, "k=1\n")
    io.writeString(new Path(p.getParent, p.getName + ".next"), "k=2 TRUNC")
    assert(io.existsSafe(p))
    assert(io.readSafe(p) == "k=1\n", "primary wins over a torn side file")
  }

  test("complete .next with primary missing (crash inside the flip gap) is served") {
    val (io, p) = fresh()
    // the local rename-overwrite is delete-then-rename: a crash between the
    // delete and the rename leaves only the COMPLETE side copy
    io.writeString(new Path(p.getParent, p.getName + ".next"), "k=3\n")
    assert(io.existsSafe(p))
    assert(io.readSafe(p) == "k=3\n")
  }
}
