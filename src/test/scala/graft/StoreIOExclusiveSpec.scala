package graft

import graft.streaming.StoreIO
import org.apache.hadoop.fs.Path

/** The write-once pointer's EXCLUSIVITY — the serialization point every
  * store protocol (replica commit, view fold, OpLog, vacuum lease) rests
  * on. The r15 stress divergence (view over/under-count under racing
  * maintainers) root-caused here, not in any protocol: the old local
  * visibility flip was Hadoop's no-OVERWRITE rename, whose exclusivity is
  * a USERSPACE exists-check before a POSIX `rename(2)` that silently
  * replaces its destination. Two same-version committers descheduled
  * inside that check-to-syscall window both returned success (measured:
  * 10 dual-wins in 2000 barrier-aligned rounds of 8 racers) — the
  * clobbered "winner" then proceeded as committed, folding a view delta
  * for a replica commit that never survived (over-count) or losing its
  * own view fold to the clobber (under-count). The flip is now `link(2)`
  * on the local FS: EEXIST is decided IN the kernel, so the interleave is
  * unschedulable. */
class StoreIOExclusiveSpec extends SparkSpecBase {

  private def newIo(root: String) = new StoreIO(root, StoreIO.sessionConf())

  test("the r15 interleave, pinned: a descheduled loser's flip executed " +
    "AFTER a same-name winner landed must fail, not clobber") {
    val root = tmpDir("excl_pin")
    val io = newIo(root)
    // the exact schedule of the dual-win: T2 (winner) completes its whole
    // createExclusive while T1 sits between its exists-check and its flip
    // syscall. With the rename flip, T1's rename(2) then silently REPLACED
    // T2's pointer and returned success. Executed sequentially — this IS
    // that schedule's tail — the link flip refuses with the race's
    // failure class instead.
    io.createExclusive(io.path("_PTR-7"), "winner\n")
    val e = intercept[java.io.IOException] {
      io.createExclusive(io.path("_PTR-7"), "loser\n")
    }
    assert(e.isInstanceOf[java.nio.file.FileAlreadyExistsException] ||
      e.getMessage.contains("exist"), s"unexpected failure class: $e")
    assert(io.readString(io.path("_PTR-7")) === "winner\n",
      "the loser's flip must leave the winner's content untouched")
    // and the raw POSIX semantics the old flip relied on, documented: a
    // rename onto an existing destination is NOT a failure at the syscall
    // level — exclusivity cannot come from rename on a local FS
    val tmp = new java.io.File(root, ".probe.tmp")
    java.nio.file.Files.write(tmp.toPath, "clobber\n".getBytes)
    assert(tmp.renameTo(new java.io.File(root, "_PTR-7")),
      "POSIX rename silently replaces an existing destination — the very " +
        "hole the link flip closes")
  }

  test("barrier-aligned hammer: N racers per round, exactly one winner, " +
    "winner's content complete") {
    val root = tmpDir("excl_hammer")
    val io = newIo(root)
    val threads = 8
    val rounds = 400
    var dualWins = 0
    (0 until rounds).foreach { r =>
      val dst = io.path(s"_PTR-$r")
      val barrier = new java.util.concurrent.CyclicBarrier(threads)
      val wins = new java.util.concurrent.atomic.AtomicInteger()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ts = (0 until threads).map { id =>
        new Thread(() => {
          try {
            barrier.await()
            io.createExclusive(dst, s"winner=$id\n")
            wins.incrementAndGet(); ()
          } catch {
            case _: java.io.IOException => () // lost the race, loudly
            case t: Throwable => errs.add(t); ()
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join(30000))
      assert(errs.isEmpty, s"round $r racer died: ${errs.peek()}")
      if (wins.get() > 1) dualWins += 1
      assert(wins.get() >= 1, s"round $r: nobody won the pointer")
      // the winner's full content is visible — never a prefix, never a mix
      val content = io.readString(dst)
      assert(content.matches("winner=\\d\\n"), s"round $r torn/mixed: $content")
    }
    assert(dualWins === 0,
      s"$dualWins/$rounds rounds had MULTIPLE createExclusive winners — " +
        "the write-once primitive is not exclusive (the r15 over-count class)")
  }
}
