package graft

import scala.util.Random
import org.apache.spark.sql.functions._

/** Randomized differential for the iterated-BPE trainer (e107): the
  * distributed form (vocab groupBy → argmax broadcast → 6×-folded
  * literal replace, three rounds) must equal an independent SEQUENTIAL
  * in-memory reference of the same merge rule on random corpora —
  * including adversarial same-character runs ("aaaaaaa…"), where
  * iterated leftmost replace deliberately diverges from textbook greedy
  * (documented at the query). What this differential actually guards:
  * the groupBy/argmax/broadcast/codegen path producing different merges
  * or counts than the plain sequential fold ever would. */
class BpePropertySpec extends SparkSpecBase {

  /** Sequential reference: same semantics, no Spark — weighted pair
    * counts over the distinct-word vocabulary, argmax by (count desc,
    * s1 asc, s2 asc), merge = 6× leftmost non-overlapping literal
    * replace on the pipe-delimited symbol string. */
  private def refBpe(words: Seq[String], rounds: Int)
      : Seq[(Int, String, Long, Long)] = {
    var cur: Seq[(Long, String)] = words.groupBy(identity).toSeq
      .map { case (w, g) => (g.size.toLong, "|" + w.mkString("|") + "|") }
    (1 to rounds).map { step =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      cur.foreach { case (f, s) =>
        val syms = s.split("\\|").filter(_.nonEmpty)
        syms.sliding(2).foreach {
          case Array(x, y) => counts((x, y)) += f
          case _           => ()
        }
      }
      val ((s1, s2), cnt) = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
      val (pat, rep) = (s"|$s1|$s2|", s"|$s1$s2|")
      cur = cur.map { case (f, s) =>
        (f, (1 to 6).foldLeft(s)((x, _) => x.replace(pat, rep)))
      }
      val after = cur.map { case (f, s) =>
        f * s.split("\\|").count(_.nonEmpty)
      }.sum
      (step, s"$s1 $s2", cnt, after)
    }
  }

  test("random corpora (with adversarial runs): distributed 3-round BPE " +
    "equals the sequential reference merge for merge") {
    val rnd = new Random(20260814L)
    (1 to 5).foreach { trial =>
      // words over a 3-letter alphabet, lengths 1-12, heavy duplication,
      // plus guaranteed same-char runs to hit the self-pair edge case
      val vocab = (1 to 30).map(_ =>
        (1 to (1 + rnd.nextInt(12))).map(_ => "abc" (rnd.nextInt(3))).mkString)
      val runs = Seq("aaaa", "aaaaa", "aaaaaaa", "bbbbbb", "ab" * 5)
      val words = (1 to 400).map(_ => vocab(rnd.nextInt(vocab.size))) ++
        (1 to 40).map(_ => runs(rnd.nextInt(runs.size)))
      // one "document" per handful of words, written as a documents table
      val docs = words.grouped(7).zipWithIndex.map { case (g, i) =>
        (i.toLong, g.mkString(" "), "en", "src0", g.mkString(" ").length.toLong)
      }.toSeq
      val dir = tmpDir(s"bpe_prop_$trial")
      import spark.implicits._
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val got = Extensions.queries("e107_bpe_merges")(spark, dir)
        .orderBy("step").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
      val want = refBpe(words, 3)
      assert(got === want,
        s"trial $trial diverged:\n got=$got\nwant=$want\nwords=${words.take(40)}")
    }
  }
}
