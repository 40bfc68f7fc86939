package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Multi-pattern blocklist filtering — the C4-style badword/boilerplate
  * gate (Raffel et al. 2020 filter corpora against a phrase list): per
  * document, the number of SUBSTRING occurrences of any listed pattern
  * (overlapping occurrences count, phrases may span word boundaries),
  * and a keep flag under a match budget.
  *
  * The kernel is a compiled Aho–Corasick automaton (Aho & Corasick 1975,
  * public): ONE pass over the text counts all patterns simultaneously —
  * O(text + matches) regardless of pattern-list size, where the naive
  * per-pattern scan is O(text × patterns). Blocklists run to thousands
  * of entries; at 100 TB the difference is the whole job. The automaton
  * compiles driver-side from the config-sized pattern list and rides the
  * expression tree as a literal (the [[Bpe]] merge-table posture); the
  * scan is a pure per-row native expression — no shuffle, no state.
  */
object Blocklist {

  /** Compiled automaton: per-state child map, failure link, and the
    * aggregated count of patterns ending at the state or any of its
    * suffix states.
    */
  final class Ac private[Blocklist] (
      val next: Array[Map[Char, Int]], val fail: Array[Int],
      val cnt: Array[Int]) extends Serializable

  def compile(patterns: Seq[String]): Ac = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "blocklist patterns must be non-empty strings")
    val next = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val ends = mutable.ArrayBuffer(0)
    patterns.foreach { p =>
      var s = 0
      p.foreach { ch =>
        s = next(s).getOrElseUpdate(ch, {
          next += mutable.Map.empty; ends += 0; next.length - 1
        })
      }
      ends(s) += 1
    }
    val fail = new Array[Int](next.length)
    val cnt = ends.toArray
    val q = mutable.Queue.empty[Int]
    next(0).values.foreach { v => fail(v) = 0; q.enqueue(v) }
    // BFS: fail(v) is strictly shallower than v, so it is dequeued (and
    // its cnt aggregated) before v — cnt(v) += cnt(fail(v)) is complete
    while (q.nonEmpty) {
      val u = q.dequeue()
      cnt(u) += cnt(fail(u))
      next(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(ch)) f = fail(f)
        fail(v) = next(f).get(ch).filter(_ != v).getOrElse(0)
        q.enqueue(v)
      }
    }
    new Ac(next.map(_.toMap).toArray, fail, cnt)
  }

  /** Total pattern occurrences in `text` (all patterns, all positions,
    * overlapping included) — one left-to-right pass.
    */
  def countMatches(text: String, ac: Ac): Long = {
    var s = 0
    var total = 0L
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (s != 0 && !ac.next(s).contains(ch)) s = ac.fail(s)
      s = ac.next(s).getOrElse(ch, 0)
      total += ac.cnt(s)
      i += 1
    }
    total
  }

  /** Reference scan for specs: per-pattern start-position matching —
    * the same overlapping-substring semantics, O(text × patterns).
    */
  private[graft] def countNaive(text: String, patterns: Seq[String]): Long = {
    var total = 0L
    patterns.foreach { p =>
      var i = text.indexOf(p)
      while (i >= 0) { total += 1; i = text.indexOf(p, i + 1) }
    }
    total
  }

  /** Per-doc blocklist verdicts: `(idCol, n_matches, kept)` where `kept`
    * is the ≤-`maxMatches` budget test (0 = zero-tolerance, the C4 rule).
    */
  def filter(docs: DataFrame, patterns: Seq[String],
             textCol: String = "text", idCol: String = "doc_id",
             maxMatches: Long = 0L): DataFrame =
    docs.select(col(idCol),
        graft.functions.native.multiPatternCount(col(textCol), patterns)
          .as("n_matches"))
      .withColumn("kept", col("n_matches") <= maxMatches)
}
