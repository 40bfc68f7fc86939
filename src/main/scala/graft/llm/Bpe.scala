package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair encoding: a REAL subword tokenizer (train + encode), replacing
  * the `n_bpe ≈ bytes/4` estimate (`TextStats.bpeEstimate`) whenever a vocab
  * artifact is available. Algorithm per Sennrich et al. 2016 ("Neural
  * Machine Translation of Rare Words with Subword Units", public): start
  * from characters, repeatedly merge the most frequent adjacent symbol
  * pair; encoding applies the learned merges in rank order.
  *
  * Semantics pinned for cross-engine replay (the `bpe_tokens` oracle
  * replays them exactly in DuckDB with a `list_reduce` fold):
  *
  *  - words are the whitespace tokens of [[TextStats.tokens]]; empty words
  *    (consecutive spaces) contribute nothing; merges never cross a word
  *    boundary (no end-of-word sentinel);
  *  - one merge rank = ONE leftmost greedy non-overlapping pass
  *    (`[a,a,a,a,a]` + (a,a) → `[aa,aa,a]`). One pass per rank is
  *    complete: merging (a,b) only creates adjacencies involving the new
  *    symbol ab, so (a,b) itself cannot reappear;
  *  - ranks apply in order. Because a rank-r pair's constituents can only
  *    be produced by ranks < r, sequential application equals the
  *    iterative lowest-rank-first algorithm;
  *  - training ties break deterministically: highest pair count, then
  *    lexicographic (a, b).
  *
  * Scale shape: the distributed part of training is the word-frequency
  * aggregate (keyed shuffle, map-side combined — vocabulary-sized output,
  * not corpus-sized). The driver loop runs on the top-`vocabCap` words by
  * frequency — a CONFIG bound, the standard practice for BPE (training
  * corpora are sampled; the artifact is tiny). Encoding is a pure per-row
  * native expression ([[graft.functions.native.bpeCount]]) — no shuffle,
  * no state, scales like any other columnar map.
  */
object Bpe {

  /** Split a word into code-point symbols (the character alphabet). */
  private[graft] def charSyms(w: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** One leftmost greedy non-overlapping merge pass of (a, b) → a+b. */
  private[graft] def mergePass(syms: Array[String], a: String,
                               b: String): Array[String] = {
    if (syms.length < 2) return syms
    val out = new mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Encode one word: character symbols, then every merge in rank order. */
  def applyMerges(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms = charSyms(word)
    val it = merges.iterator
    while (it.hasNext && syms.length > 1) {
      val (a, b) = it.next()
      syms = mergePass(syms, a, b)
    }
    syms
  }

  /** BPE token count of a whitespace-tokenized text (driver-side twin of
    * the native expression — specs assert parity).
    */
  def countTokens(text: String, merges: Seq[(String, String)]): Long = {
    var n = 0L
    text.split(" ", -1).foreach { w =>
      if (w.nonEmpty) n += applyMerges(w, merges).length
    }
    n
  }

  /** The full token SEQUENCE of a text — every word's merged symbols, in
    * document order (what a packing/training pipeline actually consumes;
    * `countTokens` is its length). Driver twin of the BpeTokens native
    * expression.
    */
  def encodeTokens(text: String, merges: Seq[(String, String)]): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    text.split(" ", -1).foreach { w =>
      if (w.nonEmpty) out ++= applyMerges(w, merges)
    }
    out.toArray
  }

  /** Learn `numMerges` merges from the corpus. The word-frequency pass is
    * distributed; the merge loop runs on the top-`vocabCap` (count DESC,
    * word ASC) words — deterministic regardless of partitioning.
    */
  def train(df: DataFrame, textCol: String = "text", numMerges: Int = 200,
            vocabCap: Int = 1 << 16): Seq[(String, String)] = {
    val vocabRows = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(vocabCap)
      .collect()
    var vocab: Array[(Array[String], Long)] =
      vocabRows.map(r => (charSyms(r.getString(0)), r.getLong(1)))
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val (a, b) = pairCounts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += ((a, b))
        vocab = vocab.map { case (syms, n) => (mergePass(syms, a, b), n) }
      }
    }
    merges.toSeq
  }

  /** Persist the merge table as `(rank, a, b)` parquet — the vocab
    * artifact, reloadable across sessions like the IVF index.
    */
  def save(spark: SparkSession, merges: Seq[(String, String)],
           path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), i) => (i + 1, a, b) }
      .toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq

  /** A FIXED literal merge table (common English digraph chains) for the
    * oracle-checked gate query: config-as-data like PSI's bin edges, so the
    * DuckDB oracle can replay the identical merges without rerunning
    * training.
    */
  val CoreEnglishMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("t", "i"), ("e", "s"), ("s", "t"), ("an", "d"), ("in", "g"),
    ("o", "u"), ("a", "r"), ("te", "d"), ("a", "l"), ("e", "d"))
}
