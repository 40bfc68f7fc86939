package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" —
  * the SentencePiece unigram model, public): pieces carry independent
  * probabilities and a word's tokenization is the Viterbi-best
  * segmentation under them. The library's second real tokenizer next to
  * [[Bpe]] — the two bracket the standard subword designs (greedy merge
  * ranks vs global likelihood), and `tokenizer_fertility`-style readouts
  * compare them on the same corpus.
  *
  * Semantics pinned for cross-engine replay (the `unigram_encode` oracle
  * restates them in SQL, Viterbi as a recursive CTE):
  *
  *  - words are whitespace tokens; empty words contribute nothing;
  *    pieces never cross a word boundary;
  *  - the SEED vocabulary is frequency-built: every substring of length
  *    ≤ `maxLen` of every word, weighted by word frequency × occurrence
  *    positions; the top `topK` by (count DESC, piece ASC) are kept,
  *    plus ALL single-character substrings (so every corpus word stays
  *    segmentable);
  *  - piece cost = round(1e6 · ln(total / count)) — integer micro-nats
  *    against the selected-vocabulary total, so scoring is exact integer
  *    arithmetic in any engine;
  *  - Viterbi minimizes the combined objective
  *    `totalCost * SCALE + nPieces` (fewest-pieces tiebreak folded into
  *    ONE integer, so the optimum VALUE is unique — no cross-engine tie
  *    ambiguity in the gated (cost, n_pieces) outputs). Among equal
  *    combined objectives the SHORTEST last piece wins (deterministic
  *    backpointer for [[segment]]);
  *  - an out-of-vocabulary single character (never the case on the
  *    training corpus itself) costs `unkCost` = round(1e6 · ln(2·total))
  *    — the count-½ smoothing of an unseen event.
  *
  * Scale shape: the seed is one word-frequency aggregate (map-side
  * combined, vocabulary-sized output — the [[Bpe.train]] posture)
  * followed by a substring explode of the WORD relation (≤ `maxLen` ×
  * word-length rows per DISTINCT word, never per corpus token) and one
  * keyed count. Training's E-step segments the distinct-word relation
  * under the broadcast model (a per-row native expression) and re-counts
  * pieces with one keyed aggregate per epoch — document text is read
  * once for the word counts and never again. Encoding is a pure per-row
  * expression: no shuffle, no state.
  */
object Unigram {

  /** Piece-count scale of the combined Viterbi objective: supports words
    * up to SCALE-1 pieces without the cost and piece fields aliasing.
    */
  val Scale = 1048576L // 1 << 20

  final case class Vocab(costs: Map[String, Long], total: Long, maxLen: Int) {
    /** Cost of an out-of-vocabulary single character (count-½ event). */
    val unkCost: Long =
      math.floor(1e6 * math.log(2.0 * total.toDouble) + 0.5).toLong
  }

  /** micro-nat cost of a selected piece with count `cnt` out of `total`. */
  def costOf(cnt: Long, total: Long): Long =
    math.floor(1e6 * math.log(total.toDouble / cnt.toDouble) + 0.5).toLong

  /** Distinct-word frequencies — the vocabulary-sized relation every
    * training pass runs on (document text is scanned exactly once).
    */
  private def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** Frequency-seeded vocabulary (the initialization step of unigram-LM
    * training, and a complete tokenizer by itself — what the oracle-gated
    * `unigram_encode` query uses so both engines can rebuild it from the
    * corpus with plain aggregates).
    */
  def seed(df: DataFrame, textCol: String = "text", maxLen: Int = 6,
           topK: Int = 200): Vocab = {
    val subs = wordFreq(df, textCol)
      .select(col("w"), col("f"),
        explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(col("w"), col("f"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxLen), length(col("w")) - col("i") + lit(1)))).as("l"))
      .select(expr("substring(w, i, l)").as("piece"), col("f"))
      .groupBy("piece").agg(sum("f").as("cnt"))
      .localCheckpoint(false) // feeds the top-K sort AND the char filter
    val top = subs.orderBy(col("cnt").desc, col("piece")).limit(topK)
    val chars = subs.where(length(col("piece")) === 1)
    val sel = top.unionByName(chars).dropDuplicates("piece")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    fromCounts(sel, maxLen)
  }

  private def fromCounts(sel: Seq[(String, Long)], maxLen: Int): Vocab = {
    val total = sel.map(_._2).sum
    Vocab(sel.map { case (p, c) => p -> costOf(c, total) }.toMap, total, maxLen)
  }

  /** Combined Viterbi objective of ONE word: `cost·Scale + nPieces`,
    * minimized. 0 for the empty word.
    */
  def wordObj(word: String, v: Vocab): Long = {
    val n = word.length
    if (n == 0) return 0L
    val INF = Long.MaxValue / 4
    val dp = new Array[Long](n + 1)
    var j = 1
    while (j <= n) {
      var best = INF
      val lmax = math.min(v.maxLen, j)
      var l = 1
      while (l <= lmax) {
        val piece = word.substring(j - l, j)
        val c = v.costs.getOrElse(piece, if (l == 1) v.unkCost else -1L)
        if (c >= 0L && dp(j - l) < INF) {
          val cand = dp(j - l) + c * Scale + 1L
          if (cand < best) best = cand
        }
        l += 1
      }
      dp(j) = best
      j += 1
    }
    dp(n)
  }

  /** Viterbi-best piece sequence of one word (backpointer variant of
    * [[wordObj]]; shortest-last-piece on combined-objective ties).
    */
  def segment(word: String, v: Vocab): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val INF = Long.MaxValue / 4
    val dp = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var best = INF
      var bl = 0
      val lmax = math.min(v.maxLen, j)
      var l = 1
      while (l <= lmax) {
        val piece = word.substring(j - l, j)
        val c = v.costs.getOrElse(piece, if (l == 1) v.unkCost else -1L)
        if (c >= 0L && dp(j - l) < INF) {
          val cand = dp(j - l) + c * Scale + 1L
          if (cand < best) { best = cand; bl = l }
        }
        l += 1
      }
      dp(j) = best; back(j) = bl
      j += 1
    }
    val out = mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { out += word.substring(p - back(p), p); p -= back(p) }
    out.reverseIterator.toArray
  }

  /** (nPieces, costMicro) of a whitespace-tokenized text — per-word
    * combined objectives split back into their two fields and summed
    * (fields sum separately, so no overflow at document length).
    */
  def encodeStats(text: String, v: Vocab): (Long, Long) = {
    var pieces = 0L
    var cost = 0L
    text.split(" ", -1).foreach { w =>
      if (w.nonEmpty) {
        val o = wordObj(w, v)
        pieces += o % Scale
        cost += o / Scale
      }
    }
    (pieces, cost)
  }

  /** The full piece sequence of a text, word by word (what a packing
    * pipeline consumes; [[encodeStats]]' first field is its length).
    */
  def encodePieces(text: String, v: Vocab): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    text.split(" ", -1).foreach { w =>
      if (w.nonEmpty) out ++= segment(w, v)
    }
    out.toArray
  }

  /** Persist the vocab artifact — `(piece, cost)` rows plus a one-row
    * meta of (total, maxLen) — reloadable across sessions like the BPE
    * merge table and the index layouts.
    */
  def save(spark: org.apache.spark.sql.SparkSession, v: Vocab,
           path: String): Unit = {
    import spark.implicits._
    v.costs.toSeq.sortBy(_._1).toDF("piece", "cost")
      .coalesce(1).write.mode("overwrite").parquet(path + "/pieces")
    Seq((v.total, v.maxLen)).toDF("total", "max_len")
      .write.mode("overwrite").parquet(path + "/meta")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Vocab = {
    val m = spark.read.parquet(path + "/meta").collect().head
    Vocab(spark.read.parquet(path + "/pieces").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap,
      m.getLong(0), m.getInt(1))
  }

  /** Hard-EM (Viterbi-EM) training: per epoch, segment every distinct
    * word under the current model (E — a per-row native expression over
    * the word relation, weighted by frequency), re-estimate piece counts
    * with one keyed aggregate, recompute costs, and prune to `vocabSize`
    * by (count DESC, piece ASC) keeping all single characters (M). The
    * corpus itself is never rescanned after the word-frequency pass.
    *
    * Returns the trained vocab plus the per-epoch corpus cost (micro-nats,
    * measured under the model ENTERING the epoch): after the first prune
    * the sequence is non-increasing — hard-EM's re-estimation cannot make
    * its own Viterbi segmentations costlier.
    */
  def train(df: DataFrame, textCol: String = "text", vocabSize: Int = 200,
            maxLen: Int = 6, epochs: Int = 3): (Vocab, Seq[Long]) = {
    val wf = wordFreq(df, textCol).localCheckpoint(false)
    var v = seed(df, textCol, maxLen, topK = vocabSize * 4)
    val losses = mutable.ArrayBuffer.empty[Long]
    var e = 0
    while (e < epochs) {
      losses += wf.select(sum(col("f") *
          graft.functions.native.unigramStats(col("w"), v).getField("cost")))
        .collect().head.getLong(0)
      val counts = wf
        .select(explode(
          graft.functions.native.unigramPieces(col("w"), v)).as("piece"),
          col("f"))
        .groupBy("piece").agg(sum("f").as("cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      // M: single chars survive with count-1 floor (the SentencePiece
      // character-coverage guarantee); multi-char pieces live on usage
      val floored = {
        val used = counts.toMap
        val chars = v.costs.keysIterator.filter(_.length == 1)
          .map(c => c -> math.max(used.getOrElse(c, 0L), 1L)).toMap
        (used.filter(_._1.length > 1) ++ chars).toSeq
      }
      val kept = floored.filter(_._1.length == 1) ++
        floored.filter(_._1.length > 1)
          .sortBy { case (p, c) => (-c, p) }
          .take(math.max(0, vocabSize - floored.count(_._1.length == 1)))
      v = fromCounts(kept.sortBy(_._1), maxLen)
      e += 1
    }
    (v, losses.toSeq)
  }
}
