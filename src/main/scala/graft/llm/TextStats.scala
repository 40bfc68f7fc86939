package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators for large-scale training-data pipelines:
  * tokenization stats, language-ID heuristic, quality scoring, document
  * fingerprinting. All pure built-in columnar expressions (whole-stage
  * codegen, no UDFs) — a scan over 100 TB of text stays one shuffle-free
  * stage until the final aggregate.
  */
object TextStats {

  /** Whitespace tokens. The corpus is single-space separated; for general
    * text swap in the regex split.
    */
  def tokens(text: Column): Column = split(text, " ")

  /** `size(tokens(text))` WITHOUT materializing the array: split-on-space
    * yields exactly (space count + 1) parts — Spark's `split` keeps
    * trailing empties — so the count is pure codegen'd string arithmetic.
    * Counting was the only reason several corpus statistics paid a full
    * tokenize pass. NULL text stays NULL, exactly like `size(null)`.
    */
  def tokenCount(text: Column): Column =
    (length(text) - length(translate(text, " ", "")) + lit(1)).cast("long")

  /** Word-ish tokens per a BPE-style pre-tokenizer regex (letters runs /
    * digit runs), an upper bound proxy for subword counts.
    */
  def alphaTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+")).cast("long")

  /** Crude byte-based BPE token estimate (~4 UTF-8 bytes per token). */
  def bpeEstimate(text: Column): Column =
    ceil(octet_length(text) / lit(4.0)).cast("long")

  /** REAL BPE token count under a trained merge-table artifact
    * ([[graft.llm.Bpe]]); [[bpeEstimate]] stays as the vocab-free fallback.
    */
  def bpeCount(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.native.bpeCount(text, merges)

  /** Stopword sets for the n-gram/stopword language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "et", "de", "un"),
    "de" -> Seq("der", "die", "und", "ein", "ist"),
    "es" -> Seq("el", "la", "y", "de", "un"))

  /** Language-ID: distinct-stopword hits per language; predict the language
    * with the most hits (ties broken by language code order), `und` if no
    * hits. Deterministic, SQL-expressible.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      (lang, size(array_intersect(toks, array(words.map(lit): _*))))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, score), other) =>
      when(score > 0 && score === best, lit(lang)).otherwise(other)
    }
  }

  /** Quality score in [0,1]: length saturation + lexical diversity +
    * stopword density (the classic cheap quality gates). Rounded so the
    * result is float-order independent.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val lenScore = least(lit(1.0), length(text) / lit(500.0))
    val uniqRatio = size(array_distinct(toks)) / n.cast("double")
    val allStop = array((stopwords.values.flatten.toSeq.distinct.sorted).map(lit): _*)
    val stopRatio = size(filter(toks, t => array_contains(allStop, t))) / n.cast("double")
    graft.functions.Rounding.dround(lit(0.3) * lenScore + lit(0.4) * uniqRatio + lit(0.3) * stopRatio, 4)
  }

  /** Polynomial rolling-hash fingerprint of the first `maxLen` chars
    * (mod 1e9+7, base 31): a stable 63-bit document fingerprint computable
    * identically in any engine with integer arithmetic.
    */
  def fingerprint(textCol: String, maxLen: Int = 64): Column =
    expr(
      s"aggregate(sequence(1, least(length($textCol), $maxLen)), 0L, " +
      s"(acc, i) -> (acc * 31 + ascii(substring($textCol, i, 1))) % 1000000007)")

  /** Repetition score in [0,1]: 1 − distinct/total word n-gram windows —
    * the duplicate-n-gram signal of Gopher-style quality rules (a high score
    * means the document repeats itself). Columnar: shingle windows counted
    * without materializing them; distinct set via the native WordShingles.
    */
  def repetitionScore(text: Column, n: Int = 3, scale: Int = 4): Column = {
    val toks = tokens(text)
    val totalWindows = greatest(size(toks) - (n - 1), least(size(toks), lit(1)))
    val distinctWindows = size(graft.functions.native.wordShingles(toks, n))
    graft.functions.Rounding.dround(
      lit(1.0) - distinctWindows.cast("double") / totalWindows, scale)
  }

  /** Mean word length — short means boilerplate/symbol soup, long means
    * concatenated junk (Gopher keeps ~3–10).
    */
  def meanWordLen(text: Column, scale: Int = 4): Column = {
    val toks = tokens(text)
    graft.functions.Rounding.dround(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks), scale)
  }

  /** Non-alphanumeric, non-space character fraction. */
  def symbolRatio(text: Column, scale: Int = 4): Column =
    graft.functions.Rounding.dround(
      (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", "")))
        .cast("double") / length(text), scale)

  /** PII redaction — the scrub pass a training corpus runs before anything
    * else: emails, IPv4 addresses, and phone-like digit runs replaced with
    * typed placeholders. Patterns stay inside the regex subset Java and RE2
    * share (no backrefs/lookarounds), so the pass is reproducible in any
    * engine; order matters (IP before phone — a phone pattern would eat the
    * dotted digits). Pure codegen'd columnar expressions: a 100 TB scrub is
    * one shuffle-free map stage.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
      "\\+?\\d[\\d() -]{7,}\\d", "<PHONE>")

  /** Per-language corpus stats: doc count, char volume, token stats. */
  def langStats(docs: DataFrame, textCol: String = "text",
                langCol: String = "lang", charsCol: String = "n_chars"): DataFrame =
    docs.groupBy(col(langCol).as("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(col(charsCol)).as("sum_chars"),
      graft.functions.Rounding.dround(avg(tokenCount(col(textCol))), 4).as("avg_tokens"),
      max(tokenCount(col(textCol))).as("max_tokens"))

  /** Gopher-style within-document repetition statistics (Rae et al. 2021,
    * appendix A1.1 — the standard pre-training repetition filters):
    *
    *  - `top{2,3,4}_frac`: the character fraction of the document covered
    *    by ALL occurrences of its most frequent word n-gram — cnt ×
    *    length(gram) / length(text), the argmax taken on (count, then
    *    lexicographically largest gram) so the statistic is deterministic;
    *  - `dup5_frac`: the character fraction in duplicated 5-grams — Σ over
    *    5-grams with count ≥ 2 of cnt × length(gram) / length(text)
    *    (overlapping occurrences all count, so the value may exceed 1 —
    *    pinned, engine-portable semantics rather than Gopher's unspecified
    *    overlap handling).
    *
    * Documents with fewer than two tokens have no n-grams and emit no row.
    * Shape at scale: the statistic is doc-local, so it is computed inside
    * the projection by one [[graft.functions.GramRepetition]] pass per
    * order — ZERO shuffle; a 100 TB run is a single map stage. (The
    * relational formulation — explode all orders, two keyed aggregates —
    * shuffled ~4 gram rows per token and benchmarked 5× slower at sf0.1;
    * per-doc state here is one hash map of the doc's distinct grams.)
    */
  /** Composite Gopher-style quality FILTER — the actual drop/keep stage a
    * pre-training pipeline runs after computing the signals. Per document:
    * `rules_failed` is a bitmask (bit set = rule VIOLATED):
    *
    *  - bit 0: word count outside [minWords, maxWords]
    *  - bit 1: mean word length outside [3, 10]
    *  - bit 2: symbol ratio > 0.1
    *  - bit 3: top-2-gram char fraction > 0.20
    *  - bit 4: duplicated-5-gram char fraction > 0.15
    *
    * and `kept` = 1 iff no rule fired. All thresholds compare the ROUNDED
    * (4 dp) signals, so the decisions are bit-identical across engines.
    * Shape: everything — the columnar signals AND the repetition
    * fractions (a doc-local [[graft.functions.GramRepetition]] pass over
    * orders 2 and 5, the only ones the rules consume) — rides the scan in
    * one projection. ZERO shuffle; a 100 TB filter is a single map stage.
    */
  def gopherFilter(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", minWords: Int = 50,
                   maxWords: Int = 100000,
                   keepCols: Seq[String] = Nil): DataFrame = {
    val rep = graft.functions.native.gramRepetition(
      tokens(col(textCol)), topOrders = Seq(2), dupOrders = Seq(5))
    def frac(c: Column): Column =
      graft.functions.Rounding.dround(
        c.cast("double") / greatest(length(col(textCol)), lit(1)), 4)
    // keepCols thread pass-through columns (source, event time) into the
    // output so STREAMING consumers stay one projection — a join-back
    // would be a stream-stream shuffle
    val sig = docs.select(col(idCol) +: keepCols.map(col) ++: Seq(
      tokenCount(col(textCol)).as("n_words"),
      meanWordLen(col(textCol)).as("_mwl"),
      symbolRatio(col(textCol)).as("_sym"),
      frac(rep.getItem(0)).as("top2_frac"),
      frac(rep.getItem(1)).as("dup5_frac")): _*)
    // docs with <2 tokens have no grams: GramRepetition yields 0 chars,
    // matching the relational form's left-join coalesce(frac, 0)
    val failed =
      when(col("n_words") < minWords || col("n_words") > maxWords, 1)
        .otherwise(0) +
      when(col("_mwl") < 3.0 || col("_mwl") > 10.0, 2).otherwise(0) +
      when(col("_sym") > 0.1, 4).otherwise(0) +
      when(col("top2_frac") > 0.20, 8).otherwise(0) +
      when(col("dup5_frac") > 0.15, 16).otherwise(0)
    sig.select(col(idCol) +: keepCols.map(col) ++: Seq(col("n_words"),
        failed.cast("long").as("rules_failed")): _*)
      .withColumn("kept",
        when(col("rules_failed") === 0, 1L).otherwise(0L))
  }

  /** C4-style LINE-structural filtering (Raffel et al. 2020 §2.2 — the
    * complement of [[gopherFilter]]'s whole-document statistics): each
    * newline-separated line survives only if it (a) ends in terminal
    * punctuation, (b) has ≥ `minWords` whitespace words, (c) carries no
    * curly brace (code leak), and (d) is not "lorem ipsum" placeholder
    * text; a document is kept when ≥ `minKeptLines` lines survive, and
    * `clean_text` is the surviving lines reassembled. Pure higher-order
    * array expressions riding the scan — a 100 TB pass is one shuffle-free
    * map stage, and the rules are SQL-replayable so the whole transform
    * sits under the hash-exact oracle.
    */
  def c4Filter(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id", minWords: Int = 5,
               minKeptLines: Int = 3,
               keepCols: Seq[String] = Nil): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l =>
      l.rlike("[.!?]$") && size(split(l, " ")) >= minWords &&
        !l.contains("{") && !l.contains("}") &&
        !lower(l).contains("lorem ipsum"))
    // keepCols thread pass-through columns (source, event time) so the
    // STREAMING front door stays one stateless projection
    docs.select(col(idCol) +: keepCols.map(col) ++: Seq(
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      (size(kept) >= minKeptLines).as("kept_doc"),
      array_join(kept, "\n").as("clean_text")): _*)
  }

  /** Unicode script ranges for [[scriptMix]] — name → character-class body
    * (literal code points, so the same class means the same thing to any
    * regex engine). Alphabetical name order is the dominance tiebreak.
    */
  val scriptRanges: Seq[(String, String)] = Seq(
    "arabic" -> "\\u0600-\\u06FF",
    "cyrillic" -> "\\u0400-\\u04FF",
    "han" -> "\\u4E00-\\u9FFF",
    "latin" -> "A-Za-z")

  /** Per-document Unicode-script mix: character counts per script range
    * plus the dominant script (most characters; ties break by script name
    * order; `none` when no range matches) — the script-level complement of
    * [[langId]] for routing mixed crawls to per-script pipelines. Four
    * codegen'd regexp counts riding the scan: shuffle-free at any scale,
    * and count semantics identical in any regex engine (single-char
    * classes over literal code-point ranges).
    */
  def scriptMix(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val counts = scriptRanges.map { case (name, cls) =>
      name -> regexp_count(col(textCol), lit(s"[$cls]")).cast("long")
    }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    val main = counts.foldRight(lit("none"): Column) {
      case ((name, c), other) =>
        when(c > 0 && c === best, lit(name)).otherwise(other)
    }
    docs.select(col(idCol) +:
      counts.map { case (name, c) => c.as(s"n_$name") } :+
      main.as("main_script"): _*)
  }

  def repetitionStats(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", scale: Int = 4): DataFrame = {
    val toks = tokens(col(textCol))
    def frac(c: Column): Column =
      graft.functions.Rounding.dround(c.cast("double") / col("_tl"), scale)
    docs
      .select(col(idCol), greatest(length(col(textCol)), lit(1)).as("_tl"),
        graft.functions.native.gramRepetition(
          toks, topOrders = Seq(2, 3, 4), dupOrders = Seq(5)).as("_r"),
        size(toks).as("_nt"))
      .where(col("_nt") >= 2) // <2 tokens: no n-grams, no row (as before)
      .select(col(idCol),
        frac(col("_r").getItem(0)).as("top2_frac"),
        frac(col("_r").getItem(1)).as("top3_frac"),
        frac(col("_r").getItem(2)).as("top4_frac"),
        frac(col("_r").getItem(3)).as("dup5_frac"))
  }

  /** Per-document token Shannon entropy in bits — the lexical-diversity
    * quality signal (low entropy = repetitive/templated text, a standard
    * pre-training filter axis complementing the Gopher repetition
    * fractions): `H = log2(n) − (Σ c·log2 c)/n` over the doc's token
    * counts. The inner sum arrives as order-free integer micro-bits from
    * one [[graft.functions.TokenEntropyMicro]] pass, so the value is
    * bit-identical cross-engine; the outer arithmetic is per-row. ZERO
    * shuffle — a 100 TB scoring run is a single map stage.
    */
  def tokenEntropy(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", scale: Int = 6): DataFrame = {
    val toks = tokens(col(textCol))
    docs
      .select(col(idCol), size(toks).cast("long").as("n_tok"),
        graft.functions.native.tokenEntropyMicro(toks).as("_e"))
      .select(col(idCol), col("n_tok"),
        col("_e").getItem(1).as("n_distinct"),
        graft.functions.Rounding.dround(
          log(col("n_tok").cast("double")) / log(lit(2.0)) -
            col("_e").getItem(0).cast("double") /
              (col("n_tok") * 1000000.0), scale).as("entropy"))
  }

  /** Compression-ratio quality signal: deflate(text)/octet_length(text) —
    * the Gopher/RefinedWeb filter axis where BOTH tails are suspect (≪ 1:
    * templated/repetitive text; ≈ 1: high-entropy noise, e.g. base64
    * blobs). Empty text scores 1.0 (nothing to compress ≠ suspicious).
    * zlib is engine-specific, so the signal is ScalaTest-pinned rather
    * than oracle-gated; doc-local ⇒ shuffle-free projection at any scale.
    */
  def compressionRatio(text: Column, level: Int = 6, scale: Int = 4): Column =
    when(octet_length(text) === 0, lit(1.0))
      .otherwise(graft.functions.Rounding.dround(
        graft.functions.native.deflateSize(text, level).cast("double") /
          octet_length(text), scale))

  /** Corpus-wide adjacent-bigram PMI — collocation/association mining (the
    * phrase-detection front-end of word2vec-style pipelines, Mikolov et al.
    * 2013 §4): `pmi(w1,w2) = ln(n12·N / (n1·n2))` over corpus counts, pairs
    * with `n12 ≥ minCount`, top `topN` by frequency.
    *
    * Scale shape: bigrams come from zipping each doc's token array with its
    * own tail — per-row, no self-join — then ONE keyed count per relation
    * (bigram, unigram), both map-side combined; the unigram relation joins
    * back by word key (broadcastable when the vocabulary fits, keyed equi-
    * join otherwise — Spark's size estimate decides), the token total is a
    * one-row aggregate. Counts enter the PMI formula CAST TO DOUBLE before
    * multiplying: at web scale n1·n2 overflows int64 (1e12² > 2⁶³), and the
    * oracle mirrors the same operand shapes so the doubles agree bitwise.
    */
  def pmiPairs(docs: DataFrame, textCol: String = "text",
               minCount: Int = 5, topN: Int = 50, scale: Int = 6): DataFrame = {
    val ws = docs.select(tokens(col(textCol)).as("ws"))
    // vocab-sized and consumed three times (grand total + both bigram
    // join legs) — the lazy checkpoint stops each consumer re-running the
    // corpus explode+aggregate
    val uni = ws.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val tot = uni.agg(sum(col("n")).cast("double").as("nt"))
    val bg = ws.select(explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("n12"))
      .where(col("n12") >= minCount)
    // broadcast the vocab-sized unigram slices so the bigram relation
    // never re-exchanges by w1 and then again by w2 (guide §3.1)
    bg.join(broadcast(uni.select(col("w").as("w1"), col("n").as("n1"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("n").as("n2"))), "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("n12"),
        graft.functions.Rounding.dround(
          log((col("n12").cast("double") * col("nt")) /
            (col("n1").cast("double") * col("n2").cast("double"))), scale)
          .as("pmi"))
      .orderBy(col("n12").desc, col("w1"), col("w2"))
      .limit(topN)
  }
}
