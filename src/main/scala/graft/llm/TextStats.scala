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

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

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
    * Shape at scale: one explode carrying all four orders (k recovered
    * from the gram's word count, the [[NgramLm.train]] trick), then two
    * keyed aggregates — (doc, gram) counts with map-side combine, then a
    * per-doc conditional fold. All state is doc-bounded; nothing global.
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
    * Shape: the columnar signals ride the scan; the repetition fractions
    * arrive via ONE doc-keyed left join against [[repetitionStats]]
    * (documents with fewer than two tokens have no n-grams — their
    * repetition fractions coalesce to 0). Cost: the repetitionStats pass
    * plus a doc-count-sized keyed join; nothing global.
    */
  def gopherFilter(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", minWords: Int = 50,
                   maxWords: Int = 100000): DataFrame = {
    val sig = docs.select(col(idCol),
      tokenCount(col(textCol)).as("n_words"),
      meanWordLen(col(textCol)).as("_mwl"),
      symbolRatio(col(textCol)).as("_sym"))
    // only orders 2 and 5 feed rules — exploding 3- and 4-grams too would
    // double the dominant map stage for statistics the filter discards
    val cnts = gramCounts(docs, textCol, idCol, Seq(2, 5))
    val rep = cnts.groupBy(col(idCol), col("_tl")).agg(
      graft.functions.Rounding.dround(
        topGramChars(2).cast("double") / col("_tl"), 4).as("top2_frac"),
      graft.functions.Rounding.dround(
        dupGramChars(5).cast("double") / col("_tl"), 4).as("dup5_frac"))
      .select(col(idCol), col("top2_frac"), col("dup5_frac"))
    val failed =
      when(col("n_words") < minWords || col("n_words") > maxWords, 1)
        .otherwise(0) +
      when(col("_mwl") < 3.0 || col("_mwl") > 10.0, 2).otherwise(0) +
      when(col("_sym") > 0.1, 4).otherwise(0) +
      when(coalesce(col("top2_frac"), lit(0.0)) > 0.20, 8).otherwise(0) +
      when(coalesce(col("dup5_frac"), lit(0.0)) > 0.15, 16).otherwise(0)
    sig.join(rep, Seq(idCol), "left")
      .select(col(idCol), col("n_words"),
        failed.cast("long").as("rules_failed"))
      .withColumn("kept",
        when(col("rules_failed") === 0, 1L).otherwise(0L))
  }

  /** Per-(doc, order, gram) occurrence counts for the requested orders —
    * ONE explode carries every order (the order is recovered from the
    * gram's word count), one keyed aggregate with map-side combine.
    */
  private def gramCounts(docs: DataFrame, textCol: String, idCol: String,
                         orders: Seq[Int]): DataFrame = {
    val toks = tokens(col(textCol))
    val grams = concat(orders.map(k =>
      graft.functions.native.wordGrams(toks, k)): _*)
    docs
      .select(col(idCol), greatest(length(col(textCol)), lit(1)).as("_tl"),
        explode(grams).as("gram"))
      .withColumn("_k",
        (length(col("gram")) - length(translate(col("gram"), " ", "")) + 1)
          .cast("int"))
      .groupBy(col(idCol), col("_tl"), col("_k"), col("gram"))
      .agg(count(lit(1)).as("_cnt"))
  }

  /** Char count of all occurrences of the most frequent order-`k` gram —
    * the argmax as max(struct(count, gram)): largest count, ties to the
    * lexicographically largest gram, one conditional fold per doc.
    */
  private def topGramChars(k: Int): Column = {
    val s = max(when(col("_k") === k, struct(col("_cnt"), col("gram"))))
    coalesce(s.getField("_cnt") * length(s.getField("gram")), lit(0L))
  }

  /** Char count of all occurrences of duplicated order-`k` grams. */
  private def dupGramChars(k: Int): Column =
    coalesce(sum(when(col("_k") === k && col("_cnt") >= 2,
      col("_cnt") * length(col("gram")))), lit(0L))

  def repetitionStats(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", scale: Int = 4): DataFrame = {
    def frac(c: Column): Column =
      graft.functions.Rounding.dround(c.cast("double") / col("_tl"), scale)
    gramCounts(docs, textCol, idCol, 2 to 5)
      .groupBy(col(idCol), col("_tl")).agg(
        frac(topGramChars(2)).as("top2_frac"),
        frac(topGramChars(3)).as("top3_frac"),
        frac(topGramChars(4)).as("top4_frac"),
        frac(dupGramChars(5)).as("dup5_frac"))
      .drop("_tl")
  }
}
