package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the trained companion of the
  * [[TextStats.langId]] stopword heuristic (reference analog: the
  * profiling/validation services' reliance on the `lang` column, e.g.
  * datagen quality fields in de4ml's `datagen.py`; the classifier itself is
  * north-star surface for corpus curation: CLD/fastText-style supervised
  * language-ID over crawl text).
  *
  * Everything is counts + integer micro-unit log10 probabilities (the
  * [[NgramLm]] convention): per-(label, word) Laplace-smoothed conditional
  * log-probs and per-label priors are rounded HALF-UP to 1e-6 log10 units
  * once, and every downstream score is a BIGINT sum of those micro terms —
  * bitwise-identical under any aggregation order, so the whole train +
  * predict loop replays hash-exact in the DuckDB oracle.
  *
  * Scale posture: training is one explode + two keyed aggregates over the
  * corpus (map-side partials; the shuffle key is a word, never text).
  * The model is (vocab × labels)-sized — broadcast on the scoring join, so
  * prediction over 100 TB is one explode + broadcast-join + keyed agg and
  * the label spine rides a one-row-per-label broadcast cross (the house
  * bounded-scalar pattern). No driver loop, no UDF.
  */
object NaiveBayes {

  /** Half-up micro-unit log10: round(log10(x) * 1e6) as BIGINT, sign-aware
    * (the [[NgramLm]] term convention — replayable in any engine).
    */
  private def microLog10(x: Column): Column = {
    val t = (log(x) / log(lit(10.0))) * 1e6
    when(t >= 0, floor(t + 0.5)).otherwise(-floor(-t + 0.5)).cast("long")
  }

  /** Trained model relations. `labels` is one row per label:
    * (label, prior_micro, oov_micro); `condprob` is the full
    * (vocab × labels) grid: (word, label, lp_micro) — Laplace-smoothed, so
    * a word seen only under some labels still scores under all of them.
    */
  final case class NbModel(labels: DataFrame, condprob: DataFrame)

  /** Train on `df(labelCol, textCol)`: whitespace tokens, multinomial
    * event model, Laplace alpha = 1 over the train vocabulary:
    * P(w|l) = (c_lw + 1) / (tot_l + V), prior P(l) = docs_l / docs,
    * out-of-vocabulary words score at the smoothing floor 1 / (tot_l + V).
    */
  def train(df: DataFrame, textCol: String, labelCol: String): NbModel = {
    val tok = df.select(col(labelCol).as("label"),
      explode(TextStats.tokens(col(textCol))).as("word"))
    // counts is VOCAB-sized after the aggregate but its subtree is the
    // corpus explode: four consumers below (vocab, V, totals, condprob)
    // would each replan that pass — the lazy checkpoint makes the corpus
    // contribute ONE scan to training
    val counts = tok.groupBy("label", "word").agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val vocab = counts.select("word").distinct()
    val vSize = vocab.agg(count(lit(1)).as("v"))
    val docTotals = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nd"))
      .localCheckpoint(false) // feeds the prior AND the doc grand total
    // the doc grand total is the sum of the per-label counts — derived
    // from docTotals instead of paying a second full scan of the corpus
    val nDocs = docTotals.agg(sum("nd").as("ndt"))
    // The label spine is docTotals, NOT the token counts: a label whose
    // training docs are all token-less has no row in `counts` but still has
    // a prior, and must survive into the model (else predict can never emit
    // it). Its token total coalesces to 0; greatest(·, 1) guards the
    // 1/(tot+V) smoothing when the whole train vocabulary is empty too.
    val tokTotals = counts.groupBy("label").agg(sum("c").as("tot"))
    val labels = docTotals.join(tokTotals, Seq("label"), "left")
      .crossJoin(broadcast(vSize)).crossJoin(broadcast(nDocs))
      .select(col("label"), coalesce(col("tot"), lit(0L)).as("tot"), col("v"),
        microLog10(col("nd").cast("double") / col("ndt")).as("prior_micro"),
        microLog10(lit(1.0) / greatest(col("tot") + col("v"), lit(1L)))
          .as("oov_micro"))
      .localCheckpoint(false) // label-count rows; feeds condprob AND scoring
    val condprob = vocab.crossJoin(broadcast(labels.select("label", "tot", "v")))
      .join(counts, Seq("word", "label"), "left")
      .select(col("word"), col("label"),
        microLog10((coalesce(col("c"), lit(0L)) + lit(1)).cast("double") /
          (col("tot") + col("v"))).as("lp_micro"))
    NbModel(labels.select("label", "prior_micro", "oov_micro"), condprob)
  }

  /** Score every row of `df` under `model`: one (id, label) micro-unit
    * BIGINT score per label — prior + in-vocab conditional terms + the OOV
    * floor for unseen words. Returns (idCol, passCols..., label,
    * score_micro); `passCols` are per-row columns of `df` (functionally
    * dependent on the id) carried through on the spine so callers never
    * need a doc-sized join to re-attach them.
    *
    * Measured and REVERTED (r15): fusing the spine into the token pass —
    * n_tok/passCols riding an `explode_outer`, OOV counts from a LEFT
    * grid join, spine recovered from the checkpointed (docs × labels)
    * aggregate — read the corpus once instead of twice but DOUBLED the
    * pass's core-time (langid_nb 0.73 → 6.3 s at 4 cores; the widened
    * exploded relation + outer generate lost the tight codegen'd
    * inner-join pipeline). The two-pass shape is the measured optimum;
    * the spine's second pass is a cheap arithmetic token count, not a
    * tokenize (see [[TextStats.tokenCount]]).
    */
  def score(df: DataFrame, model: NbModel, textCol: String,
      idCol: String, passCols: Seq[String] = Nil): DataFrame = {
    val tok = df.select(col(idCol), explode(TextStats.tokens(col(textCol))).as("word"))
    val inVocab = tok.join(broadcast(model.condprob), "word")
      .groupBy(col(idCol), col("label"))
      .agg(sum("lp_micro").as("s_in"), count(lit(1)).as("n_in"))
    df.select(col(idCol) +: passCols.map(col) :+
        TextStats.tokenCount(col(textCol)).as("n_tok"): _*)
      .crossJoin(broadcast(model.labels))
      .join(inVocab, Seq(idCol, "label"), "left")
      .select(col(idCol) +: passCols.map(col) :+ col("label") :+
        (col("prior_micro") + coalesce(col("s_in"), lit(0L)) +
          (col("n_tok") - coalesce(col("n_in"), lit(0L))) * col("oov_micro"))
          .as("score_micro"): _*)
  }

  /** Argmax label per row (ties broken by label code order — the
    * [[TextStats.langId]] tiebreak convention). (idCol, passCols...,
    * pred_label). The argmax is a plain keyed aggregate —
    * `min(struct(-score, label))` picks the highest score then the
    * smallest label, exactly the window's (score DESC, label ASC) first
    * row — so prediction partial-aggregates map-side instead of paying
    * the window's exchange + sort.
    */
  def predict(df: DataFrame, model: NbModel, textCol: String,
      idCol: String, passCols: Seq[String] = Nil): DataFrame =
    score(df, model, textCol, idCol, passCols)
      .groupBy(col(idCol) +: passCols.map(col): _*)
      .agg(min(struct((-col("score_micro")).as("_ns"), col("label"))).as("_m"))
      .select(col(idCol) +: passCols.map(col) :+
        col("_m").getField("label").as("pred_label"): _*)

  /** The gate readout: train on the even-id half (the deterministic holdout
    * split), predict EVERY doc, emit the (true label, predicted label)
    * confusion matrix — the shape [[TextStats.langId]]'s gate uses, so the
    * heuristic and the trained classifier read side-by-side.
    */
  def confusion(docs: DataFrame): DataFrame = {
    val model = train(docs.where(col("doc_id") % 2 === 0), "text", "lang")
    // the true label rides the scoring spine (functionally dependent on
    // doc_id) — the old doc-sized join to re-attach it is gone
    // no trailing sort: the confusion matrix is a label²-sized multiset
    // and every consumer (the oracle gate included) is row-order-
    // insensitive — a global sort here pays a range exchange whose
    // SAMPLING pass re-executes the whole predict pipeline (the r14
    // sweep's 2× pattern, missed then because this one lives inside the
    // operator, not the query map)
    predict(docs, model, "text", "doc_id", passCols = Seq("lang"))
      .groupBy(col("lang"), col("pred_label").as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .select("lang", "pred_lang", "n")
  }
}
