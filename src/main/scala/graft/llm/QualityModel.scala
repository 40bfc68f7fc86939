package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality scoring: a hashed bag-of-words logistic classifier
  * over documents — the modern counterpart of the heuristic
  * [[TextStats.qualityScore]] (quality-classifier filtering per the
  * DCLM / fineweb-edu recipe, public work; the reference has no model
  * scoring at all). The MODEL is a config-sized artifact (weights +
  * bias); SCORING is a pure per-row columnar map. That split is the 100 TB
  * design: training touches a bounded sample, scoring touches the corpus
  * with no shuffle and no state.
  *
  * Scoring semantics, pinned for cross-engine replay (the `quality_model`
  * oracle re-computes them exactly in SQL):
  *
  *  - tokens are the non-empty whitespace tokens, in document order;
  *  - feature index of token t = `PolyHash.h1(t) % dim` (the base-31
  *    polynomial hash every signature oracle already replays);
  *  - raw = bias + (Σ_t w[idx(t)]) / n_tok, the sum folded in token
  *    order (deterministic on both engines; no-token docs use raw = bias);
  *  - score = round(sigmoid(raw), 6) — the one edge rounding, binary-value
  *    formula ([[graft.functions.Rounding]]), absorbing exp()'s cross-libm
  *    ulp like PSI's ln terms.
  */
object QualityModel {

  final case class Model(weights: Array[Double], bias: Double) {
    def dim: Int = weights.length
  }

  /** Driver twin of the native scoring expression — ONE implementation of
    * the fold (the expression delegates here; specs assert parity).
    */
  def scoreText(text: String, m: Model): Double = {
    var sum = 0.0
    var n = 0L
    text.split(" ", -1).foreach { w =>
      if (w.nonEmpty) {
        sum += m.weights((graft.functions.PolyHash.h1(w) % m.dim).toInt)
        n += 1L
      }
    }
    val raw = m.bias + (if (n == 0L) 0.0 else sum / n)
    val s = 1.0 / (1.0 + math.exp(-raw))
    math.floor(s * 1e6 + 0.5) / 1e6
  }

  /** Scoring column (native expression: one tight loop per row). */
  def score(text: Column, m: Model): Column =
    graft.functions.native.qualityModelScore(text, m)

  /** Train by logistic SGD on a DETERMINISTIC bounded sample: rows are
    * drawn by their [[Corpus.hashUnit]] order (id-keyed, partition
    * invariant), capped at `sampleCap` (a config bound — classifier
    * training data is small by design; the corpus-sized pass is scoring).
    * Fixed iteration order makes the learned weights reproducible bit for
    * bit. Labels must be 0/1.
    */
  def train(df: DataFrame, textCol: String = "text",
            labelCol: String = "label", idCol: String = "doc_id",
            dim: Int = 1 << 12, epochs: Int = 5, lr: Double = 0.5,
            sampleCap: Int = 100000): Model = {
    val rows = df
      .select(col(idCol), col(textCol).cast("string"),
        col(labelCol).cast("double"))
      .orderBy(Corpus.hashUnit(col(idCol), 42L), col(idCol))
      .limit(sampleCap)
      .collect()
      .map(r => (r.getString(1), r.getDouble(2)))
    // hashed normalized counts per doc, computed once
    val feats = rows.map { case (text, y) =>
      val idx = scala.collection.mutable.HashMap.empty[Int, Double]
      var n = 0L
      text.split(" ", -1).foreach { w =>
        if (w.nonEmpty) {
          val i = (graft.functions.PolyHash.h1(w) % dim).toInt
          idx.update(i, idx.getOrElse(i, 0.0) + 1.0)
          n += 1L
        }
      }
      val x = idx.toArray.sortBy(_._1)
      if (n > 0L) { var j = 0; while (j < x.length) { x(j) = (x(j)._1, x(j)._2 / n); j += 1 } }
      (x, y)
    }
    val w = new Array[Double](dim)
    var b = 0.0
    var e = 0
    while (e < epochs) {
      feats.foreach { case (x, y) =>
        var raw = b
        x.foreach { case (i, v) => raw += w(i) * v }
        val g = 1.0 / (1.0 + math.exp(-raw)) - y
        x.foreach { case (i, v) => w(i) -= lr * g * v }
        b -= lr * g
      }
      e += 1
    }
    Model(w, b)
  }

  /** Persist the model as `(idx, w)` rows plus a bias row (idx = -1) —
    * reloadable across sessions like the BPE merge table and IVF index.
    */
  def save(spark: SparkSession, m: Model, path: String): Unit = {
    import spark.implicits._
    (m.weights.zipWithIndex.map { case (w, i) => (i, w) } :+ ((-1, m.bias)))
      .toSeq.toDF("idx", "w")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toMap
    Model(Array.tabulate(rows.size - 1)(rows(_)), rows(-1))
  }

  /** Fixed literal demo weights for the oracle-checked gate query
    * (config-as-data, like the BPE merge table): dim 32, splitmix-derived
    * values in [-1, 1], bias 0.
    */
  lazy val CoreDemoModel: Model = Model(
    Array.tabulate(32) { i =>
      val z = graft.functions.PolyHash.splitmix(1000L + i)
      (Math.floorMod(z, 2000001L) - 1000000L) / 1000000.0
    }, 0.0)
}
