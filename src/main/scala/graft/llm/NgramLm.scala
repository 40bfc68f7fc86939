package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-gram language-model scoring — the perplexity quality filter of the
  * CCNet recipe, built the way a 100 TB engine has to build it: the model
  * is a RELATION, not a broadcast. Smoothing is stupid backoff (Brants et
  * al. 2007, "Large Language Models in Machine Translation" — the scheme
  * DESIGNED for distributed n-gram counting: no discounting pass, one
  * count table, a constant backoff multiplier).
  *
  * Train = one explode + groupBy per order (keyed, map-side combined;
  * output is vocabulary-sized). Score = the document positions relation
  * left-joined against the model ON THE GRAM STRING — every join is a
  * keyed shuffle that scales like any other join; nothing assumes the
  * model fits in memory.
  *
  * Scoring semantics, pinned for cross-engine replay (`lm_score` oracle):
  *
  *  - tokens are non-empty whitespace tokens in document order; grams are
  *    space-joined token runs;
  *  - for position i (0-based), k_max = min(n, i+1); with c_k the count
  *    of the k-gram ending at i and ctx_k its (k−1)-gram context count:
  *    S_i = c_k / ctx_k for the LARGEST k ≤ k_max with c_k > 0 (ctx_1 =
  *    total token count N), multiplied by alpha^(k_max − k); an unseen
  *    unigram floors at alpha^(k_max − 1) / N;
  *  - per-token term = floor(log10(S_i)·1e6 − 0.5 sign-aware)… no: terms
  *    are negative, so each is rounded to micro-units with the binary-value
  *    formula of [[graft.functions.Rounding.dround]] and summed as exact
  *    BIGINTs (partition-invariant, the PSI pattern);
  *  - doc score = round(−Σ terms / (n_tok·1e6), 6) — mean negative log10
  *    probability per token (lower = more fluent under the model).
  */
object NgramLm {

  /** `(gram, k, cnt)` counts for all orders 1..n, plus the `("", 0, N)`
    * total-token row — ONE relation holding the whole model.
    */
  def train(df: DataFrame, textCol: String = "text", n: Int = 2): DataFrame = {
    require(n >= 1 && n <= 5, s"order must be in [1, 5], got $n")
    val toks = filter(split(col(textCol), " "), t => t =!= lit(""))
    val grams = (1 to n).map { k =>
      df.select(explode(gramsOf(toks, k)).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("cnt"))
        .select(col("gram"), lit(k).as("k"), col("cnt"))
    }
    val total = df.select(explode(toks).as("t"))
      .agg(count(lit(1)).as("cnt"))
      .select(lit("").as("gram"), lit(0).as("k"), col("cnt"))
    grams.reduce(_ unionByName _).unionByName(total)
  }

  /** All k-gram strings of a token array (space-joined runs). */
  private def gramsOf(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k), i =>
        array_join(slice(toks, i + 1, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))

  def save(model: DataFrame, path: String): Unit =
    model.write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Per-document mean negative log10 probability under `model` —
    * `(idCol, n_tok, lm_score)`; documents with no tokens are dropped (no
    * distribution to score them under).
    */
  def score(df: DataFrame, model: DataFrame, textCol: String = "text",
            idCol: String = "doc_id", n: Int = 2,
            alpha: Double = 0.4): DataFrame = {
    require(n >= 1 && n <= 5, s"order must be in [1, 5], got $n")
    val spark = df.sparkSession
    val toks = filter(split(col(textCol), " "), t => t =!= lit(""))
    // one row per token position, carrying every gram ending at it and
    // every context gram before it (k = 2..n)
    val posCols = Seq(col(idCol), col("_i")) ++
      (1 to n).map(k => when(col("_i") >= k - 1,
        array_join(slice(col("_toks"), col("_i") - (k - 1) + 1, lit(k)), " "))
        .as(s"_g$k")) ++
      (2 to n).map(k => when(col("_i") >= k - 1,
        array_join(slice(col("_toks"), col("_i") - (k - 1) + 1, lit(k - 1)), " "))
        .as(s"_c$k"))
    val pos = df
      .select(col(idCol), toks.as("_toks"))
      .where(size(col("_toks")) > 0)
      .select(col(idCol), col("_toks"),
        explode(sequence(lit(0), size(col("_toks")) - 1)).as("_i"))
      .select(posCols: _*)
    // total token count N: the model's k=0 row (broadcast scalar)
    val joined0 = pos.crossJoin(broadcast(
      model.where(col("k") === 0).select(col("cnt").as("_N"))))
    // one keyed left join per gram/context column, against the right order
    val withCounts = (1 to n).foldLeft(joined0) { case (d, k) =>
      d.join(broadcastIfSmall(model.where(col("k") === k)
          .select(col("gram").as(s"_g$k"), col("cnt").as(s"_n$k"))),
        Seq(s"_g$k"), "left")
    }
    val withCtx = (2 to n).foldLeft(withCounts) { case (d, k) =>
      d.join(broadcastIfSmall(model.where(col("k") === (k - 1))
          .select(col("gram").as(s"_c$k"), col("cnt").as(s"_x$k"))),
        Seq(s"_c$k"), "left")
    }
    // largest available order wins; each level dropped multiplies by alpha
    val kMax = least(lit(n), col("_i") + 1)
    val sCases = (n to 2 by -1).map { k =>
      (col(s"_n$k").isNotNull && kMax >= k,
        col(s"_n$k").cast("double") / col(s"_x$k"),
        kMax - k)
    } :+ ((col("_n1").isNotNull, col("_n1").cast("double") / col("_N"),
      kMax - 1)) :+
      ((lit(true), lit(1.0) / col("_N"), kMax - 1))
    // alpha^drop as a CASE of repeated literal products — libm pow() is not
    // guaranteed bit-identical across engines; IEEE multiplication is
    def alphaPow(drop: Column): Column =
      (1 until n).foldLeft(when(drop <= 0, lit(1.0))) { case (w, d) =>
        w.when(drop === d, (1 to d).map(_ => lit(alpha)).reduce(_ * _))
      }.otherwise(lit(Double.NaN))
    val sCol = sCases.foldRight(lit(Double.NaN)) { case ((cond, v, drop), e) =>
      when(cond, v * alphaPow(drop)).otherwise(e)
    }
    val termMicros = {
      val t = (log(sCol) / log(lit(10.0))) * 1e6
      // binary-value round, sign-aware (terms are ≤ 0)
      when(t >= 0, floor(t + 0.5)).otherwise(-floor(-t + 0.5)).cast("long")
    }
    withCtx
      .select(col(idCol), col("_i"), termMicros.as("_tm"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"), sum("_tm").as("_sum"))
      .select(col(idCol), col("n_tok"),
        graft.functions.Rounding.dround(
          -col("_sum").cast("double") / (col("n_tok") * 1e6), 6)
          .as("lm_score"))
  }

  /** The model's per-order slices are usually vocabulary-sized; leave the
    * broadcast decision to Spark/AQE (the join stays a keyed shuffle when
    * the slice is big) — this hook exists so tests can pin either shape.
    */
  private def broadcastIfSmall(df: DataFrame): DataFrame = df
}
