package graft.core

import graft.functions.{BloomBitsAgg, BloomCountHits, DotProductD, HyperplaneLshKey, Int8Quantize, Int8Scale, JaccardSim, KmvDistinctAgg, MinHashSig, SimHash60, WordShingles}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** Session construction with the engine's recommended configuration, and SQL
  * registration of the native expressions so `spark.sql` users get them too.
  *
  * Use either
  * `GraftSession.builder().master("local[32]").getOrCreate()` or a plain
  * builder with `.withExtensions(new GraftExtensions)`.
  */
object GraftSession {

  def builder(shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new GraftExtensions)

  /** Register the engine's SQL functions on an existing session. */
  def registerFunctions(spark: SparkSession): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

/** SparkSessionExtensions hook: registers graft_* SQL functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    e.injectOptimizerRule(_ => graft.functions.FuseJaccard)
  }
}

object GraftExtensions {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_simhash60" -> (exprs => SimHash60(exprs.head)),
    "graft_minhash_sig" -> (exprs =>
      MinHashSig(exprs.head, intLit(exprs(1), "numHashes"))),
    "graft_word_shingles" -> (exprs =>
      WordShingles(exprs.head, intLit(exprs(1), "n"))),
    "graft_dotd" -> (exprs => DotProductD(exprs.head, exprs(1))),
    "graft_jaccard" -> (exprs => JaccardSim(exprs.head, exprs(1))),
    "graft_lsh_key" -> (exprs =>
      HyperplaneLshKey(exprs.head, intLit(exprs(1), "nBits"))),
    "graft_int8_quant" -> (exprs => Int8Quantize(exprs.head)),
    "graft_int8_scale" -> (exprs => Int8Scale(exprs.head)),
    "graft_bloom_bits" -> (exprs =>
      BloomBitsAgg(exprs.head, intLit(exprs(1), "mBits"), intLit(exprs(2), "k"))),
    "graft_bloom_count_hits" -> (exprs =>
      BloomCountHits(exprs.head, exprs(1),
        intLit(exprs(2), "mBits"), intLit(exprs(3), "k"))),
    "graft_kmv_distinct" -> (exprs =>
      KmvDistinctAgg(exprs.head, intLit(exprs(1), "k"),
        if (exprs.length > 2) longLit(exprs(2), "seed") else 42L)))
}
