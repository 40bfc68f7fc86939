package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined-chunking dedup (the rsync / LBFS / FastCDC family,
  * north-star surface next to [[Dedup]]'s whole-doc and line/paragraph
  * operators): split every document at content-defined boundaries
  * ([[graft.functions.CdcChunks]] — a rolling-hash residue rule, so an
  * edit only perturbs the chunks it touches), hash each chunk, and account
  * duplicated bytes corpus-wide by first-occurrence-wins on the chunk
  * hash. This is the storage-dedup / boilerplate-accounting primitive:
  * where [[Dedup.duplicatedSpans]] finds exact copied token runs pairwise,
  * CDC gives a corpus-level duplicated-byte ledger at O(n) per doc plus
  * ONE exchange keyed on (chunk hash, len) — 16 bytes per chunk, text
  * never enters the shuffle, so the 100 TB posture is a map stage plus a
  * compact keyed window however large the corpus.
  */
object Cdc {

  /** One row per chunk: (idCol, idx, start, len, hash) — idx/start 1-based,
    * hash = PolyHash base-31 fold of the chunk's code points.
    */
  def chunks(docs: DataFrame, textCol: String, idCol: String,
      w: Int = 8, divisor: Long = 64L): DataFrame =
    docs.select(col(idCol),
        explode(graft.functions.native.cdcChunks(col(textCol), w, divisor))
          .as("c"))
      .select(col(idCol), col("c.idx").as("idx"), col("c.start").as("start"),
        col("c.len").as("len"), col("c.hash").as("hash"))

  /** Per-document duplicated-byte ledger: n_chunks, n_chars, dup_chars
    * (chars in chunks whose (hash, len) already occurred at a smaller
    * (id, idx) — global first occurrence keeps ownership), dup_ratio.
    */
  def dedupStats(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", w: Int = 8, divisor: Long = 64L): DataFrame = {
    val ch = chunks(docs, textCol, idCol, w, divisor)
    val rk = Window.partitionBy(col("hash"), col("len"))
      .orderBy(col(idCol), col("idx"))
    val dup = when(row_number().over(rk) > 1, col("len")).otherwise(lit(0))
    ch.select(col(idCol), col("len").cast("long").as("len"),
        dup.cast("long").as("dup"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_chunks"), sum("len").as("n_chars"),
        sum("dup").as("dup_chars"))
      .withColumn("dup_ratio", graft.functions.Rounding.dround(
        col("dup_chars").cast("double") / col("n_chars"), 6))
  }
}
