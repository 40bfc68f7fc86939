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

  /** Shared ledger aggregation: per-doc chunk counts/bytes with a
    * precomputed boolean dup flag column `_dup`.
    */
  private def ledger(flagged: DataFrame, idCol: String): DataFrame =
    flagged.select(col(idCol), col("len").cast("long").as("len"),
        when(col("_dup"), col("len")).otherwise(lit(0)).cast("long").as("dup"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_chunks"), sum("len").as("n_chars"),
        sum("dup").as("dup_chars"))
      .withColumn("dup_ratio", graft.functions.Rounding.dround(
        col("dup_chars").cast("double") / col("n_chars"), 6))

  /** Per-document duplicated-byte ledger: n_chunks, n_chars, dup_chars
    * (chars in chunks whose (hash, len) already occurred at a smaller
    * (id, idx) — global first occurrence keeps ownership), dup_ratio.
    */
  def dedupStats(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", w: Int = 8, divisor: Long = 64L): DataFrame = {
    val ch = chunks(docs, textCol, idCol, w, divisor)
    val rk = Window.partitionBy(col("hash"), col("len"))
      .orderBy(col(idCol), col("idx"))
    ledger(ch.withColumn("_dup", row_number().over(rk) > 1), idCol)
  }

  // ---- persisted chunk-hash store: the CDC family's O(batch) increment --

  /** The CDC family's incremental artifact (the engine invariant: every
    * artifact family — signatures, IVF, BM25 postings, pairs — has an
    * O(batch) increment; this is the chunk-dedup one). The store holds
    * only DISTINCT (hash, len) chunk keys — 16 bytes per distinct chunk,
    * ~16/divisor of corpus bytes — bucket-partitioned by `pmod(hash,
    * nBuckets)` so appends land beside their bucket. History TEXT is never
    * rescanned: a new crawl's duplicated-byte ledger is the batch's own
    * O(batch) chunk pass plus one keyed join against the hash store.
    */
  val storeBuckets = 16

  private def storeKeys(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) graft.core.Layouts.read(spark, path).select("hash", "len")
    else spark.range(0).select(col("id").as("hash"),
      col("id").cast("int").as("len"))
  }

  /** (Re)build the store from a corpus: distinct chunk keys, bucketed. */
  def buildStore(spark: org.apache.spark.sql.SparkSession, path: String,
      docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      w: Int = 8, divisor: Long = 64L): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
    val keys = chunks(docs, textCol, idCol, w, divisor)
      .select("hash", "len").distinct()
      .withColumn("bucket", pmod(col("hash"), lit(storeBuckets.toLong)))
    graft.core.Layouts.writePartitioned(keys, path, "bucket")
  }

  /** READ-ONLY batch ledger against the store: a batch chunk is duplicate
    * if its (hash, len) exists in history OR occurred earlier in the batch
    * itself ((id, idx) order) — exactly the ordering "history ingested
    * first". Idempotent (no store mutation); an absent store means no
    * history. Same output shape as [[dedupStats]].
    */
  def probeStats(spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      w: Int = 8, divisor: Long = 64L): DataFrame = {
    val ch = chunks(batch, textCol, idCol, w, divisor)
    val known = storeKeys(spark, path).withColumn("_hit", lit(1))
    val rk = Window.partitionBy(col("hash"), col("len"))
      .orderBy(col(idCol), col("idx"))
    val flagged = ch.join(known, Seq("hash", "len"), "left")
      .withColumn("_dup", col("_hit").isNotNull || row_number().over(rk) > 1)
    ledger(flagged, idCol)
  }

  // ---- streaming ingestion: per-batch subdirectories, replay-idempotent -

  /** Store subdirectory layout for STREAMING ingestion: each micro-batch's
    * new keys land in their own bucket-partitioned child `b<batchId>`,
    * written in OVERWRITE mode — the [[SignatureStore.ingest]] recovery
    * scheme. A replayed batch (a) rewrites its own subdirectory instead of
    * appending twice and (b) is EXCLUDED from the history it probes, so a
    * crash between the ledger and the key write replays to the identical
    * ledger and identical store contents.
    */
  private def streamKeys(spark: org.apache.spark.sql.SparkSession,
      path: String, exclude: Long): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val children =
      if (!fs.exists(p)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(p).filter(st => st.isDirectory &&
        st.getPath.getName.matches("b[0-9]+") &&
        st.getPath.getName != s"b$exclude")
    children.map(st => graft.core.Layouts.read(spark, st.getPath.toString)
        .select("hash", "len"))
      .reduceOption(_.unionByName(_))
      .getOrElse(spark.range(0).select(col("id").as("hash"),
        col("id").cast("int").as("len")))
  }

  /** One micro-batch of the STREAMING chunk-dedup ledger: the batch's
    * duplicated-byte ledger against all PRIOR batches' keys (own
    * subdirectory excluded — see [[streamKeys]]), result pinned by an
    * eager checkpoint BEFORE the batch's new keys (over)write
    * `path/b<batchId>`. History text is never rescanned: O(batch) chunking
    * plus one keyed join against the stored keys, the [[appendToStore]]
    * posture with exactly-once recovery on top.
    */
  def ingestBatch(spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, batchId: Long, textCol: String = "text",
      idCol: String = "doc_id", w: Int = 8,
      divisor: Long = 64L): DataFrame = {
    val ch = chunks(batch, textCol, idCol, w, divisor)
      .localCheckpoint(false) // feeds the ledger AND the key write
    val known = streamKeys(spark, path, exclude = batchId)
      .withColumn("_hit", lit(1))
    val rk = Window.partitionBy(col("hash"), col("len"))
      .orderBy(col(idCol), col("idx"))
    val led = ledger(ch.join(known, Seq("hash", "len"), "left")
        .withColumn("_dup", col("_hit").isNotNull || row_number().over(rk) > 1),
      idCol)
      .localCheckpoint() // FIX the ledger before the store mutates
    val newKeys = ch.select("hash", "len").distinct()
      .join(streamKeys(spark, path, exclude = batchId),
        Seq("hash", "len"), "left_anti")
      .withColumn("bucket", pmod(col("hash"), lit(storeBuckets.toLong)))
    graft.core.Layouts.writePartitioned(newKeys, s"$path/b$batchId", "bucket")
    led
  }

  /** Fold a batch's NEW chunk keys into the store (append-only increments
    * beside their bucket; the store stays a distinct-key relation because
    * only keys absent from history are written). Call after
    * [[probeStats]] — the ledger is the read, this is the write.
    */
  def appendToStore(spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      w: Int = 8, divisor: Long = 64L): Unit = {
    val newKeys = chunks(batch, textCol, idCol, w, divisor)
      .select("hash", "len").distinct()
      .join(storeKeys(spark, path), Seq("hash", "len"), "left_anti")
      .withColumn("bucket", pmod(col("hash"), lit(storeBuckets.toLong)))
      // EAGER materialization: the write lands on the path the anti-join
      // reads — the keys must be computed before the first new file lands
      .localCheckpoint(true)
    graft.core.Layouts.writePartitioned(newKeys, path, "bucket",
      mode = "append")
  }
}
