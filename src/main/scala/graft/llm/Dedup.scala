package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash-groupBy),
  * MinHash-LSH near-dup, SimHash near-dup, and n-gram Jaccard with cheap
  * blocking. All are shuffle-on-key designs — no O(n²) cross join ever
  * materialises; candidate generation is always a hash-bucket equi-join,
  * which is the only shape that survives 100 TB.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the lowest id as the canonical
    * representative. Hashing first (sha2-256) means the shuffle key is 32
    * bytes regardless of document size — group-by-text would shuffle the
    * full corpus text.
    */
  def exact(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .drop("content_hash")

  /** Distinct word n-gram shingles of a token array. */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
        i => array_join(slice(toks, i, lit(n)), " ")))

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum xxhash64 over the shingle set. One pass over the shingle array
    * per row; no shuffle.
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(sh, x => xxhash64(x, s))))

  /** Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)) / size(array_union(a, b)).cast("double")

  /** MinHash + LSH near-duplicate pairs.
    *
    * shingle → minhash signature (bands×rowsPerBand hashes) → per-band
    * bucket key → equi-join on (band, bucket) for candidates → exact
    * Jaccard verification ≥ `threshold`.
    *
    * The candidate join is on a (band, 64-bit bucket) key: at scale the only
    * shuffle is by bucket, and bucket sizes are bounded by collision rate,
    * not corpus size.
    */
  def minhash(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id", shingleLen: Int = 5,
              bands: Int = 8, rowsPerBand: Int = 2,
              threshold: Double = 0.4): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sh = docs.select(
      col(idCol).as("id"),
      shingles(TextStats.tokens(col(textCol)), shingleLen).as("sh"))
    val sig = sh.select(
      col("id"), col("sh"),
      minhashSignature(col("sh"), numHashes).as("sig"))
    val banded = sig.select(
      col("id"), col("sh"),
      explode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => struct(
            b.as("band"),
            xxhash64(slice(col("sig"), b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)))
              .as("bucket"))))
        .as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bucket"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        round(jaccard(col("a.sh"), col("b.sh")), 4).as("jacc"))
      .distinct()
      .where(col("jacc") >= threshold)
  }

  /** 64-bit SimHash from a column of precomputed token hashes (array<long>):
    * bit b of the signature is the sign of the sum over token hashes of
    * (hashbit_b ? +1 : −1). Built as a SQL expression string because dynamic
    * shift amounts are only available in the SQL function form
    * (`shiftleft(1L, b)` with a column bit count). Hashing once into a column
    * and folding over it keeps the cost O(64·|tokens|) adds, not hashes.
    */
  def simhashSignature(tokenHashesCol: String): Column =
    expr(
      s"""aggregate(sequence(0, 63), 0L, (acc, b) ->
         |  acc + IF(
         |    aggregate($tokenHashesCol, 0L,
         |      (w, h) -> w + (shiftright(h, b) & 1L) * 2 - 1) > 0,
         |    shiftleft(1L, b), 0L))""".stripMargin)

  /** SimHash near-dup pairs: candidates share at least one of four 16-bit
    * signature chunks (guarantees recall for hamming distance ≤ 3 by
    * pigeonhole), verified with an exact popcount of the XOR.
    */
  def simhash(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id", maxHamming: Int = 3): DataFrame = {
    val hashed = docs.select(
      col(idCol).as("id"),
      transform(array_distinct(TextStats.tokens(col(textCol))),
        t => xxhash64(t)).as("th"))
    val sig = hashed.select(col("id"), simhashSignature("th").as("sig"))
    val chunks = (0 until 4).map(c => struct(lit(c).as("chunk"),
      shiftrightunsigned(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL)).as("ckey")))
    val chunked = sig.select(col("id"), col("sig"),
      explode(array(chunks: _*)).as("cc"))
      .select(col("id"), col("sig"), col("cc.chunk"), col("cc.ckey"))
    val a = chunked.alias("a")
    val b = chunked.alias("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Exact n-gram (shingle) Jaccard near-dup with prefix blocking: only
    * documents sharing the same leading-characters block are compared. The
    * block key bounds the join fan-out; at scale replace the prefix with any
    * cheap locality key (URL host, minhash band, …).
    */
  def ngramJaccard(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", shingleLen: Int = 5,
                   blockPrefix: Int = 40, threshold: Double = 0.4): DataFrame = {
    val sh = docs.select(
      col(idCol).as("id"),
      substring(col(textCol), 1, blockPrefix).as("blk"),
      shingles(TextStats.tokens(col(textCol)), shingleLen).as("sh"))
    val a = sh.alias("a")
    val b = sh.alias("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        round(jaccard(col("a.sh"), col("b.sh")), 4).as("jacc"))
      .where(col("jacc") >= threshold)
  }
}
