package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bronze log sources (reference: the SQLite `(ts, data)` event log,
  * logging-service/app/lib/storage.py:31 — the storage engine is an
  * implementation detail; the semantic contract is "timestamped raw JSON
  * rows"). Batch and streaming readers share one schema so the same Etl
  * pipeline runs over either.
  */
object Sources {

  val bronzeSchema = "ts LONG, data STRING"

  /** Batch read of a JSON-lines bronze log directory/file. The explicit
    * schema skips the inference pass (one scan, not two) and keeps `data`
    * as the raw document string.
    */
  def bronzeJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(bronzeSchema).json(path)

  /** Streaming read of the same layout — new files are micro-batches; pair
    * with Etl.parse/flatten and a parquet sink for continuous ingestion.
    */
  def bronzeJsonStream(spark: SparkSession, path: String,
                       maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream.schema(bronzeSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)

  /** CSV read with an EXPLICIT schema (inference would cost a second scan
    * and can mis-type sparse columns) — header + RFC-4180 quoting, the
    * third source format beside parquet and JSON lines. `multiLine` stays
    * off: quoted embedded newlines would force whole-file parsing and kill
    * split-ability, so upstream writers must escape them ([[writeCsv]]
    * round-trips everything else).
    */
  def csv(spark: SparkSession, path: String, schema: String): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** The matching writer: header + quoting-when-needed. */
  def writeCsv(df: org.apache.spark.sql.DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** JSON-lines source with an explicit schema (the bronze reader
    * [[bronzeJson]] infers; pipelines with a contract pass the schema and
    * skip the inference pass).
    */
  def jsonl(spark: SparkSession, path: String, schema: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** The matching JSON-lines writer — the ship-to-training export format
    * (one JSON object per line, splittable by newline because string
    * values escape theirs).
    */
  def writeJsonl(df: org.apache.spark.sql.DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC source (the second columnar format beside parquet — explicit
    * schema skips footer inference, same predicate-pushdown/column-pruning
    * posture as the parquet scan).
    */
  def orc(spark: SparkSession, path: String, schema: String): DataFrame =
    spark.read.schema(schema).orc(path)

  /** The matching ORC writer. */
  def writeOrc(df: org.apache.spark.sql.DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  // ---- WARC (ISO 28500) — the crawl-archive container -------------------

  /** Write `(idCol, urlCol, textCol)` rows as uncompressed WARC response
    * records, one WARC FILE per partition. `Content-Length` counts the
    * payload's UTF-8 BYTES, so payloads containing newlines — even lines
    * that look like WARC headers — round-trip exactly. That byte-counted
    * framing is what makes WARC unsplittable by lines; files are the
    * parallelism unit (exactly how a crawl archive shards at 100 TB:
    * thousands of ~1 GB WARC files, one task each).
    *
    * Records ride Spark's text sink (one record string per row — the
    * sink's trailing newline lands between records, where [[readWarc]]'s
    * scanner skips inter-record whitespace).
    */
  def writeWarc(df: DataFrame, path: String, idCol: String = "doc_id",
                urlCol: String = "url", textCol: String = "text",
                http: Boolean = false): Unit =
    warcRecords(df, idCol, urlCol, textCol, http)
      .write.mode("overwrite").text(path)

  /** The gzip twin of [[writeWarc]] — each partition lands as one
    * `.txt.gz` member stream (Spark's text sink + the gzip codec), the
    * compressed-at-rest posture every real crawl archive ships in
    * (Common Crawl is 100% `.warc.gz`). [[readWarc]] detects the gzip
    * magic per file and inflates INCREMENTALLY through a member-resyncing
    * stream, so per-record-member archives (the Common Crawl layout,
    * which makes single records randomly accessible) read back
    * identically — the reader never assumes one member per file, and
    * never holds more than one record in memory.
    */
  def writeWarcGz(df: DataFrame, path: String, idCol: String = "doc_id",
                  urlCol: String = "url", textCol: String = "text",
                  http: Boolean = false): Unit =
    warcRecords(df, idCol, urlCol, textCol, http)
      .write.mode("overwrite").option("compression", "gzip").text(path)

  /** One WARC record string per row. `http = true` writes what a real
    * crawler stores: `Content-Type: application/http; msgtype=response`
    * records whose payload is the FULL captured HTTP response — status
    * line + response headers + blank line + body — with `Content-Length`
    * counting the whole HTTP block ([[parseWarc]] skips the header block
    * back off on read). `http = false` keeps the bare-payload records
    * (`Content-Type: text/plain`-style resource capture).
    */
  private def warcRecords(df: DataFrame, idCol: String, urlCol: String,
                          textCol: String, http: Boolean): DataFrame = {
    import org.apache.spark.sql.functions._
    val payload =
      if (http) concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8" +
          "\r\nX-Crawler: graft\r\n\r\n"), col(textCol))
      else col(textCol)
    val ctype =
      if (http) "application/http; msgtype=response" else "text/plain"
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:graft:"),
      col(idCol).cast("string"),
      lit(">\r\nWARC-Target-URI: "), coalesce(col(urlCol), lit("-")),
      lit(s"\r\nContent-Type: $ctype"),
      lit("\r\nContent-Length: "), octet_length(payload).cast("string"),
      lit("\r\n\r\n"), payload, lit("\r\n\r\n"))
    df.select(rec.as("value"))
  }

  /** Parse a directory of WARC files back to `(doc_id, url, text)` — a
    * real byte-counted record walk, not a line reader, and a STREAMING
    * one: each task opens its file as an InputStream (gzip members
    * inflate incrementally through [[maybeGunzip]]), the scanner finds
    * each `WARC/1.0` header block, reads its headers up to the blank
    * line, takes EXACTLY `Content-Length` payload bytes (newlines inside
    * payloads cannot break framing), and EMITS the record before
    * touching the next one — per-task memory is O(largest record), never
    * O(archive). That is what survives real crawl shards (~1 GB gzipped
    * / 4-5 GB inflated each): a materialize-then-parse reader would pin
    * executor memory to the inflated archive size per task. Records of
    * types other than `response`, and records missing Content-Length,
    * are skipped — the tolerant-reader posture a real crawl archive
    * needs. Files are the parallelism unit (WARC is unsplittable by
    * construction), exactly one task per file.
    */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fsys = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fsys
      .globStatus(new org.apache.hadoop.fs.Path(path + "/*.txt*"))
      .map(_.getPath.toString).sorted.toSeq
    val bconf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val raw = p.getFileSystem(bconf.value.value).open(p)
        val in = maybeGunzip(new java.io.BufferedInputStream(raw, 1 << 16))
        // close on task end whether the iterator drains or the task dies
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case _: java.io.IOException => () }))
        parseWarcStream(in)
      }
    spark.createDataset(rdd).toDF("doc_id", "url", "text")
  }

  /** Wrap `in` in an incrementally-inflating, MEMBER-RESYNCING gzip
    * stream when it starts with the gzip magic; pass anything else
    * through untouched, so [[readWarc]] reads mixed plain/gz directories
    * with one code path. Member-resync matters: Common Crawl writes ONE
    * member per WARC record (that is what makes a record individually
    * seekable), and `GZIPInputStream` probes for another member header
    * after each trailer — one stream walk covers both the
    * one-member-per-file and one-member-per-record layouts.
    */
  def maybeGunzip(in: java.io.InputStream): java.io.InputStream = {
    val pb = new java.io.PushbackInputStream(in, 2)
    val head = new Array[Byte](2)
    var got = 0
    while (got < 2) {
      val n = pb.read(head, got, 2 - got)
      if (n < 0) { if (got > 0) pb.unread(head, 0, got); return pb }
      got += n
    }
    pb.unread(head, 0, 2)
    if (head(0) == 0x1f.toByte && head(1) == 0x8b.toByte)
      new java.util.zip.GZIPInputStream(pb, 1 << 16)
    else pb
  }

  /** Back-compat byte-array walk (specs and ad-hoc use): the same
    * streaming parser over an in-memory buffer, gzip-aware.
    */
  def parseWarc(bytes: Array[Byte]): Iterator[(Long, String, String)] =
    parseWarcStream(maybeGunzip(new java.io.ByteArrayInputStream(bytes)))

  /** The streaming record walk — O(largest record) memory by
    * construction: header lines read byte-wise off the (buffered)
    * stream, the payload read as ONE exact-length buffer, the record
    * emitted before the next byte of the archive is consumed. Truncated
    * tails (EOF inside a record) drop the partial record and stop —
    * tolerant, like the archive readers crawls actually run.
    */
  def parseWarcStream(in: java.io.InputStream)
      : Iterator[(Long, String, String)] =
    new Iterator[(Long, String, String)] {
      private var nextRec: (Long, String, String) = _
      private var eof = false

      /** Bytes up to `\n` as a string (`\r` stripped); null at EOF. A
        * final unterminated line still returns (then EOF).
        */
      private def readLine(): String = {
        var c = in.read()
        if (c < 0) { eof = true; return null }
        val buf = new java.io.ByteArrayOutputStream(96)
        while (c >= 0 && c != '\n') { buf.write(c); c = in.read() }
        if (c < 0) eof = true
        new String(buf.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8).stripSuffix("\r")
      }

      /** Exactly `len` payload bytes, or null on a truncated tail. */
      private def readFully(len: Int): Array[Byte] = {
        val buf = new Array[Byte](len)
        var off = 0
        while (off < len) {
          val n = in.read(buf, off, len - off)
          if (n < 0) { eof = true; return null }
          off += n
        }
        buf
      }

      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && !eof) {
          val l0 = readLine()
          if (l0 == null || l0.trim != "WARC/1.0") () // resync scan
          else {
            var id = -1L; var url: String = null; var len = -1L
            var typ: String = null; var ctype: String = null
            var line = readLine()
            while (line != null && line.nonEmpty) {
              val ci = line.indexOf(':')
              if (ci > 0) {
                val k = line.substring(0, ci).trim.toLowerCase
                val v = line.substring(ci + 1).trim
                k match {
                  case "warc-type" => typ = v
                  case "warc-target-uri" => url = v
                  case "content-type" => ctype = v.toLowerCase
                  case "content-length" =>
                    len = try v.toLong catch { case _: Exception => -1L }
                  case "warc-record-id" =>
                    val m = "urn:graft:(-?[0-9]+)".r.findFirstMatchIn(v)
                    id = m.map(_.group(1).toLong).getOrElse(-1L)
                  case _ => ()
                }
              }
              line = readLine()
            }
            if (line != null && len >= 0 && len <= Int.MaxValue) {
              val body = readFully(len.toInt)
              if (body != null) {
                val raw = new String(body,
                  java.nio.charset.StandardCharsets.UTF_8)
                // application/http records frame the CAPTURED RESPONSE:
                // status line + headers + blank line + body, all inside
                // Content-Length. The document is the body — skip the
                // header block (tolerating bare-\n captures). A record
                // with no blank line is all headers: empty body.
                val payload =
                  if (ctype != null && ctype.startsWith("application/http")) {
                    val crlf = raw.indexOf("\r\n\r\n")
                    val lf = raw.indexOf("\n\n")
                    if (crlf >= 0 && (lf < 0 || crlf <= lf))
                      raw.substring(crlf + 4)
                    else if (lf >= 0) raw.substring(lf + 2)
                    else ""
                  } else raw
                if (typ == "response")
                  nextRec = (id, if (url == "-") null else url, payload)
              }
            }
            // len < 0 (missing/huge Content-Length): fall through — the
            // resync scan walks to the next WARC/1.0 line
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): (Long, String, String) = {
        val r = nextRec; advance(); r
      }
    }
}
