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
    * magic per file and inflates ALL members before the record walk, so
    * per-record-member archives (the Common Crawl layout, which makes
    * single records randomly accessible) read back identically — the
    * reader never assumes one member per file.
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
    * real byte-offset record walk, not a line reader: each file loads
    * whole (`binaryFile`, one task per file), the scanner finds each
    * `WARC/1.0` header block, reads its headers up to the blank line,
    * takes EXACTLY `Content-Length` payload bytes (newlines inside
    * payloads cannot break framing), and resumes after the record
    * delimiter. Records of types other than `response`, and records
    * missing Content-Length, are skipped — the tolerant-reader posture a
    * real crawl archive needs.
    */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path + "/*.txt*")
      .select("content").as[Array[Byte]]
      .flatMap(b => Sources.parseWarc(Sources.gunzipMembers(b)))
      .toDF("doc_id", "url", "text")
  }

  /** Inflate a gzipped archive of one-or-MORE back-to-back gzip members
    * to its raw bytes; non-gzip input (no 1f 8b magic) passes through
    * untouched, so [[readWarc]] reads mixed plain/gz directories with one
    * code path. Member-resync matters: Common Crawl writes ONE member per
    * WARC record (that is what makes a record individually seekable), so
    * a reader that stopped at the first member trailer would see exactly
    * one record per file.
    */
  def gunzipMembers(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || bytes(0) != 0x1f.toByte || bytes(1) != 0x8b.toByte)
      return bytes
    // GZIPInputStream resyncs concatenated members itself (after each
    // trailer it probes for another member header) — one stream walk
    // covers both the one-member-per-file and one-member-per-record
    // layouts.
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 65536)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val chunk = new Array[Byte](65536)
    var n = in.read(chunk)
    while (n >= 0) { out.write(chunk, 0, n); n = in.read(chunk) }
    in.close()
    out.toByteArray
  }

  /** The per-file record walk — shared by [[readWarc]] and its spec. */
  def parseWarc(bytes: Array[Byte]): Iterator[(Long, String, String)] =
    new Iterator[(Long, String, String)] {
      private var pos = 0
      private var nextRec: (Long, String, String) = _
      private def lineAt(p: Int): (String, Int) = {
        var e = p
        while (e < bytes.length && bytes(e) != '\n') e += 1
        val raw = new String(bytes, p, e - p,
          java.nio.charset.StandardCharsets.UTF_8)
        (raw.stripSuffix("\r"), math.min(e + 1, bytes.length))
      }
      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && pos < bytes.length) {
          val (l0, p0) = lineAt(pos)
          if (l0.trim != "WARC/1.0") { pos = p0 }
          else {
            var p = p0
            var id = -1L; var url: String = null; var len = -1L
            var typ: String = null; var ctype: String = null
            var line = lineAt(p)
            while (line._1.nonEmpty) {
              val h = line._1
              val ci = h.indexOf(':')
              if (ci > 0) {
                val k = h.substring(0, ci).trim.toLowerCase
                val v = h.substring(ci + 1).trim
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
              p = line._2
              line = lineAt(p)
            }
            p = line._2 // past the blank header terminator
            if (len >= 0 && p + len <= bytes.length) {
              val raw = new String(bytes, p, len.toInt,
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
              pos = p + len.toInt
              if (typ == "response")
                nextRec = (id, if (url == "-") null else url, payload)
            } else pos = bytes.length // truncated tail: stop tolerant
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
