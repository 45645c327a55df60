package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal WARC (ISO 28500) record reader — the one previously
  * un-owned stage between a crawl dump and the markup front door
  * (r11 verdict What's-missing #3): published pipeline recipes (C4,
  * RefinedWeb) start from Common-Crawl-shaped WARC archives, and this
  * source turns them into the (doc_id, html, fetch_ts) frames
  * `textExtract` / `curateCorpusFromHtml` consume.
  *
  * Format handled (the public spec's response path): records are
  * `WARC/1.x\r\n` + header lines (`Name: value`) + blank line +
  * `Content-Length` payload bytes + record separator; a `response`
  * record's payload is an HTTP response whose body (after the HTTP
  * header block) is the page. Whole-file gzip is detected by magic
  * bytes — per-record gzip members (the Common Crawl convention)
  * concatenate transparently under one GZIP stream.
  *
  * Poison tolerance (spec-asserted): a malformed record — truncated
  * payload, bad Content-Length, garbage between records — never kills
  * the file; the parser RESYNCS to the next `WARC/1.` magic and
  * continues, so one corrupt record costs itself, not the archive.
  *
  * Scale shape: `binaryFile` hands each archive file to one task —
  * exactly the distribution unit crawls ship (thousands of ~1 GB
  * files), so parallelism is the file count and no record straddles a
  * split. The honest bound, stated: a file must fit in a task's
  * memory (the WARC-distribution convention keeps files ~1 GB; set
  * executor memory accordingly, or pre-split bigger archives).
  */
object WarcSource {

  /** One parsed record: `html` is the HTTP body for `response`
    * records (whole payload otherwise), `fetch_ts` the WARC-Date.
    */
  private[sources] case class Rec(file: String, record_type: String,
    url: String, fetch_ts: java.sql.Timestamp, html: String,
    n_bytes: Long)

  /** All parseable records of every WARC file under `path`. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) => parseWarc(file, maybeGunzip(bytes)) }
      .toDF()
  }

  /** The crawl-intake projection: `response` records as
    * (doc_id, url, html, fetch_ts, source) — doc_id a content-free
    * xxhash64 of the url (stable across re-fetches of the same page;
    * re-crawl versioning is snapshotDiff's job on the TEXT, not the
    * reader's), source the url's host.
    */
  def docs(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .where(col("record_type") === "response")
      .select(xxhash64(col("url")).as("doc_id"), col("url"), col("html"),
        col("fetch_ts"),
        // the ONE host derivation (WebOps.hostOf — r12 verdict: the
        // reader's private regex dropped uppercase-scheme hosts, RFC
        // 3986-legal, and kept port/www/case, so host-keyed joins
        // against web-family frames silently missed)
        graft.operators.WebOps.hostOf(col("url")).as("source"))

  /** STREAMING twin of [[docs]] — WARC archives landing in a
    * directory become a page STREAM (the Common Crawl hand-off shape:
    * a fetcher drops finished ~1 GB archives into a landing dir; each
    * new file is one micro-batch unit): `binaryFile` as a file-stream
    * source (it is a plain FileFormat, so the processed-file log /
    * checkpoint semantics are the standard file-source ones — same
    * contract as [[graft.streaming.DocStream.fromFiles]]), then the
    * SAME parse as batch (`parseWarc` + gunzip — one definition, no
    * drift), projected to the page-stream schema
    * ([[graft.streaming.DocStream.pageSchema]]: doc_id, html, lang,
    * source, ingest_ts). `lang` is `und` at intake — language is a
    * downstream gate's job ([[graft.operators.TextOps.langId]]), not
    * the reader's; `ingest_ts` is the record's WARC-Date (the crawl's
    * own event time, the correct watermark column for the curation
    * chain's dedup state). Poison tolerance rides the shared parser:
    * a malformed record costs itself, a malformed FILE costs its
    * parseable tail, never the query.
    */
  def pagesStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    // the streaming file source requires an explicit schema;
    // binaryFile's is FIXED by the format (path, modificationTime,
    // length, content) — stated here verbatim rather than imported
    // from Spark's execution-internal BinaryFileFormat object
    val binSchema = new org.apache.spark.sql.types.StructType()
      .add("path", org.apache.spark.sql.types.StringType)
      .add("modificationTime", org.apache.spark.sql.types.TimestampType)
      .add("length", org.apache.spark.sql.types.LongType)
      .add("content", org.apache.spark.sql.types.BinaryType)
    val reader = spark.readStream.format("binaryFile").schema(binSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) => parseWarc(file, maybeGunzip(bytes)) }
      .toDF()
      .where(col("record_type") === "response")
      .select(xxhash64(col("url")).as("doc_id"), col("url"), col("html"),
        lit("und").as("lang"),
        // same shared derivation as [[docs]] — one definition, no drift
        graft.operators.WebOps.hostOf(col("url")).as("source"),
        col("fetch_ts").as("ingest_ts"))
  }

  private def maybeGunzip(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
        (bytes(1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } else bytes

  private val Magic = "WARC/1.".getBytes(UTF_8)

  private def indexOfMagic(bytes: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i <= bytes.length - Magic.length) {
      var j = 0
      while (j < Magic.length && bytes(i + j) == Magic(j)) j += 1
      if (j == Magic.length) return i
      i += 1
    }
    -1
  }

  private def indexOfBlank(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
        bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Tolerant single-pass record walk with resync-on-malformed. */
  private[sources] def parseWarc(file: String,
      bytes: Array[Byte]): Seq[Rec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Rec]
    var pos = indexOfMagic(bytes, 0)
    while (pos >= 0) {
      val hdrEnd = indexOfBlank(bytes, pos)
      var next = -1
      if (hdrEnd >= 0) {
        val hdrText = new String(bytes, pos, hdrEnd - pos, UTF_8)
        val headers = hdrText.split("\r\n").drop(1).flatMap { line =>
          val cut = line.indexOf(':')
          if (cut > 0)
            Some(line.substring(0, cut).trim.toLowerCase ->
              line.substring(cut + 1).trim)
          else None
        }.toMap
        val lenOk = headers.get("content-length")
          .flatMap(v => scala.util.Try(v.toLong).toOption)
        lenOk match {
          case Some(len) if len >= 0 &&
              hdrEnd + 4 + len <= bytes.length.toLong =>
            val bodyStart = hdrEnd + 4
            val payload = new String(bytes, bodyStart, len.toInt, UTF_8)
            val recordType = headers.getOrElse("warc-type", "unknown")
            // a response payload is an HTTP message: the page body
            // starts after the HTTP header block
            val html =
              if (payload.startsWith("HTTP/")) {
                val cut = payload.indexOf("\r\n\r\n")
                if (cut >= 0) payload.substring(cut + 4) else ""
              } else payload
            val ts = scala.util.Try(java.sql.Timestamp.from(
              java.time.Instant.parse(
                headers.getOrElse("warc-date", "")))).toOption
              .getOrElse(new java.sql.Timestamp(0L))
            out += Rec(file, recordType,
              headers.getOrElse("warc-target-uri", ""), ts, html, len)
            next = bodyStart + len.toInt
          case _ =>
            // bad/absent length or truncated payload: this record is
            // lost, the archive is not — resync past the magic
            next = pos + Magic.length
        }
      } else {
        next = pos + Magic.length
      }
      pos = indexOfMagic(bytes, next)
    }
    out.toSeq
  }

  /** Pack one WARC response record — the fixture/round-trip writer
    * (and the documented pre-extraction contract in reverse):
    * Content-Length counts payload BYTES (multi-byte UTF-8 included),
    * the payload is a minimal HTTP response wrapping `html`.
    */
  def packRecord(url: String, date: java.time.Instant,
      html: String): Array[Byte] = {
    val body = html.getBytes(UTF_8)
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n")
      .getBytes(UTF_8)
    val payloadLen = http.length + body.length
    val hdr = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"WARC-Date: $date\r\n" +
      s"Content-Length: $payloadLen\r\n" +
      "\r\n").getBytes(UTF_8)
    val sep = "\r\n\r\n".getBytes(UTF_8)
    hdr ++ http ++ body ++ sep
  }
}
