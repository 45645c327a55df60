package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.sources.WarcSource

/** The WARC intake: pack → read round trip, HTTP body extraction,
  * multi-byte Content-Length, poison-record resync, whole-file gzip,
  * and the response-only docs() projection.
  */
class WarcSourceSpec extends SparkSuite {

  private def t(s: String) = java.time.Instant.parse(s)

  test("WARC round trip: packed records read back verbatim; html is " +
      "the HTTP body; Content-Length counts BYTES of multi-byte text") {
    val dir = Files.createTempDirectory("graft-warc").toString
    val pages = Seq(
      ("http://a.example/x", "2026-01-02T03:04:05Z",
        "<html><body><p>plain page one with words</p></body></html>"),
      // multi-byte UTF-8: é and a CJK char — the byte length differs
      // from the char length, the classic Content-Length bug
      ("http://b.example/y", "2026-01-02T03:04:06Z",
        "<html><body><p>café 中 page two</p></body></html>"),
      // a page whose BODY contains a CRLF blank line: the HTTP-header
      // cut must split at the FIRST blank line only
      ("http://c.example/z", "2026-01-02T03:04:07Z",
        "<html>\r\n\r\n<body><p>tricky page three</p></body></html>"))
    val bytes = pages.flatMap { case (u, d, h) =>
      WarcSource.packRecord(u, t(d), h).toSeq }.toArray
    Files.write(java.nio.file.Paths.get(s"$dir/crawl.warc"), bytes)
    val got = WarcSource.read(spark, s"$dir/crawl.warc").collect()
      .map(r => (r.getAs[String]("url"),
        r.getAs[java.sql.Timestamp]("fetch_ts").toInstant.toString,
        r.getAs[String]("html"), r.getAs[String]("record_type")))
      .sortBy(_._1)
    assert(got.length == 3, s"got ${got.toSeq}")
    got.zip(pages.sortBy(_._1)).foreach { case ((u, d, h, rt), (wu, wd, wh)) =>
      assert(rt == "response")
      assert(u == wu && d == wd, s"($u,$d) != ($wu,$wd)")
      assert(h == wh, s"body mismatch for $u: '$h'")
    }
    // docs(): url-hashed doc_id, host as source
    val docs = WarcSource.docs(spark, s"$dir/crawl.warc").collect()
    assert(docs.length == 3)
    assert(docs.map(_.getAs[String]("source")).sorted.toSeq ==
      Seq("a.example", "b.example", "c.example"))
    assert(docs.map(_.getAs[Long]("doc_id")).distinct.length == 3)
  }

  test("source host rides the ONE shared derivation (WebOps.hostOf): " +
      "uppercase scheme/host, www and default port all normalize — " +
      "the r12 drift between the reader and the web family") {
    val dir = Files.createTempDirectory("graft-warc-host").toString
    val bytes = Seq(
      // RFC 3986-legal uppercase scheme — the old reader regex
      // ([a-z]+://) yielded an EMPTY source for this
      ("HTTP://WWW.Mixed.Example:80/a", "2026-01-02T03:04:05Z",
        "<html><body><p>one</p></body></html>"),
      ("https://plain.example:443/b", "2026-01-02T03:04:06Z",
        "<html><body><p>two</p></body></html>"))
      .flatMap { case (u, d, h) => WarcSource.packRecord(u, t(d), h).toSeq }
      .toArray
    Files.write(java.nio.file.Paths.get(s"$dir/crawl.warc"), bytes)
    val src = WarcSource.docs(spark, s"$dir/crawl.warc").collect()
      .map(_.getAs[String]("source")).sorted.toSeq
    assert(src == Seq("mixed.example", "plain.example"), s"got $src")
  }

  test("poison tolerance: a truncated record and inter-record garbage " +
      "cost themselves, never the archive; gzip reads transparently; " +
      "non-response records drop from docs()") {
    val dir = Files.createTempDirectory("graft-warc-poison").toString
    val good1 = WarcSource.packRecord("http://ok.example/1",
      t("2026-01-01T00:00:00Z"),
      "<html><body><p>first good page</p></body></html>")
    // truncated: claims 9999 payload bytes, delivers far fewer
    val truncated = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://bad.example/t\r\n" +
      "WARC-Date: 2026-01-01T00:00:01Z\r\n" +
      "Content-Length: 9999\r\n\r\nshort").getBytes(UTF_8)
    val garbage = "random noise between records\r\n".getBytes(UTF_8)
    // a request record (parsed, but filtered from docs())
    val request = ("WARC/1.0\r\nWARC-Type: request\r\n" +
      "WARC-Target-URI: http://ok.example/2\r\n" +
      "WARC-Date: 2026-01-01T00:00:02Z\r\n" +
      "Content-Length: 4\r\n\r\nGET /\r\n\r\n").getBytes(UTF_8)
    val good2 = WarcSource.packRecord("http://ok.example/3",
      t("2026-01-01T00:00:03Z"),
      "<html><body><p>second good page</p></body></html>")
    // the truncated record swallows everything after it in a naive
    // parser; here the resync must recover good2 (truncation consumes
    // the garbage+request bytes as its phantom payload would overlap
    // EOF, so the walk resumes at the next magic)
    val bytes = good1 ++ truncated ++ garbage ++ request ++ good2
    Files.write(java.nio.file.Paths.get(s"$dir/poison.warc"), bytes)
    val urls = WarcSource.read(spark, s"$dir/poison.warc").collect()
      .map(r => (r.getAs[String]("url"), r.getAs[String]("record_type")))
      .sortBy(_._1).toSeq
    assert(urls == Seq(("http://ok.example/1", "response"),
      ("http://ok.example/2", "request"),
      ("http://ok.example/3", "response")), s"got $urls")
    val docUrls = WarcSource.docs(spark, s"$dir/poison.warc").collect()
      .map(_.getAs[String]("url")).sorted.toSeq
    assert(docUrls ==
      Seq("http://ok.example/1", "http://ok.example/3"))
    // gzip: same archive compressed whole-file reads identically
    val gz = new java.io.ByteArrayOutputStream()
    val gzs = new java.util.zip.GZIPOutputStream(gz)
    gzs.write(bytes); gzs.close()
    Files.write(java.nio.file.Paths.get(s"$dir/poison.warc.gz"),
      gz.toByteArray)
    val gzUrls = WarcSource.read(spark, s"$dir/poison.warc.gz").collect()
      .map(_.getAs[String]("url")).sorted.toSeq
    assert(gzUrls == urls.map(_._1), s"gzip read diverged: $gzUrls")
  }

  test("warc docs feed the markup front door end-to-end") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-warc-extract").toString
    val html = "<html><head><script>if (a<b){x='<i>js</i>'}</script>" +
      "</head><body><nav><a href='/'>Home</a> | <a href='/b'>B</a></nav>" +
      "<p>the crawl page prose survives with plenty of words</p>" +
      "</body></html>"
    Files.write(java.nio.file.Paths.get(s"$dir/one.warc"),
      WarcSource.packRecord("http://w.example/p", t("2026-01-01T00:00:00Z"),
        html))
    val extracted = graft.operators.TextOps.textExtract(
      WarcSource.docs(spark, s"$dir/one.warc"), htmlCol = "html")
    val r = extracted.collect()(0)
    assert(r.getAs[String]("extract") ==
      "the crawl page prose survives with plenty of words",
      s"got $r")
  }
}
