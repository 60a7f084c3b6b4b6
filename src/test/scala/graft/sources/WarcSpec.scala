package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** [[Warc]] record framing — the cases a boundary-scanning splitter
  * gets wrong: payloads CONTAINING record-header-shaped bytes, the
  * warcinfo/metadata records a consumer must route past, and broken
  * framing that must fail loudly instead of silently resynchronizing. */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def rec(wtype: String, uri: String, payload: Array[Byte],
      extraHeaders: String = ""): Array[Byte] = {
    val head = (s"WARC/1.0\r\nWARC-Type: $wtype\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" + extraHeaders +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF_8)
    head ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def http(status: String, ctype: String,
      body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 $status\r\nContent-Type: $ctype\r\n\r\n")
      .getBytes(UTF_8) ++ body

  test("parseContainer: Content-Length framing survives a payload that " +
      "contains header-shaped bytes; warcinfo routes through") {
    // the adversarial body: looks EXACTLY like a record boundary — a
    // scan-for-WARC/ splitter would cut here, the framed parser must not
    val trap = "\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n".getBytes(UTF_8)
    val container =
      rec("warcinfo", "", "software: graft\r\n".getBytes(UTF_8)) ++
        rec("response", "https://example.com/a",
          http("200 OK", "text/plain", "hello a".getBytes(UTF_8) ++ trap)) ++
        rec("metadata", "https://example.com/a",
          "fetchDurationMs: 12\r\n".getBytes(UTF_8)) ++
        rec("response", "https://example.com/b",
          http("404 Not Found", "text/html", "gone".getBytes(UTF_8)))
    val rs = Warc.parseContainer(7L, container)
    assert(rs.map(_.warc_type) ==
      Seq("warcinfo", "response", "metadata", "response"))
    assert(rs.map(_.rec_idx) == Seq(0, 1, 2, 3))
    assert(rs(1).target_uri == "https://example.com/a")
    assert(rs(0).target_uri == "")
    // the trap bytes are INSIDE record 1's payload, intact
    assert(new String(rs(1).payload, UTF_8).contains("WARC/1.0"))
    val h = Warc.parseHttp(rs(1).payload).get
    assert(h.status == 200 && h.content_type == "text/plain")
    assert(new String(h.body, UTF_8).startsWith("hello a"))
    assert(Warc.parseHttp(rs(3).payload).get.status == 404)
    // non-HTTP payloads are None, never a crash
    assert(Warc.parseHttp(rs(2).payload).isEmpty)
  }

  test("parseContainer: broken framing fails loudly") {
    val good = rec("response", "https://x.test/1",
      http("200 OK", "text/plain", "ok".getBytes(UTF_8)))
    // truncate the final CRLF CRLF trailer
    val truncated = good.dropRight(2)
    val e1 = intercept[IllegalArgumentException] {
      Warc.parseContainer(0L, truncated)
    }
    assert(e1.getMessage.contains("warc"))
    // Content-Length pointing past the container end
    val lied = new String(good, UTF_8)
      .replaceFirst("Content-Length: \\d+", "Content-Length: 99999")
      .getBytes(UTF_8)
    val e2 = intercept[IllegalArgumentException] {
      Warc.parseContainer(0L, lied)
    }
    assert(e2.getMessage.contains("Content-Length") ||
      e2.getMessage.contains("past container end"))
  }

  test("parseHttp is total over crawl garbage: doubled-space status, " +
      "overlong status token, LF-only headers, unterminated blocks") {
    // doubled space -> empty status token: None, never NumberFormat
    assert(Warc.parseHttp(
      "HTTP/1.1  200 OK\r\n\r\nbody".getBytes(UTF_8)).isEmpty)
    // >9-digit status token would overflow toInt: None
    assert(Warc.parseHttp(
      "HTTP/1.1 99999999999 X\r\n\r\nbody".getBytes(UTF_8)).isEmpty)
    // header block that never terminates: None, never an exception
    assert(Warc.parseHttp(
      "HTTP/1.1 200 OK\r\nContent-Type: text/plain".getBytes(UTF_8)).isEmpty)
    // bare-LF headers (real origin servers emit them; the WARC payload
    // preserves bytes verbatim) parse fine
    val lf = Warc.parseHttp(
      "HTTP/1.1 200 OK\nContent-Type: text/html\n\nhello".getBytes(UTF_8)).get
    assert(lf.status == 200 && lf.content_type == "text/html" &&
      new String(lf.body, UTF_8) == "hello")
    // a response record with unparseable HTTP becomes a status -1
    // ledger row (audit discipline), not a job-killing exception
    import spark.implicits._
    val bad = rec("response", "https://x.test/garbage",
      "NOT HTTP AT ALL".getBytes(UTF_8))
    val out = Warc.httpResponses(
        Warc.records(Seq((5L, bad)).toDF("container_id", "warc"),
          "container_id", "warc"))
      .collect()
    assert(out.length == 1 && out(0).getInt(3) == -1 &&
      new String(out(0).getAs[Array[Byte]](5), UTF_8) == "NOT HTTP AT ALL")
  }

  test("gunzipMembers inflates ACROSS member boundaries (the .warc.gz " +
      "layout: one gzip member per record)") {
    def gzip(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    val r0 = rec("warcinfo", "", "software: graft\r\n".getBytes(UTF_8))
    val r1 = rec("response", "https://x.test/m",
      http("200 OK", "text/plain", "member two".getBytes(UTF_8)))
    // two INDEPENDENT members concatenated — a single-member reader
    // stops after r0 and silently loses r1
    val container = gzip(r0) ++ gzip(r1)
    assert(Warc.gunzipMembers(container).toSeq == (r0 ++ r1).toSeq)
    val rs = Warc.parseContainer(0L, Warc.gunzipMembers(container))
    assert(rs.map(_.warc_type) == Seq("warcinfo", "response"))
  }

  test("records/httpResponses: distributed explode keeps container ids " +
      "and per-container indexes") {
    val c0 =
      rec("warcinfo", "", "software: graft\r\n".getBytes(UTF_8)) ++
        rec("response", "https://x.test/0",
          http("200 OK", "text/plain", "zero".getBytes(UTF_8)))
    val c1 =
      rec("warcinfo", "", "software: graft\r\n".getBytes(UTF_8)) ++
        rec("response", "https://x.test/1",
          http("200 OK", "text/plain", "one".getBytes(UTF_8))) ++
        rec("response", "https://x.test/2",
          http("301 Moved Permanently", "", "two".getBytes(UTF_8)))
    import spark.implicits._
    val df = Seq((0L, c0), (1L, c1)).toDF("container_id", "warc")
      .repartition(3)
    val out = Warc.httpResponses(Warc.records(df, "container_id", "warc"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3), new String(r.getAs[Array[Byte]](5), UTF_8)))
      .sortBy(x => (x._1, x._2))
    assert(out.toSeq == Seq(
      (0L, 1, "https://x.test/0", 200, "zero"),
      (1L, 1, "https://x.test/1", 200, "one"),
      (1L, 2, "https://x.test/2", 301, "two")))
  }
}
