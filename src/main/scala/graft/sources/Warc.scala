package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record-framed container parsing — the format real
  * crawls actually arrive in (Common Crawl et al.), and the missing
  * first stage ahead of the charset front door: a crawl file is a
  * SEQUENCE of records, each a version line + named-field header block
  * + `Content-Length`-framed payload + a blank-line trailer. The
  * reference ingests pre-extracted JSON (`JacksonScheme.java`); a
  * 100 TB training-data pipeline starts one step earlier, at the
  * container.
  *
  * Framing discipline: the payload is sliced by `Content-Length` and
  * NEVER by boundary scanning — payload bytes are arbitrary (they
  * routinely contain things that look like record headers), so
  * scan-for-`WARC/` splitters corrupt real crawls. Malformed framing
  * fails LOUDLY with the byte offset (the house require discipline):
  * a silently skipped record is invisible data loss at corpus scale.
  *
  * Scale shape: parallelism is PER CONTAINER FILE — a real crawl is
  * millions of ~1 GB WARC files, one task each
  * (`spark.read.format("binaryFile")` or a file-manifest join), which
  * is exactly how crawl processors shard; within one container the
  * format is inherently sequential (each record's start is known only
  * after the previous record's `Content-Length`), so the kernel is a
  * single forward walk, zero copies beyond the payload slices.
  * Documented bound: members are assumed UNCOMPRESSED here —
  * production Common Crawl files gzip each record as its own member;
  * that layer is a per-member `GZIPInputStream` ahead of this parser
  * and orthogonal to the framing logic under test.
  */
object Warc {

  /** One parsed WARC record: container-relative index, the three
    * headers every consumer needs (type/URI/date), declared payload
    * length, and the payload bytes. */
  case class WarcRecord(container_id: Long, rec_idx: Int,
    warc_type: String, target_uri: String, warc_date: String,
    content_length: Long, payload: Array[Byte])

  /** An HTTP response payload split at its header/body boundary. */
  case class HttpPayload(status: Int, content_type: String,
    body: Array[Byte])

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  // HTTP/1.1 header lines stay ASCII-decoded (token charset per spec;
  // non-ASCII HTTP header bytes are crawl garbage, not URIs)
  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  /** Read one CRLF-terminated header line starting at `pos`; returns
    * (line-without-CRLF, position after CRLF). Header NAMES are ASCII
    * by spec, but WARC 1.0 permits UTF-8 in field VALUES (notably
    * WARC-Target-URI), so lines decode as UTF-8 (ADVICE r18: the old
    * US-ASCII decode silently turned non-ASCII URI bytes into U+FFFD,
    * corrupting the xxhash64-derived doc_ids instead of failing
    * loudly; UTF-8 decodes them faithfully — and ASCII headers decode
    * identically under either charset, so framing is unchanged). */
  private def readLine(b: Array[Byte], pos: Int): (String, Int) = {
    var i = pos
    while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
    require(i + 1 < b.length,
      s"warc: unterminated header line at byte $pos")
    (new String(b, pos, i - pos, Utf8), i + 2)
  }

  /** Parse one uncompressed WARC container into its records — a single
    * forward walk over version line + header block +
    * `Content-Length`-framed payload + CRLF CRLF trailer, repeated to
    * end-of-container. Header names are case-insensitive (spec);
    * records missing `WARC-Target-URI` (warcinfo, metadata) carry "". */
  def parseContainer(containerId: Long, bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer[WarcRecord]()
    var pos = 0
    var idx = 0
    while (pos < bytes.length) {
      val (version, p1) = readLine(bytes, pos)
      require(version.startsWith("WARC/"),
        s"warc: expected version line at byte $pos, got '${version.take(20)}'")
      var p = p1
      var warcType = ""
      var uri = ""
      var date = ""
      var clen = -1L
      var done = false
      while (!done) {
        val (line, np) = readLine(bytes, p)
        p = np
        if (line.isEmpty) done = true
        else {
          val c = line.indexOf(':')
          require(c > 0, s"warc: malformed header '$line' at byte $pos")
          val name = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(c + 1).trim
          name match {
            case "warc-type" => warcType = value
            case "warc-target-uri" => uri = value
            case "warc-date" => date = value
            case "content-length" => clen = value.toLong
            case _ => () // other named fields pass through unexamined
          }
        }
      }
      require(clen >= 0, s"warc: record at byte $pos missing Content-Length")
      require(p + clen + 4 <= bytes.length,
        s"warc: record at byte $pos declares $clen payload bytes past " +
          s"container end (${bytes.length})")
      val payload = java.util.Arrays.copyOfRange(bytes, p, (p + clen).toInt)
      p = (p + clen).toInt
      require(bytes(p) == '\r' && bytes(p + 1) == '\n' &&
        bytes(p + 2) == '\r' && bytes(p + 3) == '\n',
        s"warc: record at byte $pos not followed by CRLF CRLF " +
          s"(Content-Length framing broken)")
      pos = p + 4
      out += WarcRecord(containerId, idx, warcType, uri, date, clen, payload)
      idx += 1
    }
    out.toSeq
  }

  /** Tolerant HTTP line reader: accepts CRLF or bare LF terminators
    * (origin servers emit both, and the WARC payload preserves the
    * bytes verbatim — only the WARC FRAMING layer is spec-strict
    * CRLF); None when no terminator exists before end-of-payload. */
  private def readHttpLine(b: Array[Byte], pos: Int): Option[(String, Int)] = {
    var i = pos
    while (i < b.length && b(i) != '\n') i += 1
    if (i >= b.length) None
    else {
      val end = if (i > pos && b(i - 1) == '\r') i - 1 else i
      Some((new String(b, pos, end - pos, Ascii), i + 1))
    }
  }

  /** Split an HTTP response payload (status line + headers + blank
    * line + body) — the `application/http; msgtype=response` payload
    * every crawl response record carries. None when the payload is
    * not parseable HTTP (missing/empty/oversized status token,
    * unterminated header block) — callers keep the record and route
    * it; never a silent drop, never an exception on crawl garbage. */
  def parseHttp(payload: Array[Byte]): Option[HttpPayload] = {
    if (payload.length < 12 ||
      !new String(payload, 0, 5, Ascii).equals("HTTP/")) return None
    val first = readHttpLine(payload, 0).getOrElse(return None)
    val parts = first._1.split(" ", 3)
    // a doubled space yields an EMPTY token (forall on "" is vacuously
    // true) and >9 digits would overflow toInt — both are not-HTTP here
    if (parts.length < 2 || parts(1).isEmpty || parts(1).length > 9 ||
      !parts(1).forall(_.isDigit)) return None
    var p = first._2
    var ctype = ""
    var done = false
    while (!done) {
      readHttpLine(payload, p) match {
        case None => return None // header block never terminates
        case Some((line, np)) =>
          p = np
          if (line.isEmpty) done = true
          else {
            val c = line.indexOf(':')
            if (c > 0 && line.substring(0, c).trim
                .equalsIgnoreCase("content-type"))
              ctype = line.substring(c + 1).trim
                .toLowerCase(java.util.Locale.ROOT)
          }
      }
    }
    Some(HttpPayload(parts(1).toInt, ctype,
      java.util.Arrays.copyOfRange(payload, p, payload.length)))
  }

  /** Inflate a MULTI-MEMBER gzip stream — the production WARC layout
    * (Common Crawl gzips each record as its own member, so a reader
    * can seek to a member boundary and start there; a single-member
    * reader silently stops after record one, which is exactly the
    * data-loss mode this helper exists to not have). `GZIPInputStream`
    * handles member concatenation natively; the output is the plain
    * container [[parseContainer]] consumes. */
  def gunzipMembers(gz: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(gz), 8192)
    // long math: `gz.length * 4` wraps negative for >= 512 MB inputs —
    // exactly the ~1 GB production containers this path advertises
    val out = new java.io.ByteArrayOutputStream(
      math.min(Int.MaxValue - 8L, gz.length.toLong * 4).toInt)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    in.close()
    out.toByteArray
  }

  /** Containers → exploded records: one input row per WARC container
    * (id, bytes), one output row per record. mapPartitions kernel (the
    * [[graft.pipeline.Multimodal]] discipline) — payload bytes move
    * map-side only; nothing shuffles here. `gzipped = true` inflates
    * each container's member-concatenated gzip stream first (the
    * Common Crawl `.warc.gz` layout). */
  def records(containers: DataFrame, idCol: String,
      bytesCol: String, gzipped: Boolean = false): Dataset[WarcRecord] = {
    import containers.sparkSession.implicits._
    containers.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseContainer(id, if (gzipped) gunzipMembers(bytes) else bytes)
      })
  }

  /** Response-record projection: records of warc_type `response` with
    * their HTTP payload split out — (container_id, rec_idx, target_uri,
    * http_status, content_type, body). A response record whose payload
    * is NOT parseable HTTP (crawl garbage happens) emits a ledger row
    * with `http_status = -1` and the raw payload as body — the
    * audit-ledger discipline: never a silent drop, and never one
    * malformed page killing a months-running ingest (a 2xx filter
    * downstream excludes these; a corruption report counts them). */
  def httpResponses(recs: Dataset[WarcRecord]): DataFrame = {
    import recs.sparkSession.implicits._
    recs.filter(_.warc_type == "response")
      .map { r =>
        parseHttp(r.payload) match {
          case Some(h) => (r.container_id, r.rec_idx, r.target_uri,
            h.status, h.content_type, h.body)
          case None => (r.container_id, r.rec_idx, r.target_uri,
            -1, "", r.payload)
        }
      }
      .toDF("container_id", "rec_idx", "target_uri", "http_status",
        "content_type", "body")
  }
}
