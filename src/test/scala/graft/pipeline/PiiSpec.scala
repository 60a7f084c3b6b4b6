package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PII detection/redaction invariants (hand-computed fixtures). */
class PiiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scrub counts and redacts emails, phones, IPs by hand") {
    val docs = Seq(
      (1L, "mail me at alice.smith+x@sub.example.org thanks"),
      (2L, "call +1-555-0123 or +1-555-9999 tomorrow"),
      (3L, "server 192.168.0.1 and 10.0.0.255 are up"),
      (4L, "a@b.co pinged 127.0.0.1 at +1-202-5550"),
      (5L, "no pii in this one at all"))
      .toDF("doc_id", "text")
    val out = Pii.scrub(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(out(1L) == ((1L, 0L, 0L, 1L, "mail me at <EMAIL> thanks")))
    assert(out(2L) == ((0L, 2L, 0L, 2L, "call <PHONE> or <PHONE> tomorrow")))
    assert(out(3L) == ((0L, 0L, 2L, 2L, "server <IP> and <IP> are up")))
    assert(out(4L) == ((1L, 1L, 1L, 3L, "<EMAIL> pinged <IP> at <PHONE>")))
    assert(out(5L) == ((0L, 0L, 0L, 0L, "no pii in this one at all")))
  }

  test("ip pattern needs word boundaries and four octets") {
    val docs = Seq(
      (1L, "version 1.2.3 shipped"),        // three groups — no match
      (2L, "build20.1.2.3.4tag"),           // no word boundary on either end
      (3L, "x 1.2.3.4 y"))                  // clean match
      .toDF("doc_id", "text")
    val out = Pii.scrub(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) == 0L)
    // every 4-octet window lacks a boundary: "20.1.2.3" follows the
    // word char 'd', "1.2.3.4" is followed by the word char 't'
    assert(out(2L) == 0L)
    assert(out(3L) == 1L)
  }

  test("select form and append form agree") {
    val docs = Seq(
      (1L, "a@b.co and 1.2.3.4"),
      (2L, "plain")).toDF("doc_id", "text")
    val s = Pii.scrub(docs, "doc_id", "text")
      .select("doc_id", "n_emails", "n_phones", "n_ips", "n_pii", "redacted")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val a = Pii.withScrub(docs, "text")
      .select("doc_id", "n_emails", "n_phones", "n_ips", "n_pii", "redacted")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(s == a)
  }
}
