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
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6)))).toMap
    assert(out(1L) == ((1L, 0L, 0L, 0L, 1L, "mail me at <EMAIL> thanks")))
    assert(out(2L) == ((0L, 2L, 0L, 0L, 2L, "call <PHONE> or <PHONE> tomorrow")))
    assert(out(3L) == ((0L, 0L, 2L, 0L, 2L, "server <IP> and <IP> are up")))
    assert(out(4L) == ((1L, 1L, 1L, 0L, 3L, "<EMAIL> pinged <IP> at <PHONE>")))
    assert(out(5L) == ((0L, 0L, 0L, 0L, 0L, "no pii in this one at all")))
  }

  test("card excision: Luhn-valid runs spliced, invalid and non-card runs kept") {
    // 4539578763621486 is Luhn-valid; 4539578763621487 is not;
    // 79927398713 (11 digits) is valid Luhn but below card length;
    // a 21-digit run is never a candidate (maximal-run rule)
    val docs = Seq(
      (1L, "pay 4539578763621486 now"),
      (2L, "ref 4539578763621487 kept"),
      (3L, "short 79927398713 kept"),
      (4L, "burial 453957876362148612345 kept"),
      (5L, "two 4539578763621486 and 4539578763621486 gone"),
      (6L, "mixed a@b.co 4539578763621486 1.2.3.4"))
      .toDF("doc_id", "text")
    val out = Pii.scrub(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(4), r.getLong(5), r.getString(6)))).toMap
    assert(out(1L) == ((1L, 1L, "pay <CARD> now")))
    assert(out(2L) == ((0L, 0L, "ref 4539578763621487 kept")))
    assert(out(3L) == ((0L, 0L, "short 79927398713 kept")))
    assert(out(4L) == ((0L, 0L, "burial 453957876362148612345 kept")))
    assert(out(5L) == ((2L, 2L, "two <CARD> and <CARD> gone")))
    // composed: regex placeholders first, card excision last, n_pii
    // totals all four kinds
    assert(out(6L) == ((1L, 3L, "mixed <EMAIL> <CARD> <IP>")))
  }

  test("grouped card excision: uniform separators excised, mixed/misshapen kept") {
    val docs = Seq(
      (1L, "pay 4539 5787 6362 1486 now"),          // 4-4-4-4 spaces, valid
      (2L, "pay 4539-5787-6362-1486 now"),          // hyphens, valid
      (3L, "amex 3782 822463 10005 ok"),            // 4-6-5, valid
      (4L, "mixed 4539-5787 6362 1486 kept"),       // separators differ
      (5L, "bad 4539 5787 6362 1487 kept"),         // checksum fails
      (6L, "fmt 1 000 000 000 000 00 kept"),        // group sizes 1,3,…
      (7L, "shape 4539 5787 63621486 kept"),        // 4-4-8: group > 6
      (8L, "tel 555-1234 short 12-34 kept"))        // far below 13 digits
      .toDF("doc_id", "text")
    val out = Pii.scrub(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(4), r.getString(6)))).toMap
    assert(out(1L) == ((1L, "pay <CARD> now")))
    assert(out(2L) == ((1L, "pay <CARD> now")))
    assert(out(3L) == ((1L, "amex <CARD> ok")))
    assert(out(4L) == ((0L, "mixed 4539-5787 6362 1486 kept")))
    assert(out(5L) == ((0L, "bad 4539 5787 6362 1487 kept")))
    assert(out(6L) == ((0L, "fmt 1 000 000 000 000 00 kept")))
    assert(out(7L) == ((0L, "shape 4539 5787 63621486 kept")))
    assert(out(8L) == ((0L, "tel 555-1234 short 12-34 kept")))
  }

  test("IBAN report: real-world valid IBANs verify, checksum/shape " +
      "failures do not") {
    val docs = Seq(
      (1L, "send to DE89370400440532013000 please"),   // valid (DE example)
      (2L, "or GB82WEST12345698765432 works"),         // valid, letters in BBAN
      (3L, "fr FR1420041010050500013M02606 too"),      // valid, mixed alnum
      (4L, "bad DE89370400440532013001 checksum"),     // last digit off
      (5L, "shape de89370400440532013000 lower"),      // lowercase: not a candidate
      (6L, "buried 7DE89370400440532013000 run"),      // digit prefix: shape broken
      (7L, "short DE8912345 nope"),                    // under 15 chars
      (8L, "two DE89370400440532013000 and GB82WEST12345698765432"))
      .toDF("doc_id", "text")
    val out = Pii.ibanReport(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((1L, 1L, true)))
    assert(out(2L) == ((1L, 1L, true)))
    assert(out(3L) == ((1L, 1L, true)))
    assert(out(4L) == ((1L, 0L, false)))
    assert(out(5L) == ((0L, 0L, false)))
    assert(out(6L) == ((0L, 0L, false)))
    assert(out(7L) == ((0L, 0L, false)))
    assert(out(8L) == ((2L, 2L, true)))
  }

  test("an adjacent short number cannot shield a contiguous card " +
      "(per-group fallback inside a failed grouped span)") {
    val docs = Seq(
      // trailing amount / leading quantity absorb the card into a
      // grouped span whose shape fails — the card group must still go
      (1L, "pay 4539578763621486 42 dollars"),
      (2L, "order 12 4539578763621486 now"),
      (3L, "a 4539578763621486-7 b"),
      // non-card group beside a failing span stays verbatim
      (4L, "ids 4539578763621487 42 kept"))
      .toDF("doc_id", "text")
    val out = Pii.scrub(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(4), r.getString(6)))).toMap
    assert(out(1L) == ((1L, "pay <CARD> 42 dollars")))
    assert(out(2L) == ((1L, "order 12 <CARD> now")))
    assert(out(3L) == ((1L, "a <CARD>-7 b")))
    assert(out(4L) == ((0L, "ids 4539578763621487 42 kept")))
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

  test("cardReport: Luhn verification by hand — known-valid/invalid " +
      "numbers, length boundaries, maximal-run exclusion, multiples") {
    import spark.implicits._
    val docs = Seq(
      // the canonical test PAN (valid) and its off-by-one (invalid)
      (1L, "pay 4111111111111111 now"),
      (2L, "pay 4111111111111112 now"),
      // 13-digit (valid Visa-style test number) and 19-digit boundary
      // (constructed: 18 base digits + computed check digit)
      (3L, "v13 4222222222222 ok"),
      (4L, "v19 6221261111111111113 ok"),
      // 12 and 20 digit runs are not candidates at all
      (5L, "n12 411111111111 and n20 41111111111111111111"),
      // a valid card buried in a longer run is NOT a candidate
      (6L, "ref 411111111111111112345"),
      // two candidates, one valid one not
      (7L, "a 4111111111111111 b 4111111111111113"),
      (8L, "no digits here"))
      .toDF("doc_id", "text").repartition(5)
    val got = Pii.cardReport(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((1L, 1L, true)))
    assert(got(2L) == ((1L, 0L, false)))
    assert(got(3L) == ((1L, 1L, true)))
    assert(got(4L) == ((1L, 1L, true)))
    assert(got(5L) == ((0L, 0L, false)))
    assert(got(6L) == ((0L, 0L, false)))
    assert(got(7L) == ((2L, 1L, true)))
    assert(got(8L) == ((0L, 0L, false)))
    // independent Luhn reimplementation over the planted candidates
    def luhn(s: String): Boolean = {
      val ds = s.map(_ - '0')
      ds.reverse.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
      }.sum % 10 == 0
    }
    assert(luhn("4111111111111111") && !luhn("4111111111111112") &&
      luhn("4222222222222") && luhn("6221261111111111113") &&
      !luhn("4111111111111113"))
  }
}
