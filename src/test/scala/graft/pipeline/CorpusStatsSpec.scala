package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computed fixtures for the corpus-statistics operators:
  * bigram-LM surprisal, boilerplate line removal, Misra-Gries heavy
  * hitters, and the Zipf-law OLS fit. */
class CorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("bigram surprisal: add-one-smoothed model, hand-computed") {
    // corpus bigrams: d1 "a b a b" -> (a,b) (b,a) (a,b); d2 "a b c" ->
    // (a,b) (b,c); d3 "x" -> none. c12: (a,b)=3 (b,a)=1 (b,c)=1;
    // c1: a=3 b=2; V = |{a,b,c,x}| = 4.
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = TextMetrics.bigramSurprisalFromVocab(docs, "doc_id", "text",
        Seq(4L).toDF("v"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L)) // d3 has no bigrams
    val d2 = math.log((3.0 + 4.0) / (3.0 + 1.0)) + // (a,b)
      math.log((2.0 + 4.0) / (1.0 + 1.0))          // (b,c)
    assert(out(2L)._1 == 2L)
    assert(math.abs(out(2L)._2 - d2) < 1e-5)
    assert(math.abs(out(2L)._3 - d2 / 2.0) < 1e-5)
    val d1 = 2.0 * math.log(7.0 / 4.0) + math.log((2.0 + 4.0) / (1.0 + 1.0))
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2 - d1) < 1e-5)
  }

  test("boilerplate: lines repeated across >= minDocs docs are removed everywhere") {
    val banner = "accept all cookies"
    val docs = Seq(
      (1L, s"$banner\nunique one"),
      (2L, s"$banner\nunique two"),
      (3L, s"unique three\n$banner"),
      (4L, "only original text here")).toDF("doc_id", "text")
    val out = TextMetrics.boilerplateRemove(docs, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), Option(r.getString(4)))))
      .toMap
    assert(out(1L) == ((2L, 1L, "unique one".length.toLong,
      Some(md5("unique one")))))
    assert(out(3L)._2 == 1L && out(3L)._4.contains(md5("unique three")))
    assert(out(4L) == ((1L, 0L, "only original text here".length.toLong,
      Some(md5("only original text here")))))
    // at minDocs = 4 the banner survives (df = 3)
    val keep = TextMetrics.boilerplateRemove(docs, "doc_id", "text", minDocs = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(keep.values.forall(_ == 0L))
  }

  test("boilerplate: df counts distinct docs, not occurrences") {
    // the repeated line appears twice in ONE doc -> df = 1 -> kept
    val docs = Seq((1L, "dup line\ndup line\nother"), (2L, "something else"))
      .toDF("doc_id", "text")
    val out = TextMetrics.boilerplateRemove(docs, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 0L && out(2L) == 0L)
  }

  test("boilerplate: all lines removed yields null hash and zero chars") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("doc_id", "text")
    val r = TextMetrics.boilerplateRemove(docs, "doc_id", "text", minDocs = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.isNullAt(4)))
    assert(r.forall(_ == ((1L, 1L, 0L, true))))
  }

  test("heavy hitters: exact top-k counts through the sketch, ties by token") {
    // a=10 b=8 c=6 tie(d,e)=2 f=1; capacity 4 guarantees every token with
    // count > N/(capacity+1) = 29/5 survives the Misra-Gries pass
    val text = (Seq.fill(10)("a") ++ Seq.fill(8)("b") ++ Seq.fill(6)("c") ++
      Seq.fill(2)("d") ++ Seq.fill(2)("e") ++ Seq("f")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = TextMetrics.heavyHitters(docs, "doc_id", "text",
        capacity = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "a", 10L), (2L, "b", 8L), (3L, "c", 6L)))
    // tie region: d and e order alphabetically at a generous capacity
    val out5 = TextMetrics.heavyHitters(docs, "doc_id", "text",
        capacity = 64, k = 5)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(out5.toSeq == Seq(("a", 10L), ("b", 8L), ("c", 6L),
      ("d", 2L), ("e", 2L)))
  }

  test("quality calibration: deciles split the surprisal ranking evenly") {
    // 20 docs: ids 1..10 one rare-ish token each, 11..20 a common one;
    // what matters here is the bucket arithmetic, not the rule agreement
    val docs = (1L to 20L).map { i =>
      val tok = if (i <= 10) s"rare$i" else "common"
      (i, Seq.fill(10)(tok).mkString(" "))
    }.toDF("doc_id", "text")
    val tf = TextMetrics.termFrequencies(docs, "doc_id", "text")
    val out = TextMetrics.qualityCalibrationFromTf(tf, docs, "doc_id", "text",
        buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)))
  }

  test("apportionBudget: allocations sum to the budget, largest remainder wins") {
    // token counts 3/3/4 over budget 7: products 21/21/28 over tot 10 ->
    // floors 2/2/2, remainders 1/1/8 -> the single leftover seat goes
    // to c (largest remainder); a and b tie at rank 2/3 alphabetically
    val docs = Seq((1L, "x x x", "a"), (2L, "x x x", "b"), (3L, "x x x x", "c"))
      .toDF("doc_id", "text", "source")
    val out = TextMetrics.apportionBudget(docs, "source", "text", budget = 7L)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(4))))
      .toMap
    assert(out.values.map(_._2).sum == 7L)
    assert(out("a") == ((2L, 2L)))
    assert(out("b") == ((2L, 2L)))
    assert(out("c") == ((2L, 3L)))
  }

  test("zipf fit: an exact power law recovers slope -1 with r2 = 1") {
    // counts 24/rank over 4 types: ln(cnt) = ln 24 - ln(rank)
    val tf = Seq((1L, "t1", 24L), (1L, "t2", 12L), (1L, "t3", 8L),
      (1L, "t4", 6L)).toDF("doc_id", "token", "tf")
    val r = TextMetrics.zipfFitFromTf(tf).collect().head
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-4)            // slope
    assert(math.abs(r.getDouble(2) - math.log(24.0)) < 1e-4) // intercept
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-4)            // r2
  }
}
