package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CurateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val good = "the quick brown fox jumps over the lazy dog again today"
  private val contam = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"

  private lazy val verdicts = {
    val corpus = Seq(
      (1L, "srcA", good),
      (2L, "srcA", good.toUpperCase + "!"), // canonical duplicate of 1
      (3L, "srcA", "x. y! z?"),             // fails the quality gate
      (4L, "srcA", contam),                 // shares an 8-gram with eval
      (5L, "srcB", good + " twice over")    // srcB absent from rates
    ).toDF("doc_id", "source", "text")
    val eval = Seq((100L, contam)).toDF("doc_id", "text")
    Curate.curate(corpus, "doc_id", "text", "source",
        eval, "doc_id", "text", rates = Map("srcA" -> 100))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
  }

  test("each stage produces its verdict; rate-100 survivors are kept") {
    assert(verdicts === Map(
      1L -> "kept",
      2L -> "dropped_duplicate",
      3L -> "dropped_quality",
      4L -> "dropped_contaminated",
      5L -> "dropped_sampled"))
  }

  test("verdict precedence follows pipeline order") {
    // a doc that is BOTH a canonical duplicate and contaminated reports
    // the earlier stage
    val corpus = Seq(
      (1L, "srcA", contam),
      (2L, "srcA", contam + "!")).toDF("doc_id", "source", "text")
    val eval = Seq((100L, contam)).toDF("doc_id", "text")
    val m = Curate.curate(corpus, "doc_id", "text", "source",
        eval, "doc_id", "text", rates = Map("srcA" -> 100))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m(1L) == "dropped_contaminated")
    assert(m(2L) == "dropped_duplicate")
  }

  test("curateStaged splices extra drop stages between duplicate and contamination") {
    val corpus = Seq(
      (1L, "srcA", good),                    // clean -> kept (rate 100)
      (2L, "srcA", good + " nearly so"),     // planted near-dup drop
      (3L, "srcA", good + " semantically"),  // planted semantic drop
      (4L, "srcA", contam),                  // contaminated AND planted
                                             // near-dup: neardup wins
      (5L, "srcA", good.toUpperCase + "!")   // exact dup beats neardup
    ).toDF("doc_id", "source", "text")
    val eval = Seq((100L, contam)).toDF("doc_id", "text")
    val nearDrop = Seq(2L, 4L, 5L).toDF("doc_id")
    val semDrop = Seq(2L, 3L).toDF("doc_id")
    val m = Curate.curateStaged(corpus, "doc_id", "text", "source",
        eval, "doc_id", "text",
        Seq("neardup" -> nearDrop, "semantic" -> semDrop),
        rates = Map("srcA" -> 100))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m === Map(
      1L -> "kept",
      2L -> "dropped_neardup",   // in both planted stages: first wins
      3L -> "dropped_semantic",
      4L -> "dropped_neardup",   // neardup outranks contamination
      5L -> "dropped_duplicate"  // exact dup outranks planted neardup
    ))
    // empty extra stages reproduce plain curate exactly
    val a = Curate.curate(corpus, "doc_id", "text", "source",
        eval, "doc_id", "text", rates = Map("srcA" -> 100))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Curate.curateStaged(corpus, "doc_id", "text", "source",
        eval, "doc_id", "text", Nil, rates = Map("srcA" -> 100))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a === b)
  }
}
