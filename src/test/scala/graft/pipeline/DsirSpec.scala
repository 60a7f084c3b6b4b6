package graft.pipeline

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // target docs are "x"-speak, raw pool splits into an x-like doc (should
  // score high) and a y-speak doc (should score low)
  private val corpus = Seq(
    (0L, "x x y", true),
    (1L, "x y x", true),
    (2L, "x x y", false), // raw, target-like
    (3L, "z w z w z", false), // raw, unlike either model's mass
    (4L, "y y y y", false) // raw, mixed: y appears in target too
  ).toDF("doc_id", "text", "is_tgt")

  private def weights(df: org.apache.spark.sql.DataFrame = corpus) =
    Dsir.importanceWeights(df, "doc_id", "text", col("is_tgt"), buckets = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("only raw-pool documents are scored, with full gram counts") {
    val w = weights()
    assert(w.keySet === Set(2L, 3L, 4L))
    // "x x y" → 3 unigrams + 2 bigrams
    assert(w(2L)._1 == 5L)
    assert(w(3L)._1 == 9L)
  }

  test("target-like raw text outranks off-distribution raw text") {
    val w = weights()
    assert(w(2L)._2 > w(4L)._2, "doc repeating the target's own text must outrank")
    assert(w(2L)._2 > w(3L)._2, "unseen-gram doc must not outrank a target-like doc")
  }

  test("logw matches the closed form on a single-gram document") {
    // one doc per side, single token: target "a", raw "b"; buckets big
    // enough that 'a' and 'b' almost surely land apart (verified below)
    val tiny = Seq((0L, "a", true), (1L, "b", false)).toDF("doc_id", "text", "is_tgt")
    val feats = Dsir.hashedGramCounts(tiny, "doc_id", "text", col("is_tgt"), 64)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(feats.map(_._3).forall(_ == 1L))
    val Seq(ba) = feats.filter(_._1 == 0L).map(_._2).toSeq
    val Seq(bb) = feats.filter(_._1 == 1L).map(_._2).toSeq
    assert(ba != bb, "test premise: the two grams hash to distinct buckets")
    // model: T=1, S=1, m=64. 'b' bucket: ct=0, cs=1 →
    // logw = ln((0+1)/(1+64)) − ln((1+1)/(1+64)) = −ln 2
    val w = weights(tiny)
    assert(math.abs(w(1L)._2 - (-math.log(2.0))) < 1e-6)
  }

  test("the scoring plan never rescans the corpus (materialized features)") {
    // hashedGramCounts localCheckpoints before fanning out to the model
    // and the probe — so the weights plan must contain NO source scan at
    // all (only the checkpointed RDD), and the model side must broadcast
    val plan = Dsir.importanceWeights(corpus, "doc_id", "text",
      col("is_tgt"), buckets = 64).queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"),
      s"corpus rescanned by model/probe:\n$plan")
    assert(plan.contains("BroadcastExchange") || plan.contains("Broadcast"),
      "bucket model should broadcast back")
  }

  test("selectTopK keeps the k best and never a target document") {
    val top = Dsir.selectTopK(corpus, "doc_id", "text", col("is_tgt"), k = 2)
      .collect().map(_.getLong(0))
    assert(top.length == 2 && top.contains(2L))
    assert(!top.contains(0L) && !top.contains(1L))
  }
}
