package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[TextMetrics.spanCorrupt]] — the property that matters for a
  * denoising objective: splicing each sentinel's target content back
  * into the input reconstructs the ORIGINAL token stream exactly (no
  * token lost, duplicated, or reordered), plus determinism across
  * partitionings and the mask-rate sanity band. */
class SpanCorruptSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reconstruct(input: String, target: String): String = {
    // target = "<extra_id_0> tok tok <extra_id_1> tok ..." → k -> content
    val parts = target.split("(?=<extra_id_\\d+>)").filter(_.nonEmpty)
    val content = parts.map { p =>
      val m = "<extra_id_(\\d+)> ?(.*)".r
      p.trim match { case m(k, rest) => k.toInt -> rest }
    }.toMap
    input.split(" ").map { tok =>
      if (tok.startsWith("<extra_id_"))
        content(tok.stripPrefix("<extra_id_").stripSuffix(">").toInt)
      else tok
    }.filter(_.nonEmpty).mkString(" ")
  }

  test("blockLen=1 degenerates to MLM-style single-token masking") {
    val docs = (0L until 60L)
      .map(i => (i, Seq.fill(30)(s"t${i % 7}").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextMetrics.spanCorrupt(docs, "doc_id", "text", blockLen = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))
    out.foreach { case (id, nTok, nBlocks, nMasked, input, target) =>
      assert(nBlocks == nTok) // every token is its own maskable block
      assert(input.split(" ").length == nTok)
      assert(reconstruct(input, target).split(" ").length == nTok, s"doc $id")
      // each sentinel hides exactly ONE token
      if (nMasked > 0)
        target.split("(?=<extra_id_\\d+>)").filter(_.nonEmpty).foreach { p =>
          assert(p.trim.split(" ").length == 2, s"doc $id: '$p'")
        }
    }
  }

  test("input + target splice back to the original tokens; deterministic; rate sane") {
    val rnd = new scala.util.Random(5)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (0L until 120L).map { i =>
      (i, Seq.fill(5 + rnd.nextInt(40))(words(rnd.nextInt(words.length)))
        .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text").repartition(5)
    val out = TextMetrics.spanCorrupt(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(out.size == 120)
    docs.foreach { case (id, text) =>
      val (nTok, nMasked, input, target) = out(id)
      assert(nTok == text.split(" ").length)
      assert(reconstruct(input, target) == text, s"doc $id")
      if (nMasked == 0) assert(target == "")
    }
    // ~10% of blocks masked over the corpus (generous band)
    val rates = out.values.map(_._2).sum.toDouble /
      TextMetrics.spanCorrupt(df, "doc_id", "text")
        .agg(sum("n_blocks")).head().getLong(0)
    assert(rates > 0.04 && rates < 0.2, s"mask rate $rates")
    // partitioning invariance
    val again = TextMetrics.spanCorrupt(df.repartition(11), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(again == out)
  }
}
