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

  test("sampled variant: reconstruction, exact noise budget, partition-invariant") {
    val rnd = new scala.util.Random(9)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (0L until 120L).map { i =>
      (i, Seq.fill(5 + rnd.nextInt(40))(words(rnd.nextInt(words.length)))
        .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text").repartition(5)
    val out = TextMetrics.spanCorruptSampled(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    assert(out.size == 120)
    docs.foreach { case (id, text) =>
      val (nTok, nSpans, nMasked, input, target) = out(id)
      val n = text.split(" ").length
      assert(nTok == n)
      // T5's budget clamp, exactly: round(n*0.15) into [1, n-1]
      assert(nMasked == math.min(math.max(math.round(n * 0.15), 1), n - 1),
        s"doc $id budget")
      // span count: round(budget/3) clamped by both sides
      assert(nSpans == math.min(math.min(math.max(
        math.round(nMasked / 3.0), 1), nMasked), n - nMasked), s"doc $id spans")
      // masked token count == sum of target span lengths
      val spanToks = target.split(" ").count(!_.startsWith("<extra_id_"))
      assert(spanToks == nMasked, s"doc $id target tokens")
      assert(reconstruct(input, target) == text, s"doc $id reconstruct")
    }
    val again = TextMetrics.spanCorruptSampled(df.repartition(11), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    assert(again == out)
    // variable-length property: across the corpus, not every noise span
    // is the same length (the fixed-block form can never produce this)
    val lens = out.values.flatMap { case (_, _, _, _, tgt) =>
      tgt.split("(?=<extra_id_\\d+>)").filter(_.nonEmpty)
        .map(_.trim.split(" ").length - 1)
    }.toSeq
    assert(lens.distinct.size > 1, "span lengths should vary")
  }

  test("q149 sampled dump at sf0.001 matches the pinned golden hash") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val out = graft.queries.PipelineQueries
      .q149SpanSampled(spark, "/root/testdata/sf0.001")
    val lines = out.collect().map(_.mkString(",")).sorted.toSeq
    val md = java.security.MessageDigest.getInstance("SHA-256")
    lines.foreach { ln => md.update(ln.getBytes("UTF-8")); md.update('\n'.toByte) }
    val h = md.digest().map("%02x".format(_)).mkString
    assert(lines.nonEmpty)
    assert(h == "8b94ec0c5baaf79e3bb91095dfd2760802bd97a7ac277869780aad71403ec3b1",
      s"golden hash drifted: got $h over ${lines.length} rows")
  }
}
