package graft.pipeline

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q209 (unigram-LM training) is iterative hard-EM; since round 15 its
  * OUTPUT is oracle-checked by replaying the final E-step in SQL under
  * the penultimate cost table (PipelineQueries.q209OracleNow). This spec
  * closes the rest of the value surface the BpeSpec/BpeGoldenSpec way:
  * the distributed trainer must equal an independent single-threaded
  * reimplementation on real data, the two segmenters must agree
  * word-for-word, trainFull's penultimate costs must reproduce the
  * final usages (the contract the SQL oracle relies on), and the
  * sf0.001 output is pinned to a golden hash. (The ENCODE side is
  * additionally oracle-checked end-to-end through q210's recursive-CTE
  * SQL twin.) */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Viterbi picks the min-cost segmentation, ties to fewer pieces") {
    // costs: a=10, b=20, c=30, ab=5, bc=4, abc=50 (the DuckDB probe
    // fixture): best('abcab') = a|bc|ab at cost 19, 3 pieces
    val costs = Map("a" -> 10L, "b" -> 20L, "c" -> 30L,
      "ab" -> 5L, "bc" -> 4L, "abc" -> 50L)
    assert(Unigram.viterbiSegment("abcab", costs).toSeq ==
      Seq("a", "bc", "ab"))
    assert(Unigram.referenceSegment("abcab", costs) ==
      List("a", "bc", "ab"))
    // fewer-pieces tie-break: 'aa' as a|a (cost 2x) vs 'aa' piece at
    // exactly 2x must prefer the SINGLE piece (smaller k in the pack)
    val tie = Map("a" -> 7L, "aa" -> 14L)
    assert(Unigram.viterbiSegment("aa", tie).toSeq == Seq("aa"))
    assert(Unigram.referenceSegment("aa", tie) == List("aa"))
    // unsegmentable input fails loudly
    intercept[IllegalStateException] {
      Unigram.viterbiSegment("ax", Map("a" -> 1L))
    }
  }

  test("trainer matches the independent reference implementation on real data") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val got = Unigram.trainPieces(docs, "text")
    val wordCounts = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Unigram.referenceTrain(wordCounts)
    assert(got == want)
    // every corpus character survives as a single (the coverage
    // invariant that keeps every word segmentable)
    val chars = wordCounts.keysIterator.flatMap(_.toSeq).toSet
    val singles = got.collect { case (p, _) if p.length == 1 => p.head }.toSet
    assert(chars.subsetOf(singles))
  }

  test("both segmenters agree word-for-word under the trained costs") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val costs = Unigram.costsOf(Unigram.trainPieces(docs, "text").toMap)
    val words = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct().collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(Unigram.viterbiSegment(w, costs).toSeq ==
        Unigram.referenceSegment(w, costs), s"word '$w'")
    }
  }

  test("trainFull's penultimate costs replay the final E-step exactly") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (pieces, penult) = Unigram.trainFull(docs, "text")
    val wordCounts = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // segment every word under the PENULTIMATE costs, accumulate usage
    // weighted by word count, +1 smoothing — must equal the trained
    // table's usage column for every final piece (the q209 oracle's
    // exact derivation, here as a Scala-side pin)
    val usage = collection.mutable.Map.empty[String, Long]
    wordCounts.foreach { case (w, c) =>
      Unigram.viterbiSegment(w, penult).foreach { p =>
        usage(p) = usage.getOrElse(p, 0L) + c
      }
    }
    pieces.foreach { case (p, u) =>
      assert(u == usage.getOrElse(p, 0L) + 1L, s"piece '$p'")
    }
  }

  test("encode counts are consistent: words <= tokens <= chars") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val costs = Unigram.costsOf(Unigram.trainPieces(docs, "text").toMap)
    val enc = Unigram.encode(docs, "doc_id", "text", costs).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val (w, c, t) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w <= t && t <= c, r.toString)
    }
  }

  private def sha256(lines: Seq[String]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    lines.foreach { ln => md.update(ln.getBytes("UTF-8")); md.update('\n'.toByte) }
    md.digest().map("%02x".format(_)).mkString
  }

  test("q209 unigram pieces at sf0.001 match the pinned golden hash") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val out = graft.queries.PipelineQueries
      .q209UnigramTrain(spark, "/root/testdata/sf0.001")
    val lines = out.collect().map(_.mkString(",")).sorted.toSeq
    val h = sha256(lines)
    assert(lines.nonEmpty)
    assert(h == "81fc29ae7cee323f90be8248e33ae79ebfc72c203bc31c4d9423800a0371b34d",
      s"golden hash drifted: got $h over ${lines.length} rows")
  }
}
