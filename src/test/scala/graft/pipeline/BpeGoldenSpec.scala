package graft.pipeline

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q71 (BPE merge training) is iterative/argmax-per-round and not
  * SQL-expressible, so the driver records a rows-only check. Like
  * [[graft.operators.GibbsGoldenSpec]] for q36, this spec closes the
  * value surface: the full sf0.001 output is pinned to a golden hash.
  * The query is deterministic by design (total tie order −count, left,
  * right — see [[Bpe.trainMerges]]), so any hash drift means the
  * semantics changed, not the partitioning. BpeSpec separately checks
  * the distributed trainer against an independent single-threaded
  * reimplementation; this pin catches changes that move both in
  * lockstep. */
class BpeGoldenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sha256(lines: Seq[String]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    lines.foreach { ln => md.update(ln.getBytes("UTF-8")); md.update('\n'.toByte) }
    md.digest().map("%02x".format(_)).mkString
  }

  test("q71 BPE merges at sf0.001 match the pinned golden hash") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val out = graft.queries.PipelineQueries
      .q71BpeMerges(spark, "/root/testdata/sf0.001")
    val lines = out.collect().map(_.mkString(",")).sorted.toSeq
    val h = sha256(lines)
    assert(lines.nonEmpty)
    assert(h == "8d49ccda0b810544e812a3ddc345b1999c224ea8c512a0471279a89d04e41342",
      s"golden hash drifted: got $h over ${lines.length} rows")
  }

  test("q160 tokenizer fertility at sf0.001 matches the pinned golden hash") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val out = graft.queries.PipelineQueries
      .q160TokenizerFertility(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    // sanity bounds before the pin: fertility >= 1 (a word is at least
    // one token) and chars_per_token >= 1
    rows.foreach { r =>
      assert(r.getDouble(4) >= 1.0 && r.getDouble(5) >= 1.0, r.toString)
    }
    val lines = rows.map(_.mkString(",")).sorted.toSeq
    val h = sha256(lines)
    assert(lines.nonEmpty)
    assert(h == "6ffe66113f798a454f1fe65d53896274b3c6d4af5811fc36b0e9ce65227dadcf",
      s"golden hash drifted: got $h over ${lines.length} rows")
  }
}
