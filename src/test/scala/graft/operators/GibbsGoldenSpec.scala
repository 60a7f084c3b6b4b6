package graft.operators

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q36 (seeded Gibbs) is the one `SparkEntry.queries` entry with no
  * DuckDB oracle — stochastic inference is not SQL-expressible, so the
  * driver records a rows-only check. This spec closes the value surface:
  * the full sf0.001 output is pinned to a golden hash. The query is
  * deterministic by design (per-doc seeded RNG — see
  * [[TopicModel.scoreLocationsGibbs]]), so any hash drift means the
  * semantics changed, not the partitioning. */
class GibbsGoldenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sha256(lines: Seq[String]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    lines.foreach { ln => md.update(ln.getBytes("UTF-8")); md.update('\n'.toByte) }
    md.digest().map("%02x".format(_)).mkString
  }

  test("q36 seeded Gibbs at sf0.001 matches the pinned golden hash") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val out = graft.queries.OperatorQueries
      .q36TopicModelGibbs(spark, "/root/testdata/sf0.001")
    val lines = out.collect().map(_.mkString(",")).sorted.toSeq
    val h = sha256(lines)
    assert(lines.nonEmpty)
    assert(h == "e266ca2a2cf67a1f8a729df92a5b46c873a32cfee8ac3964626f35162cb3b509",
      s"golden hash drifted: got $h over ${lines.length} rows")
  }
}
