package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PSI drift properties: zero on identical distributions, positive and
  * ordered under shift, non-negative term-wise by construction. */
class PsiDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(lens: Map[String, Seq[Int]]) =
    lens.toSeq.flatMap { case (src, ls) =>
      ls.map(l => (src, ("w " * l).trim))
    }.toDF("source", "text")

  private def psi(d: org.apache.spark.sql.DataFrame) =
    TextMetrics.psiDrift(d, "source", "text", bins = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap

  test("identical same-size distributions have PSI exactly 0") {
    val lens = (1 to 40).map(i => 1 + i % 7)
    val m = psi(docsOf(Map("a" -> lens, "b" -> lens)))
    assert(m("a") == 0.0 && m("b") == 0.0,
      "p = q in every bin when the two halves are identical")
  }

  test("a shifted source scores positive, and further shift scores higher") {
    val base = (1 to 60).map(i => 10 + i % 5)
    val near = (1 to 60).map(i => 11 + i % 5)
    val far = (1 to 60).map(i => 40 + i % 5)
    val mNear = psi(docsOf(Map("base" -> base, "x" -> near)))
    val mFar = psi(docsOf(Map("base" -> base, "x" -> far)))
    assert(mNear("x") >= 0.0 && mFar("x") > mNear("x"),
      s"near=${mNear("x")} far=${mFar("x")}")
  }

  test("every PSI is non-negative (term-wise (p-q)ln(p/q) >= 0)") {
    val rnd = new scala.util.Random(7)
    val lens = Map(
      "a" -> Seq.fill(30)(1 + rnd.nextInt(20)),
      "b" -> Seq.fill(50)(1 + rnd.nextInt(10)),
      "c" -> Seq.fill(10)(15 + rnd.nextInt(30)))
    psi(docsOf(lens)).foreach { case (s, v) =>
      assert(v >= 0.0, s"psi($s) = $v")
    }
  }
}
