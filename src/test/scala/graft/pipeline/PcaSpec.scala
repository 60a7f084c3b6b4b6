package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The PCA chain ([[Similarity.jacobiEigen]] + [[Similarity.pcaReport]]):
  * solver correctness (orthonormality + reconstruction), planted-
  * structure recovery, the self-verification contract (distributed
  * projection variance equals the driver eigenvalue), partitioning
  * invariance, and the q147 sf0.001 golden hash. */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("jacobiEigen: orthonormal vectors, exact reconstruction, trace identity") {
    val rnd = new scala.util.Random(3)
    val d = 12
    val m = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val x = rnd.nextGaussian(); m(i)(j) = x; m(j)(i) = x
    }
    val (evals, v) = Similarity.jacobiEigen(m)
    // V^T V = I
    for (a <- 0 until d; b <- 0 until d) {
      val dot = (0 until d).map(i => v(i)(a) * v(i)(b)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"($a,$b)")
    }
    // A = V diag(evals) V^T
    for (i <- 0 until d; j <- 0 until d) {
      val rec = (0 until d).map(c => v(i)(c) * evals(c) * v(j)(c)).sum
      assert(math.abs(rec - m(i)(j)) < 1e-9, s"($i,$j)")
    }
    assert(math.abs(evals.sum - (0 until d).map(i => m(i)(i)).sum) < 1e-9)
  }

  test("pcaReport recovers planted dominant axes and self-verifies") {
    // dims 0/1 carry variance ~9 and ~4, the rest ~0.01: the top two
    // principal axes must align with e0/e1 and the report's distributed
    // proj_var must equal the driver eigenvalue
    val rnd = new scala.util.Random(7)
    val data = (0L until 400L).map { i =>
      val v = Array.tabulate(8)(dim => (rnd.nextGaussian() * (dim match {
        case 0 => 3.0
        case 1 => 2.0
        case _ => 0.1
      })).toFloat)
      (i, v.toSeq)
    }
    val df = data.toDF("vec_id", "embedding").repartition(5)
    val rep = Similarity.pcaReport(df, "vec_id", "embedding", k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rep.length == 4)
    // eigenvalues descending, roughly the planted variances
    assert(rep(0)._2 > 6.0 && rep(0)._2 < 12.0, rep(0))
    assert(rep(1)._2 > 2.5 && rep(1)._2 < 6.0, rep(1))
    assert(rep(2)._2 < 0.1)
    // self-verification: projection variance equals the eigenvalue
    rep.foreach { case (rank, ev, _, pv) =>
      assert(math.abs(pv - ev) <= math.max(1e-4, ev * 5e-3),
        s"rank $rank: proj_var $pv vs eigenvalue $ev")
    }
    // explained_cum is increasing and bounded by 1
    assert(rep.map(_._3).toSeq == rep.map(_._3).sorted.toSeq)
    assert(rep.last._3 <= 1.0 + 1e-9)
    // partitioning invariance: the whole report is bit-identical
    val again = Similarity.pcaReport(df.repartition(11), "vec_id", "embedding", k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(again.toSeq == rep.toSeq)
  }

  test("whitening closes the loop: whitened covariance is the identity") {
    // anisotropic data -> fit -> apply -> re-run our OWN covariance
    // operator over the whitened output; diag ~ 1, off-diag ~ 0
    val rnd = new scala.util.Random(11)
    val data = (0L until 300L).map { i =>
      val v = Array.tabulate(6)(dim =>
        (rnd.nextGaussian() * (3.0 - dim * 0.4) + dim).toFloat)
      (i, v.toSeq)
    }
    val df = data.toDF("vec_id", "embedding").repartition(4)
    val model = Similarity.fitWhitening(df, "vec_id", "embedding", k = 6)
    val whitened = Similarity.whiten(df, "embedding", model)
      .select(col("vec_id"),
        col("whitened").cast("array<float>").as("embedding"))
    val cov = Similarity.gramCovariance(whitened, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(6)).toMap
    for (i <- 0 until 6; j <- i until 6) {
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(cov((i.toLong, j.toLong)) - expect) < 2e-2,
        s"whitened cov($i,$j) = ${cov((i.toLong, j.toLong))}")
    }
    // determinism: the model is bit-identical across partitionings
    val m2 = Similarity.fitWhitening(df.repartition(9), "vec_id", "embedding", 6)
    assert(m2.mean.toSeq == model.mean.toSeq)
    assert(m2.w.map(_.toSeq).toSeq == model.w.map(_.toSeq).toSeq)
  }

  test("q147 PCA report at sf0.001 matches the pinned golden hash") {
    assume(new java.io.File("/root/testdata/sf0.001/embeddings.parquet").exists())
    val out = graft.queries.PipelineQueries
      .q147PcaReport(spark, "/root/testdata/sf0.001")
    val lines = out.collect().map(_.mkString(",")).sorted.toSeq
    val md = MessageDigest.getInstance("SHA-256")
    lines.foreach { ln => md.update(ln.getBytes("UTF-8")); md.update('\n'.toByte) }
    val h = md.digest().map("%02x".format(_)).mkString
    assert(lines.nonEmpty)
    assert(h == "2af5dd9c6e66a0caf9132ee8c5285a649cddca7569fb789b91ac514417be62af",
      s"golden hash drifted: got $h over ${lines.length} rows")
  }
}
