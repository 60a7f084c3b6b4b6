package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** [[TextMetrics.isotonicCalibration]] — PAV by hand, the pooled-to-
  * global degenerate case, the monotone output property, and an
  * independent reimplementation via the closed-form minimax
  * characterization (the same formula the DuckDB oracle runs). */
class IsotonicSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def calibrate(obs: Seq[(Long, Long)]): Map[Long, Double] =
    TextMetrics.isotonicCalibration(obs.toDF("bin", "label"), "bin", "label")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap

  /** One observation row per unit: bin b with n rows, p positive. */
  private def obsOf(stats: Seq[(Long, Long, Long)]): Seq[(Long, Long)] =
    stats.flatMap { case (b, n, p) =>
      Seq.fill(p.toInt)((b, 1L)) ++ Seq.fill((n - p).toInt)((b, 0L))
    }

  test("adjacent violators pool by hand; edges untouched") {
    // rates [.2, .6, .4, .8] over n=10 bins -> middle two pool to .5
    val out = calibrate(obsOf(Seq((0L, 10L, 2L), (1L, 10L, 6L),
      (2L, 10L, 4L), (3L, 10L, 8L))))
    assert(out == Map(0L -> 0.2, 1L -> 0.5, 2L -> 0.5, 3L -> 0.8))
  }

  test("fully decreasing rates pool to the global average") {
    val out = calibrate(obsOf(Seq((0L, 10L, 9L), (1L, 10L, 5L),
      (2L, 10L, 1L))))
    assert(out.values.toSet == Set(0.5))
  }

  test("matches the minimax closed form on an uneven-n fixture; monotone") {
    val stats = Seq((0L, 7L, 3L), (1L, 3L, 2L), (2L, 12L, 4L),
      (3L, 5L, 5L), (4L, 9L, 2L), (5L, 4L, 3L))
    val out = calibrate(obsOf(stats))
    // independent reimplementation: fitted_i = max_{k<=i} min_{j>=i}
    // of the exact range average, evaluated in IEEE double
    val want = stats.indices.map { i =>
      val fitted = (0 to i).map { k =>
        (i until stats.length).map { j =>
          val p = (k to j).map(stats(_)._3).sum.toDouble
          val n = (k to j).map(stats(_)._2).sum.toDouble
          p / n
        }.min
      }.max
      stats(i)._1 -> BigDecimal(fitted).setScale(10, BigDecimal.RoundingMode.HALF_UP)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    assert(out == want)
    val inBinOrder = stats.map(s => out(s._1))
    assert(inBinOrder == inBinOrder.sorted, "calibrated must be non-decreasing")
  }

  test("property: PAV equals minimax on 20 random uneven fixtures") {
    val rnd = new scala.util.Random(17)
    (1 to 20).foreach { trial =>
      val b = 3 + rnd.nextInt(6)
      val stats = (0 until b).map { i =>
        val n = 1L + rnd.nextInt(12)
        (i.toLong, n, rnd.nextInt(n.toInt + 1).toLong)
      }
      val out = calibrate(obsOf(stats))
      val want = stats.indices.map { i =>
        val fitted = (0 to i).map { k =>
          (i until stats.length).map { j =>
            val p = (k to j).map(stats(_)._3).sum.toDouble
            val n = (k to j).map(stats(_)._2).sum.toDouble
            p / n
          }.min
        }.max
        stats(i)._1 -> BigDecimal(fitted)
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
      assert(out == want, s"trial $trial stats=$stats")
    }
  }

  test("bin-count guard refuses unbounded driver state loudly") {
    val ex = intercept[IllegalArgumentException] {
      TextMetrics.isotonicCalibration(
        Seq((1L, 1L), (2L, 0L)).toDF("bin", "label"), "bin", "label",
        maxBins = 1)
    }
    assert(ex.getMessage.contains("maxBins"))
  }
}
