package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CoreQueries

class RateAnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // plant n events inside hour h for one type
  private def events(countsByHour: Seq[Int]) =
    countsByHour.zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(i =>
        (java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:${i % 60}%02d:00"), "a"))
    }.toDF("ts", "event_type")

  private def rows(countsByHour: Seq[Int]) =
    CoreQueries.rateAnomalyOf(events(countsByHour))
      .collect()
      .map(r => r.getString(0).substring(11, 13).toInt ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))))
      .toMap

  test("cold start yields null z until 3 baseline windows exist") {
    val m = rows(Seq(4, 4, 4, 4))
    assert(m(0) == ((4L, 0L, None, None)))
    assert(m(1)._4 == None && m(2)._4 == None)
    // hour 3 has 3 predecessors but zero variance → mean present, z null
    assert(m(3) == ((4L, 3L, Some(4.0), None)))
  }

  test("z matches the closed form against a trailing baseline") {
    // baseline for hour 3: counts 2,4,6 → mean 4, var ((4+16+36)-48)/3 = 8/3
    val m = rows(Seq(2, 4, 6, 8))
    val (n, nPrev, mean, z) = m(3)
    assert(n == 8L && nPrev == 3L && mean == Some(4.0))
    val expected = (8.0 - 4.0) / math.sqrt(8.0 / 3.0)
    assert(math.abs(z.get - expected) < 1e-6)
  }

  test("the frame is capped at 6 trailing windows") {
    // 8 constant hours then a spike: baseline = last 6 constants
    val m = rows(Seq(1, 9, 4, 4, 4, 4, 4, 4, 10))
    val (_, nPrev, mean, _) = m(8)
    assert(nPrev == 6L)
    assert(mean == Some(4.0), "the hour-1 spike must have aged out")
  }
}
