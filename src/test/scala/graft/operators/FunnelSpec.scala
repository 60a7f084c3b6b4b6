package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600L * 1000000L // one hour in micros

  private def run(rows: Seq[(Long, Long, String)], maxGap: String = "24 hours") = {
    val df = rows.toDF("user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    Funnel.funnel(df, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"), maxGap)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getAs[Long]("steps_completed")))).toMap
  }

  test("full conversion, step times are the earliest qualifying events") {
    val m = run(Seq(
      (1L, 0L, "click"),        // pre-signup click must NOT count
      (1L, 1 * H, "signup"),
      (1L, 3 * H, "click"),
      (1L, 2 * H, "click"),     // earliest post-signup click wins
      (1L, 5 * H, "purchase")))
    val (t0, t1, _, steps) = m(1L)
    assert(steps == 3L)
    assert(t0.get.toString.contains("01:00:00"))
    assert(t1.get.toString.contains("02:00:00"))
  }

  test("events outside the per-hop window do not advance the funnel") {
    val m = run(Seq(
      (2L, 0L, "signup"),
      (2L, 30 * H, "click"),     // > 24h after signup
      (2L, 31 * H, "purchase")))
    assert(m(2L)._4 == 1L)
    // the hop window is relative to the PREVIOUS step, not funnel entry
    val n = run(Seq(
      (3L, 0L, "signup"),
      (3L, 20 * H, "click"),
      (3L, 40 * H, "purchase"))) // 20h after click, 40h after signup
    assert(n(3L)._4 == 3L)
  }

  test("users without the entry step are excluded") {
    val m = run(Seq((4L, 0L, "click"), (4L, 1 * H, "purchase")))
    assert(!m.contains(4L))
  }

  test("equal-timestamp step events qualify (inclusive bounds)") {
    val m = run(Seq((5L, 0L, "signup"), (5L, 0L, "click"),
      (5L, 24 * H, "purchase"))) // exactly at the 24h bound
    assert(m(5L)._4 == 3L)
  }
}
