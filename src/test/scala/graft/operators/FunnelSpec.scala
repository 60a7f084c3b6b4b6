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

  test("funnelStreaming advances across micro-batches and holds state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Funnel.FunnelEvent]
    val query = Funnel.funnelStreaming(stream.toDS(),
        Seq("signup", "click", "purchase"), maxGapUs = 24 * H)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_stream").start()
    try {
      // batch 1: signup + an out-of-window click (ignored), equal-ts click counts
      stream.addData(
        Funnel.FunnelEvent(1L, "click", 0L),   // pre-signup: ignored
        Funnel.FunnelEvent(1L, "signup", H),
        Funnel.FunnelEvent(2L, "signup", 0L))
      query.processAllAvailable()
      val b1 = spark.table("funnel_stream").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(b1 === Set((1L, 0, H), (2L, 0, 0L)))
      // batch 2: user 1 advances through click; user 2's click too late
      stream.addData(
        Funnel.FunnelEvent(1L, "click", 3 * H),
        Funnel.FunnelEvent(2L, "click", 30 * H))
      query.processAllAvailable()
      val b2 = spark.table("funnel_stream").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(b2 === b1 + ((1L, 1, 3 * H)))
      // batch 3: purchase within 24h of the CLICK (40h after signup)
      stream.addData(Funnel.FunnelEvent(1L, "purchase", 22 * H))
      query.processAllAvailable()
      val b3 = spark.table("funnel_stream").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(b3 === b2 + ((1L, 2, 22 * H)))
    } finally query.stop()
  }

  test("funnelStreaming matches the batch funnel on ts-ordered real events") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val steps = Seq("signup", "click", "purchase")
    val gap = 24L * 3600L * 1000000L
    // batch reference: step times from the window formulation
    val batch = Funnel.funnel(
        ev.withColumn("ts", timestamp_micros(col("ts_us"))),
        "user_id", "ts", "event_type", steps, "24 hours")
      .select(col("user_id"), unix_micros(col("t0")),
        unix_micros(col("t1")), unix_micros(col("t2")))
      .collect()
      .flatMap { r =>
        (0 to 2).flatMap(i => Option(r.get(i + 1))
          .map(t => (r.getLong(0), i, t.asInstanceOf[Long])))
      }.toSet
    // streaming: feed ALL events ts-ordered in two micro-batches
    val ordered = ev.as[(Long, String, Long)].collect()
      .map { case (u, t, us) => Funnel.FunnelEvent(u, t, us) }
      .sortBy(_.ts_us)
    val (first, second) = ordered.splitAt(ordered.length / 2)
    val stream = MemoryStream[Funnel.FunnelEvent]
    val query = Funnel.funnelStreaming(stream.toDS(), steps, gap)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_parity").start()
    try {
      stream.addData(first.toSeq); query.processAllAvailable()
      stream.addData(second.toSeq); query.processAllAvailable()
      val got = spark.table("funnel_parity").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got === batch)
    } finally query.stop()
  }
}
