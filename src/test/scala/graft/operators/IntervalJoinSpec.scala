package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[IntervalJoin.intervalCount]] — inclusive-boundary semantics by
  * hand (events exactly at start and at end count; just outside do
  * not), key isolation, zero-overlap intervals, and partitioning
  * invariance of the sweep. */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("inclusive bounds, key isolation, empty intervals; partition-invariant") {
    // key 1: events at ts 5, 10, 15, 20; intervals [10, 15] (both
    // boundary events count -> 2), [16, 19] (none -> 0), [4, 21] (all 4)
    // key 2: one event at 10 — interval [10, 10] on key 1 must NOT see it
    val events = Seq((1L, 5L), (1L, 10L), (1L, 15L), (1L, 20L), (2L, 10L))
      .toDF("k", "ts")
    val intervals = Seq(
      (1L, 100L, 10L, 15L),
      (1L, 101L, 16L, 19L),
      (1L, 102L, 4L, 21L),
      (1L, 103L, 10L, 10L),
      (2L, 104L, 9L, 11L))
      .toDF("k", "iid", "s", "e")
    val out = IntervalJoin.intervalCount(intervals, events,
        keys = Seq("k"), idCol = "iid", startCol = "s", endCol = "e",
        tsCol = "ts")
      .collect().map(r => r.getAs[Long]("iid") -> r.getAs[Long]("n_events"))
      .toMap
    assert(out == Map(100L -> 2L, 101L -> 0L, 102L -> 4L, 103L -> 1L,
      104L -> 1L))
    val again = IntervalJoin.intervalCount(intervals.repartition(7),
        events.repartition(5), keys = Seq("k"), idCol = "iid",
        startCol = "s", endCol = "e", tsCol = "ts")
      .collect().map(r => r.getAs[Long]("iid") -> r.getAs[Long]("n_events"))
      .toMap
    assert(again == out)
  }

  test("inverted interval (end < start) raises loudly, never a negative count") {
    import spark.implicits._
    val ex = intercept[Exception] {
      IntervalJoin.intervalCount(
        Seq((1L, 9L, 10L, 5L)).toDF("k", "iid", "s", "e"),
        Seq((1L, 7L)).toDF("k", "ts"),
        keys = Seq("k"), idCol = "iid", startCol = "s", endCol = "e",
        tsCol = "ts").collect()
    }
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(messages(ex).contains("start > end"))
  }

  test("intervalCount property: sweep equals brute force on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val events = (1 to 400).map(_ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong))
    val intervals = (0 until 60).map { i =>
      val s = rnd.nextInt(50).toLong
      (rnd.nextInt(5).toLong, 1000L + i, s, s + rnd.nextInt(12).toLong)
    }
    val got = IntervalJoin.intervalCount(
        intervals.toDF("k", "iid", "s", "e").repartition(7),
        events.toDF("k", "ts").repartition(5),
        keys = Seq("k"), idCol = "iid", startCol = "s", endCol = "e",
        tsCol = "ts")
      .collect().map(r => r.getAs[Long]("iid") -> r.getAs[Long]("n_events"))
      .toMap
    intervals.foreach { case (k, iid, s, e) =>
      val want = events.count { case (ek, ts) => ek == k && ts >= s && ts <= e }
      assert(got(iid) == want.toLong, s"interval $iid [$s,$e] key $k")
    }
  }

  test("attributionStreaming windowUs=0: only events exactly at the probe ts count") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      IntervalJoin.PointEvent(1L, 10L, 1L, probe = false),
      IntervalJoin.PointEvent(1L, 10L, 2L, probe = false), // same instant
      IntervalJoin.PointEvent(1L, 9L, 3L, probe = false),  // 1 us earlier
      IntervalJoin.PointEvent(1L, 10L, 50L, probe = true),
      IntervalJoin.PointEvent(1L, 11L, 51L, probe = true))
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[IntervalJoin.PointEvent]
    val q = IntervalJoin.attributionStreaming(stream.toDS(), windowUs = 0L)
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_zero")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("attr0_ckpt").toString)
      .start()
    try { stream.addData(rows); q.processAllAvailable() } finally q.stop()
    val got = spark.table("attr_zero")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == Map(50L -> 2L, 51L -> 0L))
  }

  test("native watermarked stream-stream join twin equals batch q152 (idiomatic mode)") {
    assume(new java.io.File("/root/testdata/sf0.001/events.parquet").exists())
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batch = graft.queries.CoreQueries.q152IntervalJoin(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap

    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .collect()
    val evStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val prStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long)]
    val events = evStream.toDF().toDF("user_id", "ts_us")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"))
    val probes = prStream.toDF().toDF("user_id", "interval_id", "ts_us")
      .select(col("user_id"), col("interval_id"),
        timestamp_micros(col("ts_us")).as("p_ts"))
    val joined = IntervalJoin.attributionStreamingNative(probes, events,
      keys = Seq("user_id"), idCol = "interval_id", probeTsCol = "p_ts",
      tsCol = "ts", window = "1 HOUR", delay = "0 seconds")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("attr_native")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("attrn_ckpt").toString)
      .start()
    try {
      // two micro-batches split at the median event id — matches across
      // the split must join against buffered stream-stream state
      val mid = ev.map(_.getLong(2)).sorted.apply(ev.length / 2)
      def feed(pred: org.apache.spark.sql.Row => Boolean): Unit = {
        val part = ev.filter(pred)
        evStream.addData(part.map(r => (r.getLong(0), r.getLong(1))))
        prStream.addData(part.filter(_.getString(3) == "purchase")
          .map(r => (r.getLong(0), r.getLong(2), r.getLong(1))))
        q.processAllAvailable()
      }
      feed(_.getLong(2) <= mid)
      feed(_.getLong(2) > mid)
    } finally q.stop()
    val gotCounts = spark.table("attr_native")
      .groupBy(col("interval_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // inner join: zero-match probes never emit — they must be exactly
    // the batch intervals with n_events = 0
    assert(gotCounts == batch.filter(_._2 > 0L),
      "matched counts diverge from the batch sweep")
    assert(batch.keySet -- gotCounts.keySet == batch.filter(_._2 == 0L).keySet,
      "absent probes must be exactly the zero-count intervals")
  }

  test("native stream-stream join state survives a full query restart") {
    // the W6 restart proof for Spark's symmetric-hash join state:
    // a batch-1 event must match a probe that only arrives after the
    // query is killed and restarted from its checkpoint
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val prStream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long)]
    val events = evStream.toDF().toDF("user_id", "ts_us")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"))
    val probes = prStream.toDF().toDF("user_id", "interval_id", "ts_us")
      .select(col("user_id"), col("interval_id"),
        timestamp_micros(col("ts_us")).as("p_ts"))
    val ckpt = java.nio.file.Files.createTempDirectory("attrn_restart_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("attrn_restart_out").toString
    def start() = IntervalJoin.attributionStreamingNative(probes, events,
        keys = Seq("user_id"), idCol = "interval_id", probeTsCol = "p_ts",
        tsCol = "ts", window = "1 HOUR", delay = "0 seconds")
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .start()
    val base = 1700000000000000L // some event-time epoch, micros
    var active: Option[org.apache.spark.sql.streaming.StreamingQuery] = None
    try {
      val q1 = start(); active = Some(q1)
      evStream.addData(Seq((7L, base), (8L, base))) // user 8: no probe ever
      q1.processAllAvailable(); q1.stop(); active = None
      val q2 = start(); active = Some(q2)
      // probe 30 min after the batch-1 event — joins ONLY if the event
      // side's buffered state was restored from the checkpoint
      prStream.addData(Seq((7L, 501L, base + 1800L * 1000 * 1000)))
      q2.processAllAvailable(); q2.stop(); active = None
    } finally active.foreach(q => try q.stop() catch { case _: Throwable => () })
    val got = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((7L, 501L)),
      s"batch-1 event must match the post-restart probe, got $got")
  }

  test("attributionStreaming equals batch q152 on the real events table") {
    assume(new java.io.File("/root/testdata/sf0.001/events.parquet").exists())
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batch = graft.queries.CoreQueries.q152IntervalJoin(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap

    val ev = graft.Tables.load(spark, dir, "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("ts_us"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("event_type"))
      .collect()
    // every event is a point; purchases ALSO probe (fed twice)
    val rows = (ev.map(r => IntervalJoin.PointEvent(r.getLong(0),
        r.getLong(1), r.getLong(2), probe = false)) ++
      ev.filter(_.getString(3) == "purchase")
        .map(r => IntervalJoin.PointEvent(r.getLong(0), r.getLong(1),
          r.getLong(2), probe = true)))
      .sortBy(e => (e.ts_us, e.probe, e.id))
    // two micro-batches split at the median event time — windows
    // straddling the split must count state from batch 1
    val mid = rows(rows.length / 2).ts_us
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[IntervalJoin.PointEvent]
    val q = IntervalJoin.attributionStreaming(stream.toDS(),
        windowUs = 3600L * 1000 * 1000)
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("attr_ckpt").toString)
      .start()
    try {
      stream.addData(rows.filter(_.ts_us <= mid)); q.processAllAvailable()
      stream.addData(rows.filter(_.ts_us > mid)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attr_stream")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == batch)
  }
}
