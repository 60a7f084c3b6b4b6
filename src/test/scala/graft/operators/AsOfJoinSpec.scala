package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]) = {
    val l = left.toDF("k", "ts", "id")
    val r = right.toDF("k", "ts", "id")
    AsOfJoin.asOf(l, r, keys = Seq("k"), tsCol = "ts", tieCol = "id",
        payload = Seq("id"))
      .select(col("id"), col("matched.id").as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
  }

  test("matches the latest right row at-or-before each left ts") {
    val m = run(
      left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 5L, 102L)),
      right = Seq((1L, 4L, 200L), (1L, 10L, 201L), (1L, 15L, 202L)))
    assert(m(102L).contains(200L)) // ts 5: only the ts-4 right row precedes
    assert(m(100L).contains(201L)) // ts 10: the equal-ts right row matches (inclusive)
    assert(m(101L).contains(202L)) // ts 20: latest of the three
  }

  test("no prior right row yields null; keys never cross") {
    val m = run(
      left = Seq((1L, 3L, 100L), (2L, 50L, 101L)),
      right = Seq((1L, 4L, 200L), (3L, 1L, 201L)))
    assert(m(100L).isEmpty) // right row is later
    assert(m(101L).isEmpty) // right rows exist only under other keys
  }

  test("equal-ts ties among right rows resolve to the max tiebreak") {
    val m = run(
      left = Seq((1L, 10L, 100L)),
      right = Seq((1L, 10L, 200L), (1L, 10L, 205L), (1L, 10L, 203L)))
    assert(m(100L).contains(205L))
  }

  test("agrees with the brute-force join formulation on random data") {
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(300)(i => ((rnd.nextInt(5) + 1).toLong,
      rnd.nextInt(40).toLong, 1000L + i))
    val right = Seq.tabulate(300)(i => ((rnd.nextInt(5) + 1).toLong,
      rnd.nextInt(40).toLong, 2000L + i))
    val got = run(left, right)
    val want = left.map { case (k, ts, id) =>
      val cands = right.filter(r => r._1 == k && r._2 <= ts)
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(r => (r._2, r._3))._3))
    }.toMap
    assert(got === want)
  }

  test("multiple left rows sharing one ts all see the same match") {
    val m = run(
      left = Seq((1L, 10L, 100L), (1L, 10L, 101L)),
      right = Seq((1L, 9L, 200L)))
    assert(m(100L).contains(200L) && m(101L).contains(200L))
  }

  test("asOfStreaming holds state across batches; ties mirror batch order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[AsOfJoin.AsOfEvent]
    val query = AsOfJoin.asOfStreaming(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_stream").start()
    def rows() = spark.table("asof_stream").collect()
      .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    try {
      // batch 1: left before any right → no match; equal-ts right wins
      stream.addData(
        AsOfJoin.AsOfEvent(1L, 1, 5L, 100L),  // probe at ts 5: nothing yet
        AsOfJoin.AsOfEvent(1L, 0, 10L, 200L), // rights at ts 10: max id wins
        AsOfJoin.AsOfEvent(1L, 0, 10L, 205L),
        AsOfJoin.AsOfEvent(1L, 1, 10L, 101L)) // equal-ts probe matches 205
      query.processAllAvailable()
      assert(rows() === Map(100L -> None, 101L -> Some(205L)))
      // batch 2: state carried — a later probe still sees right 205
      stream.addData(AsOfJoin.AsOfEvent(1L, 1, 50L, 102L))
      query.processAllAvailable()
      assert(rows()(102L).contains(205L))
      // keys never cross
      stream.addData(AsOfJoin.AsOfEvent(2L, 1, 99L, 103L))
      query.processAllAvailable()
      assert(rows()(103L).isEmpty)
    } finally query.stop()
  }

  test("asOfStreaming matches batch asOf on the ts-ordered events table") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"),
        when(col("event_type") === "click", 0).otherwise(1).as("side"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val batch = {
      val clicks = ev.filter(col("side") === 0)
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"), col("event_id"))
      val purchases = ev.filter(col("side") === 1)
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"), col("event_id"))
      AsOfJoin.asOf(purchases, clicks, Seq("user_id"), "ts", "event_id",
          Seq("event_id"))
        .collect().map(r => r.getLong(2) ->
          Option(r.get(3)).map(_.asInstanceOf[org.apache.spark.sql.Row].getLong(0)))
        .toMap
    }
    val ordered = ev.as[(Long, Int, Long, Long)].collect()
      .map { case (k, s, ts, id) => AsOfJoin.AsOfEvent(k, s, ts, id) }
      .sortBy(_.ts_us)
    val (a, b) = ordered.splitAt(ordered.length / 2)
    val stream = MemoryStream[AsOfJoin.AsOfEvent]
    val query = AsOfJoin.asOfStreaming(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_parity").start()
    try {
      stream.addData(a.toSeq); query.processAllAvailable()
      stream.addData(b.toSeq); query.processAllAvailable()
      val got = spark.table("asof_parity").collect()
        .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      assert(got === batch)
    } finally query.stop()
  }
}
