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
}
