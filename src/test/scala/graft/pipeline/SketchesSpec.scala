package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The deterministic sketches ([[Sketches]]): CMS overestimate-only
  * guarantee and collision behavior, HLL error bound + the small-range
  * linear-counting branch the gate's corpora never reach, and
  * partitioning invariance for both (their whole reason to exist over
  * approx_count_distinct / GK). */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(parts: Int) = {
    val rnd = new scala.util.Random(44)
    val words = (0 until 400).map(i => f"w$i%03d")
    (0 until 300).map { d =>
      (d.toLong, Seq.fill(30)(words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text").repartition(parts)
  }

  test("cmsTopK: estimates never underestimate, are exact sans collisions, and inflate under forced collisions") {
    val wide = Sketches.cmsTopK(corpus(4), "text", k = 15)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(wide.length == 15)
    wide.foreach { case (_, t, exact, est) =>
      assert(est >= exact, s"CMS underestimated $t: $est < $exact") }
    // width 4 forces collisions on a 400-token vocab: SOME estimate
    // must strictly overestimate, none may deflate
    val tight = Sketches.cmsTopK(corpus(4), "text", k = 15, width = 4)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    tight.foreach { case (exact, est) => assert(est >= exact) }
    assert(tight.exists { case (exact, est) => est > exact },
      "width=4 over 400 tokens must collide somewhere")
    // partitioning invariance — the whole point of the salted-md5 form
    val again = Sketches.cmsTopK(corpus(7), "text", k = 15)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(wide.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("kmvOverlap: exact-when-small equals truth; estimator branch bounded; partitioning-invariant") {
    // small sets (30+30 items, K=256): merged sketch is COMPLETE, so
    // union/intersection must be EXACT counts — the gate's corpora only
    // exercise the estimator branch, this pins the other CASE arm
    val a = (0 until 30).map(i => ("ga", s"x$i"))
    val b = (0 until 30).map(i => ("gb", if (i < 10) s"x$i" else s"y$i"))
    val small = (a ++ b).toDF("g", "item")
    val row = Sketches.kmvOverlap(small, "g", "item").head()
    assert(row.getDouble(3) == 50.0, s"union_est ${row.getDouble(3)}") // 30+30-10
    assert(row.getDouble(4) == 10.0, s"inter_est ${row.getDouble(4)}")
    assert(row.getLong(5) == 10L)
    // estimator branch: 2000-item sets with 50% overlap, K=256 —
    // generous 3-sigma-ish bounds (sigma ~ 1/sqrt(K) ~ 6%)
    val bigA = (0 until 2000).map(i => ("ga", s"c$i"))
    val bigB = (0 until 2000).map(i => ("gb", if (i < 1000) s"c$i" else s"d$i"))
    val big = (bigA ++ bigB).toDF("g", "item").repartition(5)
    val r2 = Sketches.kmvOverlap(big, "g", "item").head()
    assert(math.abs(r2.getDouble(3) - 3000.0) / 3000.0 < 0.25,
      s"union_est ${r2.getDouble(3)}")
    assert(math.abs(r2.getDouble(4) - 1000.0) / 1000.0 < 0.5,
      s"inter_est ${r2.getDouble(4)}")
    assert(r2.getLong(5) == 1000L)
    val r3 = Sketches.kmvOverlap(big.repartition(11), "g", "item").head()
    assert(r3.getDouble(3) == r2.getDouble(3) && r3.getDouble(4) == r2.getDouble(4))
  }

  test("hllDistinct: raw-branch error within theory, ln branch on small groups, partitioning-invariant") {
    // big group: raw harmonic branch; m=64 gives sigma ~ 1.04/8 = 13%,
    // assert a generous 3-sigma bound
    val big = (0 until 4000).map(i => ("big", f"item$i%05d")).toDF("g", "item")
    val bigRow = Sketches.hllDistinct(big, "g", "item").head()
    assert(bigRow.getLong(2) == 0L, "4000 items must fill all 64 registers")
    val est = bigRow.getDouble(4)
    assert(math.abs(est - 4000.0) / 4000.0 < 0.4, s"raw estimate $est")
    // small group: zeros > 0 and raw <= 2.5m trips the ln branch, which
    // is near-exact at tiny cardinalities
    val small = (0 until 20).map(i => ("small", s"it$i")).toDF("g", "item")
    val smallRow = Sketches.hllDistinct(small, "g", "item").head()
    assert(smallRow.getLong(2) > 0L)
    assert(math.abs(smallRow.getDouble(4) - 20.0) < 4.0,
      s"linear-counting estimate ${smallRow.getDouble(4)}")
    // duplicates must not move the sketch (register = max is idempotent)
    val dup = big.unionAll(big).repartition(7)
    val dupRow = Sketches.hllDistinct(dup, "g", "item").head()
    assert(dupRow.getDouble(4) == est && dupRow.getLong(1) == 4000L)
    // partitioning invariance
    val p3 = Sketches.hllDistinct(big.repartition(3), "g", "item").head()
    assert(p3.getDouble(4) == est && p3.getLong(3) == bigRow.getLong(3))
  }
}
