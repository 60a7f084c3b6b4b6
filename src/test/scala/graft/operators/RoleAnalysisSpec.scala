package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** A5 exact-tertile arithmetic (property-tested against a direct port of
  * the recovered jar:Boundaries.train index formula), A6 ordered role
  * rules, A7 min-contribution threshold. */
class RoleAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Direct port of jar:Boundaries.train (bytecode-recovered): sort
    * ascending, low_mid = (v[n/3] + v[n/3+1]) / 2, mid_high =
    * (v[2n/3] + v[2n/3+1]) / 2, integer division; indices clamped to the
    * last element (the engine's documented deviation where the reference
    * would throw for n <= 3). */
  private def boundariesTrain(values: Seq[Double]): (Double, Double) = {
    val v = values.sorted.toIndexedSeq
    val n = v.length
    def at(i: Int) = v(math.min(i, n - 1))
    ((at(n / 3) + at(n / 3 + 1)) / 2.0,
      (at(2 * n / 3) + at(2 * n / 3 + 1)) / 2.0)
  }

  test("tertileBoundaries matches the Boundaries.train index formula (property)") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 30).map { i =>
      val n = 4 + rnd.nextInt(40)
      (s"f$i", Seq.fill(n)(math.floor(rnd.nextDouble() * 100) / 10.0))
    }
    val df = cases.flatMap { case (f, vs) => vs.map(v => (f, v)) }
      .toDF("feature", "value")
    val got = RoleAnalysis.tertileBoundaries(df)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((f, vs) <- cases)
      assert(got(f) == boundariesTrain(vs), s"feature $f n=${vs.length}")
  }

  test("tertileBoundaries clamps tiny feature sets instead of crashing") {
    val df = Seq(("f", 1.0), ("f", 2.0), ("f", 3.0)).toDF("feature", "value")
    val Array(r) = RoleAnalysis.tertileBoundaries(df).collect()
    // direct-port formula with clamped indices: n=3 -> (v[1]+v[2])/2, (v[2]+v[2])/2
    assert((r.getDouble(1), r.getDouble(2)) == boundariesTrain(Seq(1.0, 2.0, 3.0)))
  }

  /** Build a one-row level frame and read the assigned role. */
  private def roleOf(lvls: Map[String, String]): String = {
    val base = RoleAnalysis.tertileFeatures
      .foldLeft(Seq(("u1", 0.0)).toDF("user_id", "x")) { (d, f) =>
        d.withColumn(s"lvl_$f", lit(lvls.getOrElse(f, "med")))
      }
      .withColumn("lvl_postsReplyRatio", lit(lvls.getOrElse("postsReplyRatio", "med")))
    RoleAnalysis.assignRoles(base).select("role").as[String].head()
  }

  test("A6 rule table: each rule fires on its pattern") {
    assert(roleOf(Map("inDegreeRatio" -> "low", "bidirThreadRatio" -> "high",
      "bidirNeighbourRatio" -> "low")) == "Elitist")
    assert(roleOf(Map("bidirThreadRatio" -> "med", "bidirNeighbourRatio" -> "med",
      "avgPostPerThread" -> "low", "stddevPostsPerThread" -> "low")) == "Grunt")
    assert(roleOf(Map("threadInitiationRatio" -> "low", "avgPostPerThread" -> "high",
      "stddevPostsPerThread" -> "high")) == "Joining Conversationalist")
    assert(roleOf(Map("inDegreeRatio" -> "high", "avgPostPerThread" -> "high",
      "threadInitiationRatio" -> "med")) == "Popular Initiator")
    assert(roleOf(Map("inDegreeRatio" -> "high", "threadInitiationRatio" -> "low",
      "avgPostPerThread" -> "med", "stddevPostsPerThread" -> "med"))
      == "Popular Participant")
    assert(roleOf(Map("inDegreeRatio" -> "med", "bidirThreadRatio" -> "med",
      "bidirNeighbourRatio" -> "med")) == "Supporter")
    assert(roleOf(Map("bidirThreadRatio" -> "low", "bidirNeighbourRatio" -> "low",
      "avgPostPerThread" -> "low", "stddevPostsPerThread" -> "low",
      "inDegreeRatio" -> "med")) == "Taciturn")
    // bidirNeighbourRatio=high blocks rules 1-7, so rule 8 fires
    assert(roleOf(Map("postsReplyRatio" -> "low",
      "bidirNeighbourRatio" -> "high")) == "Ignored")
    assert(roleOf(Map("inDegreeRatio" -> "low", "bidirThreadRatio" -> "low",
      "bidirNeighbourRatio" -> "high", "avgPostPerThread" -> "high",
      "threadInitiationRatio" -> "high", "postsReplyRatio" -> "high"))
      == "<None>")
  }

  test("A6 precedence: first matching rule wins") {
    // matches both Elitist (rule 1) and, were it later, nothing else first
    assert(roleOf(Map("inDegreeRatio" -> "low", "bidirThreadRatio" -> "high",
      "bidirNeighbourRatio" -> "low", "postsReplyRatio" -> "low")) == "Elitist")
    // Grunt (rule 2) outranks Taciturn (rule 7) on the shared pattern
    assert(roleOf(Map("bidirThreadRatio" -> "med", "bidirNeighbourRatio" -> "med",
      "avgPostPerThread" -> "low", "stddevPostsPerThread" -> "low",
      "postsReplyRatio" -> "low")) == "Grunt")
  }

  test("A7 min-contribution threshold filters low-activity users") {
    // u1 posts twice, u2 once; nobody replies to anyone
    val nodes = Seq(
      ("n1", "u1", null.asInstanceOf[String], "n1"),
      ("n2", "u1", null.asInstanceOf[String], "n2"),
      ("n3", "u2", null.asInstanceOf[String], "n3"))
      .toDF("node_id", "user_id", "parent_id", "root_id")
    val all = RoleAnalysis.userFeatures(nodes, minContributions = 1)
      .select("user_id").as[String].collect().toSet
    val filtered = RoleAnalysis.userFeatures(nodes, minContributions = 2)
      .select("user_id").as[String].collect().toSet
    assert(all == Set("u1", "u2"))
    assert(filtered == Set("u1"))
  }

  test("A4 features on a hand-drawn community") {
    // tree: r (ua) <- c1 (ub) <- c2 (ua)   [ua replies to ub's reply: bidir]
    //       r      <- c3 (uc)
    val nodes = Seq(
      ("r", "ua", null.asInstanceOf[String], "r"),
      ("c1", "ub", "r", "r"),
      ("c2", "ua", "c1", "r"),
      ("c3", "uc", "r", "r"))
      .toDF("node_id", "user_id", "parent_id", "root_id")
    val f = RoleAnalysis.userFeatures(nodes)
      .collect().map(r => r.getAs[String]("user_id") -> r).toMap
    assert(f("ua").getAs[Long]("postCount") == 2)
    assert(f("ua").getAs[Long]("repliedPosts") == 1) // r has children
    assert(f("ua").getAs[Long]("replyingUserCount") == 2) // ub, uc replied to r
    assert(f("ub").getAs[Long]("repliedPosts") == 1) // c1 has child c2
    // bidir: c1's child c2 is authored by c1's parent author ua
    assert(f("ub").getAs[Long]("bidirThreadCount") == 1)
    assert(f("uc").getAs[Long]("bidirThreadCount") == 0)
    // |U| = 3 -> inDegreeRatio of ua = 2/3
    assert(f("ua").getAs[Double]("inDegreeRatio") == 2.0 / 3.0)
    // type=0 zeroing preserved (SURVEY §7.4 risk 4)
    assert(f("ua").getAs[Double]("threadInitiationRatio") == 0.0)
  }
}
