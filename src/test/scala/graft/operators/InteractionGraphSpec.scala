package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[InteractionGraph.triangleCounts]] — hand-counted fixtures (K4, a
  * triangle-free star, direction/multiplicity collapse) and a random
  * graph checked against brute-force enumeration. The operator's
  * degree-oriented exactly-once device must agree with naive counting
  * for any partitioning. */
class InteractionGraphSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def inter(pairs: Seq[(String, String)]) =
    pairs.toDF("author_id", "target_user_id")

  private def counts(pairs: Seq[(String, String)]): Map[String, Long] =
    InteractionGraph.triangleCounts(inter(pairs).repartition(7))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("K4 has four triangles, every vertex in three; a star has none") {
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b
    } yield (a, b)
    assert(counts(k4) == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    // hub with 5 leaves: wedges everywhere, no closing edges
    assert(counts((1 to 5).map(i => ("hub", s"leaf$i"))).isEmpty)
  }

  test("direction and multiplicity collapse: both-way and repeated interactions count one edge") {
    // the same triangle reported via duplicated and reversed edges
    val noisy = Seq(("x", "y"), ("y", "x"), ("x", "y"),
      ("y", "z"), ("z", "x"), ("x", "z"),
      ("x", "x")) // self-loop must be dropped
    assert(counts(noisy) == Map("x" -> 1L, "y" -> 1L, "z" -> 1L))
  }

  test("clusteringCoefficients: K4 closes every wedge; a path closes none; deg<2 dropped") {
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b
    } yield (a, b)
    val gotK4 = InteractionGraph.clusteringCoefficients(inter(k4))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // every vertex: deg 3 -> 3 wedges, all closed -> coeff 1.0
    assert(gotK4 == Map("a" -> ((3L, 3L, 1.0)), "b" -> ((3L, 3L, 1.0)),
      "c" -> ((3L, 3L, 1.0)), "d" -> ((3L, 3L, 1.0))))
    // path p-q-r: only q has deg 2 (1 wedge, open); endpoints deg 1 drop
    val gotPath = InteractionGraph.clusteringCoefficients(
        inter(Seq(("p", "q"), ("q", "r"))))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(gotPath == Map("q" -> ((0L, 1L, 0.0))))
  }

  test("random graph equals brute-force triangle enumeration") {
    val rnd = new scala.util.Random(29)
    val verts = (0 until 18).map(i => s"v$i")
    val pairs = for {
      a <- verts; b <- verts if a < b && rnd.nextDouble() < 0.3
    } yield (a, b)
    // brute force over the undirected deduped edge set
    val es = pairs.toSet
    def edge(a: String, b: String) =
      es.contains(if (a < b) (a, b) else (b, a))
    val want = scala.collection.mutable.Map.empty[String, Long]
    for {
      i <- verts.indices; j <- (i + 1) until verts.length
      k <- (j + 1) until verts.length
      if edge(verts(i), verts(j)) && edge(verts(j), verts(k)) &&
        edge(verts(i), verts(k))
    } Seq(verts(i), verts(j), verts(k)).foreach { v =>
      want(v) = want.getOrElse(v, 0L) + 1L
    }
    assert(counts(pairs) == want.toMap)
  }
}
