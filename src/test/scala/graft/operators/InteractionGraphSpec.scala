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

  private def components(pairs: Seq[(String, String)]): Map[String, String] =
    InteractionGraph.connectedComponents(inter(pairs).repartition(7))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("connectedComponents: chain, triangle and pair each label to their min id") {
    // an 8-node chain exercises multi-round star contraction (diameter
    // 7 ≫ the round count the log-contraction needs); direction noise
    // and a self-loop must collapse exactly like the triangle pass
    val chain = (1 until 8).map(i => (s"a$i", s"a${i + 1}"))
    val g = chain ++ Seq(("y", "x"), ("z", "y"), ("x", "z"), // triangle
      ("q", "p"), ("p", "q"), ("p", "p")) // pair + reversed dup + self-loop
    val got = components(g)
    val want = (1 to 8).map(i => s"a$i" -> "a1").toMap ++
      Map("x" -> "x", "y" -> "x", "z" -> "x", "p" -> "p", "q" -> "p")
    assert(got == want)
  }

  test("connectedComponents agrees with the neighbor-min clusterer on a random graph") {
    // two independent algorithms (large/small-star contraction vs
    // nearDupClusters' per-hop min propagation) over the same edges
    val rnd = new scala.util.Random(41)
    val verts = (0 until 40).map(i => f"n$i%02d")
    val pairs = for {
      a <- verts; b <- verts if a < b && rnd.nextDouble() < 0.04
    } yield (a, b)
    val star = components(pairs)
    val nodes = verts.toDF("id")
    val edges = pairs.toDF("doc_a", "doc_b")
    val minLabel = graft.pipeline.Dedup
      .nearDupClusters(nodes, edges, "id")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // nearDupClusters labels every node (singletons included); the
    // interaction graph has no isolated vertices, so compare on the
    // star-side key set
    assert(star == minLabel.view.filterKeys(star.keySet).toMap)
  }

  test("commonNeighborRecs: wedges minus edges, hub cap drops intermediates") {
    def recs(pairs: Seq[(String, String)], cap: Int = Int.MaxValue) =
      InteractionGraph.commonNeighborRecs(inter(pairs).repartition(5),
          k = 5, maxHubDegree = cap)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
    // path a-b-c: a and c share b; b has no non-neighbor candidates
    assert(recs(Seq(("a", "b"), ("b", "c"))) ==
      Set(("a", 1L, "c", 1L), ("c", 1L, "a", 1L)))
    // K4: everyone already interacts with everyone — no recommendations
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b
    } yield (a, b)
    assert(recs(k4).isEmpty)
    // star: all leaf pairs share the hub (cn=1); capping the hub to
    // degree 2 removes it as an intermediate -> nothing left
    val star = (1 to 3).map(i => ("hub", s"l$i"))
    val got = recs(star)
    assert(got == Set(
      ("l1", 1L, "l2", 1L), ("l1", 2L, "l3", 1L),
      ("l2", 1L, "l1", 1L), ("l2", 2L, "l3", 1L),
      ("l3", 1L, "l1", 1L), ("l3", 2L, "l2", 1L)))
    assert(recs(star, cap = 2).isEmpty)
  }

  test("degreeAssortativity: star is -1, path is -0.5, regular K4 is NULL") {
    def row(pairs: Seq[(String, String)]) =
      InteractionGraph.degreeAssortativity(inter(pairs)).collect().head
    val star = row((1 to 3).map(i => ("hub", s"leaf$i")))
    // registers: 6 directed pairs, Σd = 12, Σdxdy = 18, Σd² = 30
    assert((star.getLong(0), star.getLong(1), star.getLong(2)) == ((4L, 3L, 3L)))
    assert((star.getLong(3), star.getLong(4), star.getLong(5)) == ((12L, 18L, 30L)))
    assert(star.getDouble(6) == -1.0)
    val path = row(Seq(("a", "b"), ("b", "c"), ("c", "d")))
    assert(path.getDouble(6) == -0.5)
    val k4 = row(for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b
    } yield (a, b))
    assert(k4.isNullAt(6)) // 3-regular: zero variance, undefined
  }
}
