package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interaction-graph construction (A2): re-expression of
  * roleAnalysisTopology/.../bolts/InteractionGraphBolt.java:96-196.
  *
  * The bolt's nested `HashMap<author, HashMap<action, List<Interaction>>>`
  * becomes a long-format relation `(author_id, action, target_user_id, ts)`
  * produced by three select/explode branches union'ed together — each
  * branch prunes to exactly the columns it reads, so the scan stays
  * column-pruned and the union is shuffle-free. The verbose and flat
  * graphs are groupBy aggregations keyed by (author, action): parallel-safe
  * where the Storm bolt required parallelism 1 (SURVEY.md §2.7 W8).
  */
object InteractionGraph {

  val ACTION_REPLIED = "replied_to"
  val ACTION_MENTIONED = "mentioned"
  val ACTION_RETWEETED = "retweeted"

  /** Long-format interactions from normalized tweets
    * ([[graft.sources.TweetSource.normalized]]):
    *  - replied_to: in_reply_to_user_id_str (InteractionGraphBolt.java:133-141)
    *  - mentioned: each entities.user_mentions[].id_str (:145-155, keeps
    *    duplicates — one interaction per mention occurrence)
    *  - retweeted: retweeted_status.user.id_str (:158-166)
    */
  def interactions(normalized: DataFrame): DataFrame = {
    val replied = normalized
      .filter(col("in_reply_to_user_id_str").isNotNull)
      .select(col("author_id"), col("author_screen_name"),
        lit(ACTION_REPLIED).as("action"),
        col("in_reply_to_user_id_str").as("target_user_id"), col("ts"))
    val mentioned = normalized
      .filter(col("mentioned_user_ids").isNotNull)
      .select(col("author_id"), col("author_screen_name"),
        lit(ACTION_MENTIONED).as("action"),
        explode(col("mentioned_user_ids")).as("target_user_id"), col("ts"))
      .filter(col("target_user_id").isNotNull)
    val retweeted = normalized
      .filter(col("retweeted_user_id").isNotNull)
      .select(col("author_id"), col("author_screen_name"),
        lit(ACTION_RETWEETED).as("action"),
        col("retweeted_user_id").as("target_user_id"), col("ts"))
    replied.unionByName(mentioned).unionByName(retweeted)
  }

  /** Verbose graph: per (author, action) the full interaction list with
    * timestamps, ordered by (ts, target) — SURVEY's determinism rule in
    * place of the bolt's arrival order. */
  def verboseGraph(inter: DataFrame): DataFrame =
    inter
      .withColumn("item", struct(col("ts"), col("target_user_id").as("user_id")))
      .groupBy("author_id", "action")
      .agg(array_sort(collect_list(col("item"))).as("interactions"))

  /** Flat graph: per (author, action) the distinct target set
    * (InteractionGraphBolt.java:179-196 HashSet dedup), sorted. */
  def flatGraph(inter: DataFrame): DataFrame =
    inter.groupBy("author_id", "action")
      .agg(array_sort(collect_set(col("target_user_id"))).as("targets"))

  /** Scalar summary used by the hash-checked oracle path (arrays hash
    * differently across engines; counts do not). screen_name is the
    * T10-cleaned author screen name (constant per author). */
  def flatCounts(inter: DataFrame): DataFrame =
    inter.groupBy("author_id", "action")
      .agg(
        max(col("author_screen_name")).as("screen_name"),
        count(lit(1)).as("n_interactions"),
        countDistinct(col("target_user_id")).as("n_targets"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))

  /** Exact per-vertex triangle counts over the UNDIRECTED interaction
    * graph — the clustering/cohesion metric of social-graph analysis
    * (how many of a user's neighbor pairs also interact).
    *
    * DEGREE-ORIENTED enumeration (the standard distributed-triangle
    * device): each undirected edge is oriented from its
    * (degree, id)-smaller endpoint to the larger, so every triangle is
    * generated exactly once as two out-edges of its order-minimum
    * vertex plus the closing oriented edge — and the wedge self-join
    * fans out per LOW-degree vertex, bounding the blow-up by
    * O(Σ min-degree per edge) ≈ O(E^1.5) instead of the hub-quadratic
    * O(Σ deg²) a naive shared-vertex join pays. Exactly-once
    * enumeration makes the counts integers both engines agree on; the
    * oracle enumerates by ID order instead (a different orientation —
    * same triangle set, adversarially different mechanism).
    *
    * Shape: one distinct on the (min, max) edge relation, one
    * vertex-keyed degree aggregate joined back (AQE broadcasts it when
    * small), one source-keyed wedge self-join, one edge-keyed closing
    * semi-join, one explode + count. No driver collection anywhere. */
  def triangleCounts(inter: DataFrame): DataFrame = {
    val (edges, deg) = undirectedGraph(inter)
    trianglesFrom(edges, deg)
  }

  /** Local clustering coefficient per vertex: closed wedges over
    * possible wedges, `2·T(v) / (deg(v)·(deg(v)−1))` — the standard
    * cohesion metric on top of [[triangleCounts]]. Every vertex with
    * deg ≥ 2 is reported (zero triangles included — the interesting
    * low end); registers are exact integers and the coefficient is one
    * IEEE divide of bit-identical operands, rounded in the decimal
    * domain (the house rule), so the relation hashes across engines.
    * Shares ONE materialized graph with the triangle pass. */
  def clusteringCoefficients(inter: DataFrame): DataFrame = {
    val (edges, deg) = undirectedGraph(inter)
    trianglesFrom(edges, deg)
      .join(deg.withColumnRenamed("n", "user_id"), Seq("user_id"), "right")
      .filter(col("d") >= 2)
      .select(col("user_id"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        expr("(d * (d - 1)) div 2").as("n_wedges"), // exact integer div
        round(((coalesce(col("n_triangles"), lit(0L)) * 2).cast("double") /
            (col("d") * (col("d") - 1)).cast("double"))
            .cast("decimal(28,10)"), 6)
          .cast("double").as("coeff"))
  }

  /** Deduped undirected edge relation + per-vertex degrees. Both are
    * multiply-referenced bounded working sets (degree aggregate, both
    * wedge sides, closing semi join, the coefficient denominator) —
    * left lazy, Catalyst replays the full upstream per branch (for
    * q169 that is the JSON tweet-adapter parse; measured 17 s vs
    * 1.4 s at sf0.1), so each materializes once (the withRoots
    * device), orders smaller than the interaction log. */
  private def undirectedGraph(inter: DataFrame): (DataFrame, DataFrame) = {
    val edges = inter
      .filter(col("author_id") =!= col("target_user_id"))
      .select(least(col("author_id"), col("target_user_id")).as("u"),
        greatest(col("author_id"), col("target_user_id")).as("v"))
      .distinct()
      .localCheckpoint()
    val deg = edges.select(col("u").as("n"))
      .unionByName(edges.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .localCheckpoint()
    (edges, deg)
  }

  private def trianglesFrom(edges: DataFrame, deg: DataFrame): DataFrame = {
    // orient by (degree, id): struct comparison gives the total order
    val withDeg = edges
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    val oriented = withDeg.select(
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        struct(col("u").as("s"), col("v").as("t"),
          col("du").as("ds"), col("dv").as("dt")))
        .otherwise(struct(col("v").as("s"), col("u").as("t"),
          col("dv").as("ds"), col("du").as("dt"))).as("e"))
      .select(col("e.s"), col("e.t"), col("e.ds"), col("e.dt"))
      .localCheckpoint()
    // wedges at the order-minimum vertex: two out-edges s→a, s→b with
    // a before b in the SAME total order; the closing edge is then
    // oriented a→b by construction
    val a = oriented.select(col("s"), col("t").as("a"), col("dt").as("da"))
    val b = oriented.select(col("s"), col("t").as("b"), col("dt").as("db"))
    val wedges = a.join(b, Seq("s"))
      .filter(struct(col("da"), col("a")) < struct(col("db"), col("b")))
    val closing = oriented.select(col("s").as("a"), col("t").as("b"))
    val triangles = wedges.join(closing, Seq("a", "b"), "left_semi")
      .select(col("s"), col("a"), col("b"))
    triangles
      .select(explode(array(col("s"), col("a"), col("b"))).as("user_id"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
