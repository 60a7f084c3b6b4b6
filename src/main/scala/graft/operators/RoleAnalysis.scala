package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Community role analysis (M4 = A4 features → A5 tertiles → A6 rules),
  * re-expressed relationally from the recovered bytecode of the vendored
  * reveal-interaction jar (SURVEY.md §2.5):
  *  - features:  jar:CommunityAnalysis.analyseUserFeatures
  *  - tertiles:  jar:Boundaries.train / getLevel (verified via javap:
  *               sorted ascending v[0..n-1], low_mid = (v[n/3]+v[n/3+1])/2,
  *               mid_high = (v[2n/3]+v[2n/3+1])/2, integer division;
  *               x <= low_mid -> low, x <= mid_high -> med, else high)
  *  - rules:     jar:RoleAssociation.assignRole (first match wins,
  *               default "<None>")
  *
  * Everything is expressed with joins + groupBy + window-rank — one shuffle
  * per aggregation keyed by user/feature, no driver-side state, no UDFs —
  * so the same plan runs unchanged on a 1000-executor cluster.
  *
  * All ratio features derive from integer counts via a single double
  * division (and one sqrt), so results are bit-identical across engines —
  * the DuckDB oracle can hash-match without rounding fudge.
  */
object RoleAnalysis {

  /** The 7 features Boundaries are trained on, in the jar's order
    * (jar:RoleAssociation.process). */
  val tertileFeatures: Seq[String] = Seq(
    "avgPostPerThread", "bidirNeighbourRatio", "bidirThreadRatio",
    "inDegreeRatio", "postsReplyRatio", "stddevPostsPerThread",
    "threadInitiationRatio")

  /** Window prefix of a "<window>:<id>" scoped id ([[rolesWindowed]]). */
  private def winOf(c: Column): Column = substring_index(c, ":", 1)

  /** A4 — the 17-feature per-user aggregate over a community of
    * `nodes(node_id, user_id, parent_id, root_id)`.
    *
    * The Twitter path never sets DiscussionNode.type, so question/answer/
    * comment counts are identically zero and therefore
    * threadInitiationRatio = avgCommentsPerPost = avgRepliesPerQuestion = 0
    * (SURVEY.md §2.5 A4 — preserved faithfully; do NOT "fix").
    *
    * `windowed = true` treats ids as "<window>:<id>" (see
    * [[rolesWindowed]]): every per-user aggregation is automatically
    * window-scoped because the prefixed ids are window-unique; only |U|
    * (the inDegreeRatio denominator) needs explicit per-window
    * computation. */
  def userFeatures(nodes: DataFrame, minContributions: Int = 1,
      windowed: Boolean = false): DataFrame = {
    val base = nodes.select("node_id", "user_id", "parent_id", "root_id")

    // parent author per node. Cached: n1 self-joins into the edge view and
    // would otherwise recompute the base join once per side.
    val authors = base.select(col("node_id").as("a_nid"), col("user_id").as("a_uid"))
    val n1 = base.join(authors, col("parent_id") === col("a_nid"), "left")
      .select(col("node_id"), col("user_id"), col("parent_id"), col("root_id"),
        col("a_uid").as("parent_author"))
      .cache()

    // child edge view: child c under parent node n (with n's parent author).
    // Cached: four aggregation branches below (replied, bidir, both halves
    // of neighbours) scan it — uncached, each branch would replay the
    // two-join pipeline, the single biggest cost in the role query.
    val parents = n1.select(col("node_id").as("p_nid"), col("user_id").as("p_uid"),
      col("parent_author").as("p_grandp"), col("parent_id").as("p_parent"))
    val e = n1.join(parents, col("parent_id") === col("p_nid"))
      .select(col("user_id").as("child_author"),
        col("p_nid"), col("p_uid"), col("p_grandp"), col("p_parent"))
      .cache()

    // |U| as a broadcast 1-row aggregate cross-joined in at the end — NOT a
    // driver-side .first() action, which would execute the whole upstream
    // once per plan construction and block pipelining at scale. In
    // windowed mode it is a per-window aggregate joined on the prefix.
    val totalUsers =
      if (windowed)
        base.groupBy(winOf(col("user_id")).as("w"))
          .agg(countDistinct("user_id").cast("double").as("total_users"))
      else
        base.agg(countDistinct("user_id").cast("double").as("total_users"))

    try {
      userFeaturesFrom(base, n1, e, totalUsers, minContributions, windowed)
        // The feature frame is one row per user — tiny next to n1/e.
        // Materializing it eagerly here bounds the caches' lifecycle:
        // n1/e unpersist on return instead of living until session end
        // (one leaked pair per call in long-lived sessions otherwise).
        .localCheckpoint(true)
    } finally { n1.unpersist(false); e.unpersist(false) }
  }

  private def userFeaturesFrom(base: DataFrame, n1: DataFrame, e: DataFrame,
      totalUsers: DataFrame, minContributions: Int, windowed: Boolean): DataFrame = {
    val posts = base.groupBy("user_id").agg(count(lit(1)).as("postCount"))
    val replied = e.groupBy(col("p_uid")).agg(
      countDistinct(col("p_nid")).as("repliedPosts"),
      countDistinct(col("child_author")).as("replyingUserCount"))
    val bidir = e.filter(col("child_author") === col("p_grandp"))
      .groupBy(col("p_uid"))
      .agg(countDistinct(col("p_nid")).as("bidirThreadCount"),
        countDistinct(col("p_grandp")).as("bidirUserCount"))
    // neighbours = replying users ∪ parent authors of replied nodes that
    // themselves have a parent
    val neighbours = e.select(col("p_uid").as("u"), col("child_author").as("x"))
      .unionByName(e.filter(col("p_parent").isNotNull)
        .select(col("p_uid").as("u"), col("p_grandp").as("x")))
      .groupBy(col("u")).agg(countDistinct(col("x")).as("neighbourCount"))

    // discussion trees the user touched; tree size = whole tree
    val treeSize = base.groupBy("root_id").agg(count(lit(1)).as("tree_size"))
    val userTrees = base.select("user_id", "root_id").distinct()
      .join(treeSize, "root_id")
      .groupBy("user_id").agg(
        count(lit(1)).as("discussionCount"),
        sum("tree_size").as("sumSize"),
        sum(col("tree_size") * col("tree_size")).as("sumSize2"))

    posts
      .join(replied.withColumnRenamed("p_uid", "user_id"), Seq("user_id"), "left")
      .join(bidir.withColumnRenamed("p_uid", "user_id"), Seq("user_id"), "left")
      .join(neighbours.withColumnRenamed("u", "user_id"), Seq("user_id"), "left")
      .join(userTrees, Seq("user_id"), "left")
      .transform { d =>
        if (windowed)
          d.withColumn("w", winOf(col("user_id"))).join(totalUsers, "w").drop("w")
        else d.crossJoin(broadcast(totalUsers))
      }
      .na.fill(0L, Seq("repliedPosts", "replyingUserCount", "bidirThreadCount",
        "bidirUserCount", "neighbourCount", "discussionCount", "sumSize", "sumSize2"))
      .filter(col("postCount") >= lit(minContributions))
      .select(
        col("user_id"),
        col("postCount"), col("repliedPosts"), col("replyingUserCount"),
        col("neighbourCount"), col("bidirThreadCount"), col("bidirUserCount"),
        col("discussionCount"),
        (col("replyingUserCount").cast("double") / col("total_users"))
          .as("inDegreeRatio"),
        when(col("postCount") > 0,
          col("repliedPosts").cast("double") / col("postCount").cast("double"))
          .otherwise(0.0).as("postsReplyRatio"),
        lit(0.0).as("threadInitiationRatio"),
        lit(0.0).as("avgCommentsPerPost"),
        lit(0.0).as("avgRepliesPerQuestion"),
        when(col("neighbourCount") > 0,
          col("bidirUserCount").cast("double") / col("neighbourCount").cast("double"))
          .otherwise(0.0).as("bidirNeighbourRatio"),
        when(col("postCount") > 0,
          col("bidirThreadCount").cast("double") / col("postCount").cast("double"))
          .otherwise(0.0).as("bidirThreadRatio"),
        when(col("discussionCount") > 0,
          col("sumSize").cast("double") / col("discussionCount").cast("double"))
          .otherwise(0.0).as("avgPostPerThread"),
        when(col("discussionCount") >= 2,
          sqrt((col("discussionCount") * col("sumSize2") - col("sumSize") * col("sumSize"))
            .cast("double") /
            (col("discussionCount") * (col("discussionCount") - 1)).cast("double")))
          .otherwise(0.0).as("stddevPostsPerThread"))
  }

  /** A5 — exact tertile boundaries per feature over all users, via the
    * jar's index arithmetic (NOT ntile, NOT percentile_approx). Index
    * overflow for tiny communities (n <= 3 crashes the reference with an
    * IndexOutOfBounds) is clamped to the last element — documented
    * deviation that only fires where the reference cannot run at all.
    * Input: long format (feature STRING, value DOUBLE). */
  def tertileBoundaries(featureValues: DataFrame,
      extraKeys: Seq[String] = Nil): DataFrame = {
    val keys = "feature" +: extraKeys
    val w = Window.partitionBy(keys.map(col): _*).orderBy("value")
    val ranked = featureValues
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
    ranked.groupBy(keys.map(col): _*).agg(
      ((max(when(col("rn") === least(floor(col("n") / 3) + 1, col("n")), col("value"))) +
        max(when(col("rn") === least(floor(col("n") / 3) + 2, col("n")), col("value")))) / 2.0)
        .as("low_mid"),
      ((max(when(col("rn") === least(floor(col("n") * 2 / 3) + 1, col("n")), col("value"))) +
        max(when(col("rn") === least(floor(col("n") * 2 / 3) + 2, col("n")), col("value")))) / 2.0)
        .as("mid_high"))
  }

  /** Melt the 7 tertile features to long format (user_id, feature, value). */
  def meltFeatures(features: DataFrame): DataFrame = {
    val stackExpr = tertileFeatures.map(f => s"'$f', $f").mkString(", ")
    features.selectExpr("user_id",
      s"stack(${tertileFeatures.size}, $stackExpr) as (feature, value)")
  }

  /** A5 levels: join each (user, feature, value) against its boundaries.
    * The feature frame arrives checkpointed from [[userFeatures]] (one
    * row per user, materialized eagerly there), so the melt→boundaries→
    * levels path and the final join replay only a block read — no cache
    * needed here, and nothing to leak.
    * Windowed mode trains boundaries per "<window>:" user-id prefix (the
    * reference trains Boundaries over the users of ONE window's
    * community). */
  def withLevels(featuresIn: DataFrame, windowed: Boolean = false): DataFrame = {
    val features = featuresIn
    val melted0 = meltFeatures(features)
    val melted =
      if (windowed) melted0.withColumn("w", winOf(col("user_id"))) else melted0
    val boundKeys = if (windowed) Seq("w") else Nil
    val bounds = tertileBoundaries(melted, boundKeys)
    val lvl = melted.join(bounds, "feature" +: boundKeys)
      .withColumn("level",
        when(col("value") <= col("low_mid"), "low")
          .when(col("value") <= col("mid_high"), "med")
          .otherwise("high"))
      .groupBy("user_id")
      .pivot("feature", tertileFeatures)
      .agg(first("level"))
    val renamed = tertileFeatures.foldLeft(lvl)((d, f) => d.withColumnRenamed(f, s"lvl_$f"))
    features.join(renamed, "user_id")
  }

  /** A6 — ordered role rules; first match wins (verified via javap of
    * jar:RoleAssociation.assignRole). */
  def assignRoles(withLvls: DataFrame): DataFrame = {
    def l(f: String) = col(s"lvl_$f")
    withLvls.withColumn("role",
      when(l("inDegreeRatio") === "low" && l("bidirThreadRatio") === "high" &&
        l("bidirNeighbourRatio") === "low", "Elitist")
        .when(l("bidirThreadRatio") === "med" && l("bidirNeighbourRatio") === "med" &&
          l("avgPostPerThread") === "low" && l("stddevPostsPerThread") === "low", "Grunt")
        .when(l("threadInitiationRatio") === "low" && l("avgPostPerThread") === "high" &&
          l("stddevPostsPerThread") === "high", "Joining Conversationalist")
        .when(l("inDegreeRatio") === "high" && l("avgPostPerThread") === "high",
          "Popular Initiator")
        .when(l("inDegreeRatio") === "high" && l("threadInitiationRatio") === "low" &&
          l("avgPostPerThread") === "med" && l("stddevPostsPerThread") === "med",
          "Popular Participant")
        .when(l("inDegreeRatio") === "med" && l("bidirThreadRatio") === "med" &&
          l("bidirNeighbourRatio") === "med", "Supporter")
        .when(l("bidirThreadRatio") === "low" && l("bidirNeighbourRatio") === "low" &&
          l("avgPostPerThread") === "low" && l("stddevPostsPerThread") === "low", "Taciturn")
        .when(l("postsReplyRatio") === "low", "Ignored")
        .otherwise("<None>"))
  }

  /** M4 — full composition: nodes → features → levels → roles. */
  def roles(nodes: DataFrame, minContributions: Int = 1): DataFrame =
    assignRoles(withLevels(userFeatures(nodes, minContributions)))

  /** M4, per-window: every node/user id carries a "<window>:" prefix
    * (see [[graft.runner.Topologies]]), so user-level aggregations are
    * window-scoped by key construction, and |U| + tertile boundaries are
    * computed per window — each flushed window is an independent
    * community, exactly the reference's per-flush RoleAnalysisBolt run,
    * but all windows compute in one shuffle-parallel plan instead of a
    * driver loop. */
  def rolesWindowed(nodes: DataFrame, minContributions: Int = 1): DataFrame =
    assignRoles(withLevels(
      userFeatures(nodes, minContributions, windowed = true), windowed = true))
}
