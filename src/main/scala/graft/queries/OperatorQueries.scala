package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{DiscussionTree, InteractionGraph, Lod, RoleAnalysis, TopicModel}
import graft.sources.TweetSource
import graft.streaming.PunctuationWindow

/** Topology-operator queries (SURVEY.md §2): every reference operator
  * surfaced as a relational query over the driver's test tables, with a
  * DuckDB oracle twin.
  *
  * The tweet-shaped inputs come from [[TweetSource.eventsAsTweetJson]] — a
  * deterministic events→Twitter-JSON adapter — so the full S1 ingest path
  * (JSON encode → from_json decode → F1/F6/F7 normalize → T1 timestamp
  * parse) runs end-to-end on driver data, and the oracles mirror the
  * adapter's arithmetic directly over `events`.
  */
object OperatorQueries {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  private def tsStr(c: Column): Column = CoreQueries.tsStr(c)
  private def tsStrMicros(c: Column): Column = CoreQueries.tsStrMicros(c)

  /** q12–q14 share one normalized-events relation and one rooted-nodes
    * relation, cached per (session, sf dir): the events → tweet-JSON →
    * from_json → normalize prefix and the pointer-doubling root resolution
    * each execute ONCE per session instead of once per query (and, inside
    * q14, once per self-join branch). At cluster scale this is the
    * difference between reading the events table 10+ times and reading it
    * once into executor-local cache. */
  private val shared =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  private def normalizedEvents(spark: SparkSession, dir: String): DataFrame =
    shared.getOrElseUpdate((spark.sparkContext.applicationId, s"norm:$dir"),
      TweetSource.normalizedFromEvents(events(spark, dir)).cache())

  /** Rooted node relation shared by q13/q14 (J4 + pointer-doubling root
    * resolution over the events reply/retweet graph). localCheckpoint
    * (materialize + truncate lineage) rather than cache: the role query
    * references this relation in ~10 self-join branches, and a flat
    * LogicalRDD keeps its analyzed plan linear where the full
    * pointer-doubling lineage would make it exponential (see
    * [[DiscussionTree.withRoots]]). */
  private def rootedNodes(spark: SparkSession, dir: String): DataFrame =
    shared.getOrElseUpdate((spark.sparkContext.applicationId, s"rooted:$dir"),
      DiscussionTree.withRoots(
        DiscussionTree.nodes(normalizedEvents(spark, dir)).cache())
        .localCheckpoint())

  /** A2 — interaction-graph aggregate (flat counts form: portable across
    * engines where nested arrays are not). */
  def q12InteractionCounts(spark: SparkSession, dir: String): DataFrame = {
    val inter = InteractionGraph.interactions(normalizedEvents(spark, dir))
    InteractionGraph.flatCounts(inter)
      .select(col("author_id"), col("action"), col("screen_name"),
        col("n_interactions"), col("n_targets"),
        tsStr(col("first_ts")).as("first_ts"),
        tsStr(col("last_ts")).as("last_ts"))
      .orderBy(col("author_id"), col("action"))
  }

  /** A1/J4 — discussion-tree assembly: per-root size/depth stats after
    * pointer-doubling root resolution. */
  def q13TreeStats(spark: SparkSession, dir: String): DataFrame =
    DiscussionTree.treeStats(rootedNodes(spark, dir))
      .orderBy(col("root_id"))

  /** M4 = A4 features → A5 exact tertiles → A6 ordered role rules. */
  def q14Roles(spark: SparkSession, dir: String): DataFrame = {
    val nodes = rootedNodes(spark, dir)
      .select("node_id", "user_id", "parent_id", "root_id")
    RoleAnalysis.roles(nodes)
      .select(
        col("user_id"), col("postCount"), col("repliedPosts"),
        col("replyingUserCount"), col("neighbourCount"),
        col("bidirThreadCount"), col("bidirUserCount"), col("discussionCount"),
        col("inDegreeRatio"), col("postsReplyRatio"),
        col("bidirNeighbourRatio"), col("bidirThreadRatio"),
        col("avgPostPerThread"), col("stddevPostsPerThread"),
        col("lvl_inDegreeRatio"), col("lvl_postsReplyRatio"),
        col("lvl_bidirNeighbourRatio"), col("lvl_bidirThreadRatio"),
        col("lvl_avgPostPerThread"), col("lvl_stddevPostsPerThread"),
        col("lvl_threadInitiationRatio"), col("role"))
      .orderBy(col("user_id"))
  }

  /** T2/T3 + A8 + M2 + A9 + T5 — topic-model pipeline: stemmed corpus
    * vocab → word-id indexing → count-5 micro-batches → deterministic
    * location scoring → per-doc top-5 with the "lon,lat" string. */
  def q15TopicModel(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val vocab = TopicModel.buildVocab(d, "text", stem = true)
    val indexed = TopicModel.indexDocs(d, "doc_id", "text", vocab, stem = true)
    val batches = TopicModel.withCountBatches(
      indexed.select(col("doc_id")), "doc_id")
    val scored = TopicModel.scoreLocations(indexed, "doc_id", numLocations = 25)
    TopicModel.topLocations(scored, "doc_id", k = 5)
      .join(batches, "doc_id")
      .select(col("doc_id"), col("batch_id"),
        col("rank").cast("long").as("rank"), col("loc"),
        col("location"), col("score"), col("probability"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** J1 + J3 + T6 — LOD enrichment: customer nations → owl:sameAs lookup →
    * coordinate/label dereference → WKT output. Triple tables derive
    * deterministically from nation/region (the snapshot-side-input model
    * of SURVEY §2.4; integer-valued coordinates keep string formatting
    * engine-portable). */
  def q16LodEnrich(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.load(spark, dir, "nation")
    val dbpUri = concat(lit("dbp:"), lower(regexp_replace(col("n_name"), " ", "_")))
    val sameAs = n.select(dbpUri.as("subject"),
      concat(lit("lgd:"), col("n_nationkey")).as("object"))
    val triples =
      n.select(dbpUri.as("subject"), lit("geo:lat").as("predicate"),
          (col("n_nationkey") * 3 - 20).cast("string").as("object"),
          lit(null).cast("string").as("lang_tag"))
        .unionByName(n.select(dbpUri.as("subject"), lit("geo:long").as("predicate"),
          (col("n_nationkey") * 7 - 40).cast("string").as("object"),
          lit(null).cast("string").as("lang_tag")))
        .unionByName(n.select(dbpUri.as("subject"), lit("rdfs:label").as("predicate"),
          col("n_name").as("object"), lit("en").as("lang_tag")))
    val locs = Tables.load(spark, dir, "customer")
      .select(col("c_nationkey")).distinct()
      .withColumn("lgd_uri", concat(lit("lgd:"), col("c_nationkey")))
    val linked = Lod.sameAsLookup(locs, "lgd_uri", sameAs)
    Lod.dereferencePlaces(linked, "dbpedia_uri", triples)
      .select(col("c_nationkey"), col("dbpedia_uri"),
        col("lat").cast("long").as("lat"), col("lon").cast("long").as("lon"),
        col("label"),
        graft.functions.TextFunctions.wktPointLatFirst(col("lat"), col("lon")).as("wkt"))
      .orderBy(col("c_nationkey"))
  }

  /** T9 — naive-Bayes relevance over candidate property lists; counts
    * table derived from region, candidates + properties from supplier key
    * arithmetic. */
  def q17NbRelevance(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.load(spark, dir, "region")
    val counts = r.select(
      element_at(
        array(lit("p:a"), lit("p:b"), lit("p:c"), lit("p:d"), lit("total")),
        (col("r_regionkey") + 1).cast("int")).as("property"),
      ((col("r_regionkey") + 2) * 3).cast("double").as("rel"),
      (col("r_regionkey") + 2).cast("double").as("irrel"))
    val s = Tables.load(spark, dir, "supplier")
    val props = Seq(("p:a", 2), ("p:b", 3), ("p:c", 5), ("p:x", 7))
      .map { case (p, m) =>
        s.filter(col("s_suppkey") % m === 0)
          .select(col("s_suppkey"), lit(p).as("property"))
      }.reduce(_ unionByName _)
    Lod.nbRelevance(props, Seq("s_suppkey"), counts)
      .select(col("s_suppkey"), col("n_known_props"),
        round(col("log_pos"), 6).as("log_pos"),
        round(col("log_neg"), 6).as("log_neg"), col("accepted"))
      .orderBy(col("s_suppkey"))
  }

  /** W1/W2/W3 — the reference's first-event-aligned punctuation windows
    * (batch parity mode) over events keyed by user. */
  def q18PunctuationWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = PunctuationWindow.fromColumns(
      events(spark, dir), "user_id", "ts", "event_id")
    PunctuationWindow.toDataFrame(
        PunctuationWindow.batch(ev, lengthMicros = 600000000L))
      .select(col("key"),
        tsStrMicros(col("window_start")).as("window_start"),
        tsStrMicros(col("window_end")).as("window_end"),
        col("n_events"))
      .orderBy(col("key"), col("window_start"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q12_interaction_counts" -> q12InteractionCounts,
    "q13_tree_stats" -> q13TreeStats,
    "q14_roles" -> q14Roles,
    "q15_topic_model" -> q15TopicModel,
    "q16_lod_enrich" -> q16LodEnrich,
    "q17_nb_relevance" -> q17NbRelevance,
    "q18_punctuation_window" -> q18PunctuationWindow)

  /** Oracle mirror of [[TweetSource.eventsAsTweetJson]]: the events table
    * reinterpreted as tweets (second-truncated timestamps — the Twitter
    * format carries no sub-second precision). `live` drops the adapter's
    * synthetic Twitter DELETE messages exactly like the F1 filter. */
  private val eventsCte =
    """WITH e AS (
      |  SELECT event_id, user_id::VARCHAR AS author_id,
      |    date_trunc('second', ts::TIMESTAMP) AS ts, event_type,
      |    nullif(regexp_extract(props, '"k"\s*:\s*(\d+)', 1), '')::BIGINT AS k
      |  FROM events),
      |live AS (
      |  SELECT * FROM e
      |  WHERE NOT (event_type = 'view' AND k IS NOT NULL AND k % 13 = 9))"""
      .stripMargin

  /** Node relation incl. J4 dummy-root synthesis: parents absent from the
    * observed set (deleted tweets, or the adapter's explicit orphan
    * targets) become unobserved roots authored by min(reply-to user) —
    * string min, matching [[DiscussionTree.nodes]]. Dummies created only
    * by retweets carry a NULL author (the reference reads the reply-to
    * fields, which retweets don't set). */
  private val nodesCte =
    s"""$eventsCte,
       |obs AS (
       |  SELECT event_id::VARCHAR AS node_id, author_id AS user_id,
       |    CASE WHEN event_type IN ('signup','error') AND k IS NOT NULL
       |             AND k < event_id
       |           THEN (CASE WHEN k % 10 = 7 THEN k + 2000000000
       |                 ELSE k END)::VARCHAR
       |         WHEN event_type = 'purchase' AND k IS NOT NULL
       |             AND k < event_id
       |           THEN k::VARCHAR END AS parent_id,
       |    CASE WHEN event_type IN ('signup','error') AND k IS NOT NULL
       |             AND k < event_id
       |         THEN (CASE WHEN k % 10 = 7 THEN 100 + k % 25
       |               ELSE k % 25 END)::VARCHAR END AS reply_user,
       |    TRUE AS observed
       |  FROM live),
       |dummies AS (
       |  SELECT o.parent_id AS node_id, min(o.reply_user) AS user_id,
       |    NULL::VARCHAR AS parent_id, FALSE AS observed
       |  FROM obs o
       |  WHERE o.parent_id IS NOT NULL
       |    AND NOT EXISTS (SELECT 1 FROM obs i WHERE i.node_id = o.parent_id)
       |  GROUP BY o.parent_id),
       |nodes AS (
       |  SELECT node_id, user_id, parent_id, observed FROM obs
       |  UNION ALL
       |  SELECT node_id, user_id, parent_id, observed FROM dummies),
       |walk AS (
       |  SELECT node_id, node_id AS cur, parent_id AS nxt, 0::BIGINT AS depth
       |  FROM nodes
       |  UNION ALL
       |  SELECT w.node_id, n.node_id, n.parent_id, w.depth + 1
       |  FROM walk w JOIN nodes n ON w.nxt = n.node_id),
       |rooted AS (
       |  SELECT n.node_id, n.user_id, n.parent_id, n.observed,
       |    w.cur AS root_id, w.depth
       |  FROM nodes n JOIN walk w ON w.node_id = n.node_id AND w.nxt IS NULL)"""
      .stripMargin

  private val rolesFeatureCte =
    s"""WITH RECURSIVE ${nodesCte.stripPrefix("WITH ")},
       |base AS (SELECT node_id, user_id, parent_id, root_id FROM rooted),
       |n1 AS (
       |  SELECT b.node_id, b.user_id, b.parent_id, b.root_id,
       |    pa.user_id AS parent_author
       |  FROM base b LEFT JOIN base pa ON b.parent_id = pa.node_id),
       |ed AS (
       |  SELECT c.user_id AS child_author, p.node_id AS p_nid,
       |    p.user_id AS p_uid, p.parent_author AS p_grandp,
       |    p.parent_id AS p_parent
       |  FROM n1 c JOIN n1 p ON c.parent_id = p.node_id),
       |tot AS (SELECT count(DISTINCT user_id) AS total_users FROM base),
       |posts AS (SELECT user_id, count(*) AS postCount FROM base GROUP BY 1),
       |replied AS (
       |  SELECT p_uid AS user_id, count(DISTINCT p_nid) AS repliedPosts,
       |    count(DISTINCT child_author) AS replyingUserCount
       |  FROM ed GROUP BY 1),
       |bidir AS (
       |  SELECT p_uid AS user_id, count(DISTINCT p_nid) AS bidirThreadCount,
       |    count(DISTINCT p_grandp) AS bidirUserCount
       |  FROM ed WHERE child_author = p_grandp GROUP BY 1),
       |neigh AS (
       |  SELECT user_id, count(DISTINCT x) AS neighbourCount FROM (
       |    SELECT p_uid AS user_id, child_author AS x FROM ed
       |    UNION ALL
       |    SELECT p_uid, p_grandp FROM ed WHERE p_parent IS NOT NULL)
       |  GROUP BY 1),
       |tsz AS (SELECT root_id, count(*) AS tree_size FROM base GROUP BY 1),
       |ut AS (
       |  SELECT user_id, count(*) AS discussionCount,
       |    sum(tree_size)::BIGINT AS sumSize,
       |    sum(tree_size * tree_size)::BIGINT AS sumSize2
       |  FROM (SELECT DISTINCT user_id, root_id FROM base) d
       |  JOIN tsz USING (root_id) GROUP BY 1),
       |feats AS (
       |  SELECT p.user_id, p.postCount,
       |    coalesce(r.repliedPosts, 0) AS repliedPosts,
       |    coalesce(r.replyingUserCount, 0) AS replyingUserCount,
       |    coalesce(ng.neighbourCount, 0) AS neighbourCount,
       |    coalesce(bd.bidirThreadCount, 0) AS bidirThreadCount,
       |    coalesce(bd.bidirUserCount, 0) AS bidirUserCount,
       |    coalesce(u.discussionCount, 0) AS discussionCount,
       |    coalesce(r.replyingUserCount, 0)::DOUBLE / t.total_users::DOUBLE
       |      AS inDegreeRatio,
       |    CASE WHEN p.postCount > 0 THEN
       |      coalesce(r.repliedPosts, 0)::DOUBLE / p.postCount::DOUBLE
       |      ELSE 0.0 END AS postsReplyRatio,
       |    0.0 AS threadInitiationRatio,
       |    CASE WHEN coalesce(ng.neighbourCount, 0) > 0 THEN
       |      coalesce(bd.bidirUserCount, 0)::DOUBLE / ng.neighbourCount::DOUBLE
       |      ELSE 0.0 END AS bidirNeighbourRatio,
       |    CASE WHEN p.postCount > 0 THEN
       |      coalesce(bd.bidirThreadCount, 0)::DOUBLE / p.postCount::DOUBLE
       |      ELSE 0.0 END AS bidirThreadRatio,
       |    CASE WHEN coalesce(u.discussionCount, 0) > 0 THEN
       |      u.sumSize::DOUBLE / u.discussionCount::DOUBLE
       |      ELSE 0.0 END AS avgPostPerThread,
       |    CASE WHEN coalesce(u.discussionCount, 0) >= 2 THEN
       |      sqrt((u.discussionCount * u.sumSize2 - u.sumSize * u.sumSize)::DOUBLE
       |        / (u.discussionCount * (u.discussionCount - 1))::DOUBLE)
       |      ELSE 0.0 END AS stddevPostsPerThread
       |  FROM posts p CROSS JOIN tot t
       |  LEFT JOIN replied r ON r.user_id = p.user_id
       |  LEFT JOIN bidir bd ON bd.user_id = p.user_id
       |  LEFT JOIN neigh ng ON ng.user_id = p.user_id
       |  LEFT JOIN ut u ON u.user_id = p.user_id
       |  WHERE p.postCount >= 1),
       |melt AS (
       |  SELECT user_id, 'avgPostPerThread' AS feature, avgPostPerThread AS value FROM feats
       |  UNION ALL SELECT user_id, 'bidirNeighbourRatio', bidirNeighbourRatio FROM feats
       |  UNION ALL SELECT user_id, 'bidirThreadRatio', bidirThreadRatio FROM feats
       |  UNION ALL SELECT user_id, 'inDegreeRatio', inDegreeRatio FROM feats
       |  UNION ALL SELECT user_id, 'postsReplyRatio', postsReplyRatio FROM feats
       |  UNION ALL SELECT user_id, 'stddevPostsPerThread', stddevPostsPerThread FROM feats
       |  UNION ALL SELECT user_id, 'threadInitiationRatio', threadInitiationRatio FROM feats),
       |ranked AS (
       |  SELECT user_id, feature, value,
       |    row_number() OVER (PARTITION BY feature ORDER BY value) AS rn,
       |    count(*) OVER (PARTITION BY feature) AS n
       |  FROM melt),
       |bounds AS (
       |  SELECT feature,
       |    (max(CASE WHEN rn = least(n // 3 + 1, n) THEN value END)
       |     + max(CASE WHEN rn = least(n // 3 + 2, n) THEN value END)) / 2.0
       |      AS low_mid,
       |    (max(CASE WHEN rn = least((2 * n) // 3 + 1, n) THEN value END)
       |     + max(CASE WHEN rn = least((2 * n) // 3 + 2, n) THEN value END)) / 2.0
       |      AS mid_high
       |  FROM ranked GROUP BY feature),
       |lv AS (
       |  SELECT m.user_id, m.feature,
       |    CASE WHEN m.value <= b.low_mid THEN 'low'
       |      WHEN m.value <= b.mid_high THEN 'med'
       |      ELSE 'high' END AS level
       |  FROM melt m JOIN bounds b USING (feature)),
       |piv AS (
       |  SELECT user_id,
       |    max(CASE WHEN feature = 'inDegreeRatio' THEN level END) AS lvl_inDegreeRatio,
       |    max(CASE WHEN feature = 'postsReplyRatio' THEN level END) AS lvl_postsReplyRatio,
       |    max(CASE WHEN feature = 'bidirNeighbourRatio' THEN level END) AS lvl_bidirNeighbourRatio,
       |    max(CASE WHEN feature = 'bidirThreadRatio' THEN level END) AS lvl_bidirThreadRatio,
       |    max(CASE WHEN feature = 'avgPostPerThread' THEN level END) AS lvl_avgPostPerThread,
       |    max(CASE WHEN feature = 'stddevPostsPerThread' THEN level END) AS lvl_stddevPostsPerThread,
       |    max(CASE WHEN feature = 'threadInitiationRatio' THEN level END) AS lvl_threadInitiationRatio
       |  FROM lv GROUP BY user_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q12_interaction_counts" ->
      s"""$eventsCte,
         |inter AS (
         |  SELECT author_id, 'replied_to' AS action,
         |    (CASE WHEN k % 10 = 7 THEN 100 + k % 25
         |     ELSE k % 25 END)::VARCHAR AS target, ts
         |  FROM live WHERE event_type IN ('signup','error') AND k IS NOT NULL AND k < event_id
         |  UNION ALL
         |  SELECT author_id, 'mentioned', (k % 25)::VARCHAR, ts
         |  FROM live WHERE event_type IN ('click','view') AND k IS NOT NULL
         |  UNION ALL
         |  SELECT author_id, 'mentioned', ((k * 3 + 1) % 25)::VARCHAR, ts
         |  FROM live WHERE event_type IN ('click','view') AND k IS NOT NULL
         |  UNION ALL
         |  SELECT author_id, 'retweeted', (k % 25)::VARCHAR, ts
         |  FROM live WHERE event_type = 'purchase' AND k IS NOT NULL AND k < event_id)
         |SELECT author_id, action, 'u' || author_id AS screen_name,
         |  count(*) AS n_interactions,
         |  count(DISTINCT target) AS n_targets,
         |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
         |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
         |FROM inter GROUP BY author_id, action
         |ORDER BY author_id, action""".stripMargin,
    "q13_tree_stats" ->
      s"""WITH RECURSIVE ${nodesCte.stripPrefix("WITH ")}
         |SELECT root_id, count(*) AS tree_size, max(depth) AS max_depth,
         |  count(CASE WHEN NOT observed THEN 1 END) AS dummy_roots
         |FROM rooted GROUP BY root_id ORDER BY root_id""".stripMargin,
    "q14_roles" ->
      s"""$rolesFeatureCte
         |SELECT f.user_id, f.postCount, f.repliedPosts, f.replyingUserCount,
         |  f.neighbourCount, f.bidirThreadCount, f.bidirUserCount,
         |  f.discussionCount, f.inDegreeRatio, f.postsReplyRatio,
         |  f.bidirNeighbourRatio, f.bidirThreadRatio, f.avgPostPerThread,
         |  f.stddevPostsPerThread,
         |  p.lvl_inDegreeRatio, p.lvl_postsReplyRatio,
         |  p.lvl_bidirNeighbourRatio, p.lvl_bidirThreadRatio,
         |  p.lvl_avgPostPerThread, p.lvl_stddevPostsPerThread,
         |  p.lvl_threadInitiationRatio,
         |  CASE
         |    WHEN p.lvl_inDegreeRatio = 'low' AND p.lvl_bidirThreadRatio = 'high'
         |      AND p.lvl_bidirNeighbourRatio = 'low' THEN 'Elitist'
         |    WHEN p.lvl_bidirThreadRatio = 'med' AND p.lvl_bidirNeighbourRatio = 'med'
         |      AND p.lvl_avgPostPerThread = 'low'
         |      AND p.lvl_stddevPostsPerThread = 'low' THEN 'Grunt'
         |    WHEN p.lvl_threadInitiationRatio = 'low'
         |      AND p.lvl_avgPostPerThread = 'high'
         |      AND p.lvl_stddevPostsPerThread = 'high'
         |      THEN 'Joining Conversationalist'
         |    WHEN p.lvl_inDegreeRatio = 'high' AND p.lvl_avgPostPerThread = 'high'
         |      THEN 'Popular Initiator'
         |    WHEN p.lvl_inDegreeRatio = 'high'
         |      AND p.lvl_threadInitiationRatio = 'low'
         |      AND p.lvl_avgPostPerThread = 'med'
         |      AND p.lvl_stddevPostsPerThread = 'med' THEN 'Popular Participant'
         |    WHEN p.lvl_inDegreeRatio = 'med' AND p.lvl_bidirThreadRatio = 'med'
         |      AND p.lvl_bidirNeighbourRatio = 'med' THEN 'Supporter'
         |    WHEN p.lvl_bidirThreadRatio = 'low'
         |      AND p.lvl_bidirNeighbourRatio = 'low'
         |      AND p.lvl_avgPostPerThread = 'low'
         |      AND p.lvl_stddevPostsPerThread = 'low' THEN 'Taciturn'
         |    WHEN p.lvl_postsReplyRatio = 'low' THEN 'Ignored'
         |    ELSE '<None>' END AS role
         |FROM feats f JOIN piv p USING (user_id)
         |ORDER BY f.user_id""".stripMargin,
    // stem_map: the Porter stems of every corpus token whose stem differs
    // from the token, precomputed with graft.functions.PorterStemmer (the
    // documents tables draw from a fixed 30-word pool at every SF; DuckDB
    // ships no offline-available stemmer, so the map IS the oracle's
    // stemmer — identity words fall through the coalesce).
    "q15_topic_model" ->
      """WITH stem_map(word, stem) AS (VALUES
        |  ('customer','custom'), ('key','kei'), ('merge','merg'),
        |  ('query','queri'), ('table','tabl'), ('value','valu')),
        |toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS word
        |  FROM documents),
        |flt AS (
        |  SELECT doc_id, word FROM toks WHERE length(word) > 1
        |    AND word NOT IN ('the','a','an','and','or','of','to','in','is','it')),
        |st AS (
        |  SELECT f.doc_id, coalesce(s.stem, f.word) AS word
        |  FROM flt f LEFT JOIN stem_map s USING (word)),
        |vocab AS (
        |  SELECT word, row_number() OVER (ORDER BY word) - 1 AS word_id
        |  FROM (SELECT DISTINCT word FROM st)),
        |words AS (SELECT doc_id, word_id FROM st JOIN vocab USING (word)),
        |batches AS (
        |  SELECT doc_id, (row_number() OVER (ORDER BY doc_id) - 1) // 5 AS batch_id
        |  FROM (SELECT DISTINCT doc_id FROM words)),
        |scores AS (
        |  SELECT doc_id, g.loc::BIGINT AS loc,
        |    sum((word_id * 7 + g.loc * 13) % 97)::BIGINT AS score
        |  FROM words CROSS JOIN generate_series(0, 24) g(loc)
        |  GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(score)::BIGINT AS total FROM scores GROUP BY 1)
        |SELECT doc_id, batch_id, rank, loc,
        |  ((loc*37)%360-180 + (loc%100)/100.0)::FLOAT::VARCHAR || ',' ||
        |  ((loc*17)%180-90 + (loc%50)/100.0)::FLOAT::VARCHAR AS location,
        |  score, probability
        |FROM (
        |  SELECT s.doc_id, s.loc, s.score,
        |    s.score::DOUBLE / t.total::DOUBLE AS probability,
        |    row_number() OVER (PARTITION BY s.doc_id
        |      ORDER BY s.score::DOUBLE / t.total::DOUBLE DESC, s.loc) AS rank
        |  FROM scores s JOIN tot t USING (doc_id))
        |JOIN batches USING (doc_id)
        |WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,
    "q16_lod_enrich" ->
      """WITH locs AS (SELECT DISTINCT c_nationkey FROM customer),
        |sa AS (
        |  SELECT 'dbp:' || lower(replace(n_name, ' ', '_')) AS dbpedia_uri,
        |    n_nationkey, n_name,
        |    (n_nationkey * 3 - 20)::VARCHAR AS lat,
        |    (n_nationkey * 7 - 40)::VARCHAR AS lon
        |  FROM nation)
        |SELECT l.c_nationkey, s.dbpedia_uri,
        |  s.lat::BIGINT AS lat, s.lon::BIGINT AS lon, s.n_name AS label,
        |  'POINT(' || s.lat || ' ' || s.lon || ')' AS wkt
        |FROM locs l LEFT JOIN sa s ON s.n_nationkey = l.c_nationkey
        |ORDER BY l.c_nationkey""".stripMargin,
    "q17_nb_relevance" ->
      """WITH counts AS (
        |  SELECT (['p:a','p:b','p:c','p:d','total'])[r_regionkey + 1] AS property,
        |    ((r_regionkey + 2) * 3)::DOUBLE AS rel,
        |    (r_regionkey + 2)::DOUBLE AS irrel
        |  FROM region),
        |tot AS (SELECT rel AS totRel, irrel AS totIrrel FROM counts
        |        WHERE property = 'total'),
        |known AS (SELECT * FROM counts WHERE property <> 'total'),
        |props AS (
        |  SELECT s_suppkey, 'p:a' AS property FROM supplier WHERE s_suppkey % 2 = 0
        |  UNION ALL
        |  SELECT s_suppkey, 'p:b' FROM supplier WHERE s_suppkey % 3 = 0
        |  UNION ALL
        |  SELECT s_suppkey, 'p:c' FROM supplier WHERE s_suppkey % 5 = 0
        |  UNION ALL
        |  SELECT s_suppkey, 'p:x' FROM supplier WHERE s_suppkey % 7 = 0)
        |SELECT s_suppkey, count(*) AS n_known_props,
        |  round(sum(ln((k.rel + 1.0) / (t.totRel + 2.0))
        |    + ln(t.totRel / (t.totRel + t.totIrrel))), 6) AS log_pos,
        |  round(sum(ln((k.irrel + 1.0) / (t.totIrrel + 2.0))
        |    + ln(t.totIrrel / (t.totRel + t.totIrrel))), 6) AS log_neg,
        |  count(*) > 0 AND sum(ln((k.rel + 1.0) / (t.totRel + 2.0))
        |      + ln(t.totRel / (t.totRel + t.totIrrel)))
        |    > sum(ln((k.irrel + 1.0) / (t.totIrrel + 2.0))
        |      + ln(t.totIrrel / (t.totRel + t.totIrrel))) AS accepted
        |FROM props JOIN known k USING (property) CROSS JOIN tot t
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,
    "q18_punctuation_window" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id::VARCHAR AS key,
        |    epoch_us(ts::TIMESTAMP) AS tsm, event_id::VARCHAR AS payload,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts::TIMESTAMP), event_id::VARCHAR) AS rn
        |  FROM events),
        |step AS (
        |  SELECT key, rn, tsm, tsm AS win_start, 1::BIGINT AS buf,
        |    NULL::BIGINT AS flush_start, NULL::BIGINT AS flush_end,
        |    NULL::BIGINT AS flush_n
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.key, e.rn, e.tsm,
        |    CASE WHEN s.win_start IS NULL THEN e.tsm
        |      WHEN e.tsm >= s.win_start + 600000000 THEN NULL
        |      ELSE s.win_start END,
        |    CASE WHEN s.win_start IS NULL THEN 1
        |      WHEN e.tsm >= s.win_start + 600000000 THEN 0
        |      ELSE s.buf + 1 END,
        |    CASE WHEN s.win_start IS NOT NULL
        |      AND e.tsm >= s.win_start + 600000000 THEN s.win_start END,
        |    CASE WHEN s.win_start IS NOT NULL
        |      AND e.tsm >= s.win_start + 600000000 THEN e.tsm END,
        |    CASE WHEN s.win_start IS NOT NULL
        |      AND e.tsm >= s.win_start + 600000000 THEN s.buf + 1 END
        |  FROM step s JOIN ev e ON e.key = s.key AND e.rn = s.rn + 1)
        |SELECT key,
        |  strftime(make_timestamp(flush_start), '%Y-%m-%d %H:%M:%S.%f')
        |    AS window_start,
        |  strftime(make_timestamp(flush_end), '%Y-%m-%d %H:%M:%S.%f')
        |    AS window_end,
        |  flush_n AS n_events
        |FROM step WHERE flush_start IS NOT NULL
        |ORDER BY key, window_start""".stripMargin)
}
