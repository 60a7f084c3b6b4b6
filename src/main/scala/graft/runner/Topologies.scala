package graft.runner

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DiscussionTree, InteractionGraph, Lod, RoleAnalysis, TopicModel}
import graft.pipeline.TextMetrics
import graft.sources.TweetSource
import graft.streaming.PunctuationWindow

/** The reference's topology entry points (SURVEY.md §3) as composable
  * query builders — what a westTopologies user actually runs. Each takes
  * a tweet-shaped DataFrame (the [[TweetSource.tweetSchema]] columns,
  * from any source: Kafka, JSON-lines files, a stream) and returns the
  * topology's output relation.
  *
  * Windowing: the role-analysis and interaction-graph topologies buffer
  * into the reference's first-event-aligned punctuation windows (W1-W3)
  * and process each flushed window as an independent community. Window
  * membership is materialized by the [[PunctuationWindow]] fold; the
  * per-window community operators then run as ONE shuffle-parallel plan
  * over all windows (ids carry a "<windowStartMicros>:" prefix, making
  * every key window-scoped), where the Storm bolts looped one window at
  * a time on one thread.
  */
object Topologies {

  /** Tag each tweet of a flushed window with its window start; tweets of
    * the trailing unflushed buffer are excluded, exactly like the
    * reference (it never emits a partial buffer). `keyCol` is the
    * channel key (the bolt had a single global buffer — use a constant
    * for strict parity; any key column gives the parallel upgrade). */
  def windowTags(normalized: DataFrame, windowMicros: Long,
      keyCol: Option[String] = None): DataFrame = {
    val keyed = keyCol match {
      case Some(k) => normalized.withColumn("_wkey", col(k))
      case None => normalized.withColumn("_wkey", lit("all"))
    }
    val ev = PunctuationWindow.fromColumns(keyed, "_wkey", "ts", "tweet_id")
    PunctuationWindow.toDataFrame(PunctuationWindow.batch(ev, windowMicros))
      .select(col("window_start"), explode(col("payloads")).as("tweet_id"))
  }

  private def prefixed(c: org.apache.spark.sql.Column, win: org.apache.spark.sql.Column) =
    when(c.isNotNull, concat(win, lit(":"), c))

  /** roleAnalysisTopology: tweets → F1 → normalize → W1 windows → per-
    * window discussion trees (J4) → A3/A4/A5/A6 community roles.
    * Output: (window_start, user_id, role, postCount, ...). */
  def roleAnalysis(tweets: DataFrame, windowMicros: Long = 600000000L): DataFrame = {
    val norm = TweetSource.normalized(tweets)
    val tagged = norm.join(windowTags(norm, windowMicros), "tweet_id")
    val win = unix_micros(col("window_start")).cast("string")
    val scoped = tagged.select(
      prefixed(col("tweet_id"), win).as("tweet_id"),
      prefixed(col("author_id"), win).as("author_id"),
      col("author_screen_name"), col("ts"), col("retweet"),
      prefixed(col("ancestor_id"), win).as("ancestor_id"),
      prefixed(col("in_reply_to_user_id_str"), win).as("in_reply_to_user_id_str"),
      col("in_reply_to_screen_name"))
    val rooted = DiscussionTree.withRoots(DiscussionTree.nodes(scoped))
    RoleAnalysis.rolesWindowed(
      rooted.select("node_id", "user_id", "parent_id", "root_id"))
      .select(
        timestamp_micros(substring_index(col("user_id"), ":", 1).cast("long"))
          .as("window_start"),
        substring_index(col("user_id"), ":", -1).as("user_id"),
        col("role"), col("postCount"), col("repliedPosts"),
        col("replyingUserCount"), col("inDegreeRatio"),
        col("postsReplyRatio"), col("bidirNeighbourRatio"),
        col("bidirThreadRatio"), col("avgPostPerThread"),
        col("stddevPostsPerThread"))
  }

  /** roleAnalysisTopology, streaming form — the reference's actual bolt
    * wiring: the window stage emits each flushed window's tweets as JSON
    * (T7, DiscussionTreeBolt.java:152-161), the role stage re-parses
    * them (T8, RoleAnalysisBolt.java:81-84). Here the punctuation-window
    * fold runs in flatMapGroupsWithState (checkpointed state across
    * micro-batches, W6) and each foreachBatch runs the per-window
    * community pipeline on the flushed windows, writing parquet to
    * `outDir/batch=<id>` (idempotent under micro-batch replay) and
    * dropping the batch's cached intermediates. Caller starts the
    * returned query. */
  def roleAnalysisStream(tweets: DataFrame, windowMicros: Long,
      outDir: String, checkpoint: String) = {
    val norm = TweetSource.normalized(tweets)
    val normSchema = norm.schema
    val withPayload = norm
      .withColumn("_wkey", lit("all"))
      .withColumn("_payload",
        to_json(struct(normSchema.fieldNames.map(col).toIndexedSeq: _*)))
    val ev = PunctuationWindow.fromColumns(withPayload, "_wkey", "ts", "_payload")
    PunctuationWindow.streaming(ev, windowMicros).toDF()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val tagged = batch
            .select(col("startMicros"), explode(col("payloads")).as("json"))
            .select(col("startMicros").cast("string").as("win"),
              from_json(col("json"), normSchema).as("t"))
            .select(col("win"), col("t.*"))
          val scoped = tagged.select(
            prefixed(col("tweet_id"), col("win")).as("tweet_id"),
            prefixed(col("author_id"), col("win")).as("author_id"),
            col("author_screen_name"), col("ts"), col("retweet"),
            prefixed(col("ancestor_id"), col("win")).as("ancestor_id"),
            prefixed(col("in_reply_to_user_id_str"), col("win"))
              .as("in_reply_to_user_id_str"),
            col("in_reply_to_screen_name"))
          val rooted = DiscussionTree.withRoots(DiscussionTree.nodes(scoped))
          RoleAnalysis.rolesWindowed(
            rooted.select("node_id", "user_id", "parent_id", "root_id"))
            .select(
              timestamp_micros(substring_index(col("user_id"), ":", 1).cast("long"))
                .as("window_start"),
              substring_index(col("user_id"), ":", -1).as("user_id"),
              col("role"), col("postCount"), col("inDegreeRatio"))
            // batch-id-addressed overwrite (same device as debugJsonSink):
            // replaying a micro-batch after a restart rewrites its own
            // directory instead of appending duplicate rows — foreachBatch
            // is at-least-once, so the sink must be idempotent per batchId.
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          // No cache cleanup needed here: every operator on this path
          // (withRoots, userFeatures) bounds its own cache lifecycle, and
          // a session-wide clearCache() would evict caches belonging to
          // OTHER workloads sharing the session (sharedState is shared
          // even across newSession()). StreamingSpec asserts the
          // CacheManager is empty after the stream stops.
        }
      }
  }

  /** InteractionGraphBolt (implemented but never wired in the reference —
    * rebuilt as a first-class query): tweets → F1 → normalize → W1
    * windows → per-window (author, action) interaction summary. The
    * author id is window-prefixed through the aggregation (same
    * window-scoping device as [[roleAnalysis]]) and split back out. */
  def interactionGraph(tweets: DataFrame, windowMicros: Long = 600000000L): DataFrame = {
    val norm = TweetSource.normalized(tweets)
    val tagged = norm.join(windowTags(norm, windowMicros), "tweet_id")
    val win = unix_micros(col("window_start")).cast("string")
    val scoped = tagged.withColumn("author_id",
      concat(win, lit(":"), col("author_id")))
    InteractionGraph.flatCounts(InteractionGraph.interactions(scoped))
      .select(
        timestamp_micros(substring_index(col("author_id"), ":", 1).cast("long"))
          .as("window_start"),
        substring_index(col("author_id"), ":", -1).as("author_id"),
        col("action"), col("screen_name"), col("n_interactions"),
        col("n_targets"), col("first_ts"), col("last_ts"))
  }

  /** interactionGraph, streaming form — the same wiring as
    * [[roleAnalysisStream]] (punctuation-window fold in
    * flatMapGroupsWithState with checkpointed state, JSON hand-off
    * between stages, batch-id-addressed idempotent parquet sink,
    * operator-bounded cache lifecycles); the per-window stage is the interaction-graph
    * aggregate instead of the community-role pipeline. Caller starts the
    * returned query. */
  def interactionGraphStream(tweets: DataFrame, windowMicros: Long,
      outDir: String, checkpoint: String) = {
    val norm = TweetSource.normalized(tweets)
    val normSchema = norm.schema
    val withPayload = norm
      .withColumn("_wkey", lit("all"))
      .withColumn("_payload",
        to_json(struct(normSchema.fieldNames.map(col).toIndexedSeq: _*)))
    val ev = PunctuationWindow.fromColumns(withPayload, "_wkey", "ts", "_payload")
    PunctuationWindow.streaming(ev, windowMicros).toDF()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val scoped = batch
            .select(col("startMicros"), explode(col("payloads")).as("json"))
            .select(col("startMicros").cast("string").as("win"),
              from_json(col("json"), normSchema).as("t"))
            .select(col("win"), col("t.*"))
            .withColumn("author_id", concat(col("win"), lit(":"), col("author_id")))
          InteractionGraph.flatCounts(InteractionGraph.interactions(scoped))
            .select(
              timestamp_micros(substring_index(col("author_id"), ":", 1).cast("long"))
                .as("window_start"),
              substring_index(col("author_id"), ":", -1).as("author_id"),
              col("action"), col("screen_name"), col("n_interactions"),
              col("n_targets"), col("first_ts"), col("last_ts"))
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          // Nothing on this path caches (flatCounts is a straight
          // aggregation); see roleAnalysisStream for why a session-wide
          // clearCache() would be wrong here.
        }
      }
  }

  /** locationTopicModelTopology: tweets → F1/F2 → language filter (F3) →
    * T2 stem/tokenize → T3 vocab index → M2 scoring → A9 top-K →
    * T5 "lon,lat" → F5 key pruning. `vocab` mirrors the pretrained
    * wordmap side input (S5); pass [[TopicModel.buildVocab]] output to
    * derive it from a corpus instead. */
  def locationTopicModel(tweets: DataFrame, vocab: DataFrame,
      numLocations: Int = 25, topK: Int = 5): DataFrame = {
    val norm = TweetSource.normalized(tweets)
      .filter(col("text").isNotNull) // F2
      .filter(graft.functions.TextFunctions.detectEnglish(col("text"))) // F3
    val indexed = TopicModel.indexDocs(norm, "tweet_id", "text", vocab, stem = true)
    val scored = TopicModel.scoreLocations(indexed, "tweet_id", numLocations)
    TopicModel.topLocations(scored, "tweet_id", topK)
      .select(col("tweet_id").as("itinno:item_id"), // F5 key pruning
        col("rank"), col("location"), col("probability"))
  }

  /** locationTopicModelTopology, streaming form: per-message indexing +
    * matrix scoring + top-k inside one UDF over broadcast vocab/model
    * (the reference scores each message independently, so the streaming
    * plan has NO stateful operator — pure append mode at source rate).
    * Works on batch frames too; pair with [[TweetSource.kafkaSink]] or
    * [[TweetSource.debugJsonSink]]. */
  def locationTopicModelPerMessage(tweets: DataFrame,
      vocab: Map[String, Long], model: TopicModel.GeoModel,
      topK: Int = 5): DataFrame = {
    val norm = TweetSource.normalized(tweets)
      .filter(col("text").isNotNull) // F2
      .filter(graft.functions.TextFunctions.detectEnglish(col("text"))) // F3
    TopicModel.locatePerMessage(norm, "tweet_id", "text", vocab, model, topK)
      .select(col("tweet_id").as("itinno:item_id"), // F5
        col("rank"), col("loc"), col("probability"))
  }

  /** lodExplorerTopology: geoparsed tweet locations → J1 owl:sameAs →
    * J2 property scan (F9) → T9 naive-Bayes relevance → J3 dereference →
    * T6 WKT output. Side inputs are snapshot triple tables (SURVEY §2.4).
    * `locations(tweet_id, lgd_uri)` carries each tweet's geoparse
    * candidates (the reference reads itinno:loc_set). */
  def lodExplorer(locations: DataFrame, sameAs: DataFrame,
      propTriples: DataFrame, placeTriples: DataFrame,
      nbCounts: DataFrame): DataFrame =
    lodExplorer(locations,
      graft.operators.SnapshotLodResolver(sameAs, propTriples, placeTriples),
      nbCounts)

  /** [[lodExplorer]] against a pluggable [[graft.operators.LodResolver]]
    * — the form a live-SPARQL deployment calls (SURVEY §7.3). */
  def lodExplorer(locations: DataFrame,
      resolver: graft.operators.LodResolver, nbCounts: DataFrame): DataFrame = {
    val linked = Lod.sameAsLookup(locations, "lgd_uri", resolver)
    val cands = Lod.placeCandidates(linked, "dbpedia_uri", resolver)
    val scored = Lod.nbRelevance(
      cands.select(col("tweet_id"), col("place"), explode(col("properties")).as("property")),
      Seq("tweet_id", "place"), nbCounts)
      .filter(col("accepted"))
    Lod.dereferencePlaces(scored, "place", resolver)
      .select(col("tweet_id"), col("place"), col("label"),
        graft.functions.TextFunctions.wktPointLatFirst(col("lat"), col("lon")).as("wkt"))
  }

  /** lodExplorerTopology, streaming form — the reference's actual shape
    * (LocationCrawlerBolt scores each tweet's locations as they arrive).
    * Every stage is stateless against static side inputs: the per-place
    * property aggregation moves to the static triples side
    * ([[Lod.placePropsStatic]]), relevance scores per row over the
    * property array ([[Lod.nbRelevancePerRow]], counts captured at
    * plan-build like the bolt's prepare()-time download), and the
    * dereference joins are stream-static broadcasts — so the plan runs
    * in append mode with NO stateful operator, on batch and streaming
    * `locations` frames alike. Bit-identical `accepted` decisions to
    * [[lodExplorer]] (same DECIMAL-quantized log terms). */
  def lodExplorerPerMessage(locations: DataFrame, sameAs: DataFrame,
      propTriples: DataFrame, placeTriples: DataFrame,
      nbCounts: DataFrame): DataFrame = {
    val linked = Lod.sameAsLookup(locations, "lgd_uri", sameAs)
    val cands = Lod.placeCandidatesStream(linked, "dbpedia_uri", propTriples)
    val scored = Lod.nbRelevancePerRow(cands, "properties", nbCounts)
      .filter(col("accepted"))
    Lod.dereferencePlaces(scored, "place", placeTriples)
      .select(col("tweet_id"), col("place"), col("label"),
        graft.functions.TextFunctions.wktPointLatFirst(col("lat"), col("lon")).as("wkt"))
  }

  /** Continuous training-data ingest (north-star composition, not a
    * reference topology): a stream of (doc_id, ts, text) documents →
    * watermark-bounded exact dedup (first arrival wins, state keyed by
    * text hash) → quality score + language ID annotations → quality
    * filter → batch-id-addressed idempotent parquet sink. The batch
    * pipeline ops compose unchanged inside foreachBatch — per-row
    * projections and a bounded-state dedup, nothing that needs a
    * window. Caller starts the returned query. */
  def documentIngestStream(docs: DataFrame, outDir: String,
      checkpoint: String, watermark: String = "10 minutes") = {
    val deduped = graft.pipeline.Dedup
      .exactStreaming(docs, "doc_id", "text", "ts", watermark)
    deduped.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // append-form annotations: pure per-row projections, no join —
          // a doc_id-keyed join back would cross-pair rows when a batch
          // carries two texts under one id, and would pay two shuffles
          // per micro-batch for per-row work. PII redaction runs LAST,
          // on the surviving rows only, and replaces the raw text at
          // the sink boundary (the production norm: nothing unscrubbed
          // lands in the training store).
          graft.pipeline.Pii.withScrub(
            TextMetrics.withLanguage(
              TextMetrics.withQuality(batch.select("doc_id", "ts", "text"), "text"),
              "text")
              .filter(col("quality") > 0), "text")
            .withColumn("text", col("redacted")).drop("redacted")
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        }
      }
  }
}
