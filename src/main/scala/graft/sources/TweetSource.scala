package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** Tweet-stream ingestion: the Spark-native replacement for the reference's
  * AMQP spout + JacksonScheme (S1, util/ExampleSocialMediaAMQPSpout.java:88-105,
  * util/JacksonScheme.java:30-38). The untyped `Map<Object,Object>` tuple
  * becomes an explicit StructType; absent keys become nulls (SURVEY.md §1.3).
  */
object TweetSource {

  /** Schema for the fields the reference actually reads (FIXTURES.md §1). */
  val tweetSchema: StructType = StructType(Seq(
    StructField("created_at", StringType),
    StructField("id_str", StringType),
    StructField("text", StringType),
    StructField("user", StructType(Seq(
      StructField("id_str", StringType),
      StructField("screen_name", StringType)))),
    StructField("in_reply_to_status_id_str", StringType),
    StructField("in_reply_to_user_id_str", StringType),
    StructField("in_reply_to_screen_name", StringType),
    StructField("retweeted_status", StructType(Seq(
      StructField("id_str", StringType),
      StructField("user", StructType(Seq(StructField("id_str", StringType))))))),
    StructField("entities", StructType(Seq(
      StructField("user_mentions", ArrayType(StructType(Seq(
        StructField("id_str", StringType)))))))),
    StructField("coordinates", StructType(Seq(
      StructField("coordinates", ArrayType(DoubleType))))) ))

  /** Batch read of a JSON-lines tweet capture (testDataSender replacement,
    * S6 — TwitterLogSender.java:66-100). */
  def readJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(tweetSchema).json(path)

  /** Streaming read from Kafka (S1). Compiles against stock Spark; needs the
    * spark-sql-kafka connector on the classpath at runtime. `exchange` and
    * `routing` of the AMQP envelope map to Kafka `topic` and `key`
    * (FIXTURES.md §3). `maxOffsetsPerTrigger` is W7 backpressure — the
    * reference's AMQP prefetch=200 / maxSpoutPending=200
    * (config/storm_config.ini:47-48) as a per-micro-batch record cap. */
  def readKafka(spark: SparkSession, bootstrap: String, topic: String,
      maxOffsetsPerTrigger: Long = 10000L): DataFrame =
    decodeKafkaEnvelope(spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger.toString)
      .load())

  /** The AMQP-envelope mapping applied to a Kafka-shaped frame
    * (topic / key / value): topic→exchange, key→routing, value→parsed
    * tweet struct. Split out from [[readKafka]] so the decode semantics
    * are testable without a broker or the kafka connector jar. */
  def decodeKafkaEnvelope(kafka: DataFrame): DataFrame =
    kafka.select(
      col("topic").as("exchange"),
      col("key").cast("string").as("routing"),
      from_json(col("value").cast("string"), tweetSchema).as("message"))

  /** Streaming read of JSON-lines files (used by tests and local runs in
    * place of Kafka — same downstream schema). `maxFilesPerTrigger` is the
    * file-source analog of W7 backpressure. */
  def readStreamJsonLines(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream.schema(tweetSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .json(dir)

  /** Kafka sink for result frames (S3 — the anonymous TupleToMessage bolts,
    * lodExplorer TopologyRunner.java:173-221). Caller starts the query. */
  def kafkaSink(df: DataFrame, bootstrap: String, topic: String, checkpoint: String) =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** S4 — per-micro-batch JSON debug dump: the Spark form of the bolts'
    * debug file sinks (DiscussionTreeBolt.java:162-165,
    * RoleAnalysisBolt.java:111-120, TopicModelBolt.java:112-128). Each
    * batch serializes every column to one JSON line (T7) under
    * `dir/batch=<id>`. Caller starts the returned query. */
  def debugJsonSink(df: DataFrame, dir: String, checkpoint: String) =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch
          .select(to_json(struct(batch.columns.map(col).toIndexedSeq: _*)).as("value"))
          .write.mode("overwrite").text(s"$dir/batch=$id")
      }

  /** F1 — drop Twitter delete events (no `created_at`):
    * DiscussionTreeBolt.java:97-99. */
  def dropDeletes(tweets: DataFrame): DataFrame =
    tweets.filter(col("created_at").isNotNull)

  /** Normalized flat view used by the topology operators: parses T1
    * timestamps and resolves F6/F7 ancestor semantics
    * (DiscussionTreeBolt.java:112-126). */
  def normalized(tweets: DataFrame): DataFrame =
    dropDeletes(tweets).select(
      col("id_str").as("tweet_id"),
      col("user.id_str").as("author_id"),
      TextFunctions.cleanUserName(col("user.screen_name")).as("author_screen_name"),
      TextFunctions.parseTwitterTime(col("created_at")).as("ts"),
      col("text"),
      // F7: retweet flag; ancestor = retweeted id when retweet else reply id
      col("retweeted_status").isNotNull.as("retweet"),
      coalesce(col("retweeted_status.id_str"), col("in_reply_to_status_id_str"))
        .as("ancestor_id"),
      col("in_reply_to_user_id_str"),
      col("in_reply_to_screen_name"),
      col("retweeted_status.user.id_str").as("retweeted_user_id"),
      col("entities.user_mentions.id_str").as("mentioned_user_ids"))

  /** Deterministic adapter turning the synthetic `events` table into a
    * tweet-shaped JSON stream (TESTDATA.md): lets the full JSON → parse →
    * topology pipeline run against the provided test data without
    * synthesizing fixtures. Mapping (mirrored 1:1 in the DuckDB oracles):
    *  - user_id → author; ts → Twitter-format created_at;
    *  - view events with k % 13 == 9 → Twitter DELETE messages (no
    *    created_at), so the F1 delete filter drops real rows — and any
    *    reply/retweet targeting a deleted tweet organically exercises J4
    *    dummy-root synthesis;
    *  - signup/error events with props.k < event_id → replies to tweet k
    *    (k < event_id keeps the reply graph acyclic); the k % 10 == 7
    *    subset replies to a NON-EXISTENT tweet k + 2·10^9 authored by
    *    unobserved user 100 + k%25 — the explicit J4 dummy-root path,
    *    with dummy users entering |U| (SURVEY §7.4 risk 3);
    *  - purchase events with props.k < event_id → retweets of tweet k;
    *  - click/view events → mentions of users k%25 and (k*3+1)%25;
    *  - screen_name carries a space ("u <id>") so T10 cleanup is real.
    */
  def eventsAsTweetJson(events: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    val isDelete = col("event_type") === "view" && k.isNotNull && k % 13 === 9
    val isReply = col("event_type").isin("signup", "error") && k < col("event_id")
    val isOrphan = isReply && k % 10 === 7
    val replyTarget = when(isOrphan, k + 2000000000L).otherwise(k)
    val replyUser = when(isOrphan, k % 25 + 100).otherwise(k % 25)
    val isRetweet = col("event_type") === "purchase" && k < col("event_id")
    val isMention = col("event_type").isin("click", "view")
    events.select(to_json(struct(
      when(!isDelete, TextFunctions.formatTwitterTime(col("ts"))).as("created_at"),
      col("event_id").cast("string").as("id_str"),
      concat(lit("event "), col("event_type")).as("text"),
      struct(
        col("user_id").cast("string").as("id_str"),
        concat(lit("u "), col("user_id")).as("screen_name")).as("user"),
      when(isReply, replyTarget.cast("string")).as("in_reply_to_status_id_str"),
      when(isReply, replyUser.cast("string")).as("in_reply_to_user_id_str"),
      when(isReply, concat(lit("u "), replyUser)).as("in_reply_to_screen_name"),
      when(isRetweet, struct(
        k.cast("string").as("id_str"),
        struct((k % 25).cast("string").as("id_str")).as("user"))).as("retweeted_status"),
      when(isMention, struct(array(
        struct((k % 25).cast("string").as("id_str")),
        struct(((k * 3 + 1) % 25).cast("string").as("id_str"))).as("user_mentions")))
        .as("entities")
    )).as("json"))
  }

  /** Full adapter pipeline: events parquet → tweet JSON → parsed +
    * normalized tweet relation (exercises S1's JSON decode path end to
    * end on driver-provided data). */
  def normalizedFromEvents(events: DataFrame): DataFrame =
    normalized(
      eventsAsTweetJson(events)
        .select(from_json(col("json"), tweetSchema).as("message"))
        .select("message.*"))
}
