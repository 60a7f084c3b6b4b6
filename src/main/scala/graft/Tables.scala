package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Centralized table loaders for the externally-generated parquet test tables
  * (TESTDATA.md). All timestamp handling is normalized to microsecond
  * precision so Spark results compare bit-exactly against the DuckDB
  * oracle (DuckDB truncates parquet TIMESTAMP(NANOS) to micros; Spark
  * refuses to read NANOS unless `nanosAsLong` is set, after which we
  * floor-divide to micros — same truncation).
  *
  * At 100 TB these loaders are the single place to attach bucketing /
  * partition-pruning options; query code never hard-codes paths.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized LOGICAL PLANS per (session, dir, table) — plan-level
    * reuse, never result caching: `spark.read.parquet` pays a file
    * listing + a footer schema read at every call, and a 250-query
    * bench sweep constructs each table relation thousands of times
    * (r19; guide §6 "listing/planning time on the driver"). The
    * DataFrame is immutable and unresolved-file-free once built, so
    * reuse is safe; a regenerated testdata dir arrives with a fresh
    * session (new applicationId) and misses this map. */
  private val loaded = scala.collection.concurrent.TrieMap
    .empty[(String, String, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val appId = spark.sparkContext.applicationId
    // Evict entries keyed by OTHER applicationIds (ADVICE r19): a JVM
    // that creates many sessions over time (sbt test, long-lived
    // drivers) would otherwise pin each dead session's DataFrames —
    // and through them the SparkSessions — for the process lifetime.
    // The map is tables × dirs small, so the scan is trivial.
    loaded.keys.foreach { k => if (k._1 != appId) loaded.remove(k) }
    loaded.getOrElseUpdate((appId, sfDir, name),
      loadUncached(spark, sfDir, name))
  }

  private def loadUncached(spark: SparkSession, sfDir: String,
      name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      // The generator has shipped `ts` two ways across versions; normalize
      // both to session-TZ (UTC) TimestampType at microsecond precision
      // so downstream queries and emitted columns are identical either
      // way:
      //  - INT64 TIMESTAMP(NANOS): with
      //    spark.sql.legacy.parquet.nanosAsLong=true it arrives as Long.
      //    Integral `div` (not floor of a double division): ns-epoch
      //    longs exceed double's 53-bit mantissa, so float division can
      //    be off by 1us — `div` matches DuckDB's nanos→micros
      //    truncation bit-exactly for non-negative epochs.
      //  - TIMESTAMP(MICROS) without the UTC flag: arrives as
      //    TIMESTAMP_NTZ; the cast under the UTC session re-tags the
      //    same wall-clock micros, matching DuckDB's naive read.
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    else canonicalize(name, df)
  }

  // The testdata is REGENERATED between releases and physical
  // column types have shifted before (events.ts NANOS→MICROS broke
  // three suites at once). Pin the id/vector/label types the
  // operator and Encoder code assumes — a no-op cast-free path when the
  // parquet already matches (the normal case), a lossless widening
  // otherwise. House rule: normalize HERE, never per-query.
  private val canonicalTypes: Map[String, Seq[(String, String)]] = Map(
    "documents" -> Seq("doc_id" -> "bigint", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"))

  private def canonicalize(name: String, df: DataFrame): DataFrame =
    canonicalTypes.get(name).fold(df)(_.foldLeft(df) { case (d, (c, t)) =>
      if (d.columns.contains(c) && d.schema(c).dataType.simpleString != t)
        d.withColumn(c, col(c).cast(t))
      else d
    })

  /** Register all tables as temp views named exactly like the parquet
    * files, so `spark.sql` text matches the DuckDB oracle text. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Session defaults shared by Verify / Bench / tests. local[*] here is a
    * stand-in for a real cluster: shuffle partitions are sized to cores,
    * AQE handles skew/coalescing, and broadcast joins stay enabled so the
    * plans mirror what a 1000-executor deployment would choose. */
  def session(master: String, shufflePartitions: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions) // native expressions (stem_tokens)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Iterative plans (pointer-doubling joins) produce plan TREES whose
      // rendered string is exponential in iteration count; Spark eagerly
      // renders physicalPlanDescription per execution start, which
      // unbounded (the default) costs minutes of CPU and OOMs the driver
      // on the role-analysis query. Cap it — execution is unaffected.
      .config("spark.sql.maxPlanStringLength", "8192")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
