package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Relational-core queries over the driver test tables: scans, filters with
  * parquet pushdown, shuffle/broadcast joins, aggregation, set ops, window
  * functions, tumbling windows and sessionization. Each query has a
  * DuckDB-oracle twin in [[CoreQueries.oracles]] with identical column
  * names and a deterministic total ORDER BY.
  *
  * Float discipline: any aggregate over doubles sums in exact DECIMAL on
  * both sides (see [[CoreQueries.dsum]]) so partial-aggregation order
  * cannot move the hashed value; ratios/products of exact ints are left
  * raw (bit-exact by construction).
  */
object CoreQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Shared raw-events scan, cached per (session, sf dir): 13 queries
    * (tumbling windows, sessionization, as-of/interval joins, funnel,
    * pivot/unpivot, cohorts, the tweet-adapter prefix) each re-read and
    * re-canonicalize the same events parquet — the largest shared-scan
    * surface that had no cache family (every other hot relation — tf,
    * minhash, embeddings, stemidx — already has one). One scan into
    * executor-local columnar cache instead of 13 footer+decode passes;
    * at cluster scale this is the difference between one read of the
    * event log and a dozen. */
  private val sharedEvents =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  private[queries] def eventsScan(spark: SparkSession, dir: String): DataFrame = {
    CacheRegistry.touch("evscan")
    sharedEvents.getOrElseUpdate((spark.sparkContext.applicationId, dir),
      Tables.load(spark, dir, "events").cache())
  }

  /** Drop the shared raw-events scan cache. */
  def releaseEventsScanCache(): Unit =
    sharedEvents.keys.toSeq.foreach(k => sharedEvents.remove(k).foreach { df =>
      try df.unpersist()
      catch { case scala.util.control.NonFatal(_) => () }
    })

  /** Shared-cache families owned by this object — consumers verified
    * against the empirical [[CacheRegistry]] touches by
    * CacheLifecycleSpec; Bench computes release positions from them.
    * Transitive edges: q12 is the first normalized-events consumer in
    * sweep order, so it builds the "events" (normalized) cache FROM the
    * raw scan and appears in both sets; q18's punctuation window reads
    * the raw scan directly. */
  def cacheFamilies: Map[String, CacheFamily] = Map(
    "evscan" -> CacheFamily(
      Set("q09_tumbling_windows", "q10_sessionize", "q11_twitter_ts_parse",
        "q12_interaction_counts", "q18_punctuation_window",
        "q38_session_window_native", "q64_asof_join", "q68_funnel",
        "q109_rate_anomaly", "q139_cohort_retention", "q152_interval_join",
        "q161_pivot_activity", "q162_unpivot_activity",
        "q184_markov_transitions", "q190_type_hour_mi",
        "q191_burstiness", "q196_incremental_agg",
        "q198_cube_activity"),
      () => releaseEventsScanCache()))

  /** Timestamp output discipline: every emitted timestamp column is
    * formatted to a fixed-width string on BOTH sides (Spark date_format /
    * DuckDB strftime) — naive-vs-UTC parquet annotations and engine
    *-specific fraction trimming would otherwise break value hashing. */
  private[queries] def tsStr(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss")
  private[queries] def tsStrMicros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Order-independent double aggregation: cast each addend to exact
    * DECIMAL(28,10), sum (partial-aggregation order can no longer move
    * the result), round IN THE DECIMAL DOMAIN (Spark's decimal round and
    * DuckDB's are both HALF_UP/away-from-zero, probed on ±x.00005; the
    * per-addend double→decimal cast agrees between engines too), then
    * emit as DOUBLE. The final double cast matters: engines render
    * DECIMAL-typed values through different paths and value hashers
    * disagree on them, whereas a ≤4–6 dp decimal with ≤15 significant
    * digits converts to double bit-identically on both engines.
    * Oracle mirror: `round(sum((expr)::DECIMAL(28,10)), s)::DOUBLE`. */
  private def dsum(c: org.apache.spark.sql.Column, scale: Int) =
    round(sum(c.cast("decimal(28,10)")), scale).cast("double")

  /** avg with the same discipline: decimal-rounded exact sum, then ONE
    * double division by the non-null count — both operands are bit-equal
    * across engines, so the IEEE quotient is too; no final round step
    * exists to flake. Decimal→double is bit-identical only while the
    * rounded sum's unscaled value stays below 2^52 (≈4.5e15): callers
    * must pick `scale` so that max-possible-sum × 10^scale keeps real
    * headroom — q01 uses scale 4 (per-group sum ≤ ~1e10 even at sf1 →
    * unscaled ≤ 1e14, 45× margin), NOT 6 (only ~4× at sf0.1).
    * Oracle mirror: `round(sum((c)::DECIMAL(28,10)), s)::DOUBLE / count(c)`. */
  private def davg(c: org.apache.spark.sql.Column, scale: Int) =
    round(sum(c.cast("decimal(28,10)")), scale).cast("double") / count(c)

  /** TPC-H Q1-style pricing summary: filter → groupBy → 8 aggregates.
    * The filter and the 7-column projection both reach the parquet scan. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity"), 4).as("sum_qty"),
        dsum(col("l_extendedprice"), 4).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax")), 4).as("sum_charge"),
        davg(col("l_quantity"), 4).as("avg_qty"),
        davg(col("l_extendedprice"), 4).as("avg_price"),
        davg(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Selective filter + narrow projection: PushedFilters + 4-column
    * ReadSchema at the scan (F1/F2-style null-safe predicates). */
  def q02FilterPushdown(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R" &&
        col("l_shipdate").isNotNull)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        tsStr(col("l_shipdate")).as("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .limit(200)

  /** Shuffle join + aggregation + top-k: revenue of BUILDING-segment
    * orders (TPC-H Q3 shape). Customer side broadcasts (small dim). */
  def q03TopRevenueOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(spark, dir, "orders")
    val l = t(spark, dir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("o_orderkey"), tsStr(col("o_orderdate")).as("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Multi-way join through two broadcast dims (TPC-H Q5 shape): revenue
    * per nation where supplier and customer share the nation. */
  def q05RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val r = t(spark, dir, "region")
    val n = t(spark, dir, "nation")
    val c = t(spark, dir, "customer")
    val s = t(spark, dir, "supplier")
    val o = t(spark, dir, "orders")
    val l = t(spark, dir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, l("l_suppkey") === s("s_suppkey") && c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Anti join: customers that never ordered, counted per nation. */
  def q06OrphanCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val n = t(spark, dir, "nation")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orphans"),
        dsum(col("c_acctbal"), 4).as("orphan_acctbal"))
      .orderBy(col("n_name"))
  }

  /** Set operations: nation keys present in customer vs supplier. */
  def q07SetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val s = t(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    val both = c.intersect(s).withColumn("which", lit("both"))
    val custOnly = c.distinct().except(s).withColumn("which", lit("cust_only"))
    both.unionByName(custOnly).orderBy(col("which"), col("nationkey"))
  }

  /** Analytic window function: top-3 orders per customer by price (A9's
    * relational shape — row_number, NOT a sort-limit per group). */
  def q08WindowTopK(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** Epoch-aligned tumbling windows (idiomatic mode of W1, SURVEY §2.7):
    * daily event counts/sums per type via window(). */
  def q09TumblingWindows(spark: SparkSession, dir: String): DataFrame =
    eventsScan(spark, dir)
      .groupBy(tsStr(window(col("ts"), "1 day").getField("start")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 4).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** Event-rate anomaly detection — the streaming-analytics alerting
    * pattern: hourly counts per event type, a trailing 6-window
    * mean/std baseline (exact integer sums over the frame; the only
    * doubles are one division chain mirrored verbatim in the oracle),
    * and the z-score of each window against its own history. Windows
    * with fewer than 3 baseline predecessors emit a null z (cold
    * start); a zero-variance baseline also yields null (no alert
    * basis). Catastrophic-cancellation guard: the variance clamps at 0
    * before sqrt — both engines compute the identical double, so the
    * clamp is engine-stable.
    *
    * Shape: one scan → (type, hour) counts with map-side partials
    * (bounded by types × hours, corpus-size-independent), then pure
    * window math partitioned by type — one exchange on event_type. */
  def q109RateAnomaly(spark: SparkSession, dir: String): DataFrame =
    rateAnomalyOf(eventsScan(spark, dir))

  /** [[q109RateAnomaly]] over a caller-supplied events frame (spec path). */
  def rateAnomalyOf(events: DataFrame): DataFrame = {
    val hour = window(col("ts"), "1 hour").getField("start")
    val counts = events
      .groupBy(col("event_type"), hour.as("_w"))
      .agg(count(lit(1)).as("n_events"))
    val frame = Window.partitionBy(col("event_type")).orderBy(col("_w"))
      .rowsBetween(-6, -1)
    val nPrev = count(col("n_events")).over(frame)
    val sumPrev = sum(col("n_events")).over(frame)
    val sumSqPrev = sum(col("n_events") * col("n_events")).over(frame)
    val meanD = sumPrev.cast("double") / nPrev.cast("double")
    val varD = greatest(
      (sumSqPrev.cast("double") -
        sumPrev.cast("double") * sumPrev.cast("double") / nPrev.cast("double"))
        / nPrev.cast("double"),
      lit(0.0))
    counts
      .withColumn("n_prev", nPrev)
      .withColumn("_mean", meanD)
      .withColumn("_std", sqrt(varD))
      .select(tsStr(col("_w")).as("window_start"), col("event_type"),
        col("n_events"), col("n_prev"),
        when(col("n_prev") >= 3,
          round(col("_mean").cast("decimal(28,10)"), 6).cast("double"))
          .as("baseline_mean"),
        when(col("n_prev") >= 3 && col("_std") > 0.0,
          round(((col("n_events").cast("double") - col("_mean")) / col("_std"))
            .cast("decimal(28,10)"), 6).cast("double"))
          .as("z"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Gap-based sessionization (30-min inactivity) via lag + running sum —
    * one shuffle on (user_id), then pure window math. */
  def q10Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    eventsScan(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        tsStrMicros(min(col("ts"))).as("session_start"),
        tsStrMicros(max(col("ts"))).as("session_end"),
        dsum(col("value"), 4).as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Native session windows: the same 30-min-gap sessionization as q10
    * through Spark's built-in session_window (one shuffle on the session
    * key, sessions merged inside the aggregation — the idiomatic form,
    * and the one that also runs under Structured Streaming). Boundary
    * semantics differ from q10's lag formulation at exactly-gap spacing
    * (an event AT start+gap opens a NEW session here) — mirrored in the
    * oracle with >=. */
  def q38SessionWindowNative(spark: SparkSession, dir: String): DataFrame =
    eventsScan(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 4).as("sum_value"))
      .select(col("user_id"),
        tsStrMicros(col("session_window.start")).as("session_start"),
        tsStrMicros(col("session_window.end")).as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Event-time as-of join over the events stream: every purchase is
    * enriched with the user's most recent click at-or-before it — the
    * attribution/temporal-lookup shape ([[graft.operators.AsOfJoin]]).
    * One shuffle on user_id, no range cross product; both sides may be
    * corpus-sized. The oracle mirrors the union-and-sweep formulation
    * (running `last_value IGNORE NULLS`) rather than DuckDB's ASOF JOIN,
    * whose equal-ts tie order among right rows is unspecified. */
  def q64AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsScan(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    graft.operators.AsOfJoin.asOf(purchases, clicks,
        keys = Seq("user_id"), tsCol = "ts", tieCol = "event_id",
        payload = Seq("event_id", "ts"))
      .select(col("user_id"),
        col("event_id").as("purchase_id"),
        col("matched.event_id").as("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("matched.ts")))
          .as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** Attribution-window counting via the union-and-sweep range join
    * ([[graft.operators.IntervalJoin]]): for each purchase, the count
    * of that user's events in the inclusive hour before it. One
    * shuffle on user_id, ONE window pass — no per-key cross product;
    * the oracle runs the NAIVE range join (a different algorithm
    * entirely), so the sweep's boundary semantics are adversarially
    * verified bit-for-bit. */
  def q152IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsScan(spark, dir)
    val windows = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("interval_id"),
        (col("ts") - expr("INTERVAL 1 HOUR")).as("w_start"),
        col("ts").as("w_end"))
    graft.operators.IntervalJoin.intervalCount(windows,
        ev.select(col("user_id"), col("ts")),
        keys = Seq("user_id"), idCol = "interval_id",
        startCol = "w_start", endCol = "w_end", tsCol = "ts")
      .select(col("user_id"), col("interval_id"), col("n_events"))
      .orderBy(col("interval_id"))
  }

  /** Native relational PIVOT: per-user event counts spread across
    * event-type columns (the wide activity-profile shape BI layers
    * read). Spark's `.pivot(col, values)` with the value list given
    * explicitly — one Expand + one aggregate, no second scan; the
    * oracle is the equivalent CASE-sum formulation. */
  def q161PivotActivity(spark: SparkSession, dir: String): DataFrame =
    eventsScan(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  /** Native relational UNPIVOT (melt): the q161 wide profile folded
    * back to (user_id, event_type, n) long form — the
    * wide-to-long normalization step. Exercises Spark's `unpivot`
    * operator end-to-end over the pivot output. */
  def q162UnpivotActivity(spark: SparkSession, dir: String): DataFrame = {
    val wide = eventsScan(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
    wide.unpivot(Array(col("user_id")),
        Array(col("click"), col("error"), col("purchase"), col("signup"),
          col("view")),
        "event_type", "n")
      .orderBy(col("user_id"), col("event_type"))
  }

  /** First-order Markov transition matrix over per-user event streams:
    * order each user's events by (ts, event_id), pair each with its
    * predecessor (lag), count every (prev_type, next_type) transition,
    * and normalize rows to conditional probabilities — the behavioral
    * bigram model behind next-event prediction, anomaly scoring
    * (improbable transitions), and funnel-free flow analysis. One
    * shuffle on user_id for the lag, then the transition relation is
    * event-type² rows — dimension-bounded, so the row-normalizing
    * window is over a tiny partition, never corpus-scale. Probability
    * is one IEEE divide of exact int64 counts, rounded in the decimal
    * domain (the house rule; DuckDB's windowed sum(BIGINT) is HUGEINT,
    * cast back before the divide). */
  def q184MarkovTransitions(spark: SparkSession, dir: String): DataFrame =
    markovTransitionsOf(eventsScan(spark, dir))
      .orderBy(col("prev_type"), col("next_type"))

  /** q184's body over any (user_id, event_type, ts, event_id) relation —
    * factored so the streaming twin's parity spec can aggregate both
    * forms from one event list
    * ([[graft.streaming.TransitionStream]]). */
  def markovTransitionsOf(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = events
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val byPrev = Window.partitionBy(col("prev_type"))
    trans
      .withColumn("p_next",
        round((col("n_transitions").cast("double") /
            sum(col("n_transitions")).over(byPrev).cast("double"))
            .cast("decimal(28,10)"), 6)
          .cast("double"))
  }

  /** Mutual information between event type and hour-of-day — the
    * dependence screen behind "is activity mix time-driven?" (feature
    * selection, seasonality audits, leakage checks between a label and
    * a time column). One corpus aggregate to the |types|×24 contingency
    * table; margins broadcast back; MI and both marginal entropies in
    * nats. Every ln argument is built as the IDENTICAL float expression
    * from exact int64 counts on both engines (ln is bit-stable on
    * identical input — the q17/q52 device), each term goes through
    * DECIMAL(28,10) before summing (never a double sum), one row out. */
  def q190TypeHourMi(spark: SparkSession, dir: String): DataFrame = {
    val cell = eventsScan(spark, dir)
      .groupBy(col("event_type"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n_ij"))
    val byType = cell.groupBy(col("event_type")).agg(sum(col("n_ij")).as("n_i"))
    val byHour = cell.groupBy(col("hr")).agg(sum(col("n_ij")).as("n_j"))
    val tot = cell.agg(sum(col("n_ij")).as("n"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(28,10)")
    val joined = cell
      .join(broadcast(byType), Seq("event_type"))
      .join(broadcast(byHour), Seq("hr"))
      .crossJoin(broadcast(tot))
    val mi = joined.agg(
      max(col("n")).as("n"),
      round(sum(dec((col("n_ij").cast("double") / col("n").cast("double")) *
        log((col("n").cast("double") * col("n_ij").cast("double")) /
          (col("n_i").cast("double") * col("n_j").cast("double"))))), 6)
        .cast("double").as("mi_nats"))
    val hT = byType.crossJoin(broadcast(tot)).agg(
      round(sum(dec(-(col("n_i").cast("double") / col("n").cast("double")) *
        log(col("n_i").cast("double") / col("n").cast("double")))), 6)
        .cast("double").as("h_type_nats"))
    val hH = byHour.crossJoin(broadcast(tot)).agg(
      round(sum(dec(-(col("n_j").cast("double") / col("n").cast("double")) *
        log(col("n_j").cast("double") / col("n").cast("double")))), 6)
        .cast("double").as("h_hour_nats"))
    mi.crossJoin(hT).crossJoin(hH)
  }

  /** Inter-arrival burstiness per event type (Goh & Barabási 2008):
    * B = (σ − μ)/(σ + μ) over the second-granular gaps of each type's
    * (ts, event_id)-ordered stream — B→−1 periodic, 0 Poisson, →1
    * bursty; the rate-shape diagnostic beside q109's level anomalies.
    * One shuffle on event_type for the lag; registers are exact int64
    * (Σg, Σg², both behind loud overflow guards — the assortativity
    * discipline), variance numerator/denominator divide as identical
    * doubles, σ through IEEE-correctly-rounded sqrt (bit-stable across
    * engines, the q55 device), rounded in the decimal domain. */
  def q191Burstiness(spark: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = eventsScan(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byType))
      .filter(col("prev_ts").isNotNull)
      .select(col("event_type"),
        // exact integer floor, mirrored as epoch_us // 1000000 in the
        // oracle (date_diff('second') counts boundary crossings, not
        // the floored difference)
        expr("(unix_micros(ts) - unix_micros(prev_ts)) div 1000000")
          .as("g"))
    val guarded = gaps.select(col("event_type"), col("g"),
      when(assert_true(col("g") <= lit(3037000498L),
        lit("q191Burstiness: gap exceeds ~96 years — g*g overflows " +
          "int64; coarsen the gap unit before the registers")).isNull,
        col("g") * col("g")).as("g2"))
    val sums = guarded.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_gaps"),
      sum(col("g")).as("sum_g"),
      sum(col("g2")).as("sum_g2"))
    val num = col("n_gaps") * col("sum_g2") - col("sum_g") * col("sum_g")
    val numChecked = when(
      assert_true(
        col("sum_g2") <= lit(Long.MaxValue) / greatest(col("n_gaps"), lit(1L)) &&
          col("sum_g") <= lit(3037000498L),
        lit("q191Burstiness: register product exceeds int64 — coarsen " +
          "the gap unit before the registers")).isNull, num)
    val mu = col("sum_g").cast("double") / col("n_gaps").cast("double")
    val sigma = sqrt(numChecked.cast("double") /
      (col("n_gaps") * col("n_gaps")).cast("double"))
    sums.select(col("event_type"), col("n_gaps"), col("sum_g"),
        round((mu).cast("decimal(28,10)"), 6).cast("double").as("mean_gap_s"),
        // sum_g = 0 ⟺ every gap is 0 ⟺ σ = μ = 0: the ratio is 0/0 —
        // NULL (Spark's NaN→DECIMAL yields null where DuckDB raises)
        when(col("sum_g") === 0L, lit(null).cast("double"))
          .otherwise(round(((sigma - mu) / (sigma + mu))
              .cast("decimal(28,10)"), 6)
            .cast("double")).as("burstiness"))
      .orderBy(col("event_type"))
  }

  /** Exponentially-decayed per-user engagement score — the recency
    * weighting a freshness-aware data mix (or a trending/engagement
    * rank) applies to an event log: each event contributes
    * `2^40 >> min(days_ago, 40)` where days_ago is the exact integer
    * `(t_max − ts) div 1 day` against the stream's own max timestamp.
    * Step-decay (weight halves per whole half-life elapsed) rather
    * than continuous `exp(−λΔt)` — the deterministic sibling: shifts
    * on int64 agree bit-for-bit across engines (the q144 device) where
    * `pow`/`exp` cannot sit behind a hashed output, and the sum is an
    * order-independent exact integer register. One map-side-combined
    * shuffle on user_id; the 1-row anchor broadcasts.
    *
    * Deliberately NOT on the evscan cache (the q168 discipline): q205
    * sweeps last among the event queries, and joining the family would
    * pin the full-width events cache across the whole sweep for one
    * two-column scan — the columnar (user_id, ts) read is cheaper than
    * the residency. */
  def q205DecayScores(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("ts_us"))
    val anchor = ev.agg(max(col("ts_us")).as("t_max"))
    val scored = ev.crossJoin(broadcast(anchor))
      .select(col("user_id"),
        // 2^40 >> min(whole days ago, 40): int64-exact on both engines
        expr("shiftright(1099511627776L, " +
          "cast(least((t_max - ts_us) div 86400000000, 40) as int))")
          .as("w"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("w")).as("score_q"))
    // 2^22 events × 2^40 max weight = 2^62: the register cannot wrap
    // below that count; a larger per-user stream must rescale the
    // weight base first (loud, never silent)
    val guarded = when(assert_true(col("n_events") <= lit(1L << 22),
      lit("q205DecayScores: >2^22 events for one user — score_q can " +
        "overflow int64; lower the weight base")).isNull, col("score_q"))
    scored.select(col("user_id"), col("n_events"), guarded.as("score_q"),
        round((col("score_q").cast("double") / lit(1099511627776.0))
          .cast("decimal(28,10)"), 6).cast("double").as("decayed_events"))
      .orderBy(col("user_id"))
  }

  /** Key-skew diagnostic ([[graft.plans.Scale.skewReport]]) over the
    * event stream's user key — the report that decides between AQE,
    * salting and bucketing: top-10 hottest users with row count, corpus
    * share (ppm) and skew factor vs the mean key (×1000), all exact
    * integer registers. The descending rank rides bucketedGlobalRank
    * (negated count), never a bare global window over the
    * key-cardinality relation. */
  def q168SkewReport(spark: SparkSession, dir: String): DataFrame =
    // deliberately NOT on the evscan cache: q168 sweeps last, and
    // joining the family would pin the events cache from q09 to the end
    // of the sweep for the sake of ONE single-column scan — the
    // cache-residency pathology in miniature. The scan here prunes to
    // user_id only (columnar read of one column), cheaper than holding
    // the full-width cache alive.
    graft.plans.Scale.skewReport(
        t(spark, dir, "events").select(col("user_id")), "user_id", topN = 10)
      .orderBy(col("rank"))

  /** Ordered funnel over the events stream ([[graft.operators.Funnel]]):
    * signup → click within 24 h → purchase within 24 h of the click.
    * One shuffle on user_id; all three step windows and the per-user
    * collapse ride the same exchange. The oracle uses the equivalent
    * per-step join formulation — values identical (same min over the
    * same sets), mechanism deliberately different. */
  def q68Funnel(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.funnel(eventsScan(spark, dir),
        "user_id", "ts", "event_type",
        steps = Seq("signup", "click", "purchase"), maxGap = "24 hours")
      .select(col("user_id"),
        tsStrMicros(col("t0")).as("signup_ts"),
        tsStrMicros(col("t1")).as("click_ts"),
        tsStrMicros(col("t2")).as("purchase_ts"),
        col("steps_completed"))
      .orderBy(col("user_id"))

  /** T1 — Twitter-format timestamp roundtrip on real data: format each
    * event ts as `EEE MMM dd HH:mm:ss Z yyyy`, then parse it back with the
    * engine's parser (Spark cannot parse EEE; see
    * [[graft.functions.TextFunctions.parseTwitterTime]]). */
  def q11TwitterTsParse(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions._
    eventsScan(spark, dir)
      .filter(col("event_id") < 1000)
      .select(col("event_id"),
        formatTwitterTime(col("ts")).as("twitter_ts"),
        tsStr(parseTwitterTime(formatTwitterTime(col("ts")))).as("parsed_ts"))
      .orderBy(col("event_id"))
  }

  /** ROLLUP / grouping-sets OLAP surface: revenue at (flag, status)
    * detail, per-flag subtotals, and the grand total in ONE pass —
    * Spark expands the rollup into partial-aggregated grouping sets
    * exactly as a warehouse engine does. `grouping()` flags ride along
    * because a REAL null group key and a subtotal row are otherwise
    * indistinguishable (the standard rollup footgun). */
  def q133RollupRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"))
      .orderBy(col("g_flag"), col("g_status"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Interval RANGE window frame: per order, trailing-7-day order-value
    * sum over that customer's own orders — the moving-aggregate surface
    * (RANGE BETWEEN INTERVAL ... PRECEDING) that rows-frames cannot
    * express when event spacing is irregular. Values sum as exact
    * DECIMAL inside the frame (frame membership is timestamp
    * arithmetic, identical across engines); emitted per the house
    * round-then-double rule. */
  def q136MovingRevenue(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders")
      .filter(col("o_custkey") % 100 === 0)
      .selectExpr("o_custkey", "o_orderkey", "o_orderdate",
        """round(sum(cast(o_totalprice AS DECIMAL(28,10))) OVER (
          |  PARTITION BY o_custkey ORDER BY o_orderdate
          |  RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW),
          |4) AS trailing_7d""".stripMargin)
      .select(col("o_custkey"), col("o_orderkey"),
        tsStr(col("o_orderdate")).as("o_orderdate"),
        col("trailing_7d").cast("double").as("trailing_7d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Native CUBE over (event_type, day-of-week): all four grouping
    * sets — the full matrix, both margins, and the grand total — in ONE
    * Expand + one aggregate, with grouping() flags disambiguating
    * subtotal rows from real NULLs; completes the grouping-sets surface
    * beside q133's ROLLUP. Value sums ride the exact-decimal device. */
  def q198CubeActivity(spark: SparkSession, dir: String): DataFrame =
    eventsScan(spark, dir)
      // Spark dayofweek: Sunday=1..Saturday=7; DuckDB's is 0-based —
      // the oracle mirrors with dayofweek(ts)+1
      .withColumn("dow", dayofweek(col("ts")).cast("long"))
      .cube(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value"), 4).as("sum_value"),
        grouping(col("event_type")).cast("long").as("g_type"),
        grouping(col("dow")).cast("long").as("g_dow"))
      .orderBy(col("g_type"), col("g_dow"),
        col("event_type").asc_nulls_first, col("dow").asc_nulls_first)

  /** Incremental aggregate maintenance — the algebraic-merge pattern
    * behind every incremental ETL: yesterday's per-user activity state
    * plus today's delta combine WITHOUT touching yesterday's rows,
    * because every register is a commutative monoid (count: +, sum:
    * exact DECIMAL +, first/last: least/greatest, seen-types: bit OR —
    * the distinct-set folded to a 5-bit mask precisely because raw
    * DISTINCT is the one aggregate that does NOT merge). The split is
    * event_id % 7 (≈1/7 delta); the oracle recomputes from ALL events
    * in one pass, so the merge is hash-checked against the recompute —
    * any register that fails the monoid laws (e.g. summing as rounded
    * double instead of decimal) cannot match. Merge cost is
    * |users|-keyed full-outer join of two agg relations — never a
    * re-scan of the base data. */
  def q196IncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    def mask = when(col("event_type") === "click", 1L)
      .when(col("event_type") === "error", 2L)
      .when(col("event_type") === "purchase", 4L)
      .when(col("event_type") === "signup", 8L)
      .when(col("event_type") === "view", 16L).otherwise(0L)
    def part(df: DataFrame): DataFrame = df.groupBy(col("user_id")).agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(28,10)")).as("sv"), // exact: merges
      min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"),
      bit_or(mask).as("type_mask"))
    val ev = eventsScan(spark, dir)
    val base = part(ev.filter(col("event_id") % 7 =!= 0))
    val delta = part(ev.filter(col("event_id") % 7 === 0))
      .select(col("user_id"), col("n").as("n2"), col("sv").as("sv2"),
        col("first_ts").as("f2"), col("last_ts").as("l2"),
        col("type_mask").as("m2"))
    base.join(delta, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("n2"), lit(0L)))
          .as("n_events"),
        // the sum monoid's identity is NULL, not 0 (all-NULL values on
        // both sides must stay NULL — the recompute oracle's sum does)
        when(col("sv").isNull && col("sv2").isNull,
          lit(null).cast("double"))
          .otherwise(round(coalesce(col("sv"), lit(0).cast("decimal(28,10)")) +
              coalesce(col("sv2"), lit(0).cast("decimal(28,10)")), 4)
            .cast("double")).as("sum_value"),
        tsStrMicros(least(coalesce(col("first_ts"), col("f2")),
          coalesce(col("f2"), col("first_ts")))).as("first_ts"),
        tsStrMicros(greatest(coalesce(col("last_ts"), col("l2")),
          coalesce(col("l2"), col("last_ts")))).as("last_ts"),
        (coalesce(col("type_mask"), lit(0L))
          .bitwiseOR(coalesce(col("m2"), lit(0L)))).as("type_mask"))
      .orderBy(col("user_id"))
  }

  /** CMS join-cardinality estimate for orders ⋈ lineitem on orderkey
    * ([[graft.pipeline.Sketches.cmsJoinCardinality]]): the exact join
    * size from the key-histogram inner product (never materializing
    * the join) beside the 4×1024 sketch dot-product estimate and its
    * overestimate ratio — the planner-style cardinality device, with
    * its one-sided error auditable in the row itself. */
  def q194JoinCardinality(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Sketches.cmsJoinCardinality(
      t(spark, dir, "orders"), "o_orderkey",
      t(spark, dir, "lineitem"), "l_orderkey")

  /** Cohort retention — the classic product-analytics matrix over the
    * event stream: users grouped by first-seen day, per (cohort,
    * day-offset) the distinct users still active. Two aggregates plus
    * one user-keyed join — no window, no self-join explosion; the day
    * truncation and diff are integer-exact on both engines under the
    * UTC session. */
  def q139CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val act = eventsScan(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val first = act.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
    act.join(first, Seq("user_id"))
      .select(col("user_id"), col("d0"),
        datediff(col("d"), col("d0")).cast("long").as("day_offset"))
      .filter(col("day_offset") <= 7)
      .groupBy(date_format(col("d0"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q01PricingSummary,
    "q133_rollup_revenue" -> q133RollupRevenue,
    "q136_moving_revenue" -> q136MovingRevenue,
    "q139_cohort_retention" -> q139CohortRetention,
    "q02_filter_pushdown" -> q02FilterPushdown,
    "q03_top_revenue_orders" -> q03TopRevenueOrders,
    "q05_region_revenue" -> q05RegionRevenue,
    "q06_orphan_customers" -> q06OrphanCustomers,
    "q07_setops" -> q07SetOps,
    "q08_window_topk" -> q08WindowTopK,
    "q09_tumbling_windows" -> q09TumblingWindows,
    "q10_sessionize" -> q10Sessionize,
    "q11_twitter_ts_parse" -> q11TwitterTsParse,
    "q38_session_window_native" -> q38SessionWindowNative,
    "q64_asof_join" -> q64AsofJoin,
    "q68_funnel" -> q68Funnel,
    "q109_rate_anomaly" -> q109RateAnomaly,
    "q152_interval_join" -> q152IntervalJoin,
    "q161_pivot_activity" -> q161PivotActivity,
    "q162_unpivot_activity" -> q162UnpivotActivity,
    "q168_skew_report" -> q168SkewReport,
    "q184_markov_transitions" -> q184MarkovTransitions,
    "q190_type_hour_mi" -> q190TypeHourMi,
    "q191_burstiness" -> q191Burstiness,
    "q205_decay_scores" -> q205DecayScores,
    "q194_join_cardinality" -> q194JoinCardinality,
    "q196_incremental_agg" -> q196IncrementalAgg,
    "q198_cube_activity" -> q198CubeActivity)

  val oracles: Map[String, String] = Map(
    // Mirrors q198CubeActivity: 1-based dow (DuckDB's dayofweek is
    // 0-based), CUBE with grouping() flags, NULLS FIRST pinned on both
    // sides (Spark asc defaults nulls-first, DuckDB nulls-last).
    "q198_cube_activity" ->
      """WITH e AS (SELECT event_type,
        |    (dayofweek(ts) + 1)::BIGINT AS dow, value FROM events)
        |SELECT event_type, dow, count(*)::BIGINT AS n_events,
        |  round(sum(value::DECIMAL(28,10)), 4)::DOUBLE AS sum_value,
        |  grouping(event_type)::BIGINT AS g_type,
        |  grouping(dow)::BIGINT AS g_dow
        |FROM e GROUP BY CUBE (event_type, dow)
        |ORDER BY g_type, g_dow, event_type NULLS FIRST,
        |  dow NULLS FIRST""".stripMargin,
    // The q196 oracle RECOMPUTES from all events in one pass — the
    // merge on the Spark side must satisfy the monoid laws to match.
    "q196_incremental_agg" ->
      """SELECT user_id, count(*)::BIGINT AS n_events,
        |  round(sum(value::DECIMAL(28,10)), 4)::DOUBLE AS sum_value,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
        |  bit_or(CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
        |    WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
        |    WHEN 'view' THEN 16 ELSE 0 END)::BIGINT AS type_mask
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Mirrors cmsJoinCardinality: key-histogram inner product for the
    // exact size; the q143 salted-md5 CMS rows at width 1024 for the
    // sketch; per-row dot products, min over rows, rounded ratio.
    "q194_join_cardinality" ->
      """WITH la AS (SELECT o_orderkey AS k, count(*)::BIGINT AS ca
        |  FROM orders GROUP BY 1),
        |rb AS (SELECT l_orderkey AS k, count(*)::BIGINT AS cb
        |  FROM lineitem GROUP BY 1),
        |ex AS (SELECT coalesce(sum(ca * cb), 0)::BIGINT AS exact_pairs
        |  FROM la JOIN rb USING (k)),
        |cl AS (SELECT r, ('0x' || substr(md5('cms' || r::VARCHAR || ':'
        |      || k::VARCHAR), 1, 15))::BIGINT % 1024 AS bucket,
        |    sum(ca)::BIGINT AS counter
        |  FROM la CROSS JOIN (SELECT unnest([0, 1, 2, 3])::BIGINT AS r)
        |  GROUP BY 1, 2),
        |cr AS (SELECT r, ('0x' || substr(md5('cms' || r::VARCHAR || ':'
        |      || k::VARCHAR), 1, 15))::BIGINT % 1024 AS bucket,
        |    sum(cb)::BIGINT AS counter_b
        |  FROM rb CROSS JOIN (SELECT unnest([0, 1, 2, 3])::BIGINT AS r)
        |  GROUP BY 1, 2),
        |es AS (SELECT min(dot)::BIGINT AS cms_estimate FROM (
        |  SELECT cl.r, sum(cl.counter * cr.counter_b)::BIGINT AS dot
        |  FROM cl JOIN cr ON cr.r = cl.r AND cr.bucket = cl.bucket
        |  GROUP BY 1))
        |SELECT ex.exact_pairs, es.cms_estimate,
        |  (CASE WHEN ex.exact_pairs = 0 THEN NULL
        |    ELSE round((es.cms_estimate::DOUBLE / ex.exact_pairs::DOUBLE)
        |      ::DECIMAL(28,10), 6)::DOUBLE END) AS over_ratio
        |FROM ex CROSS JOIN es""".stripMargin,
    // Mirrors q190TypeHourMi: identical ln-argument float expression
    // trees from exact BIGINT counts, per-term DECIMAL(28,10) sums.
    "q190_type_hour_mi" ->
      """WITH cell AS (SELECT event_type, hour(ts) AS hr,
        |    count(*)::BIGINT AS n_ij
        |  FROM events GROUP BY 1, 2),
        |bt AS (SELECT event_type, sum(n_ij)::BIGINT AS n_i FROM cell
        |  GROUP BY 1),
        |bh AS (SELECT hr, sum(n_ij)::BIGINT AS n_j FROM cell GROUP BY 1),
        |t AS (SELECT sum(n_ij)::BIGINT AS n FROM cell),
        |mi AS (SELECT max(t.n) AS n,
        |    round(sum(((cell.n_ij::DOUBLE / t.n::DOUBLE) *
        |      ln((t.n::DOUBLE * cell.n_ij::DOUBLE) /
        |        (bt.n_i::DOUBLE * bh.n_j::DOUBLE)))::DECIMAL(28,10)),
        |      6)::DOUBLE AS mi_nats
        |  FROM cell JOIN bt USING (event_type) JOIN bh USING (hr)
        |  CROSS JOIN t),
        |ht AS (SELECT round(sum((-(bt.n_i::DOUBLE / t.n::DOUBLE) *
        |      ln(bt.n_i::DOUBLE / t.n::DOUBLE))::DECIMAL(28,10)), 6)
        |    ::DOUBLE AS h_type_nats
        |  FROM bt CROSS JOIN t),
        |hh AS (SELECT round(sum((-(bh.n_j::DOUBLE / t.n::DOUBLE) *
        |      ln(bh.n_j::DOUBLE / t.n::DOUBLE))::DECIMAL(28,10)), 6)
        |    ::DOUBLE AS h_hour_nats
        |  FROM bh CROSS JOIN t)
        |SELECT mi.n, mi.mi_nats, ht.h_type_nats, hh.h_hour_nats
        |FROM mi CROSS JOIN ht CROSS JOIN hh""".stripMargin,
    // Mirrors q191Burstiness: epoch_us // 1000000 floored gaps,
    // identical integer registers, identical double divide chain and
    // IEEE sqrt, DuckDB raises on the same int64 overflow Spark's
    // guards assert.
    // Mirrors q205DecayScores: the same integer step-decay weight
    // (2^40 >> min(whole days before the stream max, 40) — BIGINT
    // shifts agree across engines), exact int64 sum, one decimal-
    // rounded divide by the weight base.
    "q205_decay_scores" ->
      """WITH t AS (SELECT max(epoch_us(ts)) AS t_max FROM events),
        |w AS (SELECT e.user_id,
        |    (1099511627776::BIGINT >> least(
        |      (t.t_max - epoch_us(e.ts)) // 86400000000, 40)::INTEGER)
        |      AS w
        |  FROM events e CROSS JOIN t)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  sum(w)::BIGINT AS score_q,
        |  round((sum(w)::DOUBLE / 1099511627776.0)::DECIMAL(28,10), 6)
        |    ::DOUBLE AS decayed_events
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q191_burstiness" ->
      """WITH g AS (SELECT event_type,
        |    (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY
        |      event_type ORDER BY ts, event_id))) // 1000000 AS g
        |  FROM events QUALIFY g IS NOT NULL),
        |s AS (SELECT event_type, count(*)::BIGINT AS n_gaps,
        |    sum(g)::BIGINT AS sum_g, sum(g * g)::BIGINT AS sum_g2
        |  FROM g GROUP BY 1)
        |SELECT event_type, n_gaps, sum_g,
        |  round((sum_g::DOUBLE / n_gaps::DOUBLE)::DECIMAL(28,10), 6)
        |    ::DOUBLE AS mean_gap_s,
        |  CASE WHEN sum_g = 0 THEN NULL ELSE
        |  round(((sqrt((n_gaps * sum_g2 - sum_g * sum_g)::DOUBLE /
        |        (n_gaps * n_gaps)::DOUBLE) -
        |      sum_g::DOUBLE / n_gaps::DOUBLE) /
        |    (sqrt((n_gaps * sum_g2 - sum_g * sum_g)::DOUBLE /
        |        (n_gaps * n_gaps)::DOUBLE) +
        |      sum_g::DOUBLE / n_gaps::DOUBLE))::DECIMAL(28,10), 6)
        |    ::DOUBLE END AS burstiness
        |FROM s ORDER BY event_type""".stripMargin,
    // Mirrors q184MarkovTransitions: identical (ts, event_id) lag
    // order, ::BIGINT on the windowed sum (DuckDB promotes windowed
    // sum(BIGINT) to HUGEINT), identical round-in-decimal divide.
    "q184_markov_transitions" ->
      """WITH s AS (SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |t AS (SELECT prev_type, event_type AS next_type,
        |    count(*)::BIGINT AS n_transitions
        |  FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n_transitions,
        |  round((n_transitions::DOUBLE /
        |    (sum(n_transitions) OVER (PARTITION BY prev_type))::BIGINT
        |      ::DOUBLE)::DECIMAL(28,10), 6)::DOUBLE AS p_next
        |FROM t ORDER BY prev_type, next_type""".stripMargin,
    "q139_cohort_retention" ->
      """WITH a AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events),
        |f AS (SELECT user_id, min(d) AS d0 FROM a GROUP BY 1)
        |SELECT strftime(f.d0, '%Y-%m-%d') AS cohort_day,
        |  date_diff('day', f.d0, a.d)::BIGINT AS day_offset,
        |  count(DISTINCT a.user_id)::BIGINT AS n_users
        |FROM a JOIN f USING (user_id)
        |WHERE date_diff('day', f.d0, a.d) <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q136_moving_revenue" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
        |  round(sum(o_totalprice::DECIMAL(28,10)) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW),
        |  4)::DOUBLE AS trailing_7d
        |FROM orders WHERE o_custkey % 100 = 0
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q133_rollup_revenue" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,10)), 4)
        |    ::DOUBLE AS revenue,
        |  count(*) AS n_items,
        |  grouping(l_returnflag)::BIGINT AS g_flag,
        |  grouping(l_linestatus)::BIGINT AS g_status
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
        |  l_linestatus NULLS FIRST""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum((l_quantity)::DECIMAL(28,10)), 4)::DOUBLE AS sum_qty,
        |  round(sum((l_extendedprice)::DECIMAL(28,10)), 4)::DOUBLE AS sum_base_price,
        |  round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,10)), 4)::DOUBLE
        |    AS sum_disc_price,
        |  round(sum((l_extendedprice * (1 - l_discount) * (1 + l_tax))::DECIMAL(28,10)), 4)::DOUBLE
        |    AS sum_charge,
        |  round(sum((l_quantity)::DECIMAL(28,10)), 4)::DOUBLE / count(l_quantity) AS avg_qty,
        |  round(sum((l_extendedprice)::DECIMAL(28,10)), 4)::DOUBLE / count(l_extendedprice)
        |    AS avg_price,
        |  round(sum((l_discount)::DECIMAL(28,10)), 4)::DOUBLE / count(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS l_shipdate
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_returnflag = 'R' AND l_shipdate IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber
        |LIMIT 200""".stripMargin,
    "q03_top_revenue_orders" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
        |  round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,10)), 4)::DOUBLE AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q05_region_revenue" ->
      """SELECT r_name, n_name,
        |  round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,10)), 4)::DOUBLE AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q06_orphan_customers" ->
      """SELECT n_name, count(*) AS n_orphans,
        |  round(sum((c_acctbal)::DECIMAL(28,10)), 4)::DOUBLE AS orphan_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q07_setops" ->
      """WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
        |     s AS (SELECT s_nationkey AS nationkey FROM supplier)
        |SELECT nationkey, which FROM (
        |  SELECT nationkey, 'both' AS which FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
        |  UNION ALL
        |  SELECT nationkey, 'cust_only' AS which FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
        |)
        |ORDER BY which, nationkey""".stripMargin,
    "q08_window_topk" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,
    "q09_tumbling_windows" ->
      """SELECT strftime(date_trunc('day', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S')
        |    AS window_start, event_type,
        |  count(*) AS n_events,
        |  round(sum((value)::DECIMAL(28,10)), 4)::DOUBLE AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,
    // Mirrors q109RateAnomaly: hourly counts, the same trailing-frame
    // integer sums, and the identical double division chain (BIGINT
    // operands promote to double exactly as Spark's explicit casts).
    "q109_rate_anomaly" ->
      """WITH c AS (SELECT event_type,
        |    date_trunc('hour', ts::TIMESTAMP) AS w,
        |    count(*)::BIGINT AS n_events
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, w, n_events,
        |    count(n_events) OVER f AS n_prev,
        |    sum(n_events) OVER f AS sp,
        |    sum(n_events * n_events) OVER f AS ssp
        |  FROM c
        |  WINDOW f AS (PARTITION BY event_type ORDER BY w
        |               ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
        |SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
        |  n_events, n_prev::BIGINT AS n_prev,
        |  CASE WHEN n_prev >= 3 THEN
        |    round((sp / n_prev)::DECIMAL(28,10), 6)::DOUBLE END
        |    AS baseline_mean,
        |  CASE WHEN n_prev >= 3 AND
        |      sqrt(greatest((ssp - sp::DOUBLE * sp / n_prev) / n_prev, 0.0)) > 0
        |    THEN round(((n_events - sp / n_prev)
        |      / sqrt(greatest((ssp - sp::DOUBLE * sp / n_prev) / n_prev, 0.0)))
        |      ::DECIMAL(28,10), 6)::DOUBLE
        |  END AS z
        |FROM s ORDER BY window_start, event_type""".stripMargin,
    "q10_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts::TIMESTAMP) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        |  round(sum((value)::DECIMAL(28,10)), 4)::DOUBLE AS sum_value
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q38_session_window_native" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts::TIMESTAMP) OVER w)
        |              >= 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f')
        |    AS session_end,
        |  count(*) AS n_events,
        |  round(sum((value)::DECIMAL(28,10)), 4)::DOUBLE AS sum_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q11_twitter_ts_parse" ->
      """SELECT event_id,
        |  strftime(ts::TIMESTAMP, '%a %b %d %H:%M:%S +0000 %Y') AS twitter_ts,
        |  strftime(strptime(strftime(ts::TIMESTAMP, '%a %b %d %H:%M:%S +0000 %Y'),
        |           '%a %b %d %H:%M:%S %z %Y')::TIMESTAMP,
        |           '%Y-%m-%d %H:%M:%S') AS parsed_ts
        |FROM events
        |WHERE event_id < 1000
        |ORDER BY event_id""".stripMargin,
    "q64_asof_join" ->
      """WITH tagged AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_id,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |swept AS (
        |  SELECT user_id, ts, event_id, side,
        |         last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |           OVER w AS click_id,
        |         last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
        |           OVER w AS click_ts
        |  FROM tagged
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id::BIGINT AS user_id,
        |       event_id::BIGINT AS purchase_id,
        |       click_id::BIGINT AS click_id,
        |       (epoch_us(ts) - epoch_us(click_ts))::BIGINT AS gap_us
        |FROM swept WHERE side = 1
        |ORDER BY purchase_id""".stripMargin,
    // Mirrors the pivot as CASE sums; counts ::BIGINT. Column names
    // must equal Spark's pivot output (the bare value strings).
    "q161_pivot_activity" ->
      """SELECT user_id,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
        |    AS click,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
        |    AS error,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
        |    AS purchase,
        |  sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT
        |    AS signup,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT
        |    AS "view"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // The unpivot of the pivot is the plain long count relation with
    // zero rows materialized for absent types — a per-user × 5-type
    // grid left-joined to the counts.
    "q162_unpivot_activity" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |ty AS (SELECT unnest(['click', 'error', 'purchase', 'signup',
        |    'view']) AS event_type),
        |c AS (SELECT user_id, event_type, count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT u.user_id, ty.event_type,
        |  coalesce(c.n, 0)::BIGINT AS n
        |FROM u CROSS JOIN ty
        |LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = ty.event_type
        |ORDER BY u.user_id, ty.event_type""".stripMargin,
    // Mirrors Scale.skewReport: plain rank over the key counts (the
    // Spark side uses the bucketed-rank device — rank-exact for any
    // partitioning); integer registers via // (floors like Spark div
    // on positive operands).
    "q168_skew_report" ->
      """WITH c AS (SELECT user_id, count(*)::BIGINT AS n_rows
        |  FROM events GROUP BY 1),
        |t AS (SELECT sum(n_rows)::BIGINT AS total,
        |    count(*)::BIGINT AS keys FROM c),
        |r AS (SELECT user_id, n_rows,
        |    row_number() OVER (ORDER BY n_rows DESC, user_id) AS rank
        |  FROM c)
        |SELECT rank::BIGINT AS rank, user_id, n_rows,
        |  (n_rows * 1000000) // total AS share_ppm,
        |  (n_rows * 1000 * keys) // total AS skew_x1000
        |FROM r CROSS JOIN t WHERE rank <= 10
        |ORDER BY rank""".stripMargin,
    // The NAIVE range join on purpose: DuckDB plans it as an IEJoin,
    // a completely different algorithm from the Spark-side sweep — if
    // the sweep's inclusive-bound order were off by one tie, the hash
    // could not match.
    "q152_interval_join" ->
      """WITH iv AS (
        |  SELECT user_id, event_id AS interval_id,
        |    ts::TIMESTAMP - INTERVAL 1 HOUR AS s, ts::TIMESTAMP AS e
        |  FROM events WHERE event_type = 'purchase')
        |SELECT iv.user_id::BIGINT AS user_id,
        |  iv.interval_id::BIGINT AS interval_id,
        |  count(*)::BIGINT AS n_events
        |FROM iv JOIN events ev ON ev.user_id = iv.user_id
        |  AND ev.ts::TIMESTAMP >= iv.s AND ev.ts::TIMESTAMP <= iv.e
        |GROUP BY 1, 2 ORDER BY interval_id""".stripMargin,
    "q68_funnel" ->
      """WITH s AS (SELECT user_id, min(ts::TIMESTAMP) AS t0 FROM events
        |    WHERE event_type = 'signup' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts::TIMESTAMP) AS t1
        |  FROM events e JOIN s ON e.user_id = s.user_id
        |  WHERE e.event_type = 'click' AND e.ts::TIMESTAMP >= s.t0
        |    AND e.ts::TIMESTAMP <= s.t0 + INTERVAL 24 HOUR GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts::TIMESTAMP) AS t2
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP >= c.t1
        |    AND e.ts::TIMESTAMP <= c.t1 + INTERVAL 24 HOUR GROUP BY 1)
        |SELECT s.user_id,
        |  strftime(s.t0, '%Y-%m-%d %H:%M:%S.%f') AS signup_ts,
        |  strftime(c.t1, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |  strftime(p.t2, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
        |  (1 + (c.t1 IS NOT NULL)::INT + (p.t2 IS NOT NULL)::INT)::BIGINT
        |    AS steps_completed
        |FROM s LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY s.user_id""".stripMargin)
}
