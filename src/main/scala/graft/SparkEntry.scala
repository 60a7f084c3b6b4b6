package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{CacheFamily, CoreQueries, OperatorQueries, PipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 (plus the
  * north-star pipeline extensions) to a (spark, sfDir) => DataFrame; each
  * SQL-expressible entry has a DuckDB oracle twin in `oracleSql` with
  * IDENTICAL column names (the driver sorts columns by name before value
  * hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the TPC-H Q5-shape multi-join through two broadcast dims. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q05RegionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ OperatorQueries.queries ++ PipelineQueries.queries

  /** Headline bench set: everything except the queries that exist purely
    * as quadratic correctness baselines for their scalable twins (q21
    * all-pairs Jaccard vs q20 MinHash+LSH) — declared never-run-at-scale,
    * so they don't belong in the scale-facing headline number. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries - "q21_ngram_jaccard"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ OperatorQueries.oracles ++ PipelineQueries.oracles

  /** The EXPLICIT rows-only set — queries whose outputs are genuinely
    * not SQL-replayable (seeded Gibbs sampling q36/q135, the driver-side
    * Jacobi eigensolve q147, the seeded span-sampler RNG kernel q149),
    * each pinned instead by independent-reimplementation + golden-hash
    * specs. A query missing from BOTH `oracleSql` and this set is a
    * registry bug — the driver would silently downgrade it to a
    * rows-only check (RegistryConsistencySpec fails it loudly instead;
    * the round-14 lesson: q76/q160/q209 sat unverified for rounds after
    * their outputs had become replayable; the round-16 lesson: q188's
    * greedy argmax WAS replayable all along as a rolling-state
    * recursive CTE — its k-bounded selection state fits the q209
    * Viterbi device). */
  val rowsOnlyByContract: Set[String] = Set(
    "q36_topic_model_gibbs", "q135_topic_model_train", "q147_pca_report",
    "q149_span_sampled")

  /** Bench sweep order: numeric query index, then full name — q100 runs
    * AFTER q99 (lexicographic order ran the q1xx block first, holding
    * every family cache it touched resident across the whole sweep —
    * measured at ~5 s of avoidable residency cost). Shared by Bench and
    * CacheLifecycleSpec so the empirical consumer check observes the
    * exact warm/cold pattern the sweep produces. */
  def sweepOrder(name: String): (Int, String) = {
    val idx = name.drop(1).takeWhile(_.isDigit)
    (if (idx.isEmpty) Int.MaxValue else idx.toInt, name)
  }

  /** Cache lifecycle for a full sweep (Bench): each shared query-family
    * cache declares its consumers; Bench COMPUTES each family's release
    * position (max consumer index in the actual sorted sweep list) so
    * the sweep never holds every family's cache simultaneously and a new
    * consumer can never outlive a hand-named release point.
    * CacheLifecycleSpec asserts these sets equal the empirical
    * CacheRegistry touches. A long-lived deployment serving one family
    * keeps its cache for the session — this hook exists for the
    * all-families sweep shape. */
  def cacheFamilies: Map[String, CacheFamily] =
    CoreQueries.cacheFamilies ++ OperatorQueries.cacheFamilies ++
      PipelineQueries.cacheFamilies
}
