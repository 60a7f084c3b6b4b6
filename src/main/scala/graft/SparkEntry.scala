package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{CoreQueries, OperatorQueries, PipelineQueries}

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

  /** Cache lifecycle for a full name-ordered sweep (Bench): each shared
    * query-family cache is released right after its LAST consumer in sort
    * order, so the sweep never holds every family's cache simultaneously.
    * A long-lived deployment serving one family keeps its cache for the
    * session — this hook exists for the all-families sweep shape. */
  def cacheReleaseAfter: Map[String, () => Unit] = Map(
    "q35_interaction_graph" -> (() => OperatorQueries.releaseEventsCaches()),
    "q36_topic_model_gibbs" -> (() => OperatorQueries.releaseStemIndexCache()),
    "q93_effective_size" -> (() => PipelineQueries.releaseClusterCache()),
    "q92_quality_calibration" -> (() => PipelineQueries.releaseTfCache()),
    "q86_knn_purity" -> (() => PipelineQueries.releaseKnnCache()),
    "q91_lsh_tuning" -> (() => PipelineQueries.releaseMinhashCaches()))
}
