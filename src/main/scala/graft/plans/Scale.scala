package graft.plans

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.functions._

/** Explicit scale levers that complement the session-level defaults
  * (AQE skew-join + coalescing, broadcast joins — see
  * [[graft.Tables.session]]): deterministic salting for skew beyond what
  * AQE's runtime splitting handles, and bucketed persistence so repeated
  * co-located joins skip their exchanges entirely.
  *
  * AQE splits skewed SORT-MERGE partitions at runtime, but only at
  * shuffle boundaries it can see, and only per-query; salting bakes the
  * spread into the key, and bucketing bakes co-location into storage —
  * the two levers a 100 TB deployment reaches for when one hot key or
  * one repeated fact-fact join dominates a pipeline.
  */
object Scale {

  /** Salted equi-join for extreme key skew: the big (skewed) side gets a
    * deterministic salt in [0, nSalts) and the small side is replicated
    * once per salt, so one hot key's rows spread across nSalts shuffle
    * partitions instead of hot-spotting one. Result-identical to
    * `big.join(small, Seq(key), joinType)` for "inner" and "left" (each
    * big row matches exactly the one replica carrying its salt).
    *
    * The salt hashes the big row's contents PLUS a partition-local row
    * index rather than calling rand(): identical rows (the classic
    * extreme-skew payload — without the index they'd all hash to ONE
    * salt and re-create the hot spot) still spread, and a recomputed
    * partition reproduces the same salts (monotonically_increasing_id
    * is a pure function of partition id and position, stable for a
    * deterministic input — unlike rand(), which re-rolls under fetch
    * failures and can lose/duplicate rows mid-shuffle). Any salt value
    * is CORRECT (each big row matches exactly the replica carrying its
    * salt); determinism only matters for retry consistency.
    *
    * "right"/"full" are rejected: an unmatched small row would surface
    * once per replica. Use the small side as the left input instead. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts >= 1, "saltedJoin: nSalts must be >= 1")
    require(Set("inner", "left", "leftouter", "left_outer")(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins, not $joinType")
    val bigS = big.withColumn("_salt",
      pmod(hash(big.columns.map(col).toIndexedSeq :+
        monotonically_increasing_id(): _*), lit(nSalts)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    bigS.join(smallS, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Key-skew diagnostic — the report a deployment runs BEFORE choosing
    * between AQE, [[saltedJoin]] and bucketing: per-key row counts for
    * the top `topN` offenders, each with its corpus share and its skew
    * factor against the mean key (how many average keys this one is
    * worth). One hash aggregate on the key; the descending rank rides
    * [[graft.pipeline.Ranks.bucketedGlobalRank]] (ascending on the
    * NEGATED count) because the key-count relation is itself
    * key-cardinality — a bare global Window here would single-task the
    * exact hot-key workload this report diagnoses. Totals are one 1-row
    * broadcast. Integer registers throughout (share in ppm, skew ×1000
    * via exact int64 div), so the report hashes identically across
    * engines and partitionings. */
  def skewReport(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    require(topN >= 1, "skewReport: topN must be >= 1")
    // the key-count relation feeds FOUR consumers (bucketedGlobalRank's
    // eager min/max stats action, its histogram and rank branches, and
    // the totals aggregate) — materialize it once instead of replaying
    // the input scan + groupBy per branch (the withRoots device)
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
      .localCheckpoint()
    val totals = counts.agg(sum(col("n_rows")).as("_total"),
      count(lit(1)).as("_keys"))
    // loud int64 guard, woven INTO the emitted column so ColumnPruning
    // cannot drop it (the nbRelevance assert_true device): Spark's
    // non-ANSI multiply would WRAP silently past 2^63 where DuckDB
    // raises — n_rows * 1000 * keys must stay representable
    val skewChecked = when(
      assert_true(col("n_rows") <= lit(Long.MaxValue / 1000L) / col("_keys"),
        lit("skewReport: n_rows * 1000 * n_keys exceeds int64 — rescale " +
          "(report shares per stratum) before the skew factor")).isNull,
      expr("(n_rows * 1000L * _keys) div _total"))
    val shareChecked = when(
      assert_true(col("n_rows") <= lit(Long.MaxValue / 1000000L),
        lit("skewReport: n_rows * 1e6 exceeds int64")).isNull,
      expr("(n_rows * 1000000L) div _total"))
    graft.pipeline.Ranks.bucketedGlobalRank(
        counts.withColumn("_neg", -col("n_rows")), "_neg", keyCol,
        rankCol = "rank")
      .drop("_neg")
      .withColumn("rank", col("rank").cast("long"))
      .filter(col("rank") <= topN)
      .crossJoin(broadcast(totals))
      .select(col("rank"), col(keyCol), col("n_rows"),
        shareChecked.as("share_ppm"),
        skewChecked.as("skew_x1000"))
  }

  /** Bucketed, bucket-sorted external-table write: one file per bucket,
    * sorted on `key`. Two tables written this way with the SAME bucket
    * count sort-merge-join on `key` with NO exchange on either side —
    * the join reads co-located buckets (ScaleSpec asserts the plan is
    * exchange-free). A non-global in-partition sort remains under the
    * join by default: since SPARK-28595 bucketed scans don't expose
    * sortedness (multi-file buckets made that unsafe); set
    * spark.sql.legacy.bucketedTableScan.outputOrdering=true to also
    * elide it for single-file buckets like these. This is the
    * storage-side answer for fact-fact joins repeated across queries:
    * one bucketed write amortizes every downstream shuffle away. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    // repartition on the key with the bucket count first: bucket-id and
    // repartition hashing agree (pmod of the same hash), so each task
    // holds exactly one bucket and writes ONE file per bucket — the
    // sorted-bucket property only survives single-file buckets, and
    // multi-file buckets would put a per-task Sort back under the join.
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** The co-located join over two [[writeBucketed]] tables. Plain
    * `spark.table(a).join(spark.table(b), key)` — the method exists to
    * name the pattern and anchor the exchange-free plan assertion. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      tableA: String, tableB: String, key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), key)

  /** Materialize [[graft.pipeline.TextMetrics.shuffleShards]] output as
    * the directory layout a training loader consumes: one
    * `shard=<k>/` partition directory per shard, rows inside each file
    * in shuffled (`pos`) order. `repartition(shard)` first so each
    * shard's rows land in ONE task → one file per directory (Hive-style
    * partitionBy alone would write one file per (input-partition,
    * shard) pair — up to tasks × shards shards of a shard);
    * `sortWithinPartitions(pos)` preserves the reproducible order on
    * disk. The shard column sizes with nShards, so directory count —
    * and with it file count — is an explicit knob, not a function of
    * input partitioning. */
  def writeShards(sharded: DataFrame, path: String): Unit =
    sharded
      .repartition(col("shard"))
      .sortWithinPartitions(col("pos"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(path)

  /** Morton (Z-order) interleave of two non-negative 32-bit keys into
    * one long sort key — bit i of `a` lands at position 2i, of `b` at
    * 2i+1, so nearby (a, b) PAIRS get nearby codes. Pure builtin
    * shift/mask column arithmetic (codegen'd, engine-portable).
    *
    * Domain is ENFORCED per row: a null, negative, or >= 2^32 key raises
    * instead of silently producing a non-monotone code (the spread masks
    * destroy bits above 32, which would quietly defeat the clustering —
    * no error, just files whose min/max stats prune nothing). */
  def zInterleave(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def checked(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val l = c.cast("long")
      when(l.isNull.or(l < 0).or(l > lit(0xFFFFFFFFL)),
        raise_error(concat(lit("zInterleave: key out of [0, 2^32): "),
          coalesce(c.cast("string"), lit("null")))).cast("long"))
        .otherwise(l)
    }
    def spread(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      // classic 32→64-bit bit-spreading by doubling mask strides
      val s1 = (c.bitwiseOR(shiftleft(c, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      val s2 = (s1.bitwiseOR(shiftleft(s1, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      val s3 = (s2.bitwiseOR(shiftleft(s2, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      val s4 = (s3.bitwiseOR(shiftleft(s3, 2))).bitwiseAND(lit(0x3333333333333333L))
      (s4.bitwiseOR(shiftleft(s4, 1))).bitwiseAND(lit(0x5555555555555555L))
    }
    spread(checked(a)).bitwiseOR(shiftleft(spread(checked(b)), 1))
  }

  /** Z-order clustered write — the data-skipping layout lever for scans
    * filtered on TWO dimensions: sorting by either key alone leaves the
    * other unbounded per file (a range filter on it prunes nothing);
    * range-partitioning + sorting on the Morton code bounds BOTH keys
    * per file, so parquet row-group/file min-max stats prune either
    * predicate. The write is one range exchange + in-partition sort —
    * exactly what a plain global sort pays. ScaleSpec measures the
    * per-file key spans against a single-key sort baseline. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int): Unit = {
    require(numFiles >= 1, "writeZOrdered: numFiles must be >= 1")
    df.withColumn("_z", zInterleave(col(colA), col(colB)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite")
      .parquet(path)
  }

  /** Small-file compaction — the table-maintenance lever every
    * long-lived lake table needs: streaming sinks, fine-grained
    * `partitionBy`, and incremental appends degrade a table into
    * thousands of KB-scale files, and at 100 TB the scan's task count
    * (and the NameNode/listing load) is set by FILE population, not
    * data volume. Rewrites the directory at a file count derived from
    * ACTUAL bytes (`ceil(totalBytes / targetFileBytes)` — a knob over
    * measured input, never a guess), range-partitioned + sorted on
    * `sortCols` so the rewrite also RESTORES clustering: files carry
    * disjoint key ranges afterward, so min-max pruning works again.
    * One range exchange + in-partition sort — the same cost a plain
    * global sort pays. Returns (filesBefore, filesAfter, rows). */
  def compactFiles(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, sortCols: Seq[String],
      targetFileBytes: Long = 128L << 20): (Long, Long, Long) = {
    require(sortCols.nonEmpty, "compactFiles: at least one sort column")
    require(targetFileBytes >= 1, "compactFiles: targetFileBytes must be >= 1")
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        if (st.isDirectory) dataFiles(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st)
        else Nil
      }
    val before = dataFiles(new org.apache.hadoop.fs.Path(inPath))
    require(before.nonEmpty,
      s"compactFiles: no parquet data files under $inPath")
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath)
      .repartitionByRange(nOut, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(outPath)
    val after = dataFiles(new org.apache.hadoop.fs.Path(outPath))
    (before.length.toLong, after.length.toLong,
      spark.read.parquet(outPath).count())
  }
}
