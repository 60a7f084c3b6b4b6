package graft.sources

import org.apache.spark.sql.DataFrame

/** Interchange-format round trips — the source/sink surface beyond
  * parquet: CSV (the universal ingest format) and ORC (the other
  * columnar standard, built into Spark). The discipline encoded here
  * is the one that matters at scale:
  *
  *  - ALWAYS read with the writer's explicit schema. `inferSchema` is
  *    a full extra pass over the data and a correctness hazard (a
  *    column of digit-looking strings silently becomes numeric);
  *    [[roundtrip]] re-reads with the input DataFrame's own schema, so
  *    types survive byte-exactly.
  *  - CSV is QUOTED text, not split text: the default quote/escape
  *    handling round-trips embedded delimiters and newlines only when
  *    writer and reader agree; keeping both sides in one helper pins
  *    that agreement.
  *
  * The q163/q164 oracles never see the intermediate files — they read
  * the original parquet — so a lossy step anywhere in
  * write→re-read cannot hash-match. */
object Formats {

  /** Write `df` under `path` as `format`, then read it back with df's
    * EXPLICIT schema and the same options.
    *
    * CSV lossless defaults: Spark's CSV WRITER trims leading/trailing
    * whitespace by default (`ignoreLeadingWhiteSpace` /
    * `ignoreTrailingWhiteSpace` default true on write) — a silent
    * mutation of string payloads. This helper pins both to false
    * unless the caller overrides, so a value round-trips
    * byte-identically. */
  def roundtrip(df: DataFrame, format: String, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    require(format.nonEmpty, "roundtrip: format required")
    val opts =
      if (format == "csv")
        // multiLine on the READ side is what actually honors quoted
        // embedded newlines (the default line-mode reader splits a
        // quoted record at \n regardless of writer quoting); escape is
        // pinned explicitly so writer and reader can never drift.
        Map("ignoreLeadingWhiteSpace" -> "false",
          "ignoreTrailingWhiteSpace" -> "false",
          "multiLine" -> "true",
          "escape" -> "\"") ++ options
      else options
    df.write.mode("overwrite").options(opts).format(format).save(path)
    df.sparkSession.read.schema(df.schema).options(opts)
      .format(format).load(path)
  }
}
