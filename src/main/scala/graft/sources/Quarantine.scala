package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Malformed-record quarantine for JSON-lines ingest — the policy
  * layer every production pipeline puts between a raw feed and its
  * tables: parse with an EXPLICIT schema, route rows that fail the
  * parse to a quarantine side-output (never silently drop them, never
  * crash the job on one bad line), and let the audit count gate the
  * batch. Complements [[TweetSource]]'s happy-path readers: that code
  * assumes well-formed lines; this is the arm that makes the
  * assumption safe to make.
  *
  * Mechanism: Spark's permissive `from_json` does NOT null the struct
  * on a malformed line — it null-fills every field, indistinguishable
  * from a legitimately-sparse record (q192's first cut shipped exactly
  * that bug: 0 of 6 planted corruptions quarantined, caught by the
  * oracle's count mismatch). The reliable verdict is the parser's own
  * corrupt-record capture: a `columnNameOfCorruptRecord` field appended
  * to the schema receives the RAW LINE iff the parse failed —
  * non-null capture ⇔ quarantine, and the captured payload is the
  * replay artifact. One scan, no UDF, no shuffle. */
object Quarantine {

  private val CorruptCol = "_corrupt_record"

  /** Parse `lineCol` as JSON with `schema`; returns (clean rows with
    * the schema's columns, quarantined raw lines). A well-formed
    * object with MISSING fields parses clean with null columns —
    * field validity is the data contracts' job (q98), quarantine is
    * for lines the parser rejects. */
  def splitParsed(lines: DataFrame, lineCol: String,
      schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"splitParsed: schema must not already define $CorruptCol")
    val s2 = schema.add(CorruptCol, "string")
    val parsed = lines.withColumn("_parsed",
      from_json(col(lineCol), s2,
        Map("columnNameOfCorruptRecord" -> CorruptCol)))
    val clean = parsed
      .filter(col("_parsed").isNotNull &&
        col(s"_parsed.$CorruptCol").isNull)
      .select(schema.fieldNames.map(f => col(s"_parsed.$f")).toSeq: _*)
    val bad = parsed
      .filter(col("_parsed").isNull ||
        col(s"_parsed.$CorruptCol").isNotNull)
      .select(col(lineCol).as("raw_line"))
    (clean, bad)
  }

  /** One-row-per-verdict ingest audit: clean/quarantined counts plus a
    * content proof over the clean side (`sum_chars` of `proofCol` —
    * nonzero only if the parse actually extracted fields, so a parser
    * that null-fills every column cannot pass the gate). */
  def auditReport(lines: DataFrame, lineCol: String, schema: StructType,
      proofCol: String): DataFrame = {
    val (clean, bad) = splitParsed(lines, lineCol, schema)
    clean.agg(count(lit(1)).as("n"),
        coalesce(sum(length(col(proofCol))), lit(0L)).as("sum_chars"))
      .select(lit("clean").as("status"), col("n"), col("sum_chars"))
      .unionByName(bad.agg(count(lit(1)).as("n"))
        .select(lit("quarantined").as("status"), col("n"),
          lit(0L).as("sum_chars")))
  }
}
