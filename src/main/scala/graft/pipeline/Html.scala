package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup → text extraction — the ingestion front door every real
  * pretraining corpus hits before any text-level cleaning (the
  * reference ships the same stage as offline tooling:
  * `util/HTMLMapFilterer.java:46-63` strips markup from crawled pages
  * before they enter its pipelines; FineWeb/C4/CCNet all start here).
  * Emits line-segmented plain text ready for the line-level cleaners
  * (C4 rules q75, boilerplate q83).
  *
  * Entirely relational: one chain of `regexp_replace`/`replace`
  * Column expressions — no UDF, no lambda (Catalyst codegen keeps the
  * whole chain in one WholeStageCodegen projection; a `transform`
  * lambda here would drop the stage to interpreted evaluation, the
  * q34/q66 20× trap). Every regex uses RE2-compatible syntax (inline
  * `(?is)` flags, non-greedy `.*?`, explicit whitespace classes — never
  * `\s`, whose Java form includes \x0B while RE2's does not), so a
  * DuckDB oracle replays the identical chain.
  *
  * Extraction pipeline, in order (order is semantic — comments can
  * contain markup, scripts can contain `<` comparisons, entity decode
  * must run after tag stripping so planted `&lt;tag&gt;` text never
  * re-parses as markup, and `&amp;` decodes LAST so `&amp;lt;` yields
  * the literal `&lt;`):
  *   1. drop `<!-- … -->` comments and `<![CDATA[ … ]]>` sections
  *   2. drop `<script>`/`<style>` elements INCLUDING content
  *   3. newline at block boundaries (`</p> </div> </li> </tr> </td>
  *      </th> </h1-6> </title> <br>`) so blocks become lines
  *   4. strip every remaining tag
  *   5. decode the named entities `&lt; &gt; &quot; &#39; &nbsp;`,
  *      then `&amp;`
  *   6. normalize: collapse intra-line whitespace, trim line edges,
  *      drop empty lines
  *
  * Scale shape: map-side only — no shuffle, no driver traffic; the
  * chain fuses into the scan projection and runs at parquet-read
  * throughput. 100 TB of HTML is exactly as partitionable as its scan.
  *
  * Deliberate bounds (documented, spec-pinned): named entities beyond
  * the five above and numeric character references pass through
  * verbatim; malformed markup (an unclosed `<`) is left in place
  * rather than guessed at — a cleaning-stage filter catches the
  * stragglers, which beats silently eating document text.
  */
object Html {

  /** The extracted-text Column: [[extractText]]'s kernel, exposed so
    * queries can compose it inline (and the oracle can mirror it
    * subexpression by subexpression). */
  def extractExpr(html: Column): Column = {
    // 1. comments + CDATA (content dropped)
    val noComment = regexp_replace(
      regexp_replace(html, "(?s)<!--.*?-->", ""),
      "(?s)<!\\[CDATA\\[.*?\\]\\]>", "")
    // 2. script/style elements, content and all
    val noScript = regexp_replace(noComment,
      "(?is)<script[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", "")
    // 3. block boundaries → newline (before generic stripping, so the
    // block structure survives as line structure)
    val blocks = regexp_replace(noStyle,
      "(?i)<(/p|/div|/li|/tr|/td|/th|/h[1-6]|/title|br[^>]*)>", "\n")
    // 4. strip every remaining tag
    val noTags = regexp_replace(blocks, "<[^>]*>", "")
    // 5. named entities; &amp; LAST
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => regexp_replace(c, e, ch) }
    // 6. whitespace normalization: collapse runs (explicit class, no
    // \s), trim line edges ((?m) anchors are engine-identical), drop
    // empty lines, trim outer newlines
    val squeezed = regexp_replace(decoded, "[ \\t\\f\\r]+", " ")
    val trimmed = regexp_replace(squeezed, "(?m)^ +| +$", "")
    val joined = regexp_replace(trimmed, "\n{2,}", "\n")
    regexp_replace(joined, "^\n+|\n+$", "")
  }

  /** HTML → line-segmented plain text: one row per input document with
    * the extracted text, its line count and char count (the shape the
    * q75/q83 line cleaners consume). */
  def extractText(docs: DataFrame, idCol: String,
      htmlCol: String): DataFrame = {
    val text = extractExpr(col(htmlCol))
    docs.select(col(idCol), text.as("text"))
      .select(col(idCol), col("text"),
        when(col("text") === "", 0)
          .otherwise(size(split(col("text"), "\n"))).cast("long")
          .as("n_lines"),
        length(col("text")).cast("long").as("n_chars"))
  }
}
