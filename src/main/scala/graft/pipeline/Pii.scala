package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines (north-star
  * extension): the scrub pass every corpus runs before tokenizer/LM
  * training. Pure per-row column expressions (regexp_count /
  * regexp_replace are codegen'd) — no shuffle, scan-speed at any corpus
  * size, and trivially streamable (the same columns apply to a
  * readStream frame).
  *
  * Pattern discipline: every regex sticks to the syntax subset that
  * Java's `java.util.regex` (Spark) and RE2 (DuckDB, and most external
  * scrubbers) interpret identically — character classes, bounded
  * repetition, alternation, `\b` word boundaries; no backrefs, no
  * lookaround — so the same pattern table can be shipped to either
  * engine and the oracle can mirror the scrub byte-for-byte.
  */
object Pii {

  /** (kind, pattern, replacement) — ordered: redaction applies top to
    * bottom, so earlier patterns must not produce text that later
    * patterns match (the placeholders contain no digits or '@'). */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+1-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  /** Per-kind match counts over `textCol`, one `n_<kind>s` column each. */
  def countColumns(textCol: String): Seq[(String, Column)] =
    patterns.map { case (kind, pat, _) =>
      s"n_${kind}s" -> regexp_count(col(textCol), lit(pat)).cast("long")
    }

  /** The card placeholder [[graft.functions.TextKernels.redactCards]]
    * splices in for Luhn-verified runs. */
  val cardPlaceholder: String = "<CARD>"

  /** The scrubbed text: every pattern's matches replaced by its
    * placeholder in declaration order, then Luhn-verified card runs
    * excised LAST via the native `redact_cards` expression (a regex
    * cannot decide the checksum — detection without excision was only
    * half the scrubbing story). Order is safe by construction: the
    * regex placeholders contain no digit runs, and `<CARD>` contains
    * nothing the regex patterns match. */
  def redactedColumn(textCol: String): Column =
    call_function("redact_cards",
      patterns.foldLeft(col(textCol)) { case (c, (_, pat, repl)) =>
        regexp_replace(c, pat, repl)
      })

  /** Detection + redaction in one select: id, per-kind counts (cards
    * counted as the placeholders the excision spliced in — exact, and
    * trivially oracle-replayable; documented bound: raw text carrying
    * a literal `<CARD>` inflates the count), total hit count, and the
    * scrubbed text. */
  def scrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = countColumns(textCol)
    val nCards = regexp_count(col("redacted"), lit(cardPlaceholder))
      .cast("long")
    docs.select(
      col(idCol) +:
        counts.map { case (n, c) => c.as(n) } :+
        redactedColumn(textCol).as("redacted"): _*)
      .select(col(idCol) +:
        counts.map { case (n, _) => col(n) } :+
        nCards.as("n_cards") :+
        (counts.map { case (n, _) => col(n) }.reduce(_ + _) + nCards)
          .as("n_pii") :+
        col("redacted"): _*)
  }

  /** [[scrub]] appended to the input rows — the streaming/annotation
    * form (no join back, so repeated ids within a batch stay safe). */
  def withScrub(docs: DataFrame, textCol: String): DataFrame = {
    val counts = countColumns(textCol)
    val withCounts = counts.foldLeft(docs) { case (d, (n, c)) => d.withColumn(n, c) }
    withCounts
      .withColumn("redacted", redactedColumn(textCol))
      .withColumn("n_cards",
        regexp_count(col("redacted"), lit(cardPlaceholder)).cast("long"))
      .withColumn("n_pii",
        counts.map(_._2).reduce(_ + _) + col("n_cards"))
  }

  /** Credit-card detection with Luhn verification — the PII class a
    * bare regex cannot decide: any 13–19 digit run is only a CANDIDATE;
    * a card number must also hold the mod-10 (Luhn) checksum, and
    * redacting unverified runs shreds order ids and ISBNs. Candidates
    * are MAXIMAL digit runs filtered to card lengths — exact boundary
    * semantics without lookaround (a 20+-digit run is NOT a card and
    * never half-matches; `(?<![0-9])` devices are not RE2-safe, maximal
    * runs are). Verification is pure exact-integer relational math:
    * per-candidate digit explode (≤19 rows), double-every-second from
    * the right with the >9 ⇒ −9 fold, sum mod 10 — so a DuckDB oracle
    * replays it term for term. Emits per document the candidate count,
    * the Luhn-verified count and the verified flag.
    *
    * Scale shape: the candidate relation is hit-cardinality (vanishing
    * next to the corpus — only docs with 13+-digit runs contribute);
    * two map-side-combined aggregates; document text never shuffles.
    * Documented bound: contiguous runs only — separator-grouped forms
    * (4-4-4-4) normalize upstream if needed. */
  def cardReport(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Explode ALL digit runs, filter lengths relationally (r20): the
    // array-lambda `filter(...)` HOF is CodegenFallback — it broke the
    // scan projection's whole-stage-codegen span and boxed every
    // element (guide §4.1/"expressions and codegen"). Generate+Filter
    // fuse in codegen; `cpos` stays a per-doc-unique discriminator
    // (position among all runs instead of among card-length runs —
    // only its uniqueness is consumed, the groupBy output is
    // unchanged).
    val cands = docs.select(col(idCol),
        posexplode(regexp_extract_all(col(textCol), lit("[0-9]+"), lit(0)))
          .as(Seq("cpos", "cand")))
      .filter(length(col("cand")) >= 13 && length(col("cand")) <= 19)
    val dg = col("cand").substr(col("i"), lit(1)).cast("int")
    val term = when(((length(col("cand")) - col("i") + 1) % 2) === 0,
      when(dg * 2 > 9, dg * 2 - 9).otherwise(dg * 2)).otherwise(dg)
    val perCand = cands
      .select(col(idCol), col("cpos"), col("cand"),
        explode(sequence(lit(1), length(col("cand")))).as("i"))
      .groupBy(col(idCol), col("cpos"), col("cand"))
      .agg((sum(term) % 10 === 0).as("_ok"))
    val perDoc = perCand.groupBy(col(idCol))
      .agg(count(lit(1)).as("_nc"),
        sum(when(col("_ok"), 1L).otherwise(0L)).as("_nv"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_nc"), lit(0L)).as("n_candidates"),
        coalesce(col("_nv"), lit(0L)).as("n_valid_cards"),
        (coalesce(col("_nv"), lit(0L)) > 0).as("has_valid_card"))
  }

  /** 10^p mod 97 for p in 0..67 — the positional-power table behind
    * [[ibanReport]]'s mod-97 validation (an IBAN expands to ≤ 68
    * decimal digits once letters map to two-digit values; each digit's
    * contribution is digit · 10^position mod 97, so the whole check is
    * an order-independent SUM of small exact integers — the q239
    * relational-checksum discipline, where a left-fold running
    * remainder would not be expressible as an aggregate). Interpolated
    * into the oracle so the table cannot drift. */
  val pow10Mod97: IndexedSeq[Int] =
    Iterator.iterate(1)(x => x * 10 % 97).take(68).toIndexedSeq

  /** IBAN detection with mod-97 verification (ISO 13616) — the OTHER
    * checksum-verified PII class beside [[cardReport]]'s Luhn:
    * candidates are maximal alphanumeric runs shaped
    * `[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}` (15–34 chars — the country/
    * check/BBAN layout; lowercase or a digit prefix breaks the shape,
    * and a run burying an IBAN is NOT a candidate, the maximal-run
    * rule); verification rearranges (first 4 chars to the end), maps
    * letters A..Z → 10..35, and requires the expanded decimal number
    * ≡ 1 (mod 97) — computed per candidate as a sum over characters of
    * value · 10^(digits to the right) mod 97 via [[pow10Mod97]], with
    * the digits-to-the-right from one candidate-partitioned running
    * sum (letters occupy TWO digit positions). Everything is exact
    * integer relational math a DuckDB oracle replays term for term.
    *
    * Scale shape: candidate relation is hit-cardinality; the per-char
    * explode is ≤ 34 rows per candidate with a candidate-keyed window;
    * document text never shuffles. Documented bound: contiguous runs
    * only (printed `DE89 3704 …` groups normalize upstream — the
    * card-family grouped extension is the template when needed). */
  def ibanReport(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // same explode-then-filter form as cardReport (r20): the HOF lambda
    // ran interpreted per element; the relational filter fuses with the
    // Generate in whole-stage codegen, cpos stays per-doc unique
    val cands = docs.select(col(idCol),
        posexplode(
          regexp_extract_all(col(textCol), lit("[0-9A-Za-z]+"), lit(0)))
          .as(Seq("cpos", "cand")))
      .filter(length(col("cand")) >= 15 && length(col("cand")) <= 34 &&
        col("cand").rlike("^[A-Z]{2}[0-9]{2}[A-Z0-9]+$"))
    // rearranged form: BBAN then country+check at the end
    val rear = concat(expr("substring(cand, 5)"),
      substring(col("cand"), 1, 4))
    val ch = substring(col("_r"), col("i"), lit(1))
    val isDigit = ch >= "0" && ch <= "9"
    val chVal = when(isDigit, ch.cast("int"))
      .otherwise(ascii(ch) - 55) // 'A' (65) -> 10
    val dLen = when(isDigit, 1).otherwise(2)
    val w = Window.partitionBy(col(idCol), col("cpos"))
      .orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pows = array(pow10Mod97.map(lit): _*)
    val perCand = cands
      .select(col(idCol), col("cpos"), rear.as("_r"))
      .select(col(idCol), col("cpos"), col("_r"),
        explode(sequence(lit(1), length(col("_r")))).as("i"))
      .withColumn("_dlen", dLen)
      .withColumn("_val", chVal)
      // digits strictly to the RIGHT of this char in the expanded
      // number = total expanded length - inclusive running length
      .withColumn("_cum", sum(col("_dlen")).over(w))
      .withColumn("_tot",
        sum(col("_dlen")).over(Window.partitionBy(col(idCol), col("cpos"))))
      .withColumn("_term",
        pmod(col("_val") * element_at(pows,
          (col("_tot") - col("_cum") + 1).cast("int")), lit(97)))
      .groupBy(col(idCol), col("cpos"))
      .agg((pmod(sum(col("_term")), lit(97)) === 1).as("_ok"))
    val perDoc = perCand.groupBy(col(idCol))
      .agg(count(lit(1)).as("_nc"),
        sum(when(col("_ok"), 1L).otherwise(0L)).as("_nv"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_nc"), lit(0L)).as("n_candidates"),
        coalesce(col("_nv"), lit(0L)).as("n_valid_ibans"),
        (coalesce(col("_nv"), lit(0L)) > 0).as("has_valid_iban"))
  }

  /** Per-group PII density report — the triage read that decides where
    * scrubbing effort (or source exclusion) goes: per group, documents
    * affected, per-kind hit totals, and hits per 1000 documents. One
    * scan (the per-row count columns), one |groups|-bounded aggregate
    * with map-side partials; the density divides exact integers once
    * and rounds in the decimal domain (the house hash rule). */
  def densityReport(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val counts = countColumns(textCol)
    val total = counts.map(_._2).reduce(_ + _)
    docs.select(col(groupCol) +: (counts.map { case (n, c) => c.as(n) } :+
        total.as("_n_pii")): _*)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        (sum(when(col("_n_pii") > 0, 1L).otherwise(0L)).as("n_affected") +:
          counts.map { case (n, _) => sum(col(n)).as(n) } :+
          sum(col("_n_pii")).as("n_pii")): _*)
      .select((Seq(col(groupCol), col("n_docs"), col("n_affected")) ++
        counts.map { case (n, _) => col(n) } ++ Seq(col("n_pii"),
          round(((col("n_pii") * 1000L).cast("double") /
              col("n_docs").cast("double"))
              .cast("decimal(28,10)"), 6).cast("double")
            .as("pii_per_1k"))): _*)
  }
}
