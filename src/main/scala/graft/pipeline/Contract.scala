package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-contract validation — the expectation-suite gate a production
  * pipeline runs before letting a batch into the corpus store (the
  * Great-Expectations / dbt-test shape): a fixed rule table evaluated in
  * ONE scan via conditional aggregation, emitted one row per rule so
  * the report is joinable/alertable. A passing report (all zeros) IS
  * the normal production case; ContractSpec plants violations to prove
  * every rule fires.
  */
object Contract {

  /** Validate the `documents` contract: id presence/uniqueness, text
    * non-emptiness, stored-length consistency, language allow-list,
    * source naming. NULL-valued comparisons count as non-violations in
    * BOTH engines (SQL three-valued logic falls through the CASE), so
    * nullability itself is guarded by its own dedicated rules.
    *
    * Scale shape: one scan, map-side conditional partials, a 1-row
    * global aggregate unpivoted by `stack` (codegen'd) — no shuffle
    * beyond the final single-row reduce at any corpus size. */
  def documentsContract(docs: DataFrame,
      allowedLangs: Seq[String]): DataFrame = {
    val agg = docs.agg(
      sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("v_id_null"),
      // count(col) skips NULL ids — those are id_not_null's business
      (count(col("doc_id")) - countDistinct(col("doc_id"))).as("v_id_dup"),
      sum(when(col("text").isNull || trim(col("text")) === "", 1L)
        .otherwise(0L)).as("v_text_empty"),
      sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
        .as("v_chars"),
      sum(when(!col("lang").isin(allowedLangs: _*), 1L).otherwise(0L))
        .as("v_lang"),
      sum(when(!col("source").startsWith("src"), 1L).otherwise(0L))
        .as("v_source"))
    agg.select(expr(
        "stack(6, 'id_not_null', v_id_null, 'id_unique', v_id_dup, " +
          "'text_not_empty', v_text_empty, 'n_chars_consistent', v_chars, " +
          "'lang_allowed', v_lang, 'source_format', v_source) " +
          "as (rule, n_violations)"))
      .select(col("rule"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** The `embeddings` contract — the vector-table expectation suite an
    * ANN/dedup pipeline gates on: id presence/uniqueness, non-empty
    * vectors, ONE consistent dimensionality (counted as distinct
    * observed dims beyond the first — 0 when consistent), no
    * NaN/Infinity components, no all-zero vectors (they poison cosine
    * neighborhoods), label presence. Same one-scan conditional-
    * aggregation + stack shape as [[documentsContract]]; the component
    * checks ride `exists` lambdas (interpreted, but over short
    * fixed-dim arrays — one pass per row, no shuffle). */
  def embeddingsContract(embs: DataFrame): DataFrame = {
    val e = col("embedding")
    val agg = embs.agg(
      sum(when(col("vec_id").isNull, 1L).otherwise(0L)).as("v_id_null"),
      (count(col("vec_id")) - countDistinct(col("vec_id"))).as("v_id_dup"),
      sum(when(e.isNull || size(e) === 0, 1L).otherwise(0L)).as("v_empty"),
      // empty vectors are vector_not_empty's business — they must not
      // count dim 0 as an observed dimensionality
      greatest(countDistinct(when(e.isNotNull && size(e) > 0, size(e))) - 1L,
        lit(0L)).as("v_dim"),
      sum(when(exists(e, x => isnan(x) ||
          abs(x) === lit(Float.PositiveInfinity)), 1L).otherwise(0L))
        .as("v_nonfinite"),
      sum(when(e.isNotNull && size(e) > 0 && !exists(e, x => x =!= 0f),
        1L).otherwise(0L)).as("v_zero_vec"),
      sum(when(col("label").isNull, 1L).otherwise(0L)).as("v_label_null"))
    agg.select(expr(
        "stack(7, 'id_not_null', v_id_null, 'id_unique', v_id_dup, " +
          "'vector_not_empty', v_empty, 'dims_consistent', v_dim, " +
          "'components_finite', v_nonfinite, 'no_zero_vectors', v_zero_vec, " +
          "'label_not_null', v_label_null) as (rule, n_violations)"))
      .select(col("rule"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** Conversation-structure contract — the SFT/chat-data validation a
    * training pipeline runs before templating: per conversation,
    * (a) the first turn is the user's, (b) the last is the
    * assistant's (no truncated generations), (c) roles strictly
    * alternate, (d) no empty turns. One window pass partitioned by
    * conversation (the per-group discipline); every check is a
    * boolean/integer aggregate, so the report hashes identically
    * across engines. Input is the long turns relation
    * `(convCol, idxCol, roleCol, textCol)` — the shape chat corpora
    * ship in before template assembly. */
  def chatContract(turns: DataFrame, convCol: String, idxCol: String,
      roleCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col(convCol)).orderBy(col(idxCol))
    val flagged = turns
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col(convCol))))
      .withColumn("_prev", lag(col(roleCol), 1).over(w))
    flagged.groupBy(col(convCol))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("_rn") === 1 && col(roleCol) === "user", 1L)
          .otherwise(0L)).as("_su"),
        sum(when(col("_rn") === col("_n") && col(roleCol) === "assistant", 1L)
          .otherwise(0L)).as("_ea"),
        sum(when(col("_prev") === col(roleCol), 1L).otherwise(0L))
          .as("n_role_repeats"),
        sum(when(length(trim(col(textCol))) === 0, 1L).otherwise(0L))
          .as("n_empty"))
      .select(col(convCol), col("n_turns"),
        (col("_su") === 1L).as("starts_user"),
        (col("_ea") === 1L).as("ends_assistant"),
        col("n_role_repeats"), col("n_empty"),
        (col("_su") === 1L && col("_ea") === 1L &&
          col("n_role_repeats") === 0L && col("n_empty") === 0L).as("valid"))
  }

  /** SFT loss-mask span prep — the step between a validated chat
    * corpus and the trainer: per turn, the token offset range it
    * occupies in the assembled sequence (cumulative sum over the
    * conversation) and whether it trains (`mask = false` on assistant
    * turns, the train-on-assistant-only convention) — plus the
    * per-conversation trainable-token count the mixing/packing stages
    * consume. Offsets are exact integer window sums partitioned by
    * conversation, so the output hashes identically across engines
    * and partitionings. */
  def lossMaskSpans(turns: DataFrame, convCol: String, idxCol: String,
      roleCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col(convCol)).orderBy(col(idxCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns
      .withColumn("_nt",
        size(graft.functions.TextFunctions.tokenize(col(textCol)))
          .cast("long"))
      .withColumn("end_off", sum(col("_nt")).over(w))
      .select(col(convCol), col(idxCol), col(roleCol),
        (col("end_off") - col("_nt")).as("start_off"), col("end_off"),
        (col(roleCol) =!= "assistant").as("masked"),
        when(col(roleCol) === "assistant", col("_nt")).otherwise(lit(0L))
          .as("train_tokens"))
  }

  /** Snapshot diff — the dataset-versioning report run when a corpus
    * refresh lands: per id, `added` (new in B), `removed` (gone from
    * B), `changed` (same id, different content hash), or `unchanged`.
    * The audit that gates incremental retraining (how much actually
    * moved?) and catches silent upstream rewrites.
    *
    * Scale shape: both snapshots project to (id, md5) — the text
    * payload never shuffles — then ONE id-keyed full-outer join; the
    * status is a map-side CASE over the two hash columns. */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ha = a.select(col(idCol), md5(col(textCol)).as("_ha"))
    val hb = b.select(col(idCol), md5(col(textCol)).as("_hb"))
    ha.join(hb, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_ha").isNull, "added")
          .when(col("_hb").isNull, "removed")
          .when(col("_ha") =!= col("_hb"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** MERGE-style corpus refresh — the operation [[snapshotDiff]] only
    * REPORTS: apply snapshot B over current corpus A as an idempotent
    * upsert/delete rewrite. The result is the new corpus — one row per
    * B id carrying ALL of B's columns — tagged `status` ∈
    * {added, changed, unchanged} (ids absent from B are deleted by
    * construction; [[refreshAudit]] counts them). Applying the same
    * snapshot twice is a no-op: the second pass re-emits B with every
    * status `unchanged` (ContractSpec pins this).
    *
    * Scale shape: A contributes only (id, md5) to the join — the
    * outgoing corpus text never shuffles off the B side beyond the one
    * id-keyed exchange; verdicts are a map-side CASE. */
  def applySnapshot(current: DataFrame, refresh: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ha = current.select(col(idCol), md5(col(textCol)).as("_ha"))
    refresh.join(ha, Seq(idCol), "left")
      .withColumn("status",
        when(col("_ha").isNull, "added")
          .when(col("_ha") =!= md5(col(textCol)), "changed")
          .otherwise("unchanged"))
      .drop("_ha")
  }

  /** Audit counts for a corpus refresh: rows per [[snapshotDiff]]
    * verdict — the one-line log a production refresh records before
    * committing the rewrite (how much actually moved?). */
  def refreshAudit(current: DataFrame, refresh: DataFrame, idCol: String,
      textCol: String): DataFrame =
    snapshotDiff(current, refresh, idCol, textCol)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"))

  /** Slowly-changing-dimension type-2 history over a versioned corpus —
    * the lineage ledger behind [[applySnapshot]]'s in-place rewrite:
    * one row per (id, run of consecutive versions with identical
    * content), carrying `[effective_from, effective_to]` version bounds
    * and an `is_current` flag. A content change OR an absence gap
    * closes the interval (a doc removed at v and re-added at v+k gets
    * two intervals, even with identical content — presence history is
    * part of lineage).
    *
    * `versioned` holds one row per (version, id) PRESENT in that
    * snapshot. Shape: one id-partitioned window pass (per-id rows =
    * versions the id appears in — bounded by snapshot count, never
    * corpus-scale), one (id, run) aggregate, and a 1-row broadcast of
    * the latest version for the current flag. Content compares by md5,
    * so text never shuffles twice. */
  def scd2History(versioned: DataFrame, idCol: String, versionCol: String,
      textCol: String): DataFrame = {
    val maxV = versioned.agg(max(col(versionCol).cast("long")).as("_maxv"))
    val h = versioned.select(col(idCol),
      col(versionCol).cast("long").as("ver"),
      md5(col(textCol)).as("text_md5"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("ver"))
    val marked = h.withColumn("_brk",
      when(lag(col("text_md5"), 1).over(w).isNull ||
        lag(col("text_md5"), 1).over(w) =!= col("text_md5") ||
        lag(col("ver"), 1).over(w) =!= col("ver") - 1L, 1L).otherwise(0L))
    marked
      .withColumn("_run", sum(col("_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("_run"))
      .agg(min(col("ver")).as("effective_from"),
        max(col("ver")).as("effective_to"),
        max(col("text_md5")).as("text_md5")) // constant within a run
      .crossJoin(broadcast(maxV))
      .withColumn("is_current",
        when(col("effective_to") === col("_maxv"), 1L).otherwise(0L))
      .drop("_run", "_maxv")
  }
}
