package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end curation: the composed corpus-preparation pipeline a
  * training run actually executes — quality gate → canonical exact
  * dedup → eval-set decontamination → deterministic mix sampling — as
  * ONE declarative plan emitting a per-document verdict (`kept`, or the
  * first pipeline stage that dropped it). The single-stage operators it
  * composes each have their own query + oracle (q26/q39/q43/q47); this
  * operator exists because composition is where pipelines break in
  * practice (flag precedence, survivors-of-survivors semantics, salt
  * correlation), and a verdict ledger — WHY each document fell out — is
  * what an ablation or an audit reads, not four disconnected outputs.
  *
  * Scale design: document text NEVER crosses a shuffle. The quality
  * gate is a map-side expression; dedup shuffles only (id, md5 of the
  * canonical form); decontamination explodes gram fingerprints map-side
  * against the broadcast eval gram set (only id-keyed hit counts
  * shuffle); the mix decision is a pure function of (salt, id) over a
  * broadcast rates table. Stage flags are computed INDEPENDENTLY on the
  * quality-pass set and ranked by pipeline order in the verdict —
  * computing grams for a document that later proves a duplicate costs a
  * little map-side work, but sequencing the stages would force an extra
  * id-keyed join of the text relation per stage, and text movement, not
  * gram hashing, is the dominant cost at corpus scale.
  */
object Curate {

  /** @param rates group → keep percentage (groups absent are dropped) */
  def curate(corpus: DataFrame, idCol: String, textCol: String,
      groupCol: String, evalSet: DataFrame, evalIdCol: String,
      evalTextCol: String, rates: Map[String, Int], gramN: Int = 8,
      salt: String = "curate"): DataFrame =
    curateStaged(corpus, idCol, textCol, groupCol, evalSet, evalIdCol,
      evalTextCol, Nil, rates, gramN, salt)

  /** [[curate]] with caller-supplied drop stages spliced between the
    * duplicate and contamination verdicts — the FULL production ledger
    * (quality → exact dedup → near-dup cluster → semantic dedup →
    * decontamination → mix), where the iterative stages (near-dup
    * label propagation, semantic centroid assignment) arrive as
    * already-computed dropped-id relations and this operator stays one
    * declarative plan. `extraStages` is (stage name → single-column
    * dropped-id relation named `idCol`) in pipeline order; a doc in
    * stage s gets verdict `dropped_<s>` unless an earlier stage claimed
    * it. Flags stay independently computed + rank-ordered (the
    * [[curate]] scale argument: an extra id-keyed join per stage is
    * cheaper than sequencing text through stage filters). */
  def curateStaged(corpus: DataFrame, idCol: String, textCol: String,
      groupCol: String, evalSet: DataFrame, evalIdCol: String,
      evalTextCol: String, extraStages: Seq[(String, DataFrame)],
      rates: Map[String, Int], gramN: Int = 8,
      salt: String = "curate"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qualityExpr: Column = TextMetrics.qualityColumns(textCol)
      .collectFirst { case ("quality", c) => c }
      .getOrElse(sys.error("qualityColumns must define 'quality'"))

    val base = corpus.select(col(idCol), col(groupCol), col(textCol),
      (qualityExpr === 1.0).as("_q"))
    val pass1 = base.filter(col("_q"))

    // dedup flag: keep the min id per canonical-text hash; only the
    // 16-byte hash + id shuffle, never the text. A min-over-window on _ck
    // instead of groupBy+self-join (r20): the self-join shape planted TWO
    // copies of the keyed subtree and its inferred isnotnull(_ck) pushdown
    // re-inlined md5(canonicalText(text)) into a pre-join Filter — four
    // full-text regex+md5 passes per row where the window pass runs one
    // (per-key groups are buffered per _ck, duplicate-cluster-bounded).
    val dupFlag = pass1.select(col(idCol),
        md5(Dedup.canonicalText(col(textCol))).as("_ck"))
      .withColumn("_keep_id", min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("_ck"))))
      .select(col(idCol), (col(idCol) =!= col("_keep_id")).as("_dup"))

    // contamination flag over the quality-pass set (see scale note above)
    val contamFlag = Dedup.decontaminate(
        pass1.select(col(idCol), col(textCol)), idCol, textCol,
        evalSet.select(col(evalIdCol), col(evalTextCol)),
        evalIdCol, evalTextCol, gramN)
      .select(col(idCol), col("contaminated").as("_contam"))

    val ratesDf = rates.toSeq.toDF(groupCol, "_rate_pct")
    val flagged = extraStages.zipWithIndex.foldLeft(
      base.select(col(idCol), col(groupCol), col("_q"))
        .join(dupFlag, Seq(idCol), "left")) {
      case (acc, ((_, ids), i)) =>
        // distinct: a caller-supplied drop relation with repeated ids
        // must not fan out ledger rows (one row per document is the
        // contract); id-cardinality relation, cheap to dedup
        acc.join(ids.select(col(idCol)).distinct()
          .withColumn(s"_x$i", lit(1L)), Seq(idCol), "left")
    }
    val midStages = extraStages.zipWithIndex.foldLeft(
      when(!col("_q"), "dropped_quality")
        .when(col("_dup"), "dropped_duplicate")) {
      case (w, ((name, _), i)) =>
        w.when(col(s"_x$i").isNotNull, s"dropped_$name")
    }
    flagged
      .join(contamFlag, Seq(idCol), "left")
      .join(broadcast(ratesDf), Seq(groupCol), "left")
      .select(col(idCol), col(groupCol),
        midStages
          .when(col("_contam"), "dropped_contaminated")
          .when(coalesce(TextMetrics.mixKeeps(col(idCol), col("_rate_pct"), salt),
            lit(false)), "kept")
          .otherwise("dropped_sampled").as("verdict"))
  }
}
