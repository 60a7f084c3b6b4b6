package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linked-Open-Data enrichment (lodExplorerTopology): the reference's
  * per-tweet Jena/SPARQL lookups become broadcast joins over snapshot
  * triple tables (SURVEY.md §2.4 J1-J3, §2.3 T9).
  *
  * Live HTTP inside a streaming operator (LocationCrawlerBolt.java:131-209)
  * is replaced by side-input DataFrames — at 100 TB the sameAs/property
  * tables are dimension tables that broadcast to every executor exactly
  * like the bolt's `prepare()`-time downloads did per worker.
  */
/** Pluggable source of the LOD side-input relations (SURVEY §7.3): the
  * reference crawls live SPARQL endpoints inside the bolt
  * (LocationCrawlerBolt.java:131-153 property scans, :183-209
  * dereference); this engine's default is snapshot triple TABLES so the
  * lookups stay broadcast joins. An HTTP implementation stays possible
  * behind this trait — fetch/crawl into DataFrames of the same shapes
  * (e.g. a bounded crawler materializing its frontier per micro-batch)
  * — and every [[Lod]] entry point accepts the trait, so swapping the
  * resolver never touches query code.
  *
  * Relation contracts:
  *  - `sameAsTriples`: `(subject, object)` — `<subject> owl:sameAs
  *    <object>` rows, looked up by object (J1);
  *  - `entityTriples`: `(subject, predicate, object, object_is_uri)` —
  *    the per-entity property scan source (J2/F9);
  *  - `placeTriples`: `(subject, predicate, object, lang_tag)` — the
  *    geo:lat / geo:long / rdfs:label dereference source (J3). */
trait LodResolver {
  def sameAsTriples: DataFrame
  def entityTriples: DataFrame
  def placeTriples: DataFrame
}

/** The default resolver: pre-downloaded snapshot triple tables (the
  * bolt's `prepare()`-time side inputs, promoted to dimension tables
  * that broadcast exactly once per executor). */
final case class SnapshotLodResolver(sameAsTriples: DataFrame,
  entityTriples: DataFrame, placeTriples: DataFrame) extends LodResolver

object Lod {

  /** J1 via a [[LodResolver]]. */
  def sameAsLookup(locs: DataFrame, lgdUriCol: String,
      resolver: LodResolver): DataFrame =
    sameAsLookup(locs, lgdUriCol, resolver.sameAsTriples)

  /** J2 via a [[LodResolver]]. */
  def placeCandidates(entities: DataFrame, uriCol: String,
      resolver: LodResolver): DataFrame =
    placeCandidates(entities, uriCol, resolver.entityTriples)

  /** J3 via a [[LodResolver]]. */
  def dereferencePlaces(places: DataFrame, placeCol: String,
      resolver: LodResolver): DataFrame =
    dereferencePlaces(places, placeCol, resolver.placeTriples)

  /** J1 — owl:sameAs lookup: LinkedGeoData URI → DBpedia URI, first match
    * (LocationCrawlerBolt.java:125-129). `sameAs(subject, object)` holds
    * `<subject> owl:sameAs <object>` rows; lookup key is the object.
    * First-match ≈ min(subject) for determinism (Jena model iteration
    * order is nondeterministic; documented deviation). */
  def sameAsLookup(locs: DataFrame, lgdUriCol: String, sameAs: DataFrame): DataFrame = {
    val firstMatch = sameAs.groupBy(col("object"))
      .agg(min(col("subject")).as("dbpedia_uri"))
    locs.join(broadcast(firstMatch), locs(lgdUriCol) === firstMatch("object"), "left")
      .drop("object")
  }

  /** J2 — property scan: all (predicate, object) pairs of an entity URI,
    * grouped per object place with the predicate list
    * (LocationCrawlerBolt.java:131-153). F9: only URI-valued objects
    * qualify as candidate places. */
  def placeCandidates(entities: DataFrame, uriCol: String, triples: DataFrame): DataFrame =
    entities.join(broadcast(triples.filter(col("object_is_uri"))),
      entities(uriCol) === triples("subject"))
      .groupBy(entities.columns.map(col).toIndexedSeq :+ col("object").as("place"): _*)
      .agg(collect_set(col("predicate")).as("properties"))

  /** J3 — coordinate + label dereference: geo:lat / geo:long / optional
    * English rdfs:label per place URI (LocationCrawlerBolt.java:183-209).
    * OPTIONAL → left join; LANGMATCHES(...,"en") → lang_tag = 'en'. */
  def dereferencePlaces(places: DataFrame, placeCol: String, triples: DataFrame): DataFrame = {
    def prop(p: String, alias: String, langEn: Boolean = false) = {
      val t = triples.filter(col("predicate") === p &&
        (if (langEn) col("lang_tag") === "en" else lit(true)))
      t.groupBy(col("subject").as(s"${alias}_s")).agg(min(col("object")).as(alias))
    }
    places
      .join(broadcast(prop("geo:lat", "lat")), col(placeCol) === col("lat_s"), "left")
      .join(broadcast(prop("geo:long", "lon")), col(placeCol) === col("lon_s"), "left")
      .join(broadcast(prop("rdfs:label", "label", langEn = true)),
        col(placeCol) === col("label_s"), "left")
      .drop("lat_s", "lon_s", "label_s")
  }

  /** J2, streaming-safe form: the per-place property aggregation moved to
    * the STATIC triples side — (subject, place, properties) precomputed
    * once, so attaching candidates to a (possibly streaming) entity frame
    * is a stateless broadcast join instead of a streaming groupBy. */
  def placePropsStatic(triples: DataFrame): DataFrame =
    triples.filter(col("object_is_uri"))
      .groupBy(col("subject"), col("object").as("place"))
      .agg(collect_set(col("predicate")).as("properties"))

  /** J2 via [[placePropsStatic]]: candidates for each entity row. */
  def placeCandidatesStream(entities: DataFrame, uriCol: String,
      triples: DataFrame): DataFrame =
    entities.join(broadcast(placePropsStatic(triples)),
      entities(uriCol) === col("subject"), "inner")
      .drop("subject")

  /** T9 — naive-Bayes relevance score over a candidate's property list
    * (LocationCrawlerBolt.java:155-181). `counts(property, rel, irrel)`
    * mirrors nb_count.csv incl. its `total` row. Scores are computed in
    * log space (sum of logs ≡ the reference's product ordering-wise);
    * the reference's quirk of multiplying the prior once per *known*
    * property (not once total) is preserved.
    *
    * Each per-row log term is cast to exact DECIMAL(28,10) before the
    * sum, so partial-aggregation order cannot move the score and the
    * accept comparison is exact — the order-independence discipline of
    * [[graft.queries.CoreQueries]] applied to log space (the 10-dp cast
    * also absorbs last-ulp libm log differences across engines).
    *
    * Input: long format `(candidate keys..., property)`; output adds
    * log_pos / log_neg (DECIMAL) / accepted. */
  def nbRelevance(candidateProps: DataFrame, keyCols: Seq[String],
      counts: DataFrame): DataFrame = {
    // Positivity precondition: totRel/totIrrel must be > 0 — log(0) would
    // become NULL after the decimal cast and silently vanish from the sum
    // (the reference trains on non-empty rel+irrel corpora, so zero totals
    // mean broken input). The assert_true is woven INTO the emitted
    // columns (not a dropped side column, which ColumnPruning would
    // erase); it runs once per row of the broadcast 1-row totals.
    def checked(c: org.apache.spark.sql.Column) =
      when(assert_true(col("rel") > 0 && col("irrel") > 0,
        lit("nbRelevance requires totRel > 0 and totIrrel > 0")).isNull, c)
    val totals = counts.filter(col("property") === "total")
      .select(checked(col("rel")).as("totRel"), checked(col("irrel")).as("totIrrel"))
    val known = counts.filter(col("property") =!= "total")
    val scored = candidateProps
      .join(broadcast(known), Seq("property"), "inner") // only known properties score
      .crossJoin(broadcast(totals))
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_known_props"),
        sum((log((col("rel") + 1.0) / (col("totRel") + 2.0)) +
          log(col("totRel") / (col("totRel") + col("totIrrel"))))
          .cast("decimal(28,10)")).as("log_pos"),
        sum((log((col("irrel") + 1.0) / (col("totIrrel") + 2.0)) +
          log(col("totIrrel") / (col("totRel") + col("totIrrel"))))
          .cast("decimal(28,10)")).as("log_neg"))
      .withColumn("accepted", col("n_known_props") > 0 && col("log_pos") > col("log_neg"))
    scored
  }

  /** T9, per-row form for streaming: the same naive-Bayes score computed
    * over the candidate's `properties` ARRAY in one stateless projection
    * (no groupBy → runs under Structured Streaming append mode). The
    * counts side input is collected at plan-build time — the bolt's
    * `prepare()`-time download (LocationCrawlerBolt.java:155-181). Each
    * log term is quantized to DECIMAL(28,10) HALF_UP exactly like
    * [[nbRelevance]]'s cast, and the pos/neg comparison happens on the
    * exact decimal sums, so `accepted` is bit-identical to the
    * aggregation form regardless of property order (decimal addition is
    * order-exact); log_pos/log_neg are emitted as doubles for
    * inspection. */
  def nbRelevancePerRow(cands: DataFrame, propsCol: String,
      counts: DataFrame): DataFrame = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    // Cast before collect: the aggregation form (nbRelevance) accepts
    // integer-typed counts fine through Column arithmetic, so this form
    // must too — getDouble on an INT/BIGINT row value would throw.
    val castCounts = counts.select(col("property"),
      col("rel").cast("double").as("rel"),
      col("irrel").cast("double").as("irrel"))
    val totalRow = castCounts.filter(col("property") === "total")
      .select("rel", "irrel").collect()
    require(totalRow.nonEmpty, "nbRelevancePerRow: counts side input has no 'total' row")
    val (totRel, totIrrel) = (totalRow.head.getDouble(0), totalRow.head.getDouble(1))
    require(totRel > 0 && totIrrel > 0,
      "nbRelevancePerRow requires totRel > 0 and totIrrel > 0")
    val known = castCounts.filter(col("property") =!= "total")
      .select("property", "rel", "irrel").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val bc = cands.sparkSession.sparkContext.broadcast(known)
    val posPrior = math.log(totRel / (totRel + totIrrel))
    val negPrior = math.log(totIrrel / (totRel + totIrrel))
    def q(d: Double) = JBD.valueOf(d).setScale(10, RoundingMode.HALF_UP)
    val score = udf((props: Seq[String]) => {
      var n = 0L
      var pos = JBD.ZERO
      var neg = JBD.ZERO
      if (props != null) props.foreach { p =>
        bc.value.get(p).foreach { case (rel, irrel) =>
          n += 1
          pos = pos.add(q(math.log((rel + 1.0) / (totRel + 2.0)) + posPrior))
          neg = neg.add(q(math.log((irrel + 1.0) / (totIrrel + 2.0)) + negPrior))
        }
      }
      (n, pos.doubleValue, neg.doubleValue, n > 0 && pos.compareTo(neg) > 0)
    })
    cands
      .withColumn("_s", score(col(propsCol)))
      .withColumn("n_known_props", col("_s._1"))
      .withColumn("log_pos", col("_s._2"))
      .withColumn("log_neg", col("_s._3"))
      .withColumn("accepted", col("_s._4"))
      .drop("_s")
  }
}
