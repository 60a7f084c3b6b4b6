package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** LOD enrichment semantics: J1 first-match lookup, J3 optional
  * dereference, and T9 naive-Bayes relevance against hand-computed
  * odds (incl. the reference's multiply-prior-per-property quirk). */
class LodSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("J1: sameAs lookup takes the deterministic first match, left-joins misses") {
    val locs = Seq(("l1", "lgd:1"), ("l2", "lgd:9")).toDF("id", "lgd_uri")
    val sameAs = Seq(("dbp:b", "lgd:1"), ("dbp:a", "lgd:1"))
      .toDF("subject", "object")
    val out = Lod.sameAsLookup(locs, "lgd_uri", sameAs)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[String]("dbpedia_uri")).toMap
    assert(out("l1") == "dbp:a") // min(subject) = deterministic first match
    assert(out("l2") == null)   // no sameAs: survives with null
  }

  test("J3: lat/long join, label only when @en exists") {
    val places = Seq(("p", "plc:1"), ("q", "plc:2")).toDF("id", "place")
    val triples = Seq(
      ("plc:1", "geo:lat", "50", null),
      ("plc:1", "geo:long", "7", null),
      ("plc:1", "rdfs:label", "One", "en"),
      ("plc:2", "geo:lat", "51", null),
      ("plc:2", "geo:long", "8", null),
      ("plc:2", "rdfs:label", "Zwei", "de")) // no @en label
      .toDF("subject", "predicate", "object", "lang_tag")
    val out = Lod.dereferencePlaces(places, "place", triples)
      .collect().map(r => r.getAs[String]("id") ->
        (r.getAs[String]("lat"), r.getAs[String]("label"))).toMap
    assert(out("p") == ("50", "One"))
    assert(out("q") == ("51", null))
  }

  test("T9: log-odds match hand-computed values, prior applied per known property") {
    // counts: p:a (rel=4, irrel=1), p:b (rel=1, irrel=3); total (rel=10, irrel=5)
    val counts = Seq(
      ("p:a", 4.0, 1.0), ("p:b", 1.0, 3.0), ("total", 10.0, 5.0))
      .toDF("property", "rel", "irrel")
    // c1 has both known properties + one unknown (ignored)
    val props = Seq(("c1", "p:a"), ("c1", "p:b"), ("c1", "p:zzz"),
      ("c2", "p:b")).toDF("cand", "property")
    val out = Lod.nbRelevance(props, Seq("cand"), counts)
      .collect().map(r => r.getAs[String]("cand") -> r).toMap

    // reference quirk: the prior multiplies once PER KNOWN PROPERTY
    val posPrior = math.log(10.0 / 15.0)
    val negPrior = math.log(5.0 / 15.0)
    val c1pos = math.log(5.0 / 12.0) + posPrior + math.log(2.0 / 12.0) + posPrior
    val c1neg = math.log(2.0 / 7.0) + negPrior + math.log(4.0 / 7.0) + negPrior
    // log_pos/log_neg are exact DECIMAL(28,10) sums of per-term casts:
    // within 0.5e-10 per term of the double-domain reference value
    assert(math.abs(out("c1").getAs[java.math.BigDecimal]("log_pos")
      .doubleValue - c1pos) < 1e-9)
    assert(math.abs(out("c1").getAs[java.math.BigDecimal]("log_neg")
      .doubleValue - c1neg) < 1e-9)
    assert(out("c1").getAs[Long]("n_known_props") == 2) // p:zzz ignored
    assert(out("c1").getAs[Boolean]("accepted") == (c1pos > c1neg)) // true here
    // c2: only the irrelevance-heavy property -> rejected
    val c2pos = math.log(2.0 / 12.0) + posPrior
    val c2neg = math.log(4.0 / 7.0) + negPrior
    assert(out("c2").getAs[Boolean]("accepted") == (c2pos > c2neg))
    assert(!out("c2").getAs[Boolean]("accepted"))
  }

  test("LodResolver trait: the snapshot impl routes J1/J2/J3 identically") {
    val locs = Seq(("l1", "lgd:1")).toDF("id", "lgd_uri")
    val sameAs = Seq(("dbp:a", "lgd:1")).toDF("subject", "object")
    val entityTriples = Seq(
      ("dbp:a", "p:pop", "plc:1", true),
      ("dbp:a", "p:name", "Bonn", false)) // non-URI object: F9-filtered
      .toDF("subject", "predicate", "object", "object_is_uri")
    val placeTriples = Seq(
      ("plc:1", "geo:lat", "50", null),
      ("plc:1", "geo:long", "7", null),
      ("plc:1", "rdfs:label", "One", "en"))
      .toDF("subject", "predicate", "object", "lang_tag")
    val resolver = SnapshotLodResolver(sameAs, entityTriples, placeTriples)
    val viaTrait = Lod.dereferencePlaces(
      Lod.placeCandidates(
        Lod.sameAsLookup(locs, "lgd_uri", resolver), "dbpedia_uri", resolver),
      "place", resolver).collect()
    val direct = Lod.dereferencePlaces(
      Lod.placeCandidates(
        Lod.sameAsLookup(locs, "lgd_uri", sameAs), "dbpedia_uri", entityTriples),
      "place", placeTriples).collect()
    assert(viaTrait.map(_.toString).sorted.toSeq ==
      direct.map(_.toString).sorted.toSeq)
    assert(viaTrait.length == 1 &&
      viaTrait.head.getAs[String]("place") == "plc:1" &&
      viaTrait.head.getAs[String]("label") == "One")
  }

  test("T9: zero rel/irrel totals fail loudly instead of nulling the log sums") {
    val counts = Seq(("p:a", 4.0, 1.0), ("total", 10.0, 0.0))
      .toDF("property", "rel", "irrel")
    val props = Seq(("c1", "p:a")).toDF("cand", "property")
    val e = intercept[Exception] {
      Lod.nbRelevance(props, Seq("cand"), counts).collect()
    }
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(messages(e).contains("totRel > 0 and totIrrel > 0"))
  }
}
