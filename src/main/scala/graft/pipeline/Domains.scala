package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** URL/domain-level curation — the FineWeb/CCNet stage that runs BEFORE
  * any text-level dedup: registrable-domain extraction against a
  * bounded public-suffix table, blocklist verdicts, and per-domain
  * document caps in deterministic hash order. The reference corpus
  * tooling filters crawled pages by source the same way
  * (`util/HTMLMapFilterer.java` consumes per-site crawls); at corpus
  * scale this is the first and cheapest drop stage, so it must shuffle
  * only (id, domain) pairs — never text.
  *
  * Scale shapes:
  *  - the public-suffix table is bounded (the real PSL is ~9k rows) →
  *    always a broadcast; suffix matching is a map-side explode of at
  *    most `maxSuffixLabels` candidates per host joined against it.
  *  - the blocklist is domain-cardinality → broadcast left join.
  *  - per-domain caps are ONE domain-keyed rank window over an
  *    (id, domain, hash-key) relation — the q128 stratified-sample
  *    device keyed by domain; text never enters the exchange.
  */
object Domains {

  /** Longest public suffix considered, in labels (the real PSL tops out
    * at 4; the SQL oracle mirrors candidates per this constant). */
  val MaxSuffixLabels = 3

  /** Host extraction from a URL: the authority between `://` and the
    * first `/ ? #`, lower-cased (hosts are case-insensitive); ports and
    * userinfo are NOT stripped here — pass pre-cleaned URLs or extend
    * the suffix table deliberately. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1))

  /** Registrable domain (eTLD+1) per row: explode the host's last
    * 1..[[MaxSuffixLabels]] label suffixes, broadcast-join the
    * public-suffix table, keep the LONGEST match (max-struct aggregate
    * — no window), registrable = one label + the matched suffix.
    * Unmatched hosts fall back to the PSL convention: the last label
    * is the suffix, the last two labels are registrable.
    *
    * Documented bound — suffix-only hosts: candidates span 1..size−1
    * labels, so a host that IS a public suffix (host `co.uk` with
    * `co.uk` listed) never matches itself; it falls back to
    * "registrable = the whole host" instead of real PSL semantics
    * (no registrable domain). Deliberate: the cap/blocklist consumers
    * need a non-null grouping key for every document, and a bare
    * public suffix serving content is itself the aggregation unit you
    * want (same bound as the port/userinfo note on [[hostOf]]).
    *
    * @param suffixes single-column `suffix` relation (bounded; broadcast)
    * @return input columns + `suffix`, `domain` */
  def registrableDomain(df: DataFrame, idCol: String, hostCol: String,
      suffixes: DataFrame): DataFrame = {
    val base = df.withColumn("_lab", split(col(hostCol), "\\."))
    val cand = base
      .select(col(idCol), col("_lab"),
        explode(when(size(col("_lab")) >= 2,
          sequence(lit(1), least(lit(MaxSuffixLabels),
            size(col("_lab")) - 1)))
          .otherwise(array().cast("array<int>"))).as("_j"))
      .select(col(idCol), col("_j"),
        array_join(slice(col("_lab"), -col("_j"), col("_j")), ".")
          .as("_suf"),
        array_join(slice(col("_lab"), -(col("_j") + lit(1)),
          col("_j") + lit(1)), ".").as("_reg"))
      .join(broadcast(suffixes.select(col("suffix").as("_suf"))), Seq("_suf"))
      .groupBy(col(idCol))
      .agg(max(struct(col("_j"), col("_suf"), col("_reg"))).as("_m"))
      .select(col(idCol), col("_m._suf").as("_msuf"),
        col("_m._reg").as("_mreg"))
    base.join(cand, Seq(idCol), "left")
      .withColumn("suffix", coalesce(col("_msuf"),
        element_at(col("_lab"), -1)))
      .withColumn("domain", coalesce(col("_mreg"),
        when(size(col("_lab")) >= 2,
          array_join(slice(col("_lab"), -2, 2), "."))
          .otherwise(col(hostCol))))
      .drop("_lab", "_msuf", "_mreg")
  }

  /** Stateless Column form of [[registrableDomain]] — the STREAMING
    * face (an ingest gate cannot aggregate-and-join per micro-batch):
    * the bounded suffix table embeds as a literal array, the longest
    * of the 1..[[MaxSuffixLabels]] candidate suffixes wins by an
    * explicit descending when-chain, and the fallback mirrors the
    * batch form (last-2-labels registrable, bare host for single
    * labels). Value-identical to [[registrableDomain]] for any host
    * and the same suffix set (the batch/stream parity pin in
    * TopologiesSpec), including the suffix-only-host bound. */
  def registrableDomainExpr(host: Column, suffixes: Seq[String]): Column = {
    val lab = split(host, "\\.")
    val sufArr = array(suffixes.map(lit): _*)
    def suf(j: Int) = array_join(slice(lab, -j, j), ".")
    def reg(j: Int) = array_join(slice(lab, -(j + 1), j + 1), ".")
    val fallback = when(size(lab) >= 2, reg(1)).otherwise(host)
    (MaxSuffixLabels to 1 by -1)
      .map(j => (size(lab) >= j + 1 && array_contains(sufArr, suf(j)), reg(j)))
      .foldRight(fallback) { case ((c, v), els) => when(c, v).otherwise(els) }
  }

  /** Blocklist filter: input + `verdict` ('blocked' iff the domain is
    * listed). @param blocklist single-column `domain` relation. */
  def withBlocklist(df: DataFrame, domainCol: String,
      blocklist: DataFrame): DataFrame =
    df.join(broadcast(blocklist.select(col("domain").as(domainCol),
        lit(1L).as("_bl"))), Seq(domainCol), "left")
      .withColumn("verdict",
        when(col("_bl").isNotNull, "blocked").otherwise("kept"))
      .drop("_bl")

  /** Tracking query parameters stripped by [[canonicalizeUrl]] (the
    * CCNet/FineWeb URL-dedup normalization set): case-insensitive
    * (`UTM_SOURCE=x` collapses like `utm_source=x`) and matched with
    * or without a value (a bare `fbclid` is still a tracker). The
    * value-less anchor is `\z` (absolute end), NOT `$`: Java's `$`
    * matches before a trailing line terminator while RE2's does not,
    * so a dirty crawl param like `fbclid\n` would strip on one engine
    * and survive on the other (the q104 `\s`-vs-`\x0B` divergence
    * class); both engines agree on `\z`, under which such a param is
    * consistently NOT a tracker. */
  val TrackingParamPattern = "(?i)^(utm_[a-z0-9_]*|fbclid|gclid)(=|\\z)"

  /** URL canonicalization — the normalization before any URL-keyed
    * dedup (the same crawled page arrives as `https://Example.COM:443/
    * p/?b=2&utm_source=x&a=1#f` and `https://example.com/p?a=1&b=2`):
    *  1. drop the fragment
    *  2. lower-case scheme + authority (path case is significant)
    *  3. strip default ports (`:443` on https, `:80` on http)
    *  4. strip one trailing slash off the path
    *  5. drop tracking params ([[TrackingParamPattern]]), sort the
    *     remainder, re-join (and drop the bare `?`)
    * One Column expression chain — RE2-compatible patterns (the
    * replacement backreference SYNTAX differs per engine: Java `$1`
    * here, RE2 `\1` in the oracle — semantics identical); the
    * param-list lambda runs interpreted but on a per-URL handful of
    * elements, never a corpus-token relation (the q66 trap does not
    * apply at this cardinality). End anchors are `\z` / `(?s)`-greedy,
    * never `$`: Java's `$` matches before a trailing line terminator
    * and RE2's does not, so a dirty crawl URL carrying a literal
    * newline would canonicalize differently per engine (the q104
    * divergence class — a real crawl frontier WILL deliver such
    * URLs). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "(?s)#.*", "")
    val query = regexp_extract(noFrag, "(?s)\\?(.*)", 1)
    val base = regexp_replace(noFrag, "(?s)\\?.*", "")
    val auth = lower(regexp_extract(base, "(?i)^([a-z0-9+.-]+://[^/]*)", 0))
    val path = regexp_replace(base, "(?i)^[a-z0-9+.-]+://[^/]*", "")
    val auth2 = regexp_replace(
      regexp_replace(auth, "^(https://[^/:]+):443\\z", "$1"),
      "^(http://[^/:]+):80\\z", "$1")
    val path2 = regexp_replace(path, "/\\z", "")
    val params = sort_array(filter(split(query, "&"),
      p => length(p) > 0 && !p.rlike(TrackingParamPattern)))
    concat(auth2, path2,
      when(size(params) > 0,
        concat(lit("?"), array_join(params, "&"))).otherwise(lit("")))
  }

  /** Per-domain document cap in deterministic hash order (the q128
    * stratified-sample device keyed by domain): `pick_order` =
    * row_number by (fingerprint(salt:id), id) within the domain,
    * `kept` ⇔ pick_order ≤ cap. Emits the full ledger (kept AND
    * dropped) — what a curation audit reads. */
  def capPerDomain(df: DataFrame, idCol: String, domainCol: String,
      cap: Int, salt: String = "domcap"): DataFrame = {
    require(cap >= 1, "capPerDomain: cap must be >= 1")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("_k").asc, col(idCol).asc)
    df.select(col(idCol), col(domainCol),
        TextFunctions.fingerprint(
          concat(lit(salt), lit(":"), col(idCol).cast("string"))).as("_k"))
      .withColumn("pick_order", row_number().over(w).cast("long"))
      .select(col(idCol), col(domainCol), col("pick_order"),
        (col("pick_order") <= cap).as("kept"))
  }
}
