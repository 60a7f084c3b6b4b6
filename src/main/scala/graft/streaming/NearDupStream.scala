package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming MinHash-LSH near-dup CANDIDATE detection — the stateful
  * arrival-time face of [[graft.pipeline.Dedup.lshCandidates]] /
  * `incrementalDedup`: documents stream in as banded signature rows
  * (the [[graft.pipeline.Dedup.lshBands]] shape, computed batch-side
  * per micro-batch), and per (band, band_key) a RocksDB-backed
  * `ListState` holds every doc id seen in that bucket so far. A new
  * arrival emits one candidate pair per bucket-mate — cross-batch AND
  * within-batch — which downstream exact-Jaccard verification consumes
  * exactly as in the batch pipeline.
  *
  * Contract notes, mirroring the batch form: pairs are emitted
  * (min, max)-ordered; a pair sharing several band keys emits once per
  * shared key (the batch form's pre-`distinct` multiplicity — the
  * verify stage dedups, StreamingSpec compares sets).
  *
  * `maxBucket` caveat — batch/streaming parity holds ONLY with
  * `maxBucket` unset: both forms bound the same quantity (bucket
  * occupancy), but with DIFFERENT candidate sets at the cap. Batch
  * `capOccupancy` sees the whole relation and excludes EVERY row of an
  * overloaded key; the streaming form has already emitted the first
  * arrivals' pairs by the time the bucket fills (append mode cannot
  * retract), so the only causal semantics is keep-the-first-maxBucket
  * prefix and drop later arrivals from candidacy + state. A capped
  * bucket therefore contributes up to C(maxBucket, 2) pairs here and
  * ZERO pairs in batch. Treat the cap as a per-form degenerate-key
  * guard, not a parity-preserving knob.
  *
  * `transformWithState` (Spark 4.1, RocksDB state store) rather than
  * `flatMapGroupsWithState`: ListState appends per arrival instead of
  * rewriting a monolithic GroupState value, so a hot bucket costs
  * O(arrivals) writes, not O(occupancy²). */
object NearDupStream {

  case class BandRow(doc_id: Long, band: Int, band_key: String)
  case class CandPair(doc_a: Long, doc_b: Long, band: Int)

  class BandProcessor(maxBucket: Int)
      extends StatefulProcessor[(Int, String), BandRow, CandPair] {
    @transient private var seen: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[Long]("docs",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: (Int, String),
        rows: Iterator[BandRow], timers: TimerValues): Iterator[CandPair] = {
      val prior = seen.get().toVector
      // deterministic within-batch order; re-arrivals of a known id
      // emit no self-pair and are not re-added
      val fresh = rows.map(_.doc_id).toVector.distinct.sorted
        .filterNot(prior.contains)
      // loud-cap trade (the batch occupancy guard's streaming face):
      // arrivals past a full bucket are dropped from candidacy
      val accepted = fresh.take(math.max(maxBucket - prior.length, 0))
      val out = Vector.newBuilder[CandPair]
      for (d <- accepted; o <- prior)
        out += CandPair(math.min(d, o), math.max(d, o), key._1)
      for (i <- accepted.indices; j <- (i + 1) until accepted.length)
        out += CandPair(accepted(i), accepted(j), key._1)
      accepted.foreach(seen.appendValue)
      out.result().iterator
    }
  }

  /** Banded rows → candidate pairs, append-mode. Requires the RocksDB
    * state store provider (the `transformWithState` backend). */
  def candidates(bands: Dataset[BandRow],
      maxBucket: Int = Int.MaxValue): Dataset[CandPair] = {
    require(maxBucket >= 1, "candidates: maxBucket must be >= 1")
    import bands.sparkSession.implicits._
    bands.groupByKey(r => (r.band, r.band_key))
      .transformWithState(new BandProcessor(maxBucket),
        TimeMode.None(), OutputMode.Append())
  }
}
