package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import PunctuationWindow.{Event, Flush, fold}

/** W1/W2/W3 parity-window fold invariants: first-event alignment,
  * punctuation-only flush with the closing event included, no lateness
  * drops. Property-style over seeded random streams. */
class PunctuationWindowSpec extends AnyFunSuite {

  private val L = 100L // window length (micros)

  private def run(tss: Seq[Long]): (List[Flush], Option[PunctuationWindow.WindowState]) = {
    val evs = tss.zipWithIndex.map { case (t, i) => Event("k", t, s"p$i") }
      .sortBy(e => (e.tsMicros, e.payload))
    fold(evs.iterator, L, None)
  }

  test("W1: window starts at the first event, closes on the first event past start+L") {
    val (flushes, state) = run(Seq(10, 50, 109, 110, 115))
    // window [10, ...] closes at ts=110 (>= 10+100), closing event included
    assert(flushes.map(f => (f.startMicros, f.endMicros, f.n_events)) ==
      List((10L, 110L, 4L)))
    // 115 starts the next (unflushed) window
    assert(state.exists(s => s.startMicros == 115L && s.events.size == 1))
  }

  test("W2: no punctuation, no flush — an idle stream never emits") {
    val (flushes, state) = run(Seq(10, 20, 30))
    assert(flushes.isEmpty)
    assert(state.exists(_.events.size == 3))
  }

  test("closing event's ts becomes the emitted end, next window starts fresh") {
    val (flushes, _) = run(Seq(0, 250, 400))
    // 0 opens; 250 >= 100 closes [0,250] with both events;
    // 400 opens a new window (not flushed)
    assert(flushes.map(f => (f.startMicros, f.endMicros, f.n_events)) ==
      List((0L, 250L, 2L)))
  }

  test("every event lands in exactly one flush or the trailing state (property)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 200) {
      val n = 1 + rnd.nextInt(50)
      val tss = Seq.fill(n)(rnd.nextInt(1000).toLong)
      val (flushes, state) = run(tss)
      val flushed = flushes.flatMap(_.payloads)
      val trailing = state.map(_.events.map(_.payload)).getOrElse(Nil)
      // partition: no loss, no duplication
      assert(flushed.size + trailing.size == n, s"trial $trial")
      assert((flushed ++ trailing).distinct.size == n, s"trial $trial dup")
      for (f <- flushes) {
        assert(f.endMicros >= f.startMicros + L, s"trial $trial early flush")
        assert(f.n_events == f.payloads.size.toLong)
      }
    }
  }

  test("batch() matches a direct fold per key") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val evs = for {
      k <- Seq("a", "b", "c")
      i <- 1 to 40
    } yield Event(k, rnd.nextInt(2000).toLong, s"$k$i")
    val got = PunctuationWindow.batch(evs.toDS(), L)
      .collect().map(f => (f.key, f.startMicros, f.endMicros, f.n_events)).toSet
    val want = evs.groupBy(_.key).flatMap { case (_, ks) =>
      fold(ks.sortBy(e => (e.tsMicros, e.payload)).iterator, L, None)._1
    }.map(f => (f.key, f.startMicros, f.endMicros, f.n_events)).toSet
    assert(got == want)
  }

  test("batchCounts() equals batch() minus payloads (r20 count-only fold)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val evs = for {
      k <- Seq("a", "b", "c")
      i <- 1 to 60
    } yield Event(k, rnd.nextInt(2500).toLong, s"$k$i")
    val full = PunctuationWindow.toDataFrame(
        PunctuationWindow.batch(evs.toDS().repartition(5), L))
      .select("key", "window_start", "window_end", "n_events")
      .collect().map(_.toSeq).toSet
    val counts = PunctuationWindow.batchCounts(evs.toDS().repartition(5), L)
      .collect().map(_.toSeq).toSet
    assert(counts == full,
      "count-only fold diverged from the full fold's window boundaries/counts")
  }
}
