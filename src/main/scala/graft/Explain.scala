package graft

/** Plan-audit helper: dump `.explain("formatted")` for named queries
  * (all of them when no names given) — the evidence source for
  * PLANS.md. Usage:
  * {{{
  * sbt "runMain graft.Explain /root/testdata/sf0.01 q51_pii_scrub q52_tfidf"
  * }}}
  */
object Explain {
  def main(args: Array[String]): Unit = {
    // --exec: run each query first so the printed plan is the FINAL
    // AQE plan (isFinalPlan=true) — shows runtime ReusedExchange /
    // broadcast conversions that the static plan hides.
    val (flags, rest) = args.partition(_ == "--exec")
    val exec = flags.nonEmpty
    val dir = rest.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (rest.length > 1) rest.toSeq.tail
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Tables.session("local[8]", 8)
    try names.foreach { n =>
      println(s"==== $n")
      val df = SparkEntry.queries(n)(spark, dir)
      // collect() executes THIS Dataset's own QueryExecution, so the
      // explain below prints its finalized adaptive plan
      // (isFinalPlan=true). A noop write would execute a separate
      // QueryExecution and leave df's plan unexecuted.
      if (exec) df.collect()
      df.explain("formatted")
    } finally spark.stop()
  }
}
