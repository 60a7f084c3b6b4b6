package graft

import scala.util.control.NonFatal

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{name:sec,...},"failed":[...]}.
  * Each query is forced with a noop-format write — full materialization of
  * every output column (a bare count() would let Catalyst drop the
  * top-level sorts the oracles pay for). Failed queries report their
  * elapsed time AND are listed in "failed" so a crash is never mistaken
  * for a fast run.
  *
  * Each query runs SPARK_GRAFT_RUNS times (default 3) and reports the
  * per-query MIN — single-run numbers at local[32] swing 2–4× with cache
  * pressure and JIT state (r3/r4 both chased phantom regressions), and
  * min-of-n is the standard way to strip that noise. "runs" and the raw
  * per-run times are included so a reader can see the spread.
  *
  * Before timing, every input table is scanned once (count) so the first
  * measured query doesn't absorb one-time costs — parquet footer reads,
  * FS cache population, executor/codegen warm-up — that no steady-state
  * deployment pays per query. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // min-of-3 by default: this container shows 4× single-query swings
    // between consecutive identical-binary runs; two samples still let a
    // double-hit outlier through, three rarely do (~1 min extra total)
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = Tables.session(s"local[$cpus]", cpus)
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).count()
      catch { case NonFatal(e) => // missing table: the query will report
        System.err.println(s"[bench] warm-up scan of '$n' failed: ${e.getMessage}")
      }
    }
    // SPARK_GRAFT_ONLY=q42_repetition,q66_pmi — iterate on a subset
    // without paying the full sweep; the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    var failed = List.empty[String]
    val results = SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val timed = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case NonFatal(e) =>
            if (!failed.contains(name)) failed ::= name // any failing run marks it
            System.err.println(s"[bench] $name run $i failed: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      // A crashed run often "finishes" in near-zero time; letting it into
      // the min would report the crash duration as the query's time. Use
      // the min over SUCCESSFUL runs; only when every run failed fall back
      // to the raw min (the query is in "failed" either way).
      val good = timed.collect { case (t, true) => t }
      val best = if (good.nonEmpty) good.min else timed.map(_._1).min
      (name, best, timed)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + f"""\":$v%.2f""" }
      .mkString("{", ",", "}")
    // crashed runs emit null, not their near-zero crash duration — a
    // consumer computing spread/mean from all_runs must not absorb them
    val raw = results.map { case (k, _, ts) =>
      "\"" + k + "\":" + ts.map { case (t, ok) =>
        if (ok) f"$t%.3f" else "null"
      }.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val fl = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val sf = sfDir.split("/sf").last
    // The stdout contract is ONE parseable JSON line, and the consumer
    // only keeps the last ~2000 chars of output — with 60+ queries the
    // per-run detail blew that budget (r3–r6 all arrived truncated), so
    // the raw runs go to a sidecar file and the line stays compact.
    val detail =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$runs,"all_runs":$raw,"failed":$fl,"sf":"$sf"}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_detail.json"),
      detail.getBytes("UTF-8"))
    catch { case NonFatal(e) => System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    val flPart = if (failed.isEmpty) "" else s""","failed":$fl"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs$flPart,"sf":"$sf"}""")
    spark.stop()
  }
}
