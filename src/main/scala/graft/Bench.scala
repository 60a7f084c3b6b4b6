package graft
/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{name:sec,...},"failed":[...]}.
  * Each query is forced with a noop-format write — full materialization of
  * every output column (a bare count() would let Catalyst drop the
  * top-level sorts the oracles pay for). Failed queries report their
  * elapsed time AND are listed in "failed" so a crash is never mistaken
  * for a fast run.
  *
  * Before timing, every input table is scanned once (count) so the first
  * measured query doesn't absorb one-time costs — parquet footer reads,
  * FS cache population, executor/codegen warm-up — that no steady-state
  * deployment pays per query. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Tables.session(s"local[$cpus]", cpus)
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).count()
      catch { case _: Throwable => () } // missing table: the query will report
    }
    var failed = List.empty[String]
    val results = SparkEntry.benchQueries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val fl = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val sf = sfDir.split("/sf").last
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$fl,"sf":"$sf"}""")
    spark.stop()
  }
}
