package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole (single-JVM, forked) test run —
  * same configs as Verify/Bench via [[Tables.session]]. */
object TestSpark {
  lazy val spark: SparkSession = Tables.session("local[2]", 4)
}
