package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Structural guard for a known regression class: the external value
  * hasher renders Spark-vs-DuckDB DECIMAL cells through different paths,
  * so hash-checked queries must round in the decimal domain but EMIT
  * doubles. This spec walks every SparkEntry query's resolved schema
  * (plan construction only — no execution for the non-iterative ones)
  * and fails on any DECIMAL-typed column, top-level or nested. */
class EmissionTypesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def decimalPaths(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(path)
    case s: StructType => s.fields.flatMap(f => decimalPaths(f.dataType, s"$path.${f.name}")).toSeq
    case a: ArrayType => decimalPaths(a.elementType, s"$path[]")
    case m: MapType =>
      decimalPaths(m.keyType, s"$path<key>") ++ decimalPaths(m.valueType, s"$path<value>")
    case _ => Nil
  }

  test("no SparkEntry query emits a DECIMAL-typed column") {
    assume(new java.io.File("/root/testdata/sf0.001/lineitem.parquet").exists())
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      decimalPaths(fn(spark, "/root/testdata/sf0.001").schema, name)
    }
    assert(offenders.isEmpty,
      s"DECIMAL-typed emissions (hash-unsafe across engines): ${offenders.mkString(", ")}")
  }
}
