package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("local[8]", 8)
    Tables.registerAll(spark, "/root/testdata/sf0.01")
    val df = spark.sql("""
      SELECT l_returnflag, sum(l_quantity) AS s1,
             sum(l_extendedprice * (1 - l_discount)) AS s2,
             cast(sum(cast(l_quantity as decimal(18,2))) as double) AS s3,
             stddev_samp(l_quantity) AS s4
      FROM lineitem GROUP BY 1 ORDER BY 1""")
    df.collect().foreach { r =>
      println(s"SPARK ${r.getString(0)} ${java.lang.Double.doubleToLongBits(r.getDouble(1))} ${java.lang.Double.doubleToLongBits(r.getDouble(2))} ${java.lang.Double.doubleToLongBits(r.getDouble(3))} ${java.lang.Double.doubleToLongBits(r.getDouble(4))}")
    }
    spark.stop()
  }
}
