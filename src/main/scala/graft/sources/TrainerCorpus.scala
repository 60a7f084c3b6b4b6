package graft.sources

import java.io.{BufferedReader, ByteArrayInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The offline trainer's corpus-building batch path
  * (locationTopicModelTopology LocationTopicModelTrainer.java):
  * S7 zip-of-JSON scan with entry-name skip list (:124-160), F2
  * text-presence filter (:167-171), F4 geo-coordinate filter (:173-177,
  * 215-217), T4 token cleanup (:193-207), A10 count-header corpus export
  * (:133-137, 239-247).
  */
object TrainerCorpus {

  /** S7 — scan zip archives of JSON-lines tweet dumps. One task per
    * archive (the binaryFile source parallelizes across files — at scale
    * the corpus is many archives, so the scan is embarrassingly
    * parallel); zip entries whose names contain a skip keyword are
    * ignored (LocationTopicModelTrainer.java:146-155). */
  def readZippedJsonLines(spark: SparkSession, path: String,
      skipKeywords: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val lines = spark.read.format("binaryFile").load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { bytes =>
        val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        var e = zis.getNextEntry
        while (e != null) {
          if (!e.isDirectory && !skipKeywords.exists(e.getName.contains)) {
            val br = new BufferedReader(
              new InputStreamReader(zis, StandardCharsets.UTF_8))
            var ln = br.readLine()
            while (ln != null) { buf += ln; ln = br.readLine() }
          }
          e = zis.getNextEntry
        }
        buf
      }
    spark.read.schema(TweetSource.tweetSchema).json(lines)
  }

  /** F2 — drop messages without text (TweetIndexBolt.java:148-150;
    * trainer equivalent). */
  def requireText(tweets: DataFrame): DataFrame =
    tweets.filter(col("text").isNotNull)

  /** F4 — keep rows with usable coordinates: non-null and neither
    * component zero (LocationTopicModelTrainer.java:173-177). */
  def geoFilter(df: DataFrame, latCol: String, lonCol: String): DataFrame =
    df.filter(col(latCol).isNotNull && col(lonCol).isNotNull &&
      col(latCol) =!= 0 && col(lonCol) =!= 0)

  /** T4 trainer-variant token cleanup: lower, split, drop 1-char tokens,
    * single-space rejoin (the replaceAll("\\s\\s+", " ") squeeze,
    * LocationTopicModelTrainer.java:193-207). */
  def cleanText(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_join(TextFunctions.dropShortTokens(TextFunctions.tokenize(text)), " ")

  /** A10 — corpus with the count header: row 0 carries the corpus size
    * (LocationTopicModelTrainer.java:133-137), data rows are numbered
    * 1..N in `idCol` order. The header count is an aggregation row, not a
    * driver-side action; numbering reuses the range-partitioned
    * sort + zipWithIndex discipline (no single-partition window). */
  def corpusWithHeader(lines: DataFrame, idCol: String): DataFrame = {
    val spark = lines.sparkSession
    val sorted = lines.orderBy(col(idCol)).select(col("line"))
    val data = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("seq",
          org.apache.spark.sql.types.LongType, nullable = false)) ++
        sorted.schema.fields)
      val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq((i + 1L) +: r.toSeq)
      }
      spark.createDataFrame(rows, schema)
    }
    val header = lines.agg(count(lit(1)).cast("string").as("line"))
      .select(lit(0L).as("seq"), col("line"))
    header.unionByName(data)
  }

  /** A10 — write the corpus as one text file, header first (the trainer's
    * single training-file format; the coalesce(1) is inherent to the
    * format, not a scalability choice). */
  def writeCorpus(corpus: DataFrame, path: String): Unit =
    corpus.orderBy(col("seq")).select(col("line"))
      .coalesce(1).write.mode("overwrite").text(path)
}
