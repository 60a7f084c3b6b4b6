package graft.sources

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S7 zip-of-JSON scan (entry skip list), F2 text filter, F4 geo filter,
  * A10 count-header corpus export — the trainer batch path end to end on
  * real zip fixtures. */
class TrainerCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tweet(id: Int, text: String, lon: Double, lat: Double): String =
    s"""{"created_at":"Mon Jan 01 00:00:01 +0000 2024","id_str":"t$id",""" +
      (if (text == null) "" else s""""text":"$text",""") +
      s""""user":{"id_str":"u$id","screen_name":"s$id"},""" +
      s""""coordinates":{"coordinates":[$lon,$lat]}}"""

  private def writeZip(dir: java.nio.file.Path, name: String,
      entries: (String, Seq[String])*): Unit = {
    val zos = new ZipOutputStream(
      new FileOutputStream(dir.resolve(name).toFile))
    for ((entryName, lines) <- entries) {
      zos.putNextEntry(new ZipEntry(entryName))
      zos.write(lines.mkString("\n").getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
  }

  test("S7: reads zip entries of JSON-lines, skip list drops entries by keyword") {
    val dir = Files.createTempDirectory("dumps")
    writeZip(dir, "a.zip",
      "good-1.json" -> Seq(tweet(1, "alpha one", 7.1, 50.9)),
      "deleted-2.json" -> Seq(tweet(2, "skipped", 1.0, 1.0)),
      "good-3.json" -> Seq(tweet(3, "gamma three", 0.0, 12.0)))
    writeZip(dir, "b.zip",
      "good-4.json" -> Seq(tweet(4, null, 8.0, 49.0),
        tweet(5, "epsilon five", 2.5, -3.5)))
    val df = TrainerCorpus.readZippedJsonLines(spark, dir.toString,
      skipKeywords = Seq("deleted"))
    val ids = df.select("id_str").collect().map(_.getString(0)).toSet
    assert(ids == Set("t1", "t3", "t4", "t5")) // t2's entry skipped
  }

  test("F2 + F4: text presence and nonzero-coordinate filters") {
    val dir = Files.createTempDirectory("dumps2")
    writeZip(dir, "a.zip", "e.json" -> Seq(
      tweet(1, "alpha one", 7.1, 50.9),
      tweet(2, null, 8.0, 49.0),       // F2: no text
      tweet(3, "gamma three", 0.0, 12.0), // F4: lon == 0
      tweet(4, "delta four", 3.0, 0.0),   // F4: lat == 0
      tweet(5, "epsilon five", 2.5, -3.5)))
    val df = TrainerCorpus.requireText(
      TrainerCorpus.readZippedJsonLines(spark, dir.toString))
      .select(col("id_str"), col("text"),
        element_at(col("coordinates.coordinates"), 1).as("lon"),
        element_at(col("coordinates.coordinates"), 2).as("lat"))
    val kept = TrainerCorpus.geoFilter(df, "lat", "lon")
      .select("id_str").collect().map(_.getString(0)).toSet
    assert(kept == Set("t1", "t5"))
  }

  test("A10: corpus header carries the count, data rows numbered in id order") {
    import spark.implicits._
    val lines = Seq((30L, "50.9 7.1 alpha one"), (10L, "-3.5 2.5 epsilon five"))
      .toDF("doc_id", "line")
    val corpus = TrainerCorpus.corpusWithHeader(lines, "doc_id")
      .orderBy("seq").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(corpus.toSeq == Seq(
      (0L, "2"),
      (1L, "-3.5 2.5 epsilon five"),
      (2L, "50.9 7.1 alpha one")))
  }

  test("A10: writeCorpus produces a single header-first text file") {
    import spark.implicits._
    val lines = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "line")
    val out = Files.createTempDirectory("corpus_out").resolve("corpus")
    TrainerCorpus.writeCorpus(
      TrainerCorpus.corpusWithHeader(lines, "doc_id"), out.toString)
    val written = spark.read.text(out.toString)
      .collect().map(_.getString(0))
    assert(written.head == "2")
    assert(written.toSet == Set("2", "a b", "c d"))
  }
}
