package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Landing-zone ingestion: raw files as binary + charset decode.
  *
  * The reference's extraction step (reference: src/utils/scraping.py:
  * 24-109) scrapes an HTML index, downloads a ZIP, and decodes
  * iso-8859-1 bytes to utf-8 before landing the CSV. Network scraping
  * is orchestration, not engine work — the engine-side capability is:
  * read opaque files distributed (binaryFile source, one row per file
  * with path/length/content) and decode legacy charsets as a
  * column-level operation, so a 100 TB landing zone decodes in
  * parallel with no driver involvement.
  */
object Landing {

  /** One row per file: (path, modificationTime, length, content). */
  def readBinary(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)

  /** Distributed ZIP extraction: one row per archive ENTRY —
    * (path, entry, content) — from a binaryFile DataFrame (the
    * reference unzips the downloaded archive in memory before landing:
    * scraping.py:55-77 `zipfile.ZipFile(zip_in_memory)`).
    *
    * The codec seam is genuinely imperative (java.util.zip over opaque
    * bytes), so this is a typed flatMap — the Dataset path Spark keeps
    * for exactly this case; archives land one per task and fan out to
    * entry rows, so a directory of ZIPs inflates in parallel with no
    * driver involvement. Entry bytes are materialized eagerly (an
    * entry must fit in task memory — same bound the binaryFile source
    * already imposes per archive). */
  def unzipEntries(files: DataFrame): DataFrame = {
    import files.sparkSession.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val zis = new java.util.zip.ZipInputStream(
          new java.io.ByteArrayInputStream(bytes))
        Iterator.continually(zis.getNextEntry)
          .takeWhile(_ != null)
          .filterNot(_.isDirectory)
          .map(e => (path, e.getName, zis.readAllBytes()))
          .toVector // drain while the stream is open
      }
      .toDF("path", "entry", "content")
  }

  /** Decode the binary content column from a legacy charset (the
    * reference's iso-8859-1 → utf-8 step) into a string column. */
  def decodeText(files: DataFrame, charset: String = "ISO-8859-1"): DataFrame =
    files.withColumn("text", decode(col("content"), charset))

  /** Landed decoded lines ready for schema-enforced CSV parsing:
    * explode decoded text into trimmed lines (small-file landing path;
    * large single files should go straight to the csv source with
    * charset option instead). */
  def toLines(decoded: DataFrame): DataFrame =
    decoded.select(col("path"),
      explode(split(col("text"), "\r?\n")).as("line"))
      .filter(length(col("line")) > 0)
}
