package graft.sources

import org.apache.spark.sql.DataFrame
import java.io.File
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Writers for the medallion layers.
  *
  * - Trusted: single-file pipe-delimited CSV with header plus a UTF-8
  *   BOM for spreadsheet compatibility (reference: src/script/script.py:
  *   63-70 coalesce(1) CSV write; src/utils/scraping.py:111-182
  *   `add_bom_csv` prepends `EF BB BF` unless already present).
  * - Refined: snappy parquet (reference: src/utils/transform.py:14-70).
  *
  * Scale note: `coalesce(1)` funnels the whole dataset through one task
  * — it is an EXPORT boundary for small, human-facing extracts, never
  * the distributed path. The refined/parquet writer keeps natural
  * parallelism and optional hash partitioning.
  */
object Sinks {

  val BomUtf8: Array[Byte] = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)

  /** Single-file CSV export (trusted layer). Returns the part-file path.
    *
    * `_SUCCESS` markers are SUPPRESSED at the committer level (the
    * reference disables `mapreduce.fileoutputcommitter.
    * marksuccessfuljobs` for exactly this export — script.py:25-28):
    * the trusted dir is a human/spreadsheet-facing landing zone whose
    * consumers glob `*.csv`-adjacent files, and a marker file there is
    * byte-level infidelity to the reference layout. Spark merges write
    * options into the job's Hadoop conf, so the option scopes to THIS
    * write only. */
  def writeSingleCsv(
      df: DataFrame,
      dir: String,
      delimiter: String = "|",
      header: Boolean = true,
      withBom: Boolean = true): File = {
    df.coalesce(1)
      .write
      .mode("overwrite")
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      // doubled-quote escaping, matching CsvIngest.trustedOptions — the
      // writer default (backslash escape) would silently corrupt values
      // containing quotes on the trusted→refined read-back
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(dir)
    val part = new File(dir).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
      .getOrElse(sys.error(s"no part-*.csv produced under $dir"))
    if (withBom) addBom(part)
    part
  }

  /** Prepend a UTF-8 BOM unless the file already starts with one —
    * same idempotency check as the reference's add_bom_csv. */
  def addBom(file: File): Unit = {
    val bytes = Files.readAllBytes(file.toPath)
    val hasBom = bytes.length >= 3 &&
      bytes(0) == BomUtf8(0) && bytes(1) == BomUtf8(1) && bytes(2) == BomUtf8(2)
    if (!hasBom) {
      Files.write(file.toPath, BomUtf8 ++ bytes,
        StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.WRITE)
      // The out-of-band rewrite invalidates Hadoop LocalFileSystem's
      // .crc sidecar (the reference's GCS layer has no such sidecar);
      // drop it so subsequent Spark reads don't fail checksum.
      Files.deleteIfExists(
        Paths.get(file.getParent, s".${file.getName}.crc"))
    }
  }

  /** Refined layer: snappy parquet, optionally partitioned by columns
    * (partition pruning at read time is the 100 TB win).
    *
    * Partitioned writes REBALANCE on the partition columns first: a
    * naive partitionBy write has every task emit one file per
    * partition value it happens to hold — tasks × partitions files
    * (the classic lake file storm; at sf1 the day-partitioned events
    * write measured 6.9× its sf0.1 time almost entirely in file
    * creation/listing). The AQE rebalance shuffle routes each
    * partition value to as few tasks as possible — one file per
    * partition in the common case — while still SPLITTING a skewed
    * partition across tasks instead of funneling it through one
    * writer (what a plain repartition(partCols) would do); this is
    * the \"optimized write\" every production lake writer performs. */
  def writeParquet(
      df: DataFrame,
      dir: String,
      partitionBy: Seq[String] = Nil,
      compression: String = "snappy"): Unit = {
    val out =
      if (partitionBy.nonEmpty) df.hint("rebalance", partitionBy: _*)
      else df
    val w = out.write.mode("overwrite").option("compression", compression)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(dir)
  }

  /** Small-file compaction: rewrite a parquet dataset into
    * ceil(totalBytes / targetFileBytes) files. The maintenance job
    * every streaming/incremental landing zone needs — thousands of
    * KB-scale part files turn every downstream scan into a
    * task-scheduling and footer-read storm; compaction restores
    * splittable, HDFS-block-sized files. Content is preserved
    * bit-for-bit (hash-checked by the etl_compact oracle);
    * `repartition` is a full shuffle by design — it levels file sizes
    * regardless of input skew. Returns the output file count. */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetFileBytes: Long = 128L << 20): Int = {
    val df = spark.read.parquet(inDir)
    val totalBytes = df.inputFiles
      .map(f => new File(new java.net.URI(f).getPath).length()).sum
    val nFiles = math.max(1, math.ceil(
      totalBytes.toDouble / targetFileBytes).toInt)
    df.repartition(nFiles).write.mode("overwrite").parquet(outDir)
    nFiles
  }
}
