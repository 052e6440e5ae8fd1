package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.operators.Cleaning
import graft.sources.{CsvIngest, Sinks}

/** Raw → trusted → refined medallion pipeline, generalizing the
  * reference's job chain (reference: src/script/script.py end-to-end,
  * src/utils/transform.py:14-70 CSV→parquet refine, dag.py task order).
  *
  * All paths are caller-supplied local/URI paths — storage layout is a
  * deployment concern, not engine code.
  */
object Medallion {

  /** raw CSV (schema-enforced, reference options) → cleaned trusted
    * single-file pipe CSV with header + BOM. Returns the part file. */
  def rawToTrusted(
      spark: SparkSession,
      rawPath: String,
      trustedDir: String,
      schema: StructType,
      codeCol: String): java.io.File = {
    val raw = CsvIngest.read(spark, rawPath, schema)
    val cleaned = Cleaning.referenceClean(raw, codeCol)
    Sinks.writeSingleCsv(cleaned, trustedDir)
  }

  /** trusted CSV → refined snappy parquet (transform.py's conversion,
    * Spark-native: a distributed read + columnar write, no pandas). */
  def trustedToRefined(
      spark: SparkSession,
      trustedDir: String,
      refinedDir: String,
      schema: StructType,
      partitionBy: Seq[String] = Nil): Unit = {
    val trusted = CsvIngest.read(
      spark, trustedDir, schema, CsvIngest.trustedOptions)
    Sinks.writeParquet(trusted, refinedDir, partitionBy)
  }

  /** Warehouse-load semantics of the reference (src/utils/load_bq.py:
    * 13-73 — truncate-write with schema autodetect): Spark-native
    * analog is an overwrite-mode managed-table write. */
  def loadWarehouse(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").saveAsTable(table)
}
