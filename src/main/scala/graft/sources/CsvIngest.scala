package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-enforced CSV ingest — the reference pipeline's front door.
  *
  * Mirrors the read options of the reference's raw→trusted job
  * (reference: src/script/script.py:40-47 — `;` delimiter, `"` quote,
  * `"` escape, no header, explicit StructType). An enforced schema is
  * non-negotiable at scale: schema inference is an extra full pass over
  * 100 TB and silently drifts types between runs.
  */
object CsvIngest {

  /** Options mirroring the reference raw layer (semicolon-separated,
    * quoted with doubled-quote escapes, headerless). */
  val rawOptions: Map[String, String] = Map(
    "header" -> "false",
    "delimiter" -> ";",
    "quote" -> "\"",
    "escape" -> "\"")

  /** Options for the trusted layer the reference writes
    * (pipe-delimited, with header — script.py:63-70). */
  val trustedOptions: Map[String, String] = Map(
    "header" -> "true",
    "delimiter" -> "|",
    "quote" -> "\"",
    "escape" -> "\"")

  def read(
      spark: SparkSession,
      path: String,
      schema: StructType,
      options: Map[String, String] = rawOptions): DataFrame =
    spark.read.options(options).schema(schema).csv(path)
}
