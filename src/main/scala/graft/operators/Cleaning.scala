package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** String-cleaning transforms — the reference pipeline's core transform
  * stage (reference: src/script/script.py:53-61 — trim, empty→NULL,
  * and a parity-conditional derived segment column).
  *
  * Everything here is a narrow per-row projection of built-in
  * expressions: fully codegen'd, no shuffle, survives any scale
  * unchanged.
  */
object Cleaning {

  /** Trim every StringType column (script.py:53). */
  def trimStrings(df: DataFrame): DataFrame =
    df.schema.fields.filter(_.dataType == StringType).foldLeft(df) {
      (d, f) => d.withColumn(f.name, trim(col(f.name)))
    }

  /** Empty string → NULL on every StringType column (script.py:54-56;
    * the reference uses eqNullSafe("") so NULL inputs stay NULL). */
  def emptyToNull(df: DataFrame): DataFrame =
    df.schema.fields.filter(_.dataType == StringType).foldLeft(df) {
      (d, f) =>
        d.withColumn(f.name,
          when(col(f.name).eqNullSafe(""), lit(null).cast(StringType))
            .otherwise(col(f.name)))
    }

  /** Parity-conditional derived column (script.py:57-61: odd codes →
    * PRIMARIO, even → SECUNDARIO). */
  def withParitySegment(
      df: DataFrame,
      codeCol: String,
      outCol: String = "segmento",
      odd: String = "PRIMARIO",
      even: String = "SECUNDARIO"): DataFrame =
    df.withColumn(outCol,
      when(col(codeCol) % 2 === 1, odd).otherwise(even))

  /** The full reference transform: trim → empty-to-NULL → parity
    * segment, in the reference's order. */
  def referenceClean(df: DataFrame, codeCol: String): DataFrame =
    withParitySegment(emptyToNull(trimStrings(df)), codeCol)
}
