package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-layer audit metrics as a single DataFrame aggregation.
  *
  * The reference computes these driver-side with pandas loops over
  * object-store files (reference: src/monitoring/monitor.py:38-204 —
  * per-file row counts, file counts, timestamps, UUID-keyed audit
  * rows). The Spark-native version pushes the counting into the
  * engine: one distributed aggregation per table, unioned — no data
  * ever reaches the driver beyond the tiny audit rows themselves.
  */
object Monitor {

  /** One audit row for a table: row count, distinct count of the key
    * column, and null count of a quality-watched column. */
  def auditRow(df: DataFrame, tableName: String, keyCol: String,
      watchCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col(keyCol)).as("n_keys"),
      sum(when(col(watchCol).isNull, 1L).otherwise(0L)).as("n_nulls"))
      .select(lit(tableName).as("table_name"),
        col("n_rows"), col("n_keys"), col("n_nulls"))

  /** Audit several tables into one DataFrame (table, rows, keys,
    * nulls), ordered by table name. */
  def audit(specs: Seq[(DataFrame, String, String, String)]): DataFrame =
    specs.map { case (df, t, k, w) => auditRow(df, t, k, w) }
      .reduce(_.unionAll(_))
      .orderBy(col("table_name"))

  /** Run-level audit metadata mirroring monitor.py's insert_monitoring
    * _data row shape (uid, project, step, counts, timestamps) — the
    * uid/timestamps are caller-supplied for determinism. */
  def runAudit(spark: SparkSession, uid: String, project: String,
      step: String, qtdFiles: Long, qtdRows: Long,
      dtStart: String, dtEnd: String): DataFrame = {
    import spark.implicits._
    Seq((uid, project, step, qtdFiles, qtdRows, dtStart, dtEnd))
      .toDF("uid", "nm_project", "step", "qtd_files", "qtd_rows",
        "dt_start", "dt_end")
  }
}
