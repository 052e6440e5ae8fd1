package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for scale (SURVEY §5): bucketed co-location and
  * manual salting.
  *
  * - Bucketing pre-shuffles data ONCE at write time; every subsequent
  *   equi-join or aggregation on the bucket key runs shuffle-free.
  *   At 100 TB, re-shuffling a fact table per query is the single
  *   largest avoidable cost — bucket the canonical sort/join keys at
  *   ingest (refined layer) instead.
  * - Salting splits a skewed key's rows across `salts` sub-keys and
  *   replicates the matching dimension rows, bounding the largest
  *   task. AQE's skew-join split handles most cases automatically
  *   (enabled in GraftSession); explicit salting remains for skewed
  *   AGGREGATIONS and for joins AQE cannot split (e.g. both sides
  *   pre-sorted by a bucketed layout).
  */
object Joins {

  /** Write a DataFrame bucketed+sorted by `key` into the session
    * warehouse — the co-located layout for shuffle-free joins. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planner emits
    * a sort-merge join with NO exchange on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Salted equi-join of a skewed fact against a dimension: the fact
    * side gets a deterministic salt from a row-unique column; the dim
    * side is replicated across all salt values. The shuffle key becomes
    * (key, salt), splitting each hot key into `salts` tasks. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      uniqueCol: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(uniqueCol)), lit(salts.toLong)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
