package graft

import org.apache.spark.sql.functions._
import graft.sources.{Sinks, Tables}

/** The SQL surface: every table addressable by name via spark.sql, and
  * partitioned writes prune at read time. */
class SqlSurfaceSpec extends GraftSpec {

  test("registerAll exposes every table to spark.sql with DataFrame parity") {
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaDf = Tables.load(spark, sf, "customer")
      .join(Tables.load(spark, sf, "orders"),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql == viaDf)
    assert(viaSql.nonEmpty)
  }

  test("partitioned parquet writes prune partitions at read time") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "part")
      .toString
    val df = graft.operators.Etl.queries("etl_clean")(spark, sf)
    Sinks.writeParquet(df, s"$dir/seg", partitionBy = Seq("segmento"))
    val back = spark.read.parquet(s"$dir/seg")
      .filter(col("segmento") === "PRIMARIO")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(segmento"),
      s"partition filter not pushed:\n${plan.take(800)}")
    assert(back.count() == df.filter(col("segmento") === "PRIMARIO").count())
  }

  test("etl_partitioned_write prunes the day-partitioned lake at read time") {
    val df = graft.operators.Etl.queries("etl_partitioned_write")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"day partition filter not pushed:\n${plan.take(800)}")
    assert(df.count() > 0)
  }
}
