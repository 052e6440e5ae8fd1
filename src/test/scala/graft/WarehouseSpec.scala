package graft

import org.apache.spark.sql.functions._
import graft.operators.Warehouse

/** The two physical-design promises Warehouse makes must be visible in
  * the executed plan, not just produce correct rows. */
class WarehouseSpec extends GraftSpec {

  test("bucketed join + same-key agg runs with zero shuffle exchanges") {
    // build the bucketed layout once; the result itself is oracle-gated
    val df = Warehouse.bucketedJoin(spark, sf)
    assert(df.count() > 0)
    // under a no-broadcast regime the join MUST be an exchange-free
    // sort-merge over co-located buckets; with broadcast allowed the
    // plan is trivially exchange-free, which would prove nothing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (liTable, ordTable) = Warehouse.bucketedTables(sf)
      val plan = Warehouse
        .bucketedOrderRevenueCore(spark.table(liTable), spark.table(ordTable))
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected a sort-merge join over buckets:\n${plan.take(1500)}")
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n${plan.take(1500)}")
      assert(plan.contains("SelectedBucketsCount"),
        s"scan is not bucket-aware:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed join matches the plain shuffle join row-for-row") {
    val bucketed = Warehouse.bucketedJoin(spark, sf).collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val plain = Warehouse.bucketedOrderRevenue(li, ord).collect()
    assert(bucketed.toSeq == plain.toSeq)
  }

  test("dim filter reaches the fact scan as dynamic partition pruning") {
    val (factPath, dimPath) = Warehouse.layoutDailyLake(spark, sf)
    val df = Warehouse.dppAggregate(
      spark.read.parquet(factPath), spark.read.parquet(dimPath))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in fact scan:\n${plan.take(1500)}")
    assert(df.count() > 0)
  }
}
