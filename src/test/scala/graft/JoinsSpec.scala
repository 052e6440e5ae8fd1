package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins
import graft.sources.Tables

class JoinsSpec extends GraftSpec {

  private def dropManaged(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("bucketed tables join without any exchange") {
    dropManaged("orders_b")
    dropManaged("customer_b")
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    Joins.writeBucketed(
      orders.withColumnRenamed("o_custkey", "custkey"),
      "orders_b", "custkey", 8)
    Joins.writeBucketed(
      customer.withColumnRenamed("c_custkey", "custkey"),
      "customer_b", "custkey", 8)
    // disable broadcast so the planner shows the sort-merge path the
    // bucketing exists for (at real scale neither side broadcasts)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val joined = Joins.bucketedJoin(spark, "orders_b", "customer_b", "custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"),
        s"bucketed join should be shuffle-free, plan:\n${plan.take(2000)}")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == orders.count()) // every order has a customer
    } finally {
      // GraftSession sets neither — unset restores the defaults
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("salted join equals the plain join and shuffles on (key, salt)") {
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("custkey"))
    val customer = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    val plain = orders.join(customer, "custkey")
      .select("o_orderkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Joins.saltedJoin(orders, customer, "custkey",
      uniqueCol = "o_orderkey", salts = 4)
      .select("o_orderkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
  }
}
