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

  test("scd2Merge keeps exactly one current row per key and closes " +
    "history contiguously") {
    import spark.implicits._
    val dim = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
      .withColumn("valid_from", to_date(lit("2024-01-01")))
    val changes = Seq((2L, "B2", 25.0)).toDF("k", "name", "bal")
    val out = Warehouse.scd2Merge(dim, changes, "k", "2024-06-01")
      .orderBy("k", "valid_from").collect()
    assert(out.length == 4) // 2 untouched + closed old + opened new
    // columns: k, name, bal, valid_from, valid_to, is_current
    // per key: exactly one is_current, and it has NULL valid_to
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val current = rows.filter(_.getBoolean(5))
      assert(current.length == 1 && current.head.isNullAt(4))
    }
    // the changed key's old version closes exactly at the new version's
    // valid_from (contiguous history, no gap/overlap)
    val k2 = out.filter(_.getLong(0) == 2L)
    val closed = k2.filter(!_.getBoolean(5)).head
    val opened = k2.filter(_.getBoolean(5)).head
    assert(closed.getDate(4).toString == "2024-06-01")
    assert(opened.getDate(3).toString == "2024-06-01")
    assert(opened.getString(1) == "B2" && opened.getDouble(2) == 25.0)
  }

  test("cdcDiff applied to the old snapshot reproduces the new one") {
    import spark.implicits._
    val old = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0)).toDF("k", "name", "bal")
    val nw = Seq((1L, "a", 1.0), (2L, "B", 2.0), (4L, "d", 9.0),
      (5L, "e", 5.0)).toDF("k", "name", "bal")
    val diff = Warehouse.cdcDiff(old, nw, "k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(diff == Map(2L -> "U", 3L -> "D", 4L -> "U", 5L -> "I"))
    // row 1 (unchanged) must be absent
    assert(!diff.contains(1L))
  }

  test("cdcDiff surfaces NULL↔value transitions and treats all-NULL " +
    "attrs as presence, not absence") {
    import spark.implicits._
    val old = Seq(
      (1L, Some("a"), Some(1.0)),  // value→NULL name: U
      (2L, None, Some(2.0)),       // NULL→value name: U
      (3L, None, None),            // all-NULL attrs, unchanged: absent
      (4L, None, None),            // all-NULL attrs, deleted: D
      (6L, Some("f"), Some(6.0)))  // unchanged: absent
      .toDF("k", "name", "bal")
    val nw = Seq(
      (1L, None, Some(1.0)),
      (2L, Some("b"), Some(2.0)),
      (3L, None, None),
      (5L, None, None),            // all-NULL attrs, inserted: I
      (6L, Some("f"), Some(6.0)))
      .toDF("k", "name", "bal")
    val diff = Warehouse.cdcDiff(old, nw, "k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(diff == Map(1L -> "U", 2L -> "U", 4L -> "D", 5L -> "I"))
  }

  test("scd2Merge versions a key whose changeset sets attrs to NULL") {
    import spark.implicits._
    val dim = Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("k", "name", "bal")
      .withColumn("valid_from", to_date(lit("2024-01-01")))
    val changes = Seq((2L, Option.empty[String], Option.empty[Double]))
      .toDF("k", "name", "bal")
    val out = Warehouse.scd2Merge(dim, changes, "k", "2024-06-01")
      .orderBy("k", "valid_from").collect()
    assert(out.length == 3) // untouched k=1 + closed + opened for k=2
    val k2 = out.filter(_.getLong(0) == 2L)
    val closed = k2.filter(!_.getBoolean(5)).head
    val opened = k2.filter(_.getBoolean(5)).head
    assert(closed.getDate(4).toString == "2024-06-01")
    assert(opened.getDate(3).toString == "2024-06-01")
    assert(opened.isNullAt(1) && opened.isNullAt(2) && opened.isNullAt(4))
  }

  test("mergeCow rewrites ONLY partitions containing changed keys — " +
      "untouched partition files stay byte-identical on disk") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "mergecow").toString + "/tbl"
    val base = Seq(
      (1L, 10.0, "A"), (2L, 20.0, "A"),
      (3L, 30.0, "B"), (4L, 40.0, "B"),
      (5L, 50.0, "C"), (6L, 60.0, "C"))
      .toDF("k", "v", "p")
    base.write.partitionBy("p").parquet(dir)
    def snapshot(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath.stripPrefix(dir) ->
          ((f.length(), f.lastModified()))).toMap
    }
    val before = snapshot()
    assert(before.keys.exists(_.contains("p=C")), "fixture layout broken")
    // changes touch partitions A (update) and B (insert) — never C
    val changes = Seq((1L, 11.0, "A"), (9L, 90.0, "B"))
      .toDF("k", "v", "p")
    Warehouse.mergeCow(spark, dir, changes, "k", "p")
    val after = snapshot()
    val (cBefore, cAfter) = (
      before.filter(_._1.contains("p=C")), after.filter(_._1.contains("p=C")))
    assert(cBefore == cAfter,
      s"untouched partition C was rewritten: $cBefore vs $cAfter")
    assert(before.filter(_._1.contains("p=A"))
        != after.filter(_._1.contains("p=A")),
      "changed partition A must have been rewritten")
    // merged state is exact
    val got = spark.read.parquet(dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, 11.0, "A"), (2L, 20.0, "A"),
      (3L, 30.0, "B"), (4L, 40.0, "B"), (5L, 50.0, "C"), (6L, 60.0, "C"),
      (9L, 90.0, "B")), s"merged state: ${got.toSeq}")
    // an empty changeset is a no-op: nothing read, nothing rewritten
    Warehouse.mergeCow(spark, dir,
      changes.filter(col("k") < 0), "k", "p")
    assert(snapshot() == after, "empty changeset must not rewrite")
    // the pruned base scan partition-prunes: only changed partitions
    // are READ, visible as a PartitionFilters entry on the scan
    val pruned = spark.read.parquet(dir).filter(col("p").isin("A"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(p"),
      s"partition filter missing from pruned scan:\n$plan")
    // a NULL partition value in the changeset must fail LOUDLY before
    // any write: NULL poisons the isin prune (drops every base row of
    // the null partition) and the dynamic overwrite would then silently
    // delete that partition's unmatched rows (ADVICE r13)
    val ex = intercept[IllegalArgumentException] {
      Warehouse.mergeCow(spark, dir,
        Seq((7L, 70.0, null.asInstanceOf[String])).toDF("k", "v", "p"),
        "k", "p")
    }
    assert(ex.getMessage.contains("NULL"), ex.getMessage)
    assert(snapshot() == after, "rejected changeset must not write")
  }

  test("morton interleave matches hand-computed codes and the zone map " +
      "honors the tile-span guarantee") {
    import spark.implicits._
    // u=0b011, v=0b101 → z interleaves to 0b100111 = 39 (u even bits)
    val codes = Seq((3L, 5L), (0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L))
      .toDF("um", "vm")
      .select(Warehouse.mortonZ(col("um"), col("vm")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    def ref(u: Long, v: Long): Long =
      (0 until 16).map(i =>
        (((u >> i) & 1L) << (2 * i)) | (((v >> i) & 1L) << (2 * i + 1)))
        .sum
    assert(codes == Seq(ref(3, 5), 0L, ref(65535, 65535), 1L, 2L))
    assert(ref(3, 5) == 39L)
    assert(ref(65535, 65535) == (1L << 32) - 1)
    // Independent-path fixture (round-12 verdict item 7): the CANONICAL
    // 8×8 Z-order table from the literature (the classic Morton-curve
    // figure: u in even bits, v in odd bits), pinned as LITERAL data so
    // a bug in the shared interleave generator cannot replicate into
    // the expectation. Row v, column u.
    val literature = Seq(
      Seq(0, 1, 4, 5, 16, 17, 20, 21),
      Seq(2, 3, 6, 7, 18, 19, 22, 23),
      Seq(8, 9, 12, 13, 24, 25, 28, 29),
      Seq(10, 11, 14, 15, 26, 27, 30, 31),
      Seq(32, 33, 36, 37, 48, 49, 52, 53),
      Seq(34, 35, 38, 39, 50, 51, 54, 55),
      Seq(40, 41, 44, 45, 56, 57, 60, 61),
      Seq(42, 43, 46, 47, 58, 59, 62, 63))
    val grid = (for { v <- 0L to 7L; u <- 0L to 7L } yield (u, v))
    val gotGrid = grid.toDF("um", "vm")
      .select(col("um"), col("vm"),
        Warehouse.mortonZ(col("um"), col("vm")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    grid.foreach { case (u, v) =>
      assert(gotGrid((u, v)) == literature(v.toInt)(u.toInt).toLong,
        s"morton($u,$v): got ${gotGrid((u, v))}, literature " +
          s"${literature(v.toInt)(u.toInt)}")
    }
    val zm = Warehouse.zorderZoneMap(
        graft.sources.Tables.load(spark, sf, "orders"))
      .collect()
    assert(zm.nonEmpty)
    zm.foreach { r =>
      assert(r.getBoolean(6) && r.getBoolean(7),
        s"tile ${r.getLong(0)} violates the 2^10 span guarantee")
      assert(r.getLong(3) - r.getLong(2) < 1024 &&
        r.getLong(5) - r.getLong(4) < 1024)
    }
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

  test("mv rewrite: served result equals the base-table plan, full-dim " +
      "grouping also serves, filters and foreign aggregates bail out") {
    import graft.plans.MvCatalog
    import org.apache.spark.sql.functions._
    try {
      // face registers the view, asserts the summary (not the fact) is
      // scanned for BOTH the plain and the dimension-filtered leg, then
      // deregisters; collect the served answer
      val served = Warehouse.mvRewriteServe(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      // the face must have deregistered: the catalog is process-global
      assert(MvCatalog.registered.isEmpty,
        "mvRewriteServe leaked its catalog entry")
      val orders = graft.sources.Tables.load(spark, sf, "orders")
      val cents = floor(col("o_totalprice") * 100)
      // bypass: same aggregates straight off the base table
      val base = orders.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents).as("revenue_cents"),
          count(when(month(to_date(col("o_orderdate"))) <= 6, 1))
            .as("n_h1_orders"))
        .orderBy(col("o_orderpriority")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      assert(served.sameElements(base), "served != base")
      // re-register; a grouping on BOTH dims serves from the view too
      Warehouse.mvRegister(spark, sf)
      val full = orders.groupBy(
          month(to_date(col("o_orderdate"))).as("o_month"),
          col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
      assert(full.queryExecution.executedPlan.toString
        .contains("mv_orders_monthly"), "full-dim grouping not served")
      // a filter on a NON-dimension column must NOT be served
      val filtered = orders.filter(col("o_orderkey") > 10)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
      assert(!filtered.queryExecution.executedPlan.toString
        .contains("mv_orders_monthly"),
        "non-dimension filter was served")
      // a filter on a DIMENSION serves, and the answer matches base
      val dimF = orders.filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(month(to_date(col("o_orderdate"))).as("o_month"))
        .agg(count(lit(1)).as("n"))
      assert(dimF.queryExecution.executedPlan.toString
        .contains("mv_orders_monthly"), "dimension filter not served")
      val dimServed = dimF.orderBy(col("o_month")).collect()
        .map(r => (r.getInt(0), r.getLong(1)))
      // an aggregate the view cannot derive (MAX) must not be served
      val foreign = orders.groupBy(col("o_orderpriority"))
        .agg(max(col("o_totalprice")).as("m"))
      assert(!foreign.queryExecution.executedPlan.toString
        .contains("mv_orders_monthly"), "MAX aggregate was served")
      // a grouping outside the dims must not be served
      val offDim = orders.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      assert(!offDim.queryExecution.executedPlan.toString
        .contains("mv_orders_monthly"), "off-dimension grouping served")
      MvCatalog.clear()
      val dimBase = orders.filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(month(to_date(col("o_orderdate"))).as("o_month"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_month")).collect()
        .map(r => (r.getInt(0), r.getLong(1)))
      assert(dimServed.sameElements(dimBase), "dim-filtered served != base")
    } finally MvCatalog.clear()
  }

  test("mv star rewrite: join-served legs equal the base plan; wrong " +
      "key, wrong join type, off-dim grouping, and lone-fact bail") {
    import graft.plans.MvCatalog
    import org.apache.spark.sql.functions._
    try {
      // the face itself REQUIRES summary-scanned + neither base scanned
      // on both legs; here prove the VALUES match the base plan too
      val served = Warehouse.mvStarServe(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      assert(MvCatalog.registered.isEmpty, "mvStarServe leaked its entry")
      val orders = graft.sources.Tables.load(spark, sf, "orders")
      val customer = graft.sources.Tables.load(spark, sf, "customer")
      val cents = floor(col("o_totalprice") * 100)
      val base = orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), sum(cents).as("revenue_cents"),
          count(when(col("o_orderpriority") === "1-URGENT", 1))
            .as("n_urgent"))
        .orderBy(col("c_mktsegment")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      assert(served.sameElements(base), "star served != base")
      // re-register for the bail legs
      Warehouse.mvStarRegister(spark, sf)
      def plan(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.executedPlan.toString
      // sides in the OPPOSITE order still serve (canonicalized cond)
      val swapped = customer
        .join(orders, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      assert(plan(swapped).contains("mv_star_segment"),
        "swapped-side star query not served")
      // a DIFFERENT join key must bail (not the view's join)
      val wrongKey = orders
        .join(customer, col("o_custkey") === col("c_nationkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      assert(!plan(wrongKey).contains("mv_star_segment"),
        "wrong-key join was served")
      // a LEFT join must bail (the summary pre-counts inner matches)
      val leftJoin = orders
        .join(customer, col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      assert(!plan(leftJoin).contains("mv_star_segment"),
        "left join was served")
      // grouping by a non-dimension column of the dim side must bail
      val offDim = orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
      assert(!plan(offDim).contains("mv_star_segment"),
        "off-dimension star grouping served")
      // an aggregate over the FACT ALONE must not be served by the
      // star view (its counts are join-dependent)
      val loneFact = orders.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(!plan(loneFact).contains("mv_star_segment"),
        "fact-only aggregate served from the star view")
      // a filter on a NON-dimension column must bail
      val badFilter = orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .filter(col("c_acctbal") > 0)
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      assert(!plan(badFilter).contains("mv_star_segment"),
        "non-dimension filter was served on the star view")
      // self-join definitions refuse at registration (fail loudly)
      val selfDef = orders.as("a")
        .join(graft.sources.Tables.load(spark, sf, "orders").as("b"),
          col("a.o_orderkey") === col("b.o_orderkey"))
        .groupBy(col("a.o_orderpriority")).agg(count(lit(1)).as("n"))
      val selfPath = s"${graft.operators.Etl.roundtripRoot}/mv_self"
      selfDef.write.mode("overwrite").parquet(selfPath)
      intercept[IllegalArgumentException] {
        MvCatalog.register(spark, "self_view", selfDef, selfPath)
      }
    } finally MvCatalog.clear()
  }

  test("mv rewrite hardening: global COUNT over an empty base stays 0, " +
      "type-widening measures bail") {
    import graft.plans.MvCatalog
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = s"${graft.operators.Etl.roundtripRoot}/mv_empty_base"
    try {
      // an EMPTY parquet base table with the same shape
      val basePath = s"$root/base"
      Seq.empty[(String, Long)].toDF("k", "v")
        .write.mode("overwrite").parquet(basePath)
      val base = spark.read.parquet(basePath)
      val mvDef = base.groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      val mvPath = s"$root/mv"
      mvDef.write.mode("overwrite").parquet(mvPath)
      MvCatalog.register(spark, "empty_view", mvDef, mvPath)
      // global COUNT(*): base answers one row of 0; a naive
      // SUM(mv.n) over the empty view answers NULL — the rewrite must
      // coalesce. Also assert it WAS served, so the test is not vacuous
      val g = base.agg(count(lit(1)).as("n"))
      assert(g.queryExecution.executedPlan.toString.contains("mv_empty_base/mv"),
        "global count not served from the view")
      val got = g.collect()
      assert(got.length == 1 && !got(0).isNullAt(0) && got(0).getLong(0) == 0L,
        s"global COUNT over empty base must be 0, got ${got.mkString}")
      // grouped aggregates: zero rows on both sides
      assert(base.groupBy(col("k")).agg(count(lit(1)).as("n"))
        .collect().isEmpty)
      MvCatalog.clear()
      // a DECIMAL sum re-summed from the MV would widen its type —
      // the rewrite must bail (dataType equality), not serve
      val decPath = s"$root/decbase"
      Seq(("a", BigDecimal(1.50)), ("a", BigDecimal(2.25)))
        .toDF("k", "v")
        .select(col("k"), col("v").cast("decimal(12,2)").as("v"))
        .write.mode("overwrite").parquet(decPath)
      val dec = spark.read.parquet(decPath)
      val decDef = dec.groupBy(col("k")).agg(sum(col("v")).as("s"))
      val decMv = s"$root/decmv"
      decDef.write.mode("overwrite").parquet(decMv)
      MvCatalog.register(spark, "dec_view", decDef, decMv)
      val q = dec.groupBy(col("k")).agg(sum(col("v")).as("s"))
      assert(!q.queryExecution.executedPlan.toString.contains("decmv"),
        "decimal sum was served despite type widening")
      val r = q.collect()
      assert(r.length == 1 &&
        r(0).getDecimal(1) == new java.math.BigDecimal("3.75"))
    } finally MvCatalog.clear()
  }
}
