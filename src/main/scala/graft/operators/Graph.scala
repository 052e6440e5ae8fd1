package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Iterative graph analytics over relationship graphs derived from the
  * warehouse tables (SURVEY §2C adjunct): PageRank-style importance
  * weighting, the standard tool for domain/source authority scoring in
  * web-corpus curation (e.g. quality-weighting crawl domains by link
  * authority before sampling).
  *
  * Determinism contract: ranks are FIXED-POINT BIGINTs (units of
  * 1e-12), so every per-node in-sum is an order-independent integer
  * sum — bit-identical across engines, runs, and cluster layouts. A
  * floating-point PageRank would accumulate contributions in partition
  * order and drift in the last ulps per iteration; the fixed-point
  * formulation is what makes the result reproducible (and oracle-
  * checkable) at any parallelism. Floors lose ≤1e-12 of mass per
  * contribution — deterministic and harmless for ranking.
  */
object Graph {

  /** Fixed-point scale: 1.0 ≡ 1e12. */
  val FpOne = 1000000000000L

  /** Undirected customer↔supplier co-purchase edges: (c, s) linked
    * when customer c ever ordered a line item from supplier s.
    * Customers map to node 2·custkey, suppliers to 2·suppkey+1 —
    * disjoint integer namespaces an external engine replays with the
    * same arithmetic. One orderkey-keyed join + a distinct on the
    * bounded (c, s) pair set; both directions emitted so every node
    * in the graph has out-degree ≥ 1 (no dangling-mass special case).
    */
  def coPurchaseEdges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val pairs = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    pairs.select(col("c").as("src"), col("s").as("dst"))
      .union(pairs.select(col("s").as("src"), col("c").as("dst")))
  }

  /** Fixed-iteration PageRank with damping 0.85 over an edge list
    * (both directions present; node set = sources of the edge list):
    *
    *   r₀(v)    = ⌊FpOne / n⌋
    *   rₖ₊₁(v) = ⌊3·FpOne / (20n)⌋ + Σ_{u→v} ⌊rₖ(u)·17 / (20·deg u)⌋
    *
    * — the damped update with d = 17/20 kept in exact integer
    * arithmetic throughout.
    *
    * Scale shape: each iteration is ONE contributions join keyed by
    * src (edges co-partition with the node-sized rank table; at scale,
    * persist edges bucketed by src so the join is exchange-free) and
    * ONE map-side-combined groupBy(dst). iters is fixed and small, so
    * the lineage stays a shallow chain of iters shuffles — no driver
    * loop over collect()ed data, no convergence-dependent plan. */
  def pageRank(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters out of range: $iters")
    // materialize the edge list ONCE before iterating — without this,
    // every iteration's lineage re-runs the edge derivation (for the
    // co-purchase graph: the orders⋈lineitem join, 3× over). The
    // localCheckpoint is the single-JVM stand-in for a persisted
    // bucketed-by-src edge table on a real cluster.
    val e = edges.localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val n = deg.count()
    val teleport = 3L * FpOne / (20L * n)
    var ranks = deg.select(col("src").as("node"), lit(FpOne / n).as("r"))
    for (_ <- 1 to iters) {
      ranks = e.join(deg, "src")
        .join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("r * 17 div (20 * deg)").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("in_sum"))
        .select(col("dst").as("node"),
          (lit(teleport) + col("in_sum")).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_fp"),
        (col("r").cast("double") / lit(1e12)).as("rank_r"))
      .orderBy(col("node"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> ((s, dir) =>
      pageRank(coPurchaseEdges(Tables.load(s, dir, "orders"),
        Tables.load(s, dir, "lineitem")))))

  /** Full 3-iteration replay in chained CTEs: edge derivation, degree
    * table, the fixed-point teleport and contribution floors — every
    * intermediate rank is integer-exact, so the hash carries the whole
    * iteration history, not a rounded endpoint. */
  def oracleSql: Map[String, String] = Map(
    "graph_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (
        |  SELECT c AS src, s AS dst FROM pairs
        |  UNION ALL SELECT s AS src, c AS dst FROM pairs),
        |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        |nn AS (SELECT COUNT(*) AS n FROM deg),
        |r0 AS (SELECT src AS node, 1000000000000 // n AS r FROM deg, nn),
        |r1 AS (
        |  SELECT e.dst AS node,
        |    3000000000000 // (20 * (SELECT n FROM nn)) +
        |    CAST(SUM((r.r * 17) // (20 * d.deg)) AS BIGINT) AS r
        |  FROM edges e JOIN r0 r ON e.src = r.node
        |  JOIN deg d ON e.src = d.src GROUP BY e.dst),
        |r2 AS (
        |  SELECT e.dst AS node,
        |    3000000000000 // (20 * (SELECT n FROM nn)) +
        |    CAST(SUM((r.r * 17) // (20 * d.deg)) AS BIGINT) AS r
        |  FROM edges e JOIN r1 r ON e.src = r.node
        |  JOIN deg d ON e.src = d.src GROUP BY e.dst),
        |r3 AS (
        |  SELECT e.dst AS node,
        |    3000000000000 // (20 * (SELECT n FROM nn)) +
        |    CAST(SUM((r.r * 17) // (20 * d.deg)) AS BIGINT) AS r
        |  FROM edges e JOIN r2 r ON e.src = r.node
        |  JOIN deg d ON e.src = d.src GROUP BY e.dst)
        |SELECT node, r AS rank_fp, CAST(r AS DOUBLE) / 1e12 AS rank_r
        |FROM r3 ORDER BY node""".stripMargin)
}
