package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph
import graft.sources.Tables

class GraphSpec extends GraftSpec {
  import spark.implicits._

  /** Naive driver-side replay of the fixed-point update rule. */
  private def naivePageRank(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = deg.size.toLong
    val teleport = 3L * Graph.FpOne / (20L * n)
    var r = deg.keys.map(_ -> Graph.FpOne / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) * 17L / (20L * deg(s)) }.sum
      }
      r = in.map { case (v, s) => v -> (teleport + s) }
    }
    r
  }

  test("pagerank equals the driver replay on a random graph and on a star") {
    val rnd = new scala.util.Random(7)
    val base = (1 to 60).map(_ => (rnd.nextInt(12).toLong,
      rnd.nextInt(12).toLong)).filter(e => e._1 != e._2).distinct
    val undirected = (base ++ base.map(_.swap)).distinct
    val df = undirected.toDF("src", "dst")
    val got = Graph.pageRank(df, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naivePageRank(undirected, 3))
    // star: the hub outranks every leaf
    val star = ((1L to 5L).map(0L -> _) ++ (1L to 5L).map(_ -> 0L))
    val sr = Graph.pageRank(star.toDF("src", "dst"), iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(l => sr(0L) > sr(l)),
      s"hub must outrank leaves: $sr")
    assert(sr == naivePageRank(star, 3))
  }

  test("fixed-point mass: total rank stays within the floor-loss bound " +
      "of FpOne on the warehouse co-purchase graph") {
    val edges = Graph.coPurchaseEdges(Tables.load(spark, sf, "orders"),
      Tables.load(spark, sf, "lineitem"))
    val nEdges = edges.count()
    val ranks = Graph.pageRank(edges, iters = 3).collect()
    val total = ranks.map(_.getLong(1)).sum
    // each contribution and the teleport floor lose < 1 unit each,
    // per node per iteration; 3 iterations bound the total deficit
    val maxLoss = 3L * (nEdges + ranks.length)
    assert(total <= Graph.FpOne, s"mass exceeds 1.0: $total")
    assert(total >= Graph.FpOne - maxLoss,
      s"mass deficit ${Graph.FpOne - total} exceeds floor bound $maxLoss")
    // ranking sanity: every rank positive, nodes distinct
    assert(ranks.forall(_.getLong(1) > 0))
    assert(ranks.map(_.getLong(0)).distinct.length == ranks.length)
  }
}
