package graft

/** Global plan lint over EVERY SparkEntry query: the scale promises
  * that hold library-wide must be visible in (the absence of) red-flag
  * physical operators — a per-operator audit can miss a regression a
  * later edit introduces elsewhere. */
class PlanLintSpec extends GraftSpec {

  /** knn_brute / knn_ivf / knn_pq_adc / knn_ivfpq broadcast a BOUNDED
    * set (the query set / the fixed centroid budget / the 1-row packed
    * PQ codebook) into a crossJoin by design — the only intentional
    * nested-loop joins in the library, with their scale contract
    * documented in Similarity.scala. */
  private val intentionalCross =
    Set("knn_brute", "knn_ivf", "knn_pq_adc", "knn_ivfpq")

  test("no query plan contains a cartesian product or stray nested loop") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (k, q) =>
      val plan = q(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$k compiles to a cartesian product:\n${plan.take(1200)}")
      if (!intentionalCross(k))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$k compiles to a nested-loop join:\n${plan.take(1200)}")
    }
  }
}
