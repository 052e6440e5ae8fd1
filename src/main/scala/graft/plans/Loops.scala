package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.GraftStatsReset

/** Checkpoint discipline for FIXPOINT loops (unbounded round count). */
object Loops {

  /** Materialize a loop frame AND reset its inherited plan statistics.
    *
    * `localCheckpoint()` alone cuts LINEAGE but copies the origin
    * plan's `sizeInBytes` onto the new leaf; a loop that self-joins
    * its own checkpointed output then SQUARES that BigInt every round
    * (Catalyst multiplies child sizes at each join), doubling its
    * bit-length per iteration until planning time explodes and the
    * driver finally throws `BigInteger would overflow supported range`
    * — see [[org.apache.spark.sql.classic.GraftStatsReset]] for the
    * mechanism and the sf3 incident that exposed it. Fixed-ROUND
    * loops (PageRank's 3 iterations, k-core's 3 peels) stay orders of
    * magnitude below the wall and keep plain `localCheckpoint`; every
    * run-to-convergence loop must checkpoint through this instead.
    *
    * Cost: none beyond the checkpoint itself — the rebuilt frame wraps
    * the SAME materialized InternalRow RDD (no recompute, no Row
    * conversion). The reset leaf reports the flat default leaf size,
    * which is irrelevant to these loops' key-keyed sort-merge joins
    * and is re-measured by AQE at runtime anyway. */
  def checkpointFresh(df: DataFrame): DataFrame =
    GraftStatsReset.freshLeaf(df.localCheckpoint())
}
