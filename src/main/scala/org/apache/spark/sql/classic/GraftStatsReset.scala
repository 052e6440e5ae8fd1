package org.apache.spark.sql.classic

/** Access shim for [[SparkSession.internalCreateDataFrame]] (which is
  * `private[sql]`): rebuild a materialized DataFrame as a FRESH leaf
  * plan with default statistics.
  *
  * Why this exists — the checkpoint-stats compounding pathology:
  * `Dataset.localCheckpoint`/`checkpoint` copy the ORIGIN plan's
  * statistics onto the new `LogicalRDD` leaf
  * (`LogicalRDD.fromDataset` passes the optimized plan's stats
  * through). Catalyst's size-only estimator multiplies children's
  * `sizeInBytes` at every join
  * (SizeInBytesOnlyStatsPlanVisitor.default — a BigInt product), so a
  * FIXPOINT LOOP that self-joins its own checkpointed output squares
  * the inherited figure every round: the BigInt's bit-length DOUBLES
  * per iteration (measured: 13 bits → 23 499 bits in 12 rounds of
  * checkpoint → self-join → checkpoint). Past ~15 rounds the
  * single-threaded stats walk burns minutes multiplying million-bit
  * integers during planning; past ~30 the driver dies with
  * `java.lang.ArithmeticException: BigInteger would overflow supported
  * range` (java.math.BigInteger's 2³¹-bit magnitude cap). This is how
  * graft's connected-components loop — correct at every gate scale —
  * failed ONLY at the sf3 scale point, where convergence needed enough
  * rounds to cross the wall (caught by the round-14 growth-curve run;
  * the failure is data-independent given enough rounds).
  *
  * The fix: after each round's checkpoint, rebuild the frame on the
  * SAME materialized `InternalRow` RDD (`queryExecution.toRdd` — no
  * recompute, no Row conversion, no extra pass) via
  * `internalCreateDataFrame`, which builds a `LogicalRDD` WITHOUT
  * origin stats — its `computeStats` then reports the flat
  * `spark.sql.defaultSizeInBytes` leaf default, so per-round stats
  * stay bounded no matter how many rounds run. Join-strategy impact is
  * nil for the loops that use it: their per-round joins are key-keyed
  * sort-merge joins either way, and AQE re-plans from RUNTIME sizes.
  *
  * Trade-off — what the fresh leaf LOSES vs `LogicalRDD.fromDataset`:
  * not just origin stats but also the origin's outputPartitioning /
  * outputOrdering and derived constraints (e.g. IsNotNull on join
  * keys). Concretely, a loop round may re-exchange data the previous
  * round already had hash-partitioned, and downstream plans can gain
  * explicit Filter(IsNotNull) nodes the constraint propagation used to
  * elide (the dedup_embedding fingerprint's FilterExec=1 is exactly
  * this). Accepted deliberately: the loops this wraps re-key per round
  * anyway (the partitioning rarely survives the round's transforms),
  * and an extra exchange per round is O(rounds·n) where the stats
  * compounding was a hard driver death — do NOT "optimize" a loop on
  * the assumption that checkpoint partitioning survives freshLeaf.
  *
  * Lives in `org.apache.spark.sql.classic` solely to satisfy the
  * `private[sql]` boundary — the standard OSS pattern for the handful
  * of Spark internals with no public equivalent. Nothing else may be
  * added here without the same justification.
  */
object GraftStatsReset {
  /** The input must already be materialized (checkpointed): `toRdd` on
    * a non-materialized plan would re-execute it per consumer, undoing
    * the checkpoint this wraps. */
  def freshLeaf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema)
  }
}
