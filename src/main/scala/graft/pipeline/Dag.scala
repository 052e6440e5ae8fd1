package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Minimal deterministic DAG runner over engine steps — the
  * orchestration layer of the reference (dag.py:45-167: a task graph
  * download→transform→bom→refine→load with per-step monitoring rows
  * and restart-from-failure), re-expressed as a library: no scheduler
  * process, no cron — a RUNNER a caller invokes, with the run ledger
  * as the single source of truth for what already happened.
  *
  * Semantics:
  *  - Steps declare explicit dependencies; execution order is the
  *    unique deterministic topological order that always runs the
  *    lexicographically smallest READY step next (no wall-clock or
  *    hash-map iteration order anywhere — two runs of the same graph
  *    execute identically).
  *  - Every completed step appends one ledger row (uid, project, step
  *    name, emitted file count, emitted row count, start/end from the
  *    injected clock) to the audit table — monitor.py:123-164's row
  *    shape, shared with [[Medallion.auditedRun]] and
  *    [[Medallion.catalogLoad]].
  *  - RESUME: steps already recorded in the ledger for this `project`
  *    are skipped (their side effects — written layers, loaded tables
  *    — are durable, the ledger row is the receipt). A run killed
  *    after step k therefore re-runs ONLY steps k+1.., converging to
  *    the same layers as an uninterrupted run.
  *  - Failure is fail-fast: the exception propagates, the ledger keeps
  *    the completed prefix, nothing is recorded for the failed step.
  *
  * Scale note: the runner is driver-side control flow (as every
  * orchestrator is); all data movement lives inside the steps, which
  * are ordinary engine operators. The ledger read at resume is one
  * catalog-table scan of audit-row cardinality.
  */
object Dag {

  /** One DAG node: a unique name, the names it depends on, and the
    * action. `run()` returns (files, rows) emitted — the numbers the
    * ledger row records, computed by the step itself because only the
    * step knows which layer it materialized. */
  final case class Step(name: String, deps: Seq[String],
      run: () => (Long, Long))

  /** Transient by default: I/O failures — the [[graft.sources.Landing]]
    * httpFetch discipline (network/storage hiccups heal on retry;
    * schema errors, assertion failures and planning bugs do not).
    * Callers with richer failure taxonomies inject their own. */
  def defaultTransient(e: Throwable): Boolean =
    e.isInstanceOf[java.io.IOException]

  /** Validate the graph: unique names, known dependencies, no cycles
    * (a topological enumeration must reach every step). */
  private def validate(steps: Seq[Step]): Unit = {
    val names = steps.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate step names: ${names.diff(names.distinct).distinct}")
    // '#' is reserved for burned-attempt ledger receipts
    // ("<step>#failed_attempt_N") — a real step with that name could
    // collide with a receipt and corrupt resume bookkeeping
    names.foreach(n => require(!n.contains('#'),
      s"step name '$n' contains '#' (reserved for attempt receipts)"))
    val known = names.toSet
    steps.foreach(s => s.deps.foreach(d => require(known.contains(d),
      s"step '${s.name}' depends on unknown step '$d'")))
    val done = scala.collection.mutable.Set[String]()
    var progressed = true
    while (progressed) {
      val ready = steps.filter(s => !done(s.name) && s.deps.forall(done))
      progressed = ready.nonEmpty
      ready.foreach(s => done += s.name)
    }
    require(done.size == steps.size,
      s"dependency cycle through: ${names.filterNot(done).mkString(", ")}")
  }

  /** Steps of `project` already receipted as COMPLETED in the ledger
    * (any run id — a resumed run has a fresh uid but inherits prior
    * progress). Burned-attempt receipts (`<step>#failed_attempt_N`)
    * are audit rows, not completions — excluded by the reserved '#'
    * marker step names can never carry. */
  def completedSteps(spark: SparkSession, auditTable: String,
      project: String): Set[String] =
    if (!spark.catalog.tableExists(auditTable)) Set.empty
    else spark.table(auditTable)
      .filter(col("nm_project") === project &&
        !col("step").contains("#"))
      .select(col("step")).distinct()
      .collect().map(_.getString(0)).toSet

  /** Run the graph (resuming past any ledger-receipted steps), append
    * one ledger row per step completed IN THIS RUN, and return those
    * rows. An empty result on a fully-receipted graph is the no-op
    * re-run a scheduler's catchup performs.
    *
    * CONCURRENT RUNS of the same `project` (the scheduler-catchup race
    * the reference dodges with catchup=False, dag.py:52): the contract
    * is step-level AT-LEAST-ONCE with convergence, not mutual
    * exclusion — a plain-parquet ledger has no compare-and-swap to
    * build a lock from. Before executing each step the runner RE-READS
    * the project's receipts, so a step receipted by a parallel run in
    * the meantime is skipped like any resumed step; only steps whose
    * executions overlap in wall-clock can run twice. That is safe
    * because steps are idempotent by construction (deterministic layer
    * writes — re-materializing a layer yields the same bytes) and the
    * ledger tolerates duplicate receipts ([[completedSteps]] reads
    * DISTINCT step names; monitoring sums stay per-uid). Every step is
    * receipted at least once, no step is lost, and once any
    * combination of runs covers the graph a sequential re-run is a
    * full no-op. DagSpec interleaves two runs to pin exactly this. */
  /** Per-step retry (round-16): the reference gets task retries for
    * free from Airflow's default_args (dag.py); here they are explicit
    * and BOUNDED — a step failing with a TRANSIENT exception (the
    * injectable `isTransient` predicate, defaulting to the
    * [[defaultTransient]] I/O rule httpFetch retries on) re-runs up to
    * `maxAttempts` times with exponential backoff (`sleep` injectable
    * so specs assert the schedule without a clock). Every burned
    * attempt is RECEIPTED in the ledger under
    * `<step>#failed_attempt_N` (0 files, 0 rows, real start/end) — an
    * auditor sees every execution, and the '#' marker guarantees a
    * failure receipt can never read back as step completion in
    * [[completedSteps]]. A non-transient failure, or a transient one
    * on the last attempt, propagates — fail-fast is unchanged, the
    * exception itself is that attempt's receipt. Default
    * maxAttempts=1 keeps the pre-retry contract bit-for-bit. */
  def run(spark: SparkSession, steps: Seq[Step], auditTable: String,
      uid: String, project: String, clock: () => String,
      maxAttempts: Int = 1,
      isTransient: Throwable => Boolean = defaultTransient,
      backoffMs: Long = 200, sleep: Long => Unit = Thread.sleep): DataFrame = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1: $maxAttempts")
    validate(steps)
    val done = scala.collection.mutable.Set[String]() ++
      completedSteps(spark, auditTable, project)
    val ran = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var next = nextReady(steps, done.toSet)
    while (next.isDefined) {
      val step = next.get
      // concurrent-run convergence: a parallel run may have receipted
      // this step since our last look — one audit-cardinality catalog
      // scan per step buys the skip (driver-side orchestrator cost)
      if (completedSteps(spark, auditTable, project).contains(step.name)) {
        done += step.name
      } else {
        var attempt = 0
        var result: Option[(Long, Long)] = None
        var t0: String = null // assigned per attempt — the injected
                              // clock must tick exactly once per start
        while (result.isEmpty) {
          attempt += 1
          t0 = clock()
          try result = Some(step.run()) // fail-fast: non-transient and
          catch {                       // last-attempt failures propagate
            case e: Throwable if isTransient(e) && attempt < maxAttempts =>
              val burned = Monitor.runAudit(spark, uid, project,
                s"${step.name}#failed_attempt_$attempt",
                qtdFiles = 0L, qtdRows = 0L, dtStart = t0, dtEnd = clock())
              Medallion.appendWarehouse(burned, auditTable)
              ran += burned
              sleep(backoffMs << (attempt - 1))
          }
        }
        val (files, rows) = result.get
        val row = Monitor.runAudit(spark, uid, project, step.name,
          qtdFiles = files, qtdRows = rows, dtStart = t0, dtEnd = clock())
        Medallion.appendWarehouse(row, auditTable)
        ran += row
        done += step.name
      }
      next = nextReady(steps, done.toSet)
    }
    ran.reduceOption(_.unionAll(_)).getOrElse(
      Monitor.runAudit(spark, uid, project, "", 0L, 0L, "", "").limit(0))
  }

  /** The lexicographically smallest step whose dependencies are all
    * done — the deterministic scheduling rule. */
  private def nextReady(steps: Seq[Step], done: Set[String]): Option[Step] =
    steps.filter(s => !done(s.name) && s.deps.forall(done))
      .sortBy(_.name).headOption
}
