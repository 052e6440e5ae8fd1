package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark harness. For each SparkEntry query: one warmup run (absorbs
  * JVM/codegen/parquet-footer warmup) then one timed run. Materialization
  * is a noop-format write — executes the FULL physical plan (sorts and
  * projections included, unlike `.count()` which lets Catalyst prune them)
  * without driver-side collection or disk I/O.
  *
  * Output: ONE JSON line on stdout (driver contract) and the same JSON at
  * BENCH.json in the cwd (sbt prefixes stdout lines, which broke the
  * driver's parse in round 1). Failed queries record an "errors" entry
  * instead of a bogus timing.
  */
object Bench {
  private def materialize(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Host load snapshot (1/5/15-min loadavg). Benchmarks on a shared VM
    * have twice been polluted by co-tenant load (2.8-6x over idle truth,
    * rounds 2-3); recording load in the artifact makes a polluted run
    * identifiable without a re-measure. */
  private def loadavg(): String =
    try Files.readString(Paths.get("/proc/loadavg")).trim.split(" ").take(3).mkString(" ")
    catch { case _: Throwable => "unavailable" }

  /** Idle gate: the measurement protocol (BASELINE.md) demands 1-min
    * loadavg < 1.5 at run start — artifacts recorded above that are
    * contention-polluted (rounds 2/3/8 all needed re-measures). Rather
    * than hoping the caller checked, WAIT for the host to go idle, up
    * to `maxWaitSec`; if it never does, proceed (the loadavg bracket in
    * the artifact still flags the pollution) but record how long we
    * waited so the artifact shows the gate was applied. Disable with
    * SPARK_GRAFT_NO_IDLE_GATE=1 for quick dev timings. */
  private def awaitIdle(threshold: Double = 1.5,
      maxWaitSec: Int = 600): Long = {
    if (sys.env.contains("SPARK_GRAFT_NO_IDLE_GATE")) return 0L
    def load1(): Double =
      try loadavg().split(" ").head.toDouble catch { case _: Throwable => 0.0 }
    val t0 = System.nanoTime()
    var waited = 0
    var l = load1()
    while (l >= threshold && waited < maxWaitSec) {
      System.err.println(
        s"[bench] loadavg $l >= $threshold — waiting for idle " +
          s"($waited/${maxWaitSec}s)")
      Thread.sleep(30000)
      waited += 30
      l = load1()
    }
    (System.nanoTime() - t0) / 1000000000L
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional trailing args: bench only these keys (dev iteration);
    // unknown keys fail loudly (same contract as Verify) — BEFORE the
    // idle gate, so a typo'd key doesn't wait 10 minutes to be rejected
    val unknown = args.toSet.diff(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(
        s"[bench] unknown query keys: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val idleWaitSec = awaitIdle()
    val spark: SparkSession = GraftSession.local()
    val names =
      if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq.distinct.sorted
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val rawRuns = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val loadBefore = loadavg()
    // Phase 1 — warmup: run EVERY query once untimed. JVM/JIT warmup is
    // global, not per-query; a per-query warmup still taxes whichever
    // queries happen to run first.
    names.foreach { name =>
      try {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        materialize(SparkEntry.queries(name)(spark, sfDir))
      } catch { case _: Throwable => () } // failure re-surfaces in phase 2
    }
    // Phase 2 — timed: MEDIAN of 3 runs per query, so a shared-VM load
    // spike can't fabricate a regression. The timer starts BEFORE query
    // construction — some queries (etl_*_roundtrip) perform their layer
    // writes eagerly there, and that work is part of the operator.
    //
    // The three runs are INTERLEAVED as full passes over the registry
    // (round 7): back-to-back runs of one key all land inside the same
    // ~5 s window, so a co-tenant burst pollutes all three and the
    // median keeps it (observed: one burst put nine consecutive keys
    // 2-4x over baseline while the rest of the same run sat at 1.2x).
    // Spread minutes apart, a burst hits at most one of a key's three
    // samples and the median rejects it.
    //
    // The explicit GC between queries is load-bearing: ContextCleaner
    // reclaims broadcast/shuffle state only when the driver happens to
    // collect old-gen (its periodicGC fallback defaults to 30 min —
    // longer than this whole run), so ~200 back-to-back executions
    // otherwise accumulate state until allocation stalls surface as
    // 10-100x timings on whichever query runs next (observed: a 1 s
    // scan+groupBy measuring 93 s with a clean plan on an idle host).
    val acc = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    // one timed execution with the deterministic cleanup discipline:
    // release the previous query's localCheckpoint blocks
    // DETERMINISTICALLY (ContextCleaner cleanup is async — System.gc
    // only enqueues it), so checkpoint blocks don't accumulate in the
    // block manager across ~330 executions and inflate mid-run keys
    // 1.5-8x over their idle spot-run truth (observed on dedup_bloom/
    // dedup_cluster/stream_window_agg, code unchanged)
    def timedRun(name: String): Double = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      materialize(SparkEntry.queries(name)(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }
    // Position-resolved control sweeps (round-15, verdict #6): inside a
    // ~24-minute full-registry run, hypervisor co-tenancy samples
    // UNEVENLY — r14's final artifact read 2 of 6 controls >1.5x at
    // their in-pass positions while idle spot runs read ~1.0x. Each
    // control is therefore ALSO timed at three fixed run positions
    // (start: before pass 1; middle: after pass 2; end: after pass 3),
    // and the control ratio uses the MEDIAN of a key's position
    // samples — a burst at one position can no longer drag a control,
    // and the per-position spread is emitted so the artifact shows
    // WHERE in the run the drift lived. Swept only on full-registry
    // runs (that is when control_inflation is emitted).
    val controlKeys = Seq("q1_agg", "q7_window", "text_tokens",
      "sample_shard", "etl_row_checksum", "mm_image_dims")
    val controlPos = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.LinkedHashMap[String, Double]]()
    def controlSweep(position: String): Unit =
      if (args.isEmpty) controlKeys.foreach { k =>
        try {
          controlPos.getOrElseUpdate(k,
            scala.collection.mutable.LinkedHashMap[String, Double]())
            .update(position, timedRun(k))
        } catch { case _: Throwable => () } // failure surfaces in passes
      }
    controlSweep("start")
    (1 to 3).foreach { pass =>
      names.foreach { name =>
        if (!errors.contains(name)) try {
          acc.getOrElseUpdate(name,
            scala.collection.mutable.ArrayBuffer[Double]()) +=
            timedRun(name)
        } catch {
          case e: Throwable =>
            errors(name) =
              Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
      }
      if (pass == 2) controlSweep("middle")
    }
    controlSweep("end")
    names.foreach { name =>
      acc.get(name).filter(_.size == 3).foreach { runs =>
        rawRuns(name) = runs.toSeq
        timings(name) = runs.sorted.apply(1)
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    // Control-key inflation (round-13, BASELINE.md protocol): the host
    // is a shared VM whose hypervisor co-tenancy inflates timings
    // UNIFORMLY (~1.4-1.7x observed) while staying invisible in guest
    // loadavg, so raw per-key ratios against the baseline epoch cannot
    // distinguish a real plan regression from environment drift. Six
    // pinned, rarely-touched CONTROL keys spanning the cost spectrum
    // are compared against their BASELINE.json entries and the MEDIAN
    // ratio is emitted as `control_inflation`: a key is a real
    // regression only when measured/baseline materially exceeds
    // 2 x control_inflation. Each control's measurement is the median
    // of its position-resolved sweep samples when available (falling
    // back to its in-pass median on filtered runs). Emitted only when
    // >=3 controls have both a baseline entry and a timing in this run
    // (sf0.1 full-registry runs); null otherwise.
    val baselineQueries: Map[String, Double] =
      try {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = mapper.readTree(Files.readString(Paths.get("BASELINE.json")))
        val qs = root.get("queries")
        if (qs == null) Map.empty
        else {
          val it = qs.fields()
          val b = scala.collection.mutable.Map[String, Double]()
          while (it.hasNext) { val e = it.next(); b(e.getKey) = e.getValue.asDouble() }
          b.toMap
        }
      } catch { case _: Throwable => Map.empty }
    def posMedian(k: String): Option[Double] =
      controlPos.get(k).map(_.values.toSeq).filter(_.nonEmpty)
        .map(s => s.sorted.apply(s.size / 2))
    val controlRatios: Seq[(String, Double)] = controlKeys.flatMap(k =>
      for {
        b <- baselineQueries.get(k)
        m <- posMedian(k).orElse(timings.get(k))
        if b > 0
      } yield k -> m / b)
    val inflation: Option[Double] =
      if (controlRatios.size >= 3)
        Some(controlRatios.map(_._2).sorted.apply(controlRatios.size / 2))
      else None
    val qs = timings.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val rs = rawRuns.map { case (k, v) =>
      s"${q(k)}:${v.mkString("[", ",", "]")}" }.mkString("{", ",", "}")
    val total = timings.values.sum
    val loadAfter = loadavg()
    // "queries" stays median-of-3 (driver contract); "runs" carries the
    // raw per-run timings and "loadavg" the host load bracketing the run,
    // so a contention-polluted artifact is self-diagnosing.
    val cs = controlRatios.map { case (k, v) => s"${q(k)}:$v" }
      .mkString("{", ",", "}")
    // position-resolved control samples: where in the run each control
    // was swept and what it read — the spread IS the co-tenancy
    // diagnosis (uniform drift reads flat; positional bursts spike one
    // column)
    val cp = controlPos.map { case (k, m) =>
      s"${q(k)}:${m.map { case (p, v) => s"${q(p)}:$v" }
        .mkString("{", ",", "}")}"
    }.mkString("{", ",", "}")
    val inf = inflation.map(_.toString).getOrElse("null")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"runs":$rs,"controls":$cs,"controls_positional":$cp,"control_inflation":$inf,"loadavg":{"before":${q(loadBefore)},"after":${q(loadAfter)},"idle_wait_sec":$idleWaitSec},"sf":${q(sfDir)}}"""
    println(json)
    Files.writeString(Paths.get("BENCH.json"), json + "\n")
    // Compact FINAL stdout line (round-16, verdict #5): the full JSON
    // above runs ~20 KB for a 232-key registry, and the driver keeps
    // only a ~2000-char stdout TAIL — round 15's root artifact carried
    // a truncated mid-JSON fragment and parsed to null. The last line
    // is therefore a SELF-CONTAINED summary sized to always fit the
    // tail window: totals, control ratios + inflation, error count,
    // per-family time rollups, and a PARTIAL queries map (the six
    // controls plus the eight slowest keys — the regression-relevant
    // ones), explicitly flagged partial via "queries_complete":false
    // and "n_queries". The complete per-key block lives in BENCH.json
    // and in the full line above; round_bench.sh guards both lines
    // parse and the compact one fits.
    def r3(d: Double): Double = math.rint(d * 1000) / 1000
    val famNames = timings.keys.toSeq.groupBy { k =>
      if (k.startsWith("q") && k.length > 1 && k(1).isDigit) "relational"
      else k.takeWhile(_ != '_')
    }
    val famJson = famNames.toSeq.sortBy(_._1).map { case (f, ks) =>
      s"${q(f)}:${r3(ks.map(timings).sum)}" }.mkString("{", ",", "}")
    val spotlight = (controlKeys ++ timings.toSeq.sortBy(-_._2).take(8)
      .map(_._1)).distinct.filter(timings.contains)
    val spotJson = spotlight.map(k => s"${q(k)}:${r3(timings(k))}")
      .mkString("{", ",", "}")
    val csR = controlRatios.map { case (k, v) => s"${q(k)}:${r3(v)}" }
      .mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","sf":${q(sfDir)},"n_queries":${timings.size},"n_errors":${errors.size},"control_inflation":${inflation.map(i => r3(i).toString).getOrElse("null")},"controls":$csR,"families":$famJson,"queries":$spotJson,"queries_complete":false,"full":"BENCH.json","loadavg":${q(loadAfter)},"idle_wait_sec":$idleWaitSec}"""
    require(compact.length <= 1900,
      s"compact bench line is ${compact.length} chars — exceeds the " +
        "driver's 2000-char stdout tail window; trim the spotlight")
    println(compact)
    spark.stop()
  }
}
