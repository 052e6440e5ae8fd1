package graft

import org.apache.spark.sql.streaming.Trigger
import graft.sources.Tables
import graft.streaming.Streaming

/** Streaming faces must agree with their oracle-gated batch faces. */
class StreamingSpec extends GraftSpec {

  test("streaming window agg equals the batch face (complete mode)") {
    val stream = Streaming.eventsStream(spark, sf)
    val q = Streaming.streamingWindowAgg(stream).writeStream
      .format("memory").queryName("win_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("win_out").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = Streaming.batchWindowAgg(Tables.load(spark, sf, "events"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want)
  }

  test("streaming sliding-window agg equals the batch face (complete mode)") {
    val stream = Streaming.eventsStream(spark, sf)
    val q = Streaming.streamingSlidingAgg(stream).writeStream
      .format("memory").queryName("slide_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("slide_out").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = Streaming.batchSlidingAgg(Tables.load(spark, sf, "events"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want)
  }

  test("streaming dedup removes injected re-deliveries within watermark") {
    val stream = Streaming.eventsStream(spark, sf)
    val q = Streaming.streamingDedup(stream).writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val events = Tables.load(spark, sf, "events")
    val got = spark.table("dedup_out")
    // exactly one copy of every event survives
    assert(got.count() == events.count())
    assert(got.select("event_id").distinct().count() == events.count())
  }

  test("stream-stream interval join matches the batch face") {
    val stream = Streaming.eventsStream(spark, sf)
    val q = Streaming.streamStreamJoin(stream).writeStream
      .format("memory").queryName("ssj_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val got = spark.table("ssj_out").collect().map(key).toSet
    val want = Streaming.batchClickConversions(
      Tables.load(spark, sf, "events")).collect().map(key).toSet
    assert(got.nonEmpty)
    // pairs still inside the watermark horizon at stream end may be
    // unemitted; everything emitted must match batch
    assert(got.subsetOf(want), s"extra pairs: ${(got -- want).take(3)}")
    assert(got.size >= (want.size * 0.9).toInt,
      s"stream emitted ${got.size} of ${want.size} pairs")
  }

  test("stream-static dim join enriches every matching event") {
    val stream = Streaming.eventsStream(spark, sf)
    val customer = Tables.load(spark, sf, "customer")
    val q = Streaming.streamingStaticEnrich(stream, customer).writeStream
      .format("memory").queryName("enrich_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("enrich_out").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    val want = Tables.load(spark, sf, "events")
      .join(customer, org.apache.spark.sql.functions.col("user_id") ===
        org.apache.spark.sql.functions.col("c_custkey"))
      .select("event_id", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want) // stateless join: nothing held back at stream end
    assert(got.nonEmpty)
  }

  test("foreachBatch upsert sink converges to the batch user state") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "upsert")
      .toString
    // split events into 4 files so maxFilesPerTrigger=1 forces 4
    // incremental micro-batches — a single batch would never exercise
    // the read-merge-swap path
    val events = Tables.load(spark, sf, "events")
    events.withColumn("ts", unix_micros(col("ts")) * 1000) // physical ns-long
      .repartition(4)
      .write.mode("overwrite").parquet(s"$root/src")
    val stream = spark.readStream
      .schema(Streaming.eventsPhysicalSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$root/src")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = Streaming.foreachBatchUpsert(spark, stream, s"$root/state")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/chk")
      .start()
    q.awaitTermination(120000)
    val got = spark.read.parquet(s"$root/state")
      .select(col("user_id"), col("n_events"),
        col("last_ts"), col("total_value").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getDouble(3))).toSet
    val want = Streaming.batchUserState(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getDouble(3))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("upsert sink is exactly-once under crash replay: re-delivered " +
      "micro-batches are no-ops and half-completed swaps recover") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory(Paths.get("target"), "replay")
      .toString
    val state = s"$root/state"
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    def batchOf(rows: (Long, Int, Double)*) =
      rows.toSeq.map { case (u, m, v) => (u, ts(m), v) }
        .toDF("user_id", "ts", "value")
    def read() = spark.read.parquet(state)
      .select(col("user_id"), col("n_events"),
        col("total_value").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val b0 = batchOf((1L, 1, 10.0), (2L, 2, 20.0))
    val b1 = batchOf((1L, 3, 5.0))
    Streaming.upsertBatch(spark, b0, 0L, state)
    Streaming.upsertBatch(spark, b1, 1L, state)
    val committed = read()
    assert(committed == Set((1L, 2L, 15.0), (2L, 1L, 20.0)),
      s"converged state: $committed")
    // crash between sink commit and checkpoint commit → Structured
    // Streaming re-delivers the SAME batchId on restart: must be a
    // no-op, not a double-count (this was the round-12 exactly-once
    // note, now pinned)
    Streaming.upsertBatch(spark, b1, 1L, state)
    Streaming.upsertBatch(spark, b0, 0L, state)
    assert(read() == committed, "replayed micro-batch double-counted")
    // swap hole A: crash AFTER the old state moved away, BEFORE the
    // complete .next was promoted — recovery must promote .next and
    // then apply the new batch exactly once
    Files.move(Paths.get(state), Paths.get(s"$state.next"))
    Streaming.upsertBatch(spark, batchOf((2L, 4, 1.0)), 2L, state)
    assert(read() == Set((1L, 2L, 15.0), (2L, 2L, 21.0)),
      s"swap-hole-A recovery: ${read()}")
    // swap hole B: crash BEFORE the swap promoted anything, leaving
    // only .old — recovery must roll back to it; the re-delivered
    // batchId is then skipped off the restored marker
    Files.move(Paths.get(state), Paths.get(s"$state.old"))
    Streaming.upsertBatch(spark, batchOf((2L, 4, 1.0)), 2L, state)
    assert(read() == Set((1L, 2L, 15.0), (2L, 2L, 21.0)),
      s"swap-hole-B recovery: ${read()}")
    // swap hole C (ADVICE r13): crash MID-parquet-write leaves a partial
    // .next with NO _committed_batch marker. Recovery must NOT promote
    // it (its rows never committed — promoting would double-count them
    // when the batch is redelivered with lastCommitted=-1); it must be
    // deleted and .old restored, after which the redelivered batch
    // applies exactly once off the restored marker
    Files.move(Paths.get(state), Paths.get(s"$state.old"))
    val partial = Paths.get(s"$state.next")
    Files.createDirectories(partial)
    Files.write(partial.resolve("part-00000.parquet"),
      Array[Byte](0x50, 0x41, 0x52)) // truncated parquet, no footer
    Streaming.upsertBatch(spark, batchOf((2L, 4, 1.0)), 2L, state)
    assert(!Files.exists(partial), "uncommitted partial .next survived")
    assert(read() == Set((1L, 2L, 15.0), (2L, 2L, 21.0)),
      s"swap-hole-C recovery: ${read()}")
    // and the first-batch variant: no state dir, no .old, only the
    // markerless partial — recovery deletes it and the (re)delivered
    // first batch builds fresh state
    val state2 = s"$root/state2"
    val partial2 = Paths.get(s"$state2.next")
    Files.createDirectories(partial2)
    Files.write(partial2.resolve("part-00000.parquet"),
      Array[Byte](0x50, 0x41, 0x52))
    Streaming.upsertBatch(spark, b0, 0L, state2)
    assert(!Files.exists(partial2), "first-batch partial .next survived")
    val got2 = spark.read.parquet(state2)
      .select(col("user_id"), col("n_events"),
        col("total_value").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got2 == Set((1L, 1L, 10.0), (2L, 1L, 20.0)),
      s"first-batch recovery state: $got2")
  }

  test("upsert sink KILLED mid-stream restarts from its checkpoint and " +
      "converges exactly to the batch face — the production restart " +
      "path, not just the single-lifetime parity") {
    import org.apache.spark.sql.functions._
    import java.nio.file.{Files, Paths}
    val root = Files
      .createTempDirectory(Paths.get("target"), "upsert_restart").toString
    val events = Tables.load(spark, sf, "events")
    events.withColumn("ts", unix_micros(col("ts")) * 1000)
      .repartition(4)
      .write.mode("overwrite").parquet(s"$root/src")
    def stream() = spark.readStream
      .schema(Streaming.eventsPhysicalSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$root/src")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    // lifetime 1: a poisoned wrapper around the SAME sink body kills
    // the query at micro-batch 2 — batches 0-1 are committed to both
    // the sink and the checkpoint, batch 2 is not (the kill -9 moment)
    val q1 = stream().writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (id >= 2) throw new RuntimeException("injected mid-stream kill")
        Streaming.upsertBatch(spark, batch, id, s"$root/state")
    }.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/chk")
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination(120000)
      throw q1.exception.getOrElse(
        fail("query survived the injected kill"))
    }
    // the killed run left PARTIAL state: readable (the atomic swap
    // never exposes a half-written directory) but short of the answer
    val totalEvents = events.count()
    val partialEvents = spark.read.parquet(s"$root/state")
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(partialEvents > 0 && partialEvents < totalEvents,
      s"kill landed at $partialEvents of $totalEvents events")
    // lifetime 2: the UNMODIFIED production sink restarts from the
    // same checkpoint — remaining batches resume (any redelivery is a
    // no-op off the committed-batch marker) and the state converges
    val q2 = Streaming.foreachBatchUpsert(spark, stream(), s"$root/state")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/chk")
      .start()
    q2.awaitTermination(120000)
    val got = spark.read.parquet(s"$root/state")
      .select(col("user_id"), col("n_events"),
        col("last_ts"), col("total_value").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getDouble(3))).toSet
    val want = Streaming.batchUserState(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getDouble(3))).toSet
    assert(got == want, "restarted sink diverged from the batch face")
    assert(got.nonEmpty)
  }

  test("gap-fill carried state survives a checkpoint restart: a stream " +
      "consumed across TWO query lifetimes equals the batch face, " +
      "including fills whose source observation arrived before the stop") {
    import org.apache.spark.sql.functions._
    import java.nio.file.{Files, Paths}
    val root = Files
      .createTempDirectory(Paths.get("target"), "gap_restart").toString
    val events = Tables.load(spark, sf, "events")
    // split by TIME so per-key arrival stays in order across the two
    // lifetimes (the streamingGapFill contract): first half lands
    // before the stop, second half after the restart
    val us = events.select(unix_micros(col("ts")).as("us"))
    val cut = us.stat.approxQuantile("us", Array(0.5), 0.0)(0).toLong
    def phys(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", unix_micros(col("ts")) * 1000).coalesce(1)
    phys(events.filter(unix_micros(col("ts")) <= cut))
      .write.mode("overwrite").parquet(s"$root/src")
    def stream() = spark.readStream
      .schema(Streaming.eventsPhysicalSchema)
      .parquet(s"$root/src")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    // the file sink supports checkpoint recovery (the memory sink does
    // not) — both lifetimes append to one output directory
    def run() = {
      val q = Streaming.streamingGapFill(spark, stream()).writeStream
        .format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/chk")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    run() // lifetime 1: first half only
    val firstHalf = spark.read.parquet(s"$root/out").count()
    assert(firstHalf > 0 && firstHalf < events.count(),
      s"lifetime 1 consumed $firstHalf of ${events.count()} events")
    // new files arrive while the query is DOWN; the restart resumes
    // from the checkpoint (offsets know the old file, state carries
    // each device's last observation)
    phys(events.filter(unix_micros(col("ts")) > cut))
      .write.mode("append").parquet(s"$root/src")
    run() // lifetime 2: the remainder, against restored state
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val got = spark.read.parquet(s"$root/out").collect().map(key).toMap
    val batch = graft.operators.Etl.gapFill(events).collect()
      .map(key).toMap
    assert(got.size == batch.size && got == batch,
      s"stream/batch divergence: ${got.size} vs ${batch.size} rows")
    // the restart is genuinely exercised only if some lifetime-2
    // masked event was filled from a LIFETIME-1 observation: a user
    // whose events after the cut start masked, with an observation
    // before the cut — its fill value must have crossed the restart
    // inside the restored state store
    val raw = events.select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"),
        (col("event_id") % 5 === 0).as("masked")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    val crossing = raw.groupBy(_._2).values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._3, e._1))
      val (p1, p2) = sorted.partition(_._3 <= cut)
      val lastObs = p1.filter(!_._5).lastOption
      p2.takeWhile(_._5).headOption.flatMap(e => lastObs.map(o => (e, o)))
    }
    assert(crossing.nonEmpty,
      "fixture exercised no cross-restart fill — split point degenerate")
    crossing.foreach { case (e, o) =>
      assert(got(e._1) == ((e._2, None, Some(o._4))),
        s"cross-restart fill lost for event ${e._1}: ${got(e._1)}")
    }
  }

  test("sessionization state survives a checkpoint restart: a stream " +
      "consumed across TWO query lifetimes emits only batch sessions, " +
      "including sessions whose events straddle the stop") {
    // flatMapGroupsWithState is a distinct state shape from the upsert
    // sink's committed-batch marker and gap-fill's last-observation row
    // (verdict r16 #8): the restored state carries each user's OPEN
    // session (start/end/count), and a session spanning the restart is
    // correct only if lifetime 2 extends lifetime 1's restored window.
    import org.apache.spark.sql.functions._
    import java.nio.file.{Files, Paths}
    val root = Files
      .createTempDirectory(Paths.get("target"), "sess_restart").toString
    val events = Tables.load(spark, sf, "events")
    def usOf(t: java.sql.Timestamp) =
      t.getTime / 1000 * 1000000 + t.getNanos / 1000
    // split by TIME so per-key arrival order holds across lifetimes
    // (the gap-restart discipline) — and pick the cut INSIDE a known
    // multi-event session that has a successor session, so a session
    // provably straddles the restart (a median cut usually falls in a
    // between-sessions gap and exercises nothing)
    val batchRows = Streaming.batchSessionize(events).collect()
    val sessByUser = batchRows
      .map(r => (r.getLong(0), usOf(r.getTimestamp(3)),
        usOf(r.getTimestamp(4)), r.getLong(2)))
      .groupBy(_._1)
    val splitHost = sessByUser.values.flatMap { ss =>
      val lastEnd = ss.map(_._3).max
      ss.filter(s => s._4 >= 2 && s._3 > s._2 && s._3 < lastEnd)
    }.toSeq.sortBy(s => (s._1, s._2)).headOption
      .getOrElse(fail("fixture has no multi-event non-final session"))
    val cut = splitHost._2 // the host session's FIRST event timestamp
    def phys(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", unix_micros(col("ts")) * 1000).coalesce(1)
    phys(events.filter(unix_micros(col("ts")) <= cut))
      .write.mode("overwrite").parquet(s"$root/src")
    def stream() = spark.readStream
      .schema(Streaming.eventsPhysicalSchema)
      .parquet(s"$root/src")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    def run() = {
      val q = Streaming.sessionizeStream(spark, stream()).writeStream
        .format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/chk")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    run() // lifetime 1: first half; open sessions stay in state
    phys(events.filter(unix_micros(col("ts")) > cut))
      .write.mode("append").parquet(s"$root/src")
    run() // lifetime 2: the remainder, against restored session state
    val got = spark.read.parquet(s"$root/out").collect()
      .map(r => (r.getLong(0), usOf(r.getTimestamp(1)),
        usOf(r.getTimestamp(2)), r.getLong(3))).toSet
    val batch = batchRows
      .map(r => (r.getLong(0), usOf(r.getTimestamp(3)),
        usOf(r.getTimestamp(4)), r.getLong(2))).toSet
    // the same contract the single-lifetime test pins: emissions are a
    // subset of batch sessions, withholding at most each user's final
    // (still-open) session
    assert(got.nonEmpty, "stream emitted no sessions across a restart")
    assert(got.subsetOf(batch),
      s"restarted stream emitted non-batch sessions: ${(got -- batch).take(3)}")
    val users = events.select("user_id").distinct().count()
    assert(got.size >= batch.size - users)
    // the restart is genuinely exercised: the host session's start was
    // restored from lifetime-1 state and its end/count were written by
    // lifetime-2 events — it must be emitted EXACTLY (it has a
    // successor session, so it cannot hide as a legitimately-open one)
    assert(got.contains(splitHost),
      s"session $splitHost spans the restart but was lost or emitted " +
        s"wrong: ${got.filter(_._1 == splitHost._1)}")
  }

  test("CDC-apply aggregation state survives a checkpoint restart: " +
      "two query lifetimes converge to the batch materialization, " +
      "keys whose ops all precede the stop included") {
    // the struct-max aggregation is the remaining distinct state shape
    // (verdict r16 #8): restored state is each key's running
    // (ts, event_id, op, value) maximum — a key silent in lifetime 2
    // appears in the final answer ONLY via the restored aggregate.
    import org.apache.spark.sql.functions._
    import java.nio.file.{Files, Paths}
    val root = Files
      .createTempDirectory(Paths.get("target"), "cdc_restart").toString
    val events = Tables.load(spark, sf, "events")
    // cut BY CONSTRUCTION at the last op of a key that survives the
    // materialization (last op U) and falls silent before the stream
    // ends — that key's final row can only come from the restored
    // aggregate (a median cut leaves every key active in lifetime 2)
    def usOf(t: java.sql.Timestamp) =
      t.getTime / 1000 * 1000000 + t.getNanos / 1000
    val lastOps = Streaming.cdcOps(events).collect()
      .map(r => (r.getLong(0), usOf(r.getTimestamp(1)), r.getLong(2),
        r.getString(3)))
      .groupBy(_._1).view.mapValues(_.maxBy(x => (x._2, x._3))).toMap
    val globalMax = lastOps.values.map(_._2).max
    val cut = lastOps.values.toSeq
      .filter(o => o._4 == "U" && o._2 < globalMax)
      .map(_._2).maxOption
      .getOrElse(fail("fixture has no early-quiet surviving key"))
    def phys(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", unix_micros(col("ts")) * 1000).coalesce(1)
    phys(events.filter(unix_micros(col("ts")) <= cut))
      .write.mode("overwrite").parquet(s"$root/src")
    def stream() = spark.readStream
      .schema(Streaming.eventsPhysicalSchema)
      .parquet(s"$root/src")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    // complete-mode aggregation: the recoverable sink is foreachBatch
    // overwriting the materialization (the file sink is append-only)
    def run() = {
      val q = Streaming.streamingCdcApply(stream()).writeStream
        .outputMode("complete")
        .foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            batch.write.mode("overwrite").parquet(s"$root/state")
        }
        .option("checkpointLocation", s"$root/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    run() // lifetime 1
    val partial = spark.read.parquet(s"$root/state").count()
    phys(events.filter(unix_micros(col("ts")) > cut))
      .write.mode("append").parquet(s"$root/src")
    run() // lifetime 2: resumes against the restored aggregate
    val got = spark.read.parquet(s"$root/state").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getDouble(3))).toSet
    val want = Streaming.batchCdcApply(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getDouble(3))).toSet
    assert(partial > 0, "lifetime 1 materialized nothing")
    assert(got == want,
      s"restarted CDC state diverged: ${(got -- want).take(3)} vs " +
        s"${(want -- got).take(3)}")
    // restart genuinely exercised: the cut-defining key's ops ALL
    // landed before the cut — its final row exists only because
    // lifetime 2 restored lifetime 1's aggregate rather than
    // recomputing from its own (empty) slice of that key
    val quietKeys = lastOps.collect {
      case (k, o) if o._4 == "U" && o._2 <= cut => k
    }.toSet
    val crossing = got.map(_._1) & quietKeys
    assert(crossing.nonEmpty,
      "fixture exercised no restored-only key — split point degenerate")
    assert(quietKeys.subsetOf(got.map(_._1)),
      "a surviving key quiet after the cut was dropped by the restart")
  }

  test("streaming sessionization emits closed sessions matching batch") {
    val stream = Streaming.eventsStream(spark, sf)
    val q = Streaming.sessionizeStream(spark, stream).writeStream
      .format("memory").queryName("sess_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    // batch columns: user_id, session_id, n_events, session_start, session_end
    val batch = Streaming.batchSessionize(Tables.load(spark, sf, "events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(3), r.getTimestamp(4),
        r.getLong(2))).toSet
    // the stream's per-user FINAL session stays open (no timeout fires
    // under AvailableNow) — everything emitted must be a batch session
    assert(got.nonEmpty, "stream emitted no sessions")
    assert(got.subsetOf(batch),
      s"stream emitted sessions absent from batch: ${(got -- batch).take(3)}")
    val users = Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(got.size >= batch.size - users)
  }

  test("streaming LOCF gap fill equals the batch window face exactly") {
    val stream = Streaming.eventsStream(spark, sf)
    val q = Streaming.streamingGapFill(spark, stream).writeStream
      .format("memory").queryName("gap_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val got = spark.table("gap_out").collect().map(key).toMap
    val batch = graft.operators.Etl
      .gapFill(Tables.load(spark, sf, "events")).collect().map(key).toMap
    assert(got.nonEmpty && got == batch,
      s"stream/batch divergence on ${got.size} vs ${batch.size} rows")
    // the repair is exercised: some masked rows carry a filled value
    assert(got.values.exists(v => v._2.isEmpty && v._3.nonEmpty))
  }

  test("native session windows: closed streaming sessions match batch") {
    val stream = Streaming.eventsStream(spark, sf)
    val q = Streaming.streamingSessionWindow(stream).writeStream
      .format("memory").queryName("sw_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("sw_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    val batch = Streaming
      .batchSessionWindow(Tables.load(spark, sf, "events")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    // append mode emits only sessions the final watermark closed —
    // every emission must be a batch session, and at most one open
    // session per user may be withheld
    assert(got.nonEmpty, "stream emitted no sessions")
    assert(got.subsetOf(batch),
      s"stream emitted sessions absent from batch: ${(got -- batch).take(3)}")
    val users = Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(got.size >= batch.size - users)
  }

  test("rate alert: a planted spike alerts after a full trailing " +
    "window; warmup buckets stay null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // hourly counts cycle 4/5/6 for 30 h, then a 40-event spike
    val rows = (0 to 30).flatMap { h =>
      val c = if (h == 30) 40 else 4 + h % 3
      (0 until c).map(j => (h.toLong * 3600 + j * 10, "a"))
    }
    val ev = rows.toDF("secs", "event_type")
      .withColumn("ts", timestamp_seconds(col("secs")))
    val out = Streaming.batchRateAlert(ev).collect()
      .map(r => (r.getTimestamp(0).getTime / 3600000, r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getBoolean(4)))
    assert(out.length == 31)
    // the first 24 buckets lack a full trailing window: z null, quiet
    out.filter(_._1 < 24).foreach { case (h, _, z, a) =>
      assert(z.isEmpty && !a, s"warmup bucket $h scored")
    }
    // steady-state buckets score but stay under threshold
    out.filter(t => t._1 >= 24 && t._1 < 30).foreach { case (h, _, z, a) =>
      assert(z.nonEmpty && !a, s"steady bucket $h: $z alert=$a")
    }
    // the spike bucket alerts hard: mean 5, sd sqrt(16/23) → z ≈ 42
    val spike = out.find(_._1 == 30).get
    assert(spike._2 == 40 && spike._4 && spike._3.exists(_ > 3),
      s"spike: $spike")
  }

  test("late audit: the distributed chunked prefix scan equals the " +
    "naive global running-max watermark") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val events = Tables.load(spark, sf, "events")
    val got = Streaming.batchLateAudit(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // naive reference: ONE global window over arrival order — the
    // definition the chunked scan must reproduce exactly
    val d = Streaming.LateDelayMs
    val naive = events.select(
        col("event_id"), col("event_type"),
        (unix_millis(col("ts")) -
          ((col("event_id") % 1000003L) * 2654435761L % 3600L) * 1000L)
          .as("tms"))
      .withColumn("wm", max(col("tms")).over(Window.orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("tms") < col("wm") - d, 1)).as("n_late"),
        sum(when(col("tms") < col("wm") - d, col("wm") - d - col("tms"))
          .otherwise(0L)).as("late_ms_sum"),
        max(when(col("tms") < col("wm") - d, col("wm") - d - col("tms"))
          .otherwise(0L)).as("late_ms_max"))
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === naive)
    // the jittered fixture actually exercises lateness
    assert(got.map(_._3).sum > 0, "no late rows — audit is vacuous")
    // chunk boundaries are where the decomposition can break: rows 1000
    // and 2000 sit at the first positions of chunks 1 and 2
    assert(got.map(_._2).sum === events.count())
  }

  test("streaming CDC apply: last-writer-wins state equals the batch " +
      "materialization, tombstones retract") {
    val stream = Streaming.eventsStream(spark, sf)
    val q = Streaming.streamingCdcApply(stream).writeStream
      .format("memory").queryName("cdc_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("cdc_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getDouble(3))).toSet
    val want = Streaming.batchCdcApply(Tables.load(spark, sf, "events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getDouble(3))).toSet
    assert(got == want)
    // tombstones really retract: users whose LAST op is a delete are
    // absent from the materialization but present in the raw stream
    val lastOps = Streaming.cdcOps(Tables.load(spark, sf, "events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3)))
      .groupBy(_._1).view
      // order on the FULL timestamp resolution (micros), not getTime's
      // milliseconds — batchCdcApply orders by the complete ts, and a
      // future sub-millisecond fixture must not diverge the expectation
      .mapValues(_.maxBy(x =>
        (x._2.getTime / 1000 * 1000000 + x._2.getNanos / 1000,
          x._3))._4).toMap
    val deleted = lastOps.filter(_._2 == "D").keySet
    assert(deleted.nonEmpty, "fixture has no trailing tombstones")
    val gotKeys = got.map(_._1)
    assert(deleted.forall(k => !gotKeys.contains(k)))
    assert(gotKeys == lastOps.filter(_._2 == "U").keySet)
  }

  test("streaming top-k: watermarked pre-agg counts ranked at read " +
      "time equal the batch leaderboard") {
    val stream = Streaming.eventsStream(spark, sf)
    val q = Streaming.streamingTopUserCounts(stream).writeStream
      .format("memory").queryName("topk_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = Streaming.rankTopUsers(spark.table("topk_out")).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val want = Streaming.batchTopUsers(Tables.load(spark, sf, "events"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want)
    // every window carries at most 3 rows with dense ranks from 1
    got.groupBy(_._1).foreach { case (ws, rows) =>
      val ranks = rows.map(_._4).toSeq.sorted
      assert(ranks == (1L to ranks.length).toSeq && ranks.length <= 3,
        s"window $ws ranks $ranks")
    }
  }

  test("cep pairs: adjacency, the 10-minute bound, and intervening " +
      "events replay on a planted sequence; the streaming state face " +
      "matches the batch census on the fixture") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def t(min: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-05-01 10:00:00").getTime +
        min * 60000L)
    val planted = Seq(
      // user 1: view then click 5 min later -> match
      (1L, t(0), 1L, "view"), (2L, t(5), 1L, "click"),
      // user 2: gap 20 min > bound -> no match
      (3L, t(0), 2L, "view"), (4L, t(20), 2L, "click"),
      // user 3: view view click -> ONE match (adjacent view wins)
      (5L, t(0), 3L, "view"), (6L, t(2), 3L, "view"),
      (7L, t(4), 3L, "click"),
      // user 4: intervening purchase breaks adjacency -> no match
      (8L, t(0), 4L, "view"), (9L, t(1), 4L, "purchase"),
      (10L, t(2), 4L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Streaming.batchCepPairs(planted).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        r.getTimestamp(2), r.getTimestamp(3)))).toMap
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L) == ((1L, t(0), t(5))))
    assert(got(3L) == ((1L, t(2), t(4))), "match must use the ADJACENT view")
    // streaming parity on the fixture: aggregate raw match pairs to
    // the batch census
    val stream = Streaming.eventsStream(spark, sf)
    val q = Streaming.streamingCepPairs(spark, stream).writeStream
      .format("memory").queryName("cep_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val sgot = spark.table("cep_out")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), min(col("view_ts")).as("fv"),
        max(col("click_ts")).as("lc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getTimestamp(3))).toSet
    val want = Streaming.batchCepPairs(
        Tables.load(spark, sf, "events")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getTimestamp(3))).toSet
    assert(sgot == want)
  }

  test("streaming approx distinct: watermarked per-window HLL equals " +
      "the batch sketch, and the exact-vs-sketch gate face is green") {
    import org.apache.spark.sql.functions._
    val stream = Streaming.eventsStream(spark, sf)
    val q = Streaming.streamingDistinctUsers(stream).writeStream
      .format("memory").queryName("adist_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("adist_out").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    // same sketch, same hash, same estimate as the batch computation
    val want = Tables.load(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
      .select(col("window.start"), col("event_type"), col("n_approx"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    // the registered gate face: every window inside the sketch bound
    val face = Streaming.batchDistinctUsers(
      Tables.load(spark, sf, "events")).collect()
    assert(face.nonEmpty && face.forall(_.getBoolean(3)))
  }
}
