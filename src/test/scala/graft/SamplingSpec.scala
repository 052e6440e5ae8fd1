package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends GraftSpec {
  import spark.implicits._

  private val docs = (0L until 2000L)
    .map(i => (i, Seq("en", "de", "fr", "es", "zh")((i % 5).toInt), s"src${i % 3}"))
    .toDF("doc_id", "lang", "source")

  test("hash bucket is deterministic and spreads uniformly") {
    val buckets = docs.select(Sampling.hashBucket(col("doc_id")).as("b"))
      .groupBy("b").count().collect()
    assert(buckets.forall { r =>
      val b = r.getLong(0); b >= 0 && b < Sampling.Buckets
    })
    // 2000 sequential ids over 1000 buckets: exactly 2 per bucket for a
    // multiplier coprime to the bucket count
    assert(buckets.length == 1000 && buckets.forall(_.getLong(1) == 2))
  }

  test("stratified sample respects per-language permille rates") {
    val sampled = Sampling.stratifiedSample(docs)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 400 docs per language; expected keeps = rate ‰ × 400 ± hash noise
    val rates = Sampling.DefaultRates.toMap
    for ((lang, permille) <- rates) {
      val expected = 400.0 * permille / 1000
      val got = byLang.getOrElse(lang, 0L).toDouble
      assert(math.abs(got - expected) <= 40,
        s"$lang: got $got, expected ~$expected")
    }
    // re-run is bit-identical (deterministic, no rand())
    assert(sampled.collect().toSeq ==
      Sampling.stratifiedSample(docs).collect().toSeq)
  }

  test("split counts cover every doc and honor 80/10/10") {
    val counts = Sampling.splitCounts(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts.values.sum == 2000)
    val bySplit = counts.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    assert(math.abs(bySplit("train") - 1600.0) <= 80)
    assert(math.abs(bySplit("val") - 200.0) <= 40)
    assert(math.abs(bySplit("test") - 200.0) <= 40)
  }

  test("per-stratum top-N is exact-count, deterministic and rank-limited") {
    val got = Sampling.topKPerStratum(docs, k = 7).collect()
    val byLang = got.groupBy(_.getString(1))
    assert(byLang.size == 5 && byLang.values.forall(_.length == 7))
    // the plan keeps only N rows per partition BEFORE the exchange
    val plan = Sampling.topKPerStratum(docs, k = 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("token budget keeps the maximal prefix per language") {
    val wdocs = docs.withColumn("text",
      concat_ws(" ", typedLit((1 to 40).map(i => s"w$i"))))
    val got = Sampling.tokenBudget(wdocs, budgetTokens = 200L).collect()
    // 40 tokens/doc, budget 200 → exactly 5 docs per language
    val byLang = got.groupBy(_.getString(1))
    assert(byLang.size == 5 && byLang.values.forall(_.length == 5))
    got.foreach(r => assert(r.getLong(3) <= 200L))
  }

  test("shard assignment is a deterministic permutation covering all docs") {
    val got = Sampling.shardAssign(docs).collect()
    assert(got.length == 2000)
    // every doc appears once, shards are in range, and the shard split
    // is roughly uniform (2000/16 = 125 ± noise)
    assert(got.map(_.getLong(0)).distinct.length == 2000)
    val byShard = got.groupBy(_.getInt(2)).view.mapValues(_.length).toMap
    assert(byShard.keys.forall(s => s >= 0 && s < Sampling.Shards))
    assert(byShard.values.forall(n => math.abs(n - 125) <= 50),
      byShard.toString)
    // reruns are bit-identical — the property that makes training
    // order resumable
    assert(got.toSeq == Sampling.shardAssign(docs).collect().toSeq)
  }

  test("source cap keeps exactly `cap` longest docs per source") {
    val wdocs = docs.withColumn("n_chars", col("doc_id") % 97)
    val got = Sampling.sourceCap(wdocs, cap = 10).collect()
    val bySource = got.groupBy(_.getString(1))
    assert(bySource.size == 3 && bySource.values.forall(_.length == 10))
    assert(got.forall(_.getLong(2) <= 10))
    // rank-limited before the exchange, like topKPerStratum
    val plan = Sampling.sourceCap(wdocs, cap = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("temperature mix: weights normalize, α interpolates between " +
    "proportional and uniform, flattening favors small sources") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "big", 900L), (2L, "big", 900L), (3L, "big", 900L),
      (4L, "mid", 600L), (5L, "small", 100L))
      .toDF("doc_id", "source", "n_chars")
    def mix(alpha: Double) =
      Sampling.temperatureMix(fixture, alpha, budget = 1000)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val prop = mix(1.0); val flat = mix(0.0); val temp = mix(0.7)
    Seq(prop, flat, temp).foreach { m =>
      assert(math.abs(m.values.sum - 1.0) < 1e-5, s"not normalized: $m")
    }
    // α=1: exact corpus shares (2700/3400, 600/3400, 100/3400)
    assert(math.abs(prop("big") - 2700.0 / 3400) < 1e-6)
    assert(math.abs(prop("small") - 100.0 / 3400) < 1e-6)
    // α=0: uniform over sources
    assert(flat.values.forall(w => math.abs(w - 1.0 / 3) < 1e-6))
    // 0<α<1: strictly between — small source gains, big loses
    assert(temp("small") > prop("small") && temp("small") < flat("small"))
    assert(temp("big") < prop("big") && temp("big") > flat("big"))
    // targets follow the weights on the real corpus
    val real = Sampling.temperatureMix(
      graft.sources.Tables.load(spark, sf, "documents")).collect()
    assert(real.map(_.getLong(3)).sum > 0)
    real.foreach(r => assert(
      math.abs(r.getLong(3) - r.getDouble(2) * 100000) <= 0.5 + 1e-6))
  }

  test("mixture solver: exact integer solve, no source oversampled, " +
    "binding source taken (nearly) whole") {
    import spark.implicits._
    // 3 sources, token masses chosen so src1 (weight 5) binds:
    // toks/weight = 4000/8=500 (src0), 1000/5=200 (src1), 9000/1=9000
    val fixture = (0L until 140L).map { i =>
      val (src, nTok) =
        if (i < 20) ("src0", 200) // 4000 tokens
        else if (i < 40) ("src1", 50) // 1000 tokens
        else ("src9", 90) // 9000 tokens
      (i, src, Seq.fill(nTok)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val out = Sampling.mixtureRates(fixture).collect()
      .map(r => r.getString(0) -> r).toMap
    val w = Map("src0" -> 8L, "src1" -> 5L, "src9" -> 1L)
    val toks = Map("src0" -> 4000L, "src1" -> 1000L, "src9" -> 9000L)
    val wTotal = w.values.sum // 14
    val tMax = w.keys.map(s => toks(s) * wTotal / w(s)).min // 2800 via src1
    w.keys.foreach { s =>
      val r = out(s)
      assert(r.getLong(2) === toks(s), s"toks $s")
      assert(r.getLong(3) === w(s), s"weight $s")
      val permille = 1000L.min(1000L * tMax * w(s) / (wTotal * toks(s)))
      assert(r.getLong(4) === permille, s"permille $s")
      // floored permille never oversamples past the target share
      assert(permille * toks(s) <= 1000L * tMax * w(s) / wTotal + 1000L)
    }
    // the binding source's rate is ~1000‰ (floor can shave a point)
    assert(out("src1").getLong(4) >= 995L)
    // realized kept counts respect the rate on the hash sampler
    w.keys.foreach { s =>
      val r = out(s)
      assert(r.getLong(5) <= r.getLong(1), s"kept>docs $s")
      if (r.getLong(4) == 1000L) assert(r.getLong(5) === r.getLong(1))
    }
  }

  test("interleave: closed-form positions equal the naive global order " +
      "on uneven sources, and rounds rotate sources") {
    // a:5 docs, b:2, c:3 — b leaves the rotation after round 2,
    // c after round 3
    val df = Seq(
      (10L, "a"), (11L, "a"), (12L, "a"), (13L, "a"), (14L, "a"),
      (20L, "b"), (21L, "b"),
      (30L, "c"), (31L, "c"), (32L, "c")).toDF("doc_id", "source")
    val got = Sampling.interleave(df).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // naive definition replayed on the driver
    val expected = got.map(t => (t._3, t._2, t._1)).sorted
      .zipWithIndex.map { case ((r, s, id), i) => (id, s, r, i + 1L) }
      .sortBy(_._4)
    assert(got.toSeq == expected.toSeq)
    // all 10 positions distinct and dense
    assert(got.map(_._4).sorted.toSeq == (1L to 10L))
    // round 1 serves one doc of each source in source order
    assert(got.sortBy(_._4).take(3).map(t => (t._2, t._1)).toSeq ==
      Seq(("a", 10L), ("b", 20L), ("c", 30L)))
    // after b and c exhaust, the tail is all a
    assert(got.sortBy(_._4).drop(8).forall(_._2 == "a"))
  }

  test("shard manifest: chunked prefix scan equals the naive per-type " +
      "running cut, never splits an item, certifies overflow bound") {
    import graft.operators.Multimodal
    // doc_ids straddle the ShardChunk=100 boundary so the cross-chunk
    // prefix hand-off is exercised; one oversized item (25 > budget)
    val sizes = Seq(95L -> 6L, 96L -> 6L, 97L -> 6L, 98L -> 25L,
      99L -> 3L, 100L -> 4L, 101L -> 4L, 102L -> 9L, 103L -> 2L)
    val media = sizes.map { case (id, n) =>
      (id, if (id % 2 == 0) "image" else "audio", n)
    }.toDF("doc_id", "media_type", "n_bytes")
    val got = Multimodal.shardManifest(media, shardBytes = 10L).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6)))).toMap
    // naive replay on the driver: per-type running start, cut every 10
    val expected = sizes.map { case (id, n) =>
      (id, if (id % 2 == 0) "image" else "audio", n)
    }.groupBy(_._2).flatMap { case (mt, items) =>
      val sorted = items.sortBy(_._1)
      val starts = sorted.map(_._3).scanLeft(0L)(_ + _).init
      sorted.zip(starts).map { case ((id, _, n), st) => (mt, st / 10, id, n) }
    }.groupBy(t => (t._1, t._2)).map { case (k, rows) =>
      k -> ((rows.size.toLong, rows.map(_._4).sum, rows.map(_._3).min,
        rows.map(_._3).max, rows.map(_._4).sum <= 9 + rows.map(_._4).max))
    }
    assert(got == expected, s"got $got\nexpected $expected")
    // every item appears in exactly one shard
    assert(got.values.map(_._1).sum == sizes.size)
    // the certificate holds on every emitted shard
    assert(got.values.forall(_._5))
  }

  test("sampling plans are shuffle-free scans (filter only)") {
    val plan = Sampling.stratifiedSample(docs)
      .queryExecution.executedPlan.toString
    // no hash shuffle anywhere — the only exchange is the final
    // presentation sort's range partitioning
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("curriculum: stages mirror the ppl terciles, positions are " +
      "dense per (stage, shard), order follows the hash") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val got = Sampling.curriculum(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val buckets = graft.operators.TextAnalysis.pplBucket(docs).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val stageOf = Map("head" -> 1L, "middle" -> 2L, "tail" -> 3L)
    got.foreach { case (d, st, _, _) =>
      assert(st == stageOf(buckets(d)), s"doc $d stage $st")
    }
    def key(d: Long) = d % 1000003L * 2654435761L % 1000000007L
    got.groupBy(r => (r._2, r._3)).foreach { case ((st, sh), rows) =>
      val ps = rows.map(_._4).sorted.toSeq
      assert(ps == (1L to ps.length).toSeq, s"($st,$sh) positions $ps")
      val byPos = rows.sortBy(_._4).map(r => (key(r._1), r._1)).toSeq
      assert(byPos == byPos.sorted, s"($st,$sh) not in hash order")
      rows.foreach(r => assert(key(r._1) % 8 == sh))
    }
  }

  test("scene segments: cuts fire exactly at the byte-wrap boundary " +
      "and match a driver replay of the planted arithmetic") {
    import graft.operators.Multimodal
    val docs = (0L until 40L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = Multimodal.sceneSegments(Multimodal.videoTable(docs))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // driver replay: first_byte = 97 + (id+f) % 26, cut when |diff|>10
    val want = (0L until 40L).flatMap { id =>
      val n = (4 + id % 4).toInt
      val fb = (0 until n).map(f => 97 + ((id + f) % 26).toInt)
      val segs = fb.indices.map { i =>
        fb.take(i + 1).sliding(2).count {
          case Seq(a, b) => math.abs(b - a) > 10; case _ => false }
      }
      segs.distinct.map { s =>
        val frames = segs.zipWithIndex.filter(_._1 == s).map(_._2)
        (id, s.toLong, frames.min, frames.length.toLong)
      }
    }
    assert(got.sorted.toSeq == want.sorted.toSeq)
    // the wrap actually produces multi-segment docs in this range
    assert(got.groupBy(_._1).exists(_._2.length > 1))
    // segment ids are dense from 0 and frames partition each doc
    got.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.map(_._2).sorted.toSeq ==
        (0L until rows.length.toLong).toSeq)
      assert(rows.map(_._4).sum == 4 + id % 4)
    }
  }

  test("epoch plan: targets split the 3x budget by weight, epochs and " +
      "partial pass close each target, over-repeat flags fire") {
    import graft.operators.Sampling
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val got = Sampling.epochPlan(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getBoolean(8)))
    val totalToks = got.map(_._3).sum
    val wTotal = got.map(_._4).sum
    val budget = totalToks * Sampling.EpochBudgetX
    got.foreach { case (src, _, toks, w, target, fe, pm, planned, over) =>
      assert(target == budget * w / wTotal, s"$src target")
      assert(fe == target / toks, s"$src epochs")
      assert(pm == 1000L * (target - fe * toks) / toks, s"$src permille")
      assert(over == (fe >= Sampling.EpochCap), s"$src flag")
      // the hash-kept partial pass lands within ~15% of the remainder
      // (doc-granularity + hash noise on a 25-doc source)
      val err = math.abs(planned - target).toDouble / target
      assert(err < 0.15, s"$src planned $planned vs target $target")
    }
    // the weighted sources repeat, some uniform source does not
    assert(got.exists(_._9) && got.exists(!_._9))
    // planned volume reaches the budget within the same tolerance
    val plannedTotal = got.map(_._8).sum.toDouble
    assert(math.abs(plannedTotal - budget) / budget < 0.05)
  }

  test("aspect buckets: nearest-ladder assignment with min-ratio tie " +
      "break, contiguous size-16 batches per bucket") {
    import graft.operators.Multimodal
    val docs = (0L until 120L).map(i => (i, s"doc $i text"))
      .toDF("doc_id", "text")
    val got = Multimodal.aspectBuckets(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // driver replay of the closed-form dims + ladder argmin
    val ladder = Multimodal.AspectBuckets
    got.foreach { case (id, w, h, ar, bk, _) =>
      assert(w == 160 + id % 1280 && h == 90 + id % 720)
      assert(ar == 1000L * w / h)
      val want = ladder.minBy(b => (math.abs(ar - b), b))
      assert(bk == want.toLong, s"doc $id: bucket $bk, want $want")
    }
    // per bucket: batch ids start at 0, are contiguous in doc order,
    // and every batch except the last holds exactly AspectBatchSize
    got.groupBy(_._5).foreach { case (bk, rows) =>
      val ordered = rows.sortBy(_._1).map(_._6)
      val expected = ordered.indices
        .map(i => (i / Multimodal.AspectBatchSize).toLong)
      assert(ordered.toSeq == expected,
        s"bucket $bk batch ids $ordered")
    }
  }

  test("sample_reservoir: bottom-k by the fixed permutation, stable " +
      "under repartitioning") {
    val corpus = graft.sources.Tables.load(spark, sf, "documents")
    val ids = corpus.select(col("doc_id")).collect().map(_.getLong(0))
    val want = ids
      .map(id => (id % 1000000007L * 2654435761L % 1000000007L, id))
      .sorted.take(200).map(_._2).sorted.toSeq
    val got = Sampling.reservoirSample(corpus).collect()
      .map(_.getLong(0)).toSeq
    assert(got == want)
    // determinism across physical layouts: the sample is a pure
    // function of the data, not of partitioning
    val re = Sampling.reservoirSample(corpus.repartition(13)).collect()
      .map(_.getLong(0)).toSeq
    assert(re == want)
  }

  test("group split: every group lands in exactly one fold, the census " +
      "conserves rows and groups, and the fold replays from the hash") {
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id")).collect().map(_.getLong(0))
    def fold(u: Long): String = {
      val b = u % 1000003L * 2654435761L % 1000L
      if (b < 800) "train" else if (b < 900) "val" else "test"
    }
    val got = Sampling.groupSplit(
        graft.sources.Tables.load(spark, sf, "events")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // brute replay of both census levels
    val byFold = ev.groupBy(fold)
    byFold.foreach { case (f, rows) =>
      val (g, n) = got(f)
      assert(g == rows.distinct.length && n == rows.length, s"fold $f")
    }
    // conservation: all rows, all groups, no fold invented
    assert(got.keySet == byFold.keySet)
    assert(got.values.map(_._2).sum == ev.length)
    assert(got.values.map(_._1).sum == ev.distinct.length)
    // planted: one multi-row group stays whole — its 5 rows all land
    // in ITS fold's census (the property a row-hash split violates)
    val planted = ((1 to 5).map(i => (i.toLong * 100, 7L)) ++
      Seq((900L, 3L))).toDF("event_id", "user_id")
    val p = Sampling.groupSplit(planted).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(p(fold(7L))._2 >= 5, "multi-row group split across folds")
    assert(p.values.map(_._1).sum == 2 && p.values.map(_._2).sum == 6)
  }

  test("weighted reservoir: integer E-S priorities replay, the sample " +
      "is layout-independent, and weight monotonicity holds per hash") {
    val corpus = graft.sources.Tables.load(spark, sf, "documents")
    val rows = corpus.select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val p = 1000000007L
    val lnP = math.floor(math.log(p.toDouble) * 1e6).toLong
    def key(id: Long, w: Long): Long = {
      val h = id % p * 2654435761L % (p - 1) + 1
      (lnP - math.floor(math.log(h.toDouble) * 1e6).toLong) * 1000000L / w
    }
    val want = rows.map { case (id, w) => (key(id, w), id) }
      .sorted.take(30).map(_._2).sorted.toSeq
    val got = Sampling.weightedSample(corpus, k = 30).collect()
      .map(_.getLong(0)).toSeq
    assert(got == want)
    // pure function of the data, not of partitioning
    val re = Sampling.weightedSample(corpus.repartition(13), k = 30)
      .collect().map(_.getLong(0)).toSeq
    assert(re == want)
    // per-row monotonicity: for a FIXED hash the priority falls as the
    // weight grows (heavier docs sample first) — the E-S property the
    // integer formulation must preserve through the div
    val ks = Sampling.weightedSample(corpus, k = 30).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    ks.foreach { case (id, w, kfp) => assert(kfp == key(id, w)) }
    rows.take(50).foreach { case (id, w) =>
      assert(key(id, w * 2) <= key(id, w), s"doc $id priority not monotone")
    }
  }

  test("importance selection: target-vocabulary docs keep, off-target " +
      "docs drop, and the fixed-point scores replay from raw counts") {
    // target slice ('en') speaks aa, the rest speak bb; one mixed doc
    val crafted = Seq(
      (0L, "en", "aa aa"), (1L, "en", "aa aa"),
      (2L, "de", "bb bb"), (3L, "de", "bb bb"),
      (4L, "fr", "aa bb")).toDF("doc_id", "lang", "text")
    val h = Sampling.importanceWeight(crafted).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(h(0L) && h(1L), "target-vocab docs must keep")
    assert(!h(2L) && !h(3L), "off-target docs must drop")
    // full driver replay over the fixture corpus
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.flatMap { case (id, lang, t) =>
      t.split(" ", -1).map(w => (id, lang, w))
    }
    val cAll = toks.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val cT = toks.filter(_._2 == "en").groupBy(_._3).view
      .mapValues(_.length.toLong).toMap
    val nAll = toks.length.toLong
    val nT = toks.count(_._2 == "en").toLong
    val v = cAll.size.toLong
    val shift = math.floor(math.log((nAll + v).toDouble) * 1e6).toLong -
      math.floor(math.log((nT + v).toDouble) * 1e6).toLong
    def fp(c: Long): Long = math.floor(math.log((c + 1).toDouble) * 1e6)
      .toLong
    val want = toks.groupBy(_._1).map { case (id, ws) =>
      val ratio = ws.map(w =>
        fp(cT.getOrElse(w._3, 0L)) - fp(cAll(w._3))).sum
      id -> ((ws.length.toLong, ratio + ws.length * shift))
    }
    val got = Sampling.importanceWeight(
        graft.sources.Tables.load(spark, sf, "documents")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, (n, imp)) =>
      val (gn, gimp, gkeep) = got(id)
      assert(gn == n && gimp == imp && gkeep == (imp > 0), s"doc $id")
    }
  }
}
