package graft

import graft.operators.Corpus

/** The composed corpus build must drop exactly what its stages promise:
  * low-quality docs, non-canonical exact copies, non-canonical near-dup
  * cluster members — and keep everything else, split-assigned
  * deterministically. */
class CorpusSpec extends GraftSpec {
  import spark.implicits._

  test("pipeline drops low-quality, exact-dup and near-dup docs") {
    val base = (0 until 120).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w119", "zzz") // one word changed
    val other = (0 until 60).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (1L, base, "en", "webA"), // canonical — kept
      (2L, base, "en", "webB"), // exact copy — dropped (keep_id 1)
      (3L, nearDup, "en", "webC"), // near-dup — clustered with 1, dropped
      (4L, "too short", "en", "webD"), // quality gate — dropped
      (5L, other, "de", "webE")) // distinct — kept
      .map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

    val got = Corpus.buildSummary(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // hashBucket(1) = 761 → train; hashBucket(5) = 805 → val
    val want = Set(
      ("en", "train", 1L, 120L),
      ("de", "val", 1L, 60L))
    assert(got == want, s"got $got")
  }

  test("attrition funnel: each stage's census matches the planted " +
      "drops, permilles replay, and the funnel is monotone") {
    val base = (0 until 120).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w119", "zzz")
    val other = (0 until 60).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (1L, base, "en", "webA"), // kept throughout
      (2L, base, "en", "webB"), // exact copy — stage 2 drop
      (3L, nearDup, "en", "webC"), // near-dup — stage 3 drop
      (4L, "too short", "en", "webD"), // quality — stage 1 drop
      (5L, other, "de", "webE")) // kept throughout
      .map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Corpus.attrition(spark, docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      ("0_raw", 5L, 0L, 0L),
      ("1_quality", 4L, 1L, 200L),
      ("2_exact_dedup", 3L, 1L, 250L),
      ("3_near_dedup", 2L, 1L, 333L),
      ("4_decontaminated", 2L, 0L, 0L)), s"got $got")
    // funnel monotone on the fixture corpus, totals conserve
    val face = Corpus.attrition(spark,
      graft.sources.Tables.load(spark, sf, "documents")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    face.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 <= a._2 && b._2 == a._2 - b._3, s"$a -> $b")
      case _ =>
    }
    face.foreach { case (_, n, d, pm) =>
      assert(pm == (if (d == 0) 0L else 1000L * d / (n + d)))
    }
  }

  test("decontamination drops eval members and verbatim leaks") {
    val span = (0 until 20).map(i => s"e$i").mkString(" ")
    val evalDoc = span + " " + (0 until 30).map(i => s"q$i").mkString(" ")
    val leak = (0 until 30).map(i => s"l$i").mkString(" ") + " " + span
    val clean = (0 until 40).map(i => s"c$i").mkString(" ")
    val docs = Seq((50L, evalDoc), (7L, leak), (9L, clean))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = Corpus.dropContaminated(docs).collect().map(_.getLong(0)).toSet
    assert(kept == Set(9L),
      s"eval member and leak must both leave the corpus; kept $kept")
  }

  test("near-dup removal keeps untouched singletons intact") {
    val texts = (0 until 8).map { d =>
      (d + 10L, (0 until 40).map(i => s"t${d}x$i").mkString(" "), "en", "s")
    }
    val docs = texts
      .map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = Corpus.dropNearDups(Corpus.dropExactDups(docs))
    assert(kept.count() == 8) // pairwise-distinct docs all survive
    assert(kept.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
  }

  test("mix drift: zero cells count, L1 replays, an on-mix source " +
      "scores near zero") {
    import spark.implicits._
    // corpus mix: 50/50 en/de. source A mirrors it (drift ~0), source
    // B is all-en (drift = |1000-500| + |0-500| = 1000), source C
    // lacks de entirely the same way but smaller
    val docs = (
      (1 to 10).map(i => (100L + i, "A", if (i <= 5) "en" else "de")) ++
      (1 to 10).map(i => (200L + i, "B", "en")) ++
      (1 to 10).map(i => (300L + i, "C", "de")))
      .toSeq.toDF("doc_id", "source", "lang")
    val got = Corpus.mixDrift(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))).toMap
    // corpus: 15 en / 15 de of 30 -> 500/500 permille
    assert(got("A") == ((10L, 0L, "de", 0L)))
    assert(got("B") == ((10L, 1000L, "de", 500L)))
    assert(got("C") == ((10L, 1000L, "de", 500L)))
    // corpus face: every drift bounded by 2000 permille, n_docs
    // conservation
    val face = SparkEntry.queries("corpus_mix_drift")(spark, sf).collect()
    assert(face.nonEmpty)
    assert(face.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 2000))
    val total = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(face.map(_.getLong(1)).sum == total)
  }
}
