#!/bin/bash
# Per-round bench loop (BASELINE.md protocol): one idle-gated
# full-registry run at sf0.1, then one idle-gated SCALE run at sf1
# over the scale-sensitive key set — so scale regressions are caught
# every round, not one-shot. Artifacts land in bench_records/<round>/.
#
# Usage: scripts/round_bench.sh r10
# The sf1 dataset is synthesized on demand (scripts/gen_sf1.py) until
# the driver ships a real one.
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND=${1:?usage: round_bench.sh rN}
OUT=bench_records/$ROUND
mkdir -p "$OUT"
CP="/opt/spark/jars/*:target/scala-2.13/classes"

# Scale-sensitive key set (round 10): the round-9 27-key set, PLUS the
# streaming + ETL-fact families (events is the largest table and its
# consumers were not scale-validated before round 10), PLUS the ANN
# serve splits and the auto-bits LSH key.
SF1_KEYS=(
  # round-9 set
  dedup_bloom dedup_cluster dedup_contain dedup_embedding dedup_exact
  dedup_incremental dedup_incremental_emb dedup_incremental_near
  dedup_minhash dedup_ngram_jaccard dedup_normalized dedup_segments
  dedup_semantic dedup_simhash emb_pca_power emb_pq etl_bucketed_join
  knn_brute knn_ivf knn_ivfpq knn_pq_adc pipeline_corpus
  q19_salted_join q20_skew_agg q26_dpp text_bm25 text_winnow_overlap
  # streaming family (batch faces over the 10x events table)
  stream_window_agg stream_sessionize stream_session_window
  stream_sliding_agg stream_stream_join stream_dedup stream_static_join
  stream_upsert_sink
  # ETL fact family
  etl_partitioned_write etl_compact
  # event-table relational keys
  q22_latest_by_key q23_range_window q29_sessionize q30_funnel
  q31_retention
  # round-10 additions
  knn_pq_serve knn_ivfpq_serve dedup_embedding_lsh
  text_ppl_bucket sample_mixture stream_late_audit
  # round-10 second-wave operators (scale-sensitive: gram shuffles,
  # iterative joins, corpus-wide counts, packed-code scans)
  dedup_substring graph_pagerank text_collocation knn_hamming
  emb_bitpack mm_shard_pack sample_interleave
  # round-10 third-wave operators
  graph_triangles mm_phash_dedup text_tfidf_keywords emb_knn_graph
  etl_variant_extract q35_approx_topk
  emb_standardize mm_resize_thumb mm_audio_rms q36_recursive_cte
  q37_lateral_topn
  # round-10 fourth-wave operators (gap windows, reshape, projections,
  # Lloyd iterations, fused retrieval, cube expand, z-order, BFS joins,
  # BMP decode, LM counts, cluster selection, recall audit)
  etl_gapfill q38_unpivot emb_rand_proj emb_kmeans hybrid_rrf q39_cube
  etl_zorder graph_bfs mm_image_hist text_readability etl_dq_audit
  dedup_keep_best text_bigram_logprob q40_date_spine stream_gapfill
  emb_recall_audit
  # round-10 late-session keys that had no bench rows (round-11 advice
  # item 4) + round-11 additions (CC fixpoint, link prediction)
  emb_mmr etl_k_anon graph_cc q41_kmv_distinct q42_mv_rewrite
  sample_curriculum graph_link_pred
  # round-11 new operators (sketch set algebra, cumulative distinct,
  # AUC/calibration, group split, Heaps growth, PQ distortion, hard
  # negatives, k-core, importance selection, mutual kNN, code detect,
  # inferred dim, image entropy, freshness, windowed HLL)
  q56_kmv_setops q57_cum_distinct text_quality_auc text_calibration
  sample_group_split sample_importance text_heaps emb_pq_distortion
  emb_hard_negatives emb_mutual_knn graph_kcore text_code_detect
  etl_inferred_dim mm_image_entropy etl_freshness stream_approx_distinct
  text_ngram_novelty stream_cep_pairs sample_weighted emb_cell_purity
  mm_audio_snr corpus_attrition
  # round-12 additions (fuzzy decontamination + digest-censused
  # boilerplate join the gram family; the catalog load, the resumed
  # DAG and the star-MV serve are new keys)
  dedup_contain_near dedup_boilerplate etl_catalog_load etl_dag_resume
  q58_mv_star
  # round-13 addition: the partition-granular COW merge
  etl_merge_cow
  # round-14 additions: label-prop + integer modularity audit; the
  # k-round farthest-point coreset traversal
  graph_modularity emb_kcenter
  # round-15 addition: the persisted-LSH-store serve face
  dedup_incr_near_serve
  # round-16 addition: the persisted pHash store serve face
  mm_phash_serve
  # round-17 additions: duplicated-span removal and span-level
  # benchmark decontamination (gram census/membership + islands +
  # reassembly — scale-sensitive on all stages)
  dedup_span_removal dedup_decontam_spans
)

# sf3 growth-curve set (round 14, verdict #4): the superlinear-RISK
# families — LSH/banded dedup, ANN build faces, the stream-stream
# interval join, the iterative graph family — plus dedup_embedding,
# which is quadratic BY DESIGN (the exact verification face; its
# alpha~2 row demonstrates the growth table flags real superlinearity
# while the production face dedup_embedding_lsh stays ~linear).
# A third scale point turns the sf1/sf0.1 ratio into a measured
# growth EXPONENT (scripts/growth_table.py): alpha = ln(t3/t1)/ln(3).
# Membership rule (round 15, verdict #8): every key whose sf1/sf0.1
# ratio beta >= 4x gets a marginal exponent — an unmeasured beta>=4
# tail is exactly the blind spot that hid the r14 CC checkpoint wall.
SF3_KEYS=(
  dedup_minhash dedup_ngram_jaccard dedup_simhash dedup_embedding
  dedup_embedding_lsh dedup_substring dedup_boilerplate dedup_cluster
  dedup_incremental_near dedup_incr_near_serve dedup_segments
  knn_ivf knn_ivfpq knn_pq_adc emb_knn_graph emb_kmeans
  emb_recall_audit
  stream_stream_join
  graph_pagerank graph_cc graph_bfs graph_kcore graph_triangles
  text_code_detect text_collocation text_bigram_logprob
  text_winnow_overlap text_ngram_novelty
  mm_image_hist
  dedup_span_removal dedup_decontam_spans
)

# Bench-artifact guard (round-16, verdict #5): round 15's root
# artifact shipped "parsed": null because the driver keeps only a
# ~2000-char stdout TAIL and the full JSON line is ~20 KB. Bench now
# prints a compact self-contained summary as its FINAL stdout line;
# this guard fails the run when either artifact stops parsing or the
# compact line outgrows the tail window — parse fragility surfaces
# here, not in the round artifact.
check_bench() { # $1 = captured stdout log
  python3 - "$1" <<'PY'
import json, sys
lines = open(sys.argv[1]).read().rstrip("\n").splitlines()
full = json.loads(open("BENCH.json").read())
assert full.get("queries"), "BENCH.json carries no queries block"
last = lines[-1]
assert len(last) <= 1900, f"compact line is {len(last)} chars > 1900"
c = json.loads(last)
for k in ("metric", "value", "sf", "n_queries", "controls",
          "families", "queries"):
    assert k in c, f"compact line missing key {k!r}"
tail = "\n".join(lines)[-2000:]
assert last in tail, "compact line does not fit a 2000-char tail"
print("[round_bench] artifact guard OK: full=%dB compact=%dB"
      % (len(json.dumps(full)), len(last)))
PY
}

# sbt-path guard (round-17, verdict #1): the DRIVER invokes Bench
# through sbt, where two decorations used to break the final-line JSON
# contract (the "[info] " relog prefix on forked stdout and the
# trailing "[success] Total time" banner). build.sbt now sets
# run/outputStrategy := StdoutOutput and showSuccess := false; this
# step runs Bench THROUGH sbt on the tiny sf and asserts the same
# final-line contract the bare-JVM runs get — a build.sbt regression
# surfaces here, not in the round's root artifact.
echo "[round_bench] sbt-invocation final-line guard at sf0.001 ..."
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_CPUS=8 \
  sbt "runMain graft.Bench q1_agg" | tee "$OUT/bench_${ROUND}_sbtpath.stdout"
check_bench "$OUT/bench_${ROUND}_sbtpath.stdout"
rm -f BENCH.json

echo "[round_bench] full registry at sf0.1 ..."
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  java -Xmx8g -cp "$CP" graft.Bench | tee "$OUT/bench_${ROUND}_sf01.stdout"
check_bench "$OUT/bench_${ROUND}_sf01.stdout"
mv BENCH.json "$OUT/bench_${ROUND}_sf01.json"

# the sentinel is written LAST by gen_sf1.py — a partial dir from an
# interrupted run has no sentinel and is regenerated, never benched
if [ ! -f target/sf1/_GRAFT_SYNTH_OK ]; then
  echo "[round_bench] synthesizing sf1 ..."
  rm -rf target/sf1
  python3 scripts/gen_sf1.py
fi

echo "[round_bench] scale set (${#SF1_KEYS[@]} keys) at sf1 ..."
SPARK_GRAFT_SF_DIR="$PWD/target/sf1" SPARK_GRAFT_CPUS=32 \
  java -Xmx8g -cp "$CP" graft.Bench "${SF1_KEYS[@]}" \
  | tee "$OUT/bench_${ROUND}_sf1.stdout"
check_bench "$OUT/bench_${ROUND}_sf1.stdout"
mv BENCH.json "$OUT/bench_${ROUND}_sf1.json"

if [ ! -f target/sf3/_GRAFT_SYNTH_OK ]; then
  echo "[round_bench] synthesizing sf3 (30 replicas) ..."
  rm -rf target/sf3
  python3 scripts/gen_sf1.py target/sf3 30
fi

echo "[round_bench] growth-curve set (${#SF3_KEYS[@]} keys) at sf3 ..."
SPARK_GRAFT_SF_DIR="$PWD/target/sf3" SPARK_GRAFT_CPUS=32 \
  java -Xmx8g -cp "$CP" graft.Bench "${SF3_KEYS[@]}" \
  | tee "$OUT/bench_${ROUND}_sf3.stdout"
check_bench "$OUT/bench_${ROUND}_sf3.stdout"
mv BENCH.json "$OUT/bench_${ROUND}_sf3.json"

# nprobe operating table (round 16, verdict #7): measured recall@10 ×
# scan fraction per nprobe for the IVF-PQ serving path, at both scale
# points — the table DEPLOY.md §6 carries. One index build + five
# serving sweeps per point; artifacts ride bench_records/.
echo "[round_bench] nprobe operating table at sf0.1 and sf1 ..."
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  java -Xmx8g -cp "$CP" graft.NprobeAudit
mv NPROBE.json "$OUT/nprobe_${ROUND}_sf01.json"
SPARK_GRAFT_SF_DIR="$PWD/target/sf1" SPARK_GRAFT_CPUS=32 \
  java -Xmx8g -cp "$CP" graft.NprobeAudit
mv NPROBE.json "$OUT/nprobe_${ROUND}_sf1.json"

# sf9 spot point (round 16, verdict #2): every key that read
# alpha >= 1.1 in EITHER r15 run gets a 90x measurement — two points
# cannot distinguish noise from a knee; a third in a row can (the sf3
# addition is what caught the r14 CC wall). Membership rule: keys
# whose alpha(1->3) >= 1.1 in the previous round's growth table.
# r17 membership update: text_code_detect (0.93/1.03 r16, 0.90/0.80
# r17), dedup_simhash (0.63 r16, 0.32 r17) and knn_pq_adc (0.89 r16,
# 0.77 r17) retired after two consecutive clean rounds;
# mm_image_hist (first IN-protocol clean round: 0.83/0.82 r17) and
# emb_recall_audit (flagged 1.19 r16, clean 0.45/0.75 r17) stay one
# more round; dedup_cluster joins on its r17 alpha(1->3) = 1.10 flag.
SF9_KEYS=(
  mm_image_hist emb_recall_audit dedup_cluster
)
if [ ! -f target/sf9/_GRAFT_SYNTH_OK ]; then
  echo "[round_bench] synthesizing sf9 (90 replicas) ..."
  rm -rf target/sf9
  python3 scripts/gen_sf1.py target/sf9 90
fi

echo "[round_bench] sf9 spot set (${#SF9_KEYS[@]} keys) at sf9 ..."
SPARK_GRAFT_SF_DIR="$PWD/target/sf9" SPARK_GRAFT_CPUS=32 \
  java -Xmx8g -cp "$CP" graft.Bench "${SF9_KEYS[@]}" \
  | tee "$OUT/bench_${ROUND}_sf9.stdout"
check_bench "$OUT/bench_${ROUND}_sf9.stdout"
mv BENCH.json "$OUT/bench_${ROUND}_sf9.json"

echo "[round_bench] growth exponents:"
python3 scripts/growth_table.py "$OUT/bench_${ROUND}_sf01.json" \
  "$OUT/bench_${ROUND}_sf1.json" "$OUT/bench_${ROUND}_sf3.json" \
  "$OUT/bench_${ROUND}_sf9.json" || true

echo "[round_bench] artifacts in $OUT"
