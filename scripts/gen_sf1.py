#!/usr/bin/env python3
"""Dev-only: synthesize an sf1 (10x sf0.1) scale point for the scale
validation runs. The driver ships sf{0.001,0.01,0.1} only; correctness
stays gated at sf0.01 against those — this dataset exists to validate
SCALE behavior empirically (AQE skew handling, LSH bucket occupancy,
bucket-join fan-in, watermark state) at 10x the bench volume.

Scaling model — facts grow, dimensions don't (the shape a production
corpus actually has; it also AMPLIFIES per-key fan-in 10x, which is
the stress we want, where TPC-H-style uniform scaling would keep
per-key work constant):
  - region/nation/customer/supplier/part: copied unchanged.
  - orders/lineitem: 10 replicas; o_orderkey and l_orderkey shift in
    lockstep (replica r adds r*KEY_STRIDE) so the order join stays
    intact, while o_custkey / l_partkey / l_suppkey stay UNSHIFTED —
    every customer now has 10x orders, every part 10x lineitems.
  - events: 10 replicas, event_id shifted, user_id unchanged, ts
    shifted per replica by the full original span (plus a 1 h guard) —
    the timeline widens 10x, the way 10x of a real event feed arrives
    as a LONGER history, not a denser one. Every user still carries
    10x events (10x sessionization work), but time-bounded state
    (interval joins, windows) sees ~1x concurrent density, so
    stream_stream_join's matched pairs scale ~10x linearly instead of
    the 100x a same-range replication fabricates (the round-11 18.8x
    bench row was exactly that artifact).
  - documents: 10 replicas, doc_id shifted, and every token gets a
    replica suffix ("tok" -> "tok_r3"). Within-replica shingle/token
    structure (and thus the planted dup/near-dup groups) is preserved
    exactly; across replicas the shingle sets are disjoint, so dup
    GROUPS scale 10x linearly. Plain replication would instead turn
    every dup pair into a 20-clique (~190x pair blowup) — not what
    "10x data" means.
  - embeddings: 10 replicas, vec_id shifted, each replica's vectors
    run through a replica-specific signed permutation of the dims (an
    orthogonal transform: within-replica cosines are EXACTLY
    preserved, cross-replica cosines are scrambled toward 0) — same
    rationale as the text suffix, in vector space.

Deterministic (seed fixed), ~170 MB at 10 replicas. Usage:
  python3 scripts/gen_sf1.py [out_dir] [replicas]   # default target/sf1, 10

A third scale point (round 14): `python3 scripts/gen_sf1.py target/sf3 30`
builds 30x sf0.1 = 3x sf1 with the SAME scaling model — replicas 1-9
are bit-identical to sf1's (same seed, sequential rng draws), so
sf0.1 -> sf1 -> sf3 is a true geometric growth curve and the
sf3/sf1 ratio measures the growth EXPONENT the sf1/sf0.1 ratio can
only bound.
"""
import os
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
KEY_STRIDE = 10_000_000


def replicate(df: pd.DataFrame, shift_cols, per_replica=None) -> pd.DataFrame:
    out = []
    for r in range(REPLICAS):
        c = df.copy()
        for col in shift_cols:
            c[col] = c[col] + r * KEY_STRIDE
        if per_replica is not None:
            c = per_replica(c, r)
        out.append(c)
    return pd.concat(out, ignore_index=True)


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)

    for t in ["region", "nation", "customer", "supplier", "part"]:
        pd.read_parquet(f"{SRC}/{t}.parquet").to_parquet(
            f"{out_dir}/{t}.parquet", index=False)

    orders = pd.read_parquet(f"{SRC}/orders.parquet")
    replicate(orders, ["o_orderkey"]).to_parquet(
        f"{out_dir}/orders.parquet", index=False)

    lineitem = pd.read_parquet(f"{SRC}/lineitem.parquet")
    replicate(lineitem, ["l_orderkey"]).to_parquet(
        f"{out_dir}/lineitem.parquet", index=False)

    events = pd.read_parquet(f"{SRC}/events.parquet")
    span = (events["ts"].max() - events["ts"].min()) + pd.Timedelta(hours=1)

    def shift_ts(c: pd.DataFrame, r: int) -> pd.DataFrame:
        if r == 0:
            return c
        c["ts"] = c["ts"] + r * span
        return c

    replicate(events, ["event_id"], shift_ts).to_parquet(
        f"{out_dir}/events.parquet", index=False)

    docs = pd.read_parquet(f"{SRC}/documents.parquet")

    def suffix_tokens(c: pd.DataFrame, r: int) -> pd.DataFrame:
        if r == 0:
            return c
        sfx = f"_r{r}"
        c["text"] = c["text"].map(
            lambda t: None if t is None
            else " ".join(w + sfx if w else w for w in t.split(" ")))
        c["n_chars"] = c["text"].map(
            lambda t: 0 if t is None else len(t)).astype("int64")
        return c

    replicate(docs, ["doc_id"], suffix_tokens).to_parquet(
        f"{out_dir}/documents.parquet", index=False)

    emb = pd.read_parquet(f"{SRC}/embeddings.parquet")
    dim = len(emb["embedding"].iloc[0])
    rng = np.random.default_rng(42)
    mat = np.stack(emb["embedding"].to_numpy())  # (n, dim) float32

    def transform(c: pd.DataFrame, r: int) -> pd.DataFrame:
        if r == 0:
            return c
        perm = rng.permutation(dim)
        signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
        t = mat[:, perm] * signs  # signed permutation: orthogonal
        c["embedding"] = list(t)
        return c

    replicate(emb, ["vec_id"], transform).to_parquet(
        f"{out_dir}/embeddings.parquet", index=False)

    import pyarrow.parquet as pq
    for t in ["orders", "lineitem", "events", "documents", "embeddings"]:
        n = pq.read_metadata(f"{out_dir}/{t}.parquet").num_rows
        print(f"{t}: {n} rows")

    # completion sentinel, written LAST: an interrupted run leaves no
    # sentinel, so callers (round_bench.sh) regenerate instead of
    # benching a partial corpus
    with open(f"{out_dir}/_GRAFT_SYNTH_OK", "w") as f:
        f.write(f"replicas={REPLICAS}\n")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "target/sf1")
