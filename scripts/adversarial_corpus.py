#!/usr/bin/env python3
"""Dev-only: build the adversarial documents corpus for the text/dedup
oracle-precondition check (round-6 simhash item, closed round 9).

The text-side oracles (dedup_simhash's poly-simhash replay above all)
tokenize with split-on-space and hash CODEPOINTS, so the classic ways
two engines can silently disagree are:
  - consecutive / leading / trailing spaces (empty tokens),
  - non-BMP codepoints (surrogate pairs in the JVM's UTF-16),
  - combining marks (NFD vs NFC is a CODEPOINT difference, not a
    visual one — the engines must agree it is a difference).
This script appends rows exercising each of those (with planted exact
duplicates so the pair-emitting faces have non-vacuous matches) to the
sf0.001 documents table and symlinks the sibling tables, producing a
drop-in sfDir for Verify + localcheck.

Usage:
  python3 scripts/adversarial_corpus.py [out_dir]   # default target/advdata
  sbt -batch "runMain graft.Verify <out_dir> target/verify_adv \
      dedup_simhash dedup_minhash dedup_ngram_jaccard ..."
  python3 scripts/localcheck.py target/verify_adv <out_dir> dedup_simhash ...

Verified green (round 9) for all 20 documents-table keys:
dedup_{exact,normalized,segments,minhash,ngram_jaccard,incremental,
incremental_near,bloom,contain}, text_{fingerprint,winnow_overlap,chunk,entropy,
tokens,langid,quality,ngram_stats,pii_scrub,rep_words,unigram_logprob}
— with the three planted dup pairs emitted at hamming 0 by
dedup_simhash and the NFC variant NOT aliasing its NFD twin.
"""
import os
import sys
import unicodedata

import pandas as pd

SRC = "/root/testdata/sf0.001"
SIBLINGS = ["region", "nation", "customer", "part", "events",
            "embeddings"]

# Planted GRAPH fixture (round 15): at sf0.001 the supplier table has
# no s_nationkey=1 row (graph_bfs seeds empty) and the DOULION-sampled
# co-supply graph has no wedge (graph_link_pred empty), so those two
# keys passed VACUOUSLY against this corpus. Three planted suppliers
# fix both: keys searched so the multiplicative sample hash keeps
# edges (1000,1020) and (1000,1040) and drops (1020,1040) at mod 20 —
# a wedge centered on supplier 1000, which also carries nationkey 1
# (the BFS seed predicate). Two planted orders co-supply the wedge.
WEDGE_CENTER, WEDGE_A, WEDGE_B = 1000, 1020, 1040


def _sampled(u: int, v: int, mod: int = 20) -> bool:
    a, b = min(u, v), max(u, v)
    return (((a * 100003 + b) % 1000003) * 2654435761) % mod == 0


def build(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in SIBLINGS:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)

    assert _sampled(WEDGE_CENTER, WEDGE_A) \
        and _sampled(WEDGE_CENTER, WEDGE_B) \
        and not _sampled(WEDGE_A, WEDGE_B), "wedge keys lost the hash"

    sup = pd.read_parquet(os.path.join(SRC, "supplier.parquet"))
    planted_sup = pd.DataFrame({
        "s_suppkey": [WEDGE_CENTER, WEDGE_A, WEDGE_B],
        "s_name": ["adv supplier center", "adv supplier a",
                   "adv supplier b"],
        "s_nationkey": pd.array([1, 2, 2], dtype=sup.s_nationkey.dtype),
        "s_acctbal": [0.0, 0.0, 0.0],
    })
    pd.concat([sup, planted_sup], ignore_index=True).to_parquet(
        os.path.join(out_dir, "supplier.parquet"), index=False)

    orders = pd.read_parquet(os.path.join(SRC, "orders.parquet"))
    o_tpl = orders.iloc[[0, 1]].copy()
    o_tpl["o_orderkey"] = [900001, 900002]
    pd.concat([orders, o_tpl], ignore_index=True).to_parquet(
        os.path.join(out_dir, "orders.parquet"), index=False)

    li = pd.read_parquet(os.path.join(SRC, "lineitem.parquet"))
    l_tpl = pd.concat([li.iloc[[0]]] * 4, ignore_index=True)
    l_tpl["l_orderkey"] = [900001, 900001, 900002, 900002]
    l_tpl["l_suppkey"] = [WEDGE_CENTER, WEDGE_A, WEDGE_CENTER, WEDGE_B]
    l_tpl["l_linenumber"] = pd.array([1, 2, 1, 2],
                                     dtype=li.l_linenumber.dtype)
    pd.concat([li, l_tpl], ignore_index=True).to_parquet(
        os.path.join(out_dir, "lineitem.parquet"), index=False)
    base = pd.read_parquet(os.path.join(SRC, "documents.parquet"))
    nfc = "combining é accent café test words"
    nfd = unicodedata.normalize("NFD", nfc)
    assert nfc != nfd, "NFD normalization was a no-op"
    texts = [
        "double  space between tokens",   # consecutive spaces -> empty token
        "double  space between tokens",   # exact dup (must pair, hamming 0)
        "trailing space ",                # trailing empty token
        " leading space",                 # leading empty token
        "emoji \U0001F600 \U0001F680 rocket science test",  # non-BMP
        "emoji \U0001F600 \U0001F680 rocket science test",  # dup
        nfd,                              # e + U+0301 combining acute
        nfd,                              # dup
        nfc,                              # precomposed variant: differs
    ]
    adv = pd.DataFrame({
        "doc_id": [100001 + i for i in range(len(texts))],
        "text": texts,
    })
    adv["lang"] = "en"
    adv["source"] = "adversarial"
    adv["n_chars"] = adv["text"].str.len().astype("int64")
    out = pd.concat([base, adv], ignore_index=True)
    out.to_parquet(os.path.join(out_dir, "documents.parquet"), index=False)
    print(f"{out_dir}/documents.parquet: {len(out)} rows "
          f"({len(adv)} adversarial)")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "target/advdata")
