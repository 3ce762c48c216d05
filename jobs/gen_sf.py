"""Deterministic sf-series synthesizer (linearity evidence, round 5).

The driver ships sf0.001/0.01/0.1 only; the 100-TB design claims need at
least one decade of measured scale-up beyond the bench's sf0.1. This
generates an sf1-equivalent ``documents.parquet`` + ``embeddings.parquet``
(the only two tables the bench queries read) with the SAME distributions
as the driver's corpus, 10x the rows:

- documents: 31-word vocab (the sf-series vocab verbatim), text length
  uniform 10..100 words, lang ~ (en .40, zh/es/fr/de .15), source uniform
  src0..src19, planted exact-dup PAIRS at the sf0.1 rate (8 per 5000 docs)
- embeddings: 64-dim unit-normalized gaussians, label uniform 0..7

Seeded numpy; no external data. Usage:

    python jobs/gen_sf.py --out /root/repo/.bench_sf1 --docs 50000 --vecs 20000
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
DUP_PAIRS_PER_5000 = 8
EMB_DIM = 64
N_LABELS = 8


def gen_documents(n: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.array(VOCAB)
    lens = rng.integers(10, 101, size=n)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), size=ln)])
        for ln in lens
    ]
    # plant exact-dup pairs at the sf-series rate: doc j copies doc i
    n_pairs = round(n * DUP_PAIRS_PER_5000 / 5000)
    idx = rng.choice(n, size=2 * n_pairs, replace=False)
    for k in range(n_pairs):
        texts[idx[2 * k + 1]] = texts[idx[2 * k]]
    lang = rng.choice(LANGS, size=n, p=LANG_P)
    source = np.array([f"src{int(s)}" for s in rng.integers(0, 20, size=n)])
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(lang, type=pa.string()),
        "source": pa.array(source, type=pa.string()),
        "n_chars": pa.array(
            np.array([len(t) for t in texts], dtype=np.int64)),
    })


def gen_embeddings(n: int, seed: int = 43) -> pa.Table:
    rng = np.random.default_rng(seed)
    e = rng.standard_normal((n, EMB_DIM)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(e), type=pa.list_(pa.float32())),
        "label": pa.array(
            rng.integers(0, N_LABELS, size=n).astype(np.int32)),
    })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--vecs", type=int, default=20_000)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    pq.write_table(gen_documents(args.docs, args.seed),
                   os.path.join(args.out, "documents.parquet"))
    pq.write_table(gen_embeddings(args.vecs, args.seed + 1),
                   os.path.join(args.out, "embeddings.parquet"))
    print(f"wrote {args.docs} docs + {args.vecs} vecs to {args.out}")


if __name__ == "__main__":
    main()
