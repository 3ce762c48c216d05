"""Deterministic corpus sampling / splitting for training pipelines.

Train/val/test assignment must be a pure function of the document id —
stable across reruns, cluster sizes, and partitionings — so it is computed
from a content-independent hash of the id, never from randomness or row
order. Pure per-row JVM expressions: no shuffle, no Python, scale-free.

Two hash families, same shape as the MinHash pair
(operators/dedup.py minhash_signatures vs minhash_signatures_md5):

- ``hash="xxhash64"`` (default): the production path — JVM-native,
  fastest.
- ``hash="md5"``: portable to any SQL engine; ``corpus_split_sql`` is its
  exact DuckDB twin for oracle checking.

At 100 TB the split is a WHERE clause, not a job: downstream stages filter
on the split column and Catalyst pushes the predicate into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000  # ppm resolution for split fractions


def _bucket(id_col: str, hash: str, seed: str):
    sid = F.col(id_col).cast("string")
    if hash == "xxhash64":
        return F.pmod(F.xxhash64(sid, F.lit(seed)), F.lit(_BUCKETS))
    if hash == "md5":
        # first 60 bits of md5(seed || id) as a decimal, mod buckets —
        # expressible verbatim in DuckDB (conv == from-hex)
        return F.pmod(
            F.conv(F.substring(F.md5(F.concat(F.lit(seed), sid)), 1, 15),
                   16, 10).cast("long"),
            F.lit(_BUCKETS))
    raise ValueError(f"unknown hash family: {hash}")


def corpus_split(df: DataFrame, weights: dict[str, float] | None = None,
                 id_col: str = "doc_id", seed: str = "split-v1",
                 hash: str = "xxhash64") -> DataFrame:
    """Assign each row a deterministic split label by hashed-id bucket.

    ``weights`` maps label -> fraction (must sum to <= 1; any remainder
    falls to the LAST label). Insertion order defines the bucket ranges,
    so the same weights dict always yields the same assignment; changing
    ``seed`` re-deals every document. Returns the input columns plus
    ``split``.
    """
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights or any(w < 0 for w in weights.values()) \
            or sum(weights.values()) > 1.0 + 1e-9:
        raise ValueError("weights must be non-negative and sum to <= 1")
    bucket = _bucket(id_col, hash, seed)
    expr = None
    hi = 0
    labels = list(weights)
    for label in labels[:-1]:
        hi += int(round(weights[label] * _BUCKETS))
        cond = bucket < hi
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = F.lit(labels[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def corpus_split_sql(table: str = "documents",
                     weights: dict[str, float] | None = None,
                     id_col: str = "doc_id", seed: str = "split-v1") -> str:
    """DuckDB oracle twin of corpus_split(hash='md5')."""
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    bucket = (f"(('0x' || substr(md5('{seed}' || "
              f"CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT % {_BUCKETS})")
    labels = list(weights)
    cases = []
    hi = 0
    for label in labels[:-1]:
        hi += int(round(weights[label] * _BUCKETS))
        cases.append(f"WHEN {bucket} < {hi} THEN '{label}'")
    when = " ".join(cases)
    case = (f"CASE {when} ELSE '{labels[-1]}' END" if cases
            else f"'{labels[-1]}'")
    return f"SELECT *, {case} AS split FROM {table}"
