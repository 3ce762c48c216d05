"""Replay the dedup/ANN oracle rows at sf1 (VERDICT r4 task-3 last clause).

The driver's correctness gate runs every registry query vs its DuckDB
oracle twin at sf0.01; the sf1 linearity record (BENCH/rounds/
run-20260817T233322.md) measured wall-ratios only. This job closes the
gap: the dedup / near-dup / ANN family — the operators whose banding and
bucketing design carries the 100-TB claims — is replayed at sf1
(50k docs / 20k vectors, jobs/gen_sf.py corpus) with the SAME multiset
compare as tests/test_entry_oracle.py (row count + sorted column names +
order-insensitive value hash at 4-decimal float normalization).

Usage:
    python jobs/sf1_oracle_check.py [--sf-dir /root/repo/.bench_sf1]

Prints one JSON line per query plus a summary; exits non-zero on any
mismatch.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The family whose scale posture the sf1 evidence is about. Every entry
# reads only documents.parquet / embeddings.parquet, which gen_sf.py
# synthesizes at 10x the sf0.1 row counts with the same distributions.
FAMILY = [
    "dedup_exact",
    "dedup_jaccard",
    "dedup_minhash_lsh",
    "minhash_signatures",
    "dedup_clusters",
    "passage_dedup",
    "simhash",
    "simhash_near_dups",
    "cosine_near_dups",
    "cosine_near_dup_recall",
    "ann_bruteforce",
    "ann_lsh",
    "ann_lsh_recall",
    "ann_ivf",
    "url_dedup",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.4f}"
    if isinstance(v, bool):
        return str(int(v))
    if v is None:
        return ""
    return str(v)


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.bench_sf1")
    ap.add_argument("--all", action="store_true",
                    help="replay the ENTIRE registry, not just the "
                         "dedup/ANN family (every query derives its input "
                         "from documents/embeddings, so the sf1 corpus "
                         "covers all 50)")
    ap.add_argument("--queries", default=None,
                    help="comma-separated explicit query list (overrides "
                         "--all/FAMILY); lets a long replay resume after "
                         "an interrupted run instead of redoing green rows")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if args.queries:
        names = [q.strip() for q in args.queries.split(",") if q.strip()]
    elif args.all:
        names = sorted(queries)
    else:
        names = FAMILY
    results = []
    ok_all = True
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf_dir)
            cols = [f.name for f in sdf.schema.fields]
            srows = [tuple(r) for r in sdf.collect()]
            rel = con.execute(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
            ok = (
                len(srows) == len(orows)
                and sorted(cols) == sorted(ocols)
                and _multiset(srows, cols) == _multiset(orows, ocols)
            )
        except Exception as exc:  # noqa: BLE001 - recorded, not masked
            rec = {"query": name, "ok": False, "err": repr(exc)[:200]}
            results.append(rec)
            print(json.dumps(rec), flush=True)
            ok_all = False
            continue
        rec = {
            "query": name,
            "ok": bool(ok),
            "rows": len(srows),
            "sec": round(time.time() - t0, 2),
        }
        results.append(rec)
        ok_all = ok_all and ok
        print(json.dumps(rec), flush=True)
    spark.stop()
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "family": len(names),
        "green": sum(1 for r in results if r.get("ok")),
        "all_ok": ok_all,
        "failed": [r["query"] for r in results if not r.get("ok")],
    }))
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
