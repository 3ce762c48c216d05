"""One-off: clean re-measure of the sf1 two-level scaling pair.

The 20260817T233322 sf1 bench ran its scaling section under co-tenant load
(2 of 3 rounds rejected by the anchor gate; the accepted round still showed
load-average 2-8 on the box). This re-runs ONLY the scaling pair — same
corpus construction, same SCALE_MULT/SCALE_REPEAT as bench.py — on a quiet
box and prints per-round results as JSON lines for the run-artifact addendum.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/repo/.bench_sf1")

import bench  # noqa: E402  (reuses _run_extraction/_quick_anchor_ms/config)
from ksoup_spark.session import get_spark  # noqa: E402

N_SMALL = bench.SCALE_N
N_BIG = bench.SCALE_N * 4
ROUNDS = int(os.environ.get("SF1_RECHECK_ROUNDS", "2"))


def measure_level(n: int) -> float:
    s = get_spark(app=f"ksoup-scale-recheck-{n}", master=f"local[{n}]",
                  shuffle_partitions=n)
    s.sparkContext.setLogLevel("ERROR")
    s.read.parquet(f"{bench.SF_DIR}/documents.parquet").count()
    reps = 2 if n == N_SMALL else 4
    dt, nd, _ = bench._run_extraction(s, bench.SCALE_MULT, bench.SCALE_REPEAT,
                                      timed_runs=reps)
    s.stop()
    return nd / dt


def main() -> None:
    for i in range(ROUNDS):
        pre = bench._quick_anchor_ms()
        thr_a = measure_level(N_SMALL)
        mid = bench._quick_anchor_ms()
        thr_b = measure_level(N_BIG)
        post = bench._quick_anchor_ms()
        rec = {
            "round": i + 1,
            "thr_n": round(thr_a, 1),
            "thr_4n": round(thr_b, 1),
            "efficiency": round(thr_b / ((N_BIG / N_SMALL) * thr_a), 3),
            "anchors_ms": [None if t is None else round(t, 1)
                           for t in (pre, mid, post)],
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
