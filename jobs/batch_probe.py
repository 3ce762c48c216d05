"""Arrow-batch-size probe for the headline extraction path.

Measures the sf0.1 x16 headline extraction wall time at several
spark.sql.execution.arrow.maxRecordsPerBatch values, each in a fresh
local[32] session (config is session-fixed), best-of-K timed runs after
the standard worker/JIT warmup. Bracketed by single-doc anchor probes so
a co-tenant burst is visible in the record.

Motivation: at 36k docs/s the per-doc budget is ~27 us, so Python-worker
framing (one Arrow IPC round trip per batch) is a candidate fixed cost.
Larger batches amortize framing but worsen tail/pipelining at this corpus
size; smaller batches do the reverse. This probe finds the knee.

Usage: python jobs/batch_probe.py [sizes...]   (default: 64 128 256 512)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuse _corpus/_run_extraction/anchor machinery)
from ksoup_spark.session import get_spark  # noqa: E402


def probe(size: int, runs: int = 3) -> dict:
    spark = get_spark(app=f"batch-probe-{size}", master=f"local[{bench.CPUS}]",
                      shuffle_partitions=bench.CPUS, arrow_batch=size)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{bench.SF_DIR}/documents.parquet").count()
    dt, n_docs, mb = bench._run_extraction(spark, bench.MULT, timed_runs=runs)
    spark.stop()
    return {"batch": size, "sec": round(dt, 3),
            "docs_per_sec": round(n_docs / dt, 1),
            "mb_per_sec": round(mb / dt, 2), "n_docs": n_docs}


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [64, 128, 256, 512]
    out = {"anchor_pre_ms": bench._quick_anchor_ms(), "probes": []}
    for s in sizes:
        rec = probe(s)
        rec["anchor_ms"] = round(bench._quick_anchor_ms() or -1, 1)
        out["probes"].append(rec)
        print(json.dumps(rec), flush=True)
    out["anchor_pre_ms"] = round(out["anchor_pre_ms"] or -1, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
