"""sf1 linearity evidence (round 5, VERDICT r4 task #3).

Two parts:

1. ``--oracles``: replay the driver's correctness compare (row count +
   column names + order-insensitive value multiset vs the DuckDB oracle)
   for the dedup/ANN family at a generated sf1 directory — the 100-TB
   operators must stay CORRECT, not just fast, when the input grows 10x.

2. ``--report A.json B.json``: given two bench run artifacts (sf0.1 and
   sf1), emit the per-query wall-time ratio table to
   ``BENCH/rounds/linearity-<stamp>.md``. With 10x rows, a linear operator
   lands at <=~12x (10x data + fixed overhead + the box's documented +-20%
   noise); anything materially above that is flagged.

Usage:
    python jobs/gen_sf.py --out .bench_sf1 --docs 50000 --vecs 20000
    python jobs/linearity.py --oracles --sf-dir .bench_sf1
    python jobs/linearity.py --report BENCH/rounds/run-A.json \
        BENCH/rounds/run-B.json
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the dedup/ANN family — every operator whose 100-TB plan shape was
# audited in VERDICT r3/r4
FAMILY = [
    "dedup_exact",
    "dedup_jaccard",
    "dedup_clusters",
    "passage_dedup",
    "minhash_signatures",
    "dedup_minhash_lsh",
    "simhash",
    "simhash_near_dups",
    "cosine_near_dups",
    "cosine_near_dup_recall",
    "ann_bruteforce",
    "ann_ivf",
    "ann_lsh",
    "ann_lsh_recall",
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


def run_oracles(sf_dir: str, names: list[str]) -> dict:
    import duckdb

    import __spark_entry__ as entrymod
    from ksoup_spark.session import get_spark

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    spark = get_spark(app="linearity-oracles")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "err": None}
        try:
            t0 = time.time()
            sdf = queries[name](spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            rec["spark_rows"] = len(srows)
            rec["spark_sec"] = round(time.time() - t0, 2)
            if name not in oracles:
                rec["err"] = "no oracle (rows-only)"
                out[name] = rec
                continue
            t0 = time.time()
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
            rec["oracle_rows"] = len(orows)
            rec["oracle_sec"] = round(time.time() - t0, 2)
            rec["rows_match"] = len(srows) == len(orows)
            rec["schema_match"] = sorted(scols) == sorted(ocols)
            sm = _multiset([[r[c] for c in scols] for r in srows], scols)
            om = _multiset(orows, ocols)
            rec["hash_match"] = sm == om
        except Exception as exc:  # record, keep going
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        out[name] = rec
        status = ("PASS" if rec["rows_match"] and rec["schema_match"]
                  and rec["hash_match"] else "FAIL")
        print(f"{name}: {status} {json.dumps(rec)}", flush=True)
    spark.stop()
    return out


def write_report(path_a: str, path_b: str, oracle_json: str | None) -> str:
    a = json.load(open(path_a))
    b = json.load(open(path_b))
    ra = a.get("n_docs", 0)
    rb = b.get("n_docs", 0)
    lines = [
        "# sf1 linearity evidence",
        "",
        f"- A: `{os.path.basename(path_a)}` sf={a.get('sf')} "
        f"n_docs={ra} headline={a.get('value')}s "
        f"({a.get('docs_per_sec')} docs/s)",
        f"- B: `{os.path.basename(path_b)}` sf={b.get('sf')} "
        f"n_docs={rb} headline={b.get('value')}s "
        f"({b.get('docs_per_sec')} docs/s)",
        "",
        f"Headline wall ratio: **{b.get('value', 0) / max(a.get('value', 1e-9), 1e-9):.1f}x** "
        f"for {rb / max(ra, 1):.0f}x docs "
        f"(docs/s held: {a.get('docs_per_sec')} -> {b.get('docs_per_sec')})",
        "",
        "| query | A sec | B sec | ratio | verdict (<=12x = linear) |",
        "|---|---|---|---|---|",
    ]
    qa, qb = a.get("queries", {}), b.get("queries", {})
    flagged = []
    for k in qa:
        if k not in qb:
            continue
        ratio = qb[k] / max(qa[k], 1e-9)
        verdict = "ok" if ratio <= 12 else "FLAG: superlinear"
        if ratio > 12:
            flagged.append(k)
        lines.append(f"| {k} | {qa[k]} | {qb[k]} | {ratio:.1f}x | {verdict} |")
    lines.append("")
    if flagged:
        lines.append(f"Flagged superlinear: {', '.join(flagged)}")
    else:
        lines.append("No query exceeded the 12x linearity bound.")
    if oracle_json and os.path.exists(oracle_json):
        o = json.load(open(oracle_json))
        npass = sum(1 for r in o.values()
                    if r.get("hash_match") and r.get("rows_match"))
        lines += ["", f"## sf1 oracle parity (dedup/ANN family): "
                      f"{npass}/{len(o)} hash_match", ""]
        for k, r in o.items():
            st = "pass" if r.get("hash_match") else f"FAIL {r.get('err')}"
            lines.append(f"- {k}: {st} (spark {r.get('spark_rows')} rows, "
                         f"{r.get('spark_sec')}s; oracle "
                         f"{r.get('oracle_sec')}s)")
    stamp = time.strftime("%Y%m%dT%H%M%S")
    out_path = f"BENCH/rounds/linearity-{stamp}.md"
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--oracles", action="store_true")
    ap.add_argument("--sf-dir", default=".bench_sf1")
    ap.add_argument("--out", default="BENCH/rounds/linearity-oracles-sf1.json")
    ap.add_argument("--report", nargs=2, metavar=("A_JSON", "B_JSON"))
    ap.add_argument("--oracle-json", default=None)
    args = ap.parse_args()
    if args.oracles:
        res = run_oracles(args.sf_dir, FAMILY)
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"wrote {args.out}")
        npass = sum(1 for r in res.values() if r.get("hash_match"))
        print(f"{npass}/{len(res)} hash_match")
    if args.report:
        write_report(args.report[0], args.report[1], args.oracle_json)


if __name__ == "__main__":
    main()
