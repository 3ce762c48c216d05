"""Physical-plan quality checks: pushdown, broadcast, no stray shuffles."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ksoup_spark.operators import similarity  # noqa: E402
from tests.conftest import SF_ORACLE_DIR  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_to_parquet(spark):
    df = spark.read.parquet(f"{SF_ORACLE_DIR}/documents.parquet") \
        .filter(F.col("doc_id") < 10).select("doc_id", "n_chars")
    plan = _plan(df)
    assert "PushedFilters" in plan and "LessThan(doc_id,10)" in plan
    # column pruning: text column not read
    assert "ReadSchema" in plan and "text" not in plan.split("ReadSchema")[1][:200]


def test_ann_broadcasts_small_side(spark):
    emb = spark.read.parquet(f"{SF_ORACLE_DIR}/embeddings.parquet")
    df = similarity.cosine_topk(emb, query_ids=[0, 1], k=2)
    plan = _plan(df)
    assert "Broadcast" in plan  # queries broadcast, candidates streamed
    # query-id filter pushed into the scan of the query side
    assert "PushedFilters" in plan


def test_extraction_plan_no_extra_shuffle(spark):
    """Kernel over pre-partitioned input must add no exchange."""
    from ksoup_spark.operators import extract
    df = spark.createDataFrame(
        [("a", "<p>x</p>")], "doc_id string, html string"
    ).repartition(4, F.xxhash64("doc_id"))
    out = extract.extract_spans_from_html_df(df)
    plan = _plan(out)
    assert plan.count("Exchange") == 1  # only the explicit salted repartition


def test_cosine_near_dups_bucketed_no_cartesian(spark):
    """Scale path: LSH-bucketed candidates + exact verify — the plan must
    contain no cartesian/unconditional cross join anywhere."""
    emb = spark.read.parquet(f"{SF_ORACLE_DIR}/embeddings.parquet")
    df = similarity.cosine_near_dups(emb, threshold=0.8, dim=64)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_near_dups_single_scan_per_side(spark):
    """Candidate generation is ONE (seed, bucket)-explode self-join, not a
    union of per-seed joins: at most one scan of the embeddings parquet per
    join side plus two pruned (id, vec) scans for the post-dedup verify
    re-join (4 total). The pre-r5 shape read the table 2×n_seeds = 12
    times; the r5 shape carried the vector payload through the candidate
    and dedup shuffles — at sf1 that was 490 s vs ~20 s for this one."""
    emb = spark.read.parquet(f"{SF_ORACLE_DIR}/embeddings.parquet")
    df = similarity.cosine_near_dup_candidates(emb, dim=64)
    plan = _plan(df)
    assert plan.count("embeddings.parquet") <= 4, plan
    # self-join + pair dedup + two verify joins (id-keyed)
    assert plan.count("Exchange") <= 8, plan
    # the candidate/dedup shuffles move id rows only: no vector column may
    # appear upstream of the dedup aggregate. In the executed-plan text the
    # dedup prints before its inputs, so 'va' / 'vb' must first appear
    # BEFORE (downstream of) the first id-pair HashAggregate.
    dedup_at = plan.index("HashAggregate")
    assert "va" in plan[:dedup_at], plan[:dedup_at]


def test_jaccard_df_cut_filter_in_plan(spark):
    """Default df-cut runs as a count-per-shingle pass whose hot survivors
    anti-join the shingle stream BEFORE the posting-list aggregation, so a
    hot shingle never materializes its doc list in an aggregation buffer."""
    from ksoup_spark.operators import dedup
    docs = spark.read.parquet(f"{SF_ORACLE_DIR}/documents.parquet")
    plan = _plan(dedup.jaccard_pairs(docs, n=3, threshold=0.2))
    assert "1000" in plan and "LeftAnti" in plan
    # the anti-join (hot-shingle cut) must sit UPSTREAM of the posting-list
    # collect_list aggregate in the plan text (executed plans print
    # downstream operators first)
    assert plan.index("collect_list") < plan.index("LeftAnti")
    assert "CartesianProduct" not in plan


def test_jaccard_no_cache_in_lineage(spark):
    """No InMemoryTableScan: the shingle table must not be cached (leak)."""
    from ksoup_spark.operators import dedup
    docs = spark.read.parquet(f"{SF_ORACLE_DIR}/documents.parquet")
    plan = _plan(dedup.jaccard_pairs(docs, n=3, threshold=0.2))
    assert "InMemoryTableScan" not in plan


def test_simhash_single_pass_no_shuffle(spark):
    """SimHash folds bit votes per-row (higher-order aggregate): the plan
    must contain no exchange and no explode/Generate."""
    from ksoup_spark.operators import textstats
    docs = spark.read.parquet(f"{SF_ORACLE_DIR}/documents.parquet")
    plan = _plan(textstats.simhash(docs))
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode anywhere


def test_unigram_logprob_broadcasts_vocab(spark):
    """Top-k vocab must reach the scoring join as a broadcast (TakeOrdered
    -> BroadcastHashJoin); the word-level join must not shuffle the corpus
    a second time."""
    from ksoup_spark.operators import textstats
    docs = spark.read.parquet(f"{SF_ORACLE_DIR}/documents.parquet")
    plan = _plan(textstats.unigram_logprob(docs, top_k=100))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_broadcasts_benchmark(spark):
    """The eval-set n-gram side must reach the contamination join as a
    broadcast: a training corpus never shuffles against its (tiny)
    benchmark set, and the per-doc aggregate is the only Exchange on the
    doc-shingle stream."""
    from ksoup_spark.operators import dedup
    docs = spark.read.parquet(f"{SF_ORACLE_DIR}/documents.parquet")
    bench = docs.filter("doc_id % 41 = 0")
    plan = _plan(dedup.decontaminate(docs, bench, n=8))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_url_dedup_single_shuffle(spark):
    """Canonicalization is per-row JVM regex; the dedup is ONE exchange."""
    from pyspark.sql import functions as F2

    from ksoup_spark.operators import urls
    docs = spark.read.parquet(f"{SF_ORACLE_DIR}/documents.parquet")
    d = docs.select("doc_id", F2.concat(
        F2.lit("https://h"), (F2.col("doc_id") % 9).cast("string"),
        F2.lit(".com/p?utm_source=x")).alias("url"))
    plan = _plan(urls.url_dedup(d))
    assert plan.count("Exchange") <= 2  # agg partial+final pair at most
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
