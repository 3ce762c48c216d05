"""Deterministic synthetic interleaved-document corpus.

Builds the north-rule input table (doc_id:string,
spans:array<struct<kind,text,media_ref,offset>>) from the driver-provided
``documents`` parquet (TESTDATA.md) — no external data, fully deterministic
(pure column expressions of doc_id/text). Media spans are interleaved for
every doc (rotating image/video/object), and the HTML wrapper varies by
doc_id so tokenizer/tree paths (attributes, entities, lists, pre) are
exercised at corpus scale.

Everything here is JVM-side column expressions (no Python) — corpus prep
must not compete with the extraction kernel for Python-worker time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def build_docs_table(spark: SparkSession, sf_dir: str,
                     repeat: int = 1,
                     partitions: int | None = None) -> DataFrame:
    """documents.parquet -> interleaved (doc_id, spans) corpus table.

    ``repeat`` scales each document's body ×repeat (bench realism: web docs
    are tens of KB, the seed texts are ~400 B); repeat=1 is the
    oracle-checked shape.

    ``partitions``: salted spread on hash(doc_id) applied to the SEED rows,
    before the body-inflating column ops — a small parquet file arrives in
    one partition, and everything downstream (including the extraction
    kernel) would serialize on it otherwise. This is the north-rule salted
    repartition, done at the cheapest point in the plan.
    """
    docs = load_documents(spark, sf_dir)
    if partitions:
        docs = docs.repartition(partitions, F.xxhash64("doc_id"))
    if repeat > 1:
        docs = docs.withColumn(
            "text",
            F.array_join(F.array_repeat(F.col("text"), repeat), " "),
        )
    did = F.col("doc_id")
    sid = F.format_string("doc-%08d", did)
    mod = F.pmod(did, F.lit(3))

    def span(kind, text, media_ref, offset):
        return F.struct(
            F.lit(kind).alias("kind") if isinstance(kind, str) else kind.alias("kind"),
            (F.lit(None).cast("string") if text is None else text).alias("text"),
            (F.lit(None).cast("string") if media_ref is None else media_ref).alias(
                "media_ref"
            ),
            F.lit(offset).cast("int").alias("offset"),
        )

    head = span(
        "html",
        F.concat(
            F.lit('<html><head><title>Doc '),
            sid,
            F.lit('</title><base href="http://corpus.example/'),
            sid,
            F.lit('/"></head><body><div id="main" class="content doc">'),
        ),
        None,
        0,
    )
    body = span(
        "html",
        F.when(
            mod == 0, F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>"))
        )
        .when(
            mod == 1,
            # one <li> per 6 words — realistic web tag density (~1 tag per
            # half-dozen words), not one tag per word
            F.concat(
                F.lit('<ul><li class="first">'),
                F.expr(
                    "array_join(transform("
                    " sequence(0, int(ceil(size(split(text,' ')) / 6.0)) - 1),"
                    " i -> concat('<li>',"
                    "   array_join(slice(split(text,' '), i*6 + 1, 6), ' '))"
                    "), '')"
                ),
                F.lit("</ul>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('<h1>Doc &amp; '),
                sid,
                F.lit("</h1><pre>"),
                F.expr("replace(text, ' ', '\n')"),
                F.lit("</pre>"),
            )
        ),
        None,
        1,
    )
    media_kind = (
        F.when(mod == 0, F.lit("image"))
        .when(mod == 1, F.lit("video"))
        .otherwise(F.lit("object"))
    )
    media = span(
        media_kind,
        None,
        F.concat(F.lit("media/"), sid, F.lit(".bin")),
        2,
    )
    tail = span(
        "html",
        F.concat(
            F.lit('<p class="tail">tail '),
            F.lit("of "),
            sid,
            F.lit("</p></div></body></html>"),
        ),
        None,
        3,
    )
    return docs.select(
        sid.alias("doc_id"),
        F.array(head, body, media, tail).alias("spans"),
        F.col("text").alias("source_text"),
        did.alias("orig_id"),
    )
