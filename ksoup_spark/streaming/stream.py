"""Structured Streaming extraction — the StreamParser analogue.

The reference's StreamParser emits elements incrementally within one
document (parser/StreamParser.kt:16-140); at corpus scale the equivalent is
a stream OF documents: readStream -> the same Arrow extraction kernel ->
writeStream, with exactly-once progress via checkpointLocation. Within-doc
incrementality is unnecessary (documents are bounded rows); skew is defused
by the same salted repartition as the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.extract import SPANS_SCHEMA, extract_spans_df

DOCS_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def read_docs_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(DOCS_SCHEMA).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def extract_spans_stream(docs_stream: DataFrame) -> DataFrame:
    """Streaming DF of (doc_id, spans-in) -> (doc_id, spans-out).

    mapInArrow is stateless, so it composes with streaming unchanged.
    """
    return extract_spans_df(docs_stream)


def start_extraction_stream(
    docs_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    trigger_available_now: bool = True,
):
    """writeStream with checkpointed progress; availableNow drains the
    backlog then stops (batch-equivalent semantics for tests/backfills)."""
    spans = extract_spans_stream(docs_stream)
    writer = (
        spans.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
