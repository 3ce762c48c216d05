"""Core extraction operators: interleaved docs -> ordered span sequences,
and HTML -> exploded node table.

Physical plan (SURVEY.md §4): read -> salted repartition on hash(doc_id)
(defuses giant-document skew by scattering rows uniformly; one doc is one
row, so skew is row-size skew, not key skew) -> mapInArrow(extract kernel)
-> columnar spans. No per-row Python at the Spark boundary: the kernel
receives Arrow record batches and returns Arrow record batches; the
per-document parse loop runs inside the batch (the same document-at-a-time
model as the reference, Parser.kt:13-14 — parallelism lives BETWEEN
documents).

At 100 TB scale: extraction is embarrassingly parallel (no shuffle needed
beyond the optional salting pass), the parse kernel is CPU-bound per core,
and Arrow batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
so a multi-MB document cannot balloon executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from ..kernel import dom
from ..kernel.textops import extract_spans as _kernel_extract_spans
from ..kernel.treebuilder import parse as _parse

SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)
SPANS_TYPE = ArrayType(SPAN_STRUCT)

SPANS_SCHEMA = StructType(
    [StructField("doc_id", StringType()), StructField("spans", SPANS_TYPE)]
)

NODE_TABLE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("node_id", IntegerType()),
        StructField("parent_id", IntegerType()),
        StructField("depth", IntegerType()),
        StructField("kind", IntegerType()),
        StructField("tag", StringType()),
        StructField("ns", IntegerType()),
        StructField("sibling_index", IntegerType()),
        StructField("elem_sibling_index", IntegerType()),
        StructField("first_child", IntegerType()),
        StructField("next_sibling", IntegerType()),
        StructField("subtree_end", IntegerType()),
        StructField("text", StringType()),
        StructField("attrs", MapType(StringType(), StringType())),
    ]
)

NODE_TABLE_TEXT_SCHEMA = StructType(
    NODE_TABLE_SCHEMA.fields + [StructField("elem_text", StringType())]
)

_MEDIA_TAG = {"image": "img", "video": "video", "object": "object"}


def assemble_html(spans: list) -> str:
    """Interleaved input spans -> one HTML payload.

    Text-kind spans ('html'/'text') concatenate in offset order; media spans
    become media elements at their stream position (the "interleaved
    placeholders resolved against DOM positions" contract).
    """
    parts: list[str] = []
    for s in sorted(spans, key=lambda x: x["offset"] if x["offset"] is not None else 0):
        kind = s["kind"]
        if kind in ("html", "text"):
            parts.append(s["text"] or "")
        else:
            tag = _MEDIA_TAG.get(kind)
            if tag is None:
                continue
            ref = s["media_ref"] or ""
            if tag == "object":
                parts.append(f'<object data="{ref}"></object>')
            elif tag == "video":
                parts.append(f'<video src="{ref}"></video>')
            else:
                parts.append(f'<img src="{ref}">')
    return "".join(parts)


def spans_to_rows(spans: list[tuple]) -> list[dict]:
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": o}
        for k, t, m, o in spans
    ]


def extract_spans_from_html(html: str, base_uri: str = "") -> list[dict]:
    return spans_to_rows(_kernel_extract_spans(_parse(html, base_uri)))


def salted_repartition(df: DataFrame, num_partitions: int | None = None,
                       id_col: str = "doc_id") -> DataFrame:
    """Scatter rows uniformly by hash(doc_id) so giant documents spread
    across partitions instead of clumping (north-rule skew defusal)."""
    if num_partitions:
        return df.repartition(num_partitions, F.xxhash64(F.col(id_col)))
    return df.repartition(F.xxhash64(F.col(id_col)))


def extract_spans_df(docs: DataFrame, repartition: int | None = None) -> DataFrame:
    """(doc_id, spans<input>) -> (doc_id, spans<output>) via Arrow kernel."""
    docs = docs.select("doc_id", "spans")
    if repartition:
        docs = salted_repartition(docs, repartition)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        arrow_spans_type = pa.list_(
            pa.struct(
                [
                    ("kind", pa.string()),
                    ("text", pa.string()),
                    ("media_ref", pa.string()),
                    ("offset", pa.int32()),
                ]
            )
        )
        for batch in batches:
            ids = batch.column(0)
            in_spans = batch.column(1).to_pylist()
            out = [
                extract_spans_from_html(assemble_html(s or []))
                for s in in_spans
            ]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out, type=arrow_spans_type)],
                names=["doc_id", "spans"],
            )

    return docs.mapInArrow(kernel, SPANS_SCHEMA)


def extract_spans_from_html_df(docs: DataFrame, html_col: str = "html",
                               id_col: str = "doc_id",
                               repartition: int | None = None) -> DataFrame:
    """(doc_id, html) -> (doc_id, spans)."""
    docs = docs.select(F.col(id_col).cast("string").alias("doc_id"),
                       F.col(html_col).alias("html"))
    if repartition:
        docs = salted_repartition(docs, repartition)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        arrow_spans_type = pa.list_(
            pa.struct(
                [
                    ("kind", pa.string()),
                    ("text", pa.string()),
                    ("media_ref", pa.string()),
                    ("offset", pa.int32()),
                ]
            )
        )
        for batch in batches:
            ids = batch.column(0)
            htmls = batch.column(1).to_pylist()
            out = [extract_spans_from_html(h or "") for h in htmls]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out, type=arrow_spans_type)],
                names=["doc_id", "spans"],
            )

    return docs.mapInArrow(kernel, SPANS_SCHEMA)


_TEXT_COLUMN_NAMES = {"text": "elem_text", "own": "elem_own_text",
                      "whole": "elem_whole_text",
                      "whole_own": "elem_whole_own_text",
                      "data": "elem_data"}


def node_table_df(docs: DataFrame, html_col: str = "html",
                  id_col: str = "doc_id",
                  include_elem_text: bool = False,
                  text_columns: tuple = (),
                  match_text: bool = False) -> DataFrame:
    """(doc_id, html) -> exploded node table (SURVEY.md §1.2): one row per
    DOM node with preorder ids, int parent/child/sibling indices, and a
    subtree interval enabling descendant joins
    (ancestor iff anc.node_id < d.node_id <= anc.subtree_end).

    include_elem_text adds a normalized per-element ``elem_text`` column so
    nodequery can compile :contains/:matches as JVM string predicates.
    text_columns generalizes it to the other per-element text views the
    text pseudos read: any of "text", "own" (elem_own_text), "whole"
    (elem_whole_text), "whole_own" (elem_whole_own_text), "data"
    (elem_data). Opt-in: each text fragment is stored once per ancestor
    element, so at corpus scale request only what the query set needs.

    match_text builds the table from the :matchText-rewritten tree
    (selector.prepare_match_text — every text-node child wrapped in a
    PseudoTextElement carrying the parent's tag+attrs, Evaluator.kt:816-829)
    and adds a 0/1 ``pseudo`` column, so nodequery compiles :matchText as a
    plain column predicate. Opt-in because the rewrite changes tree shape
    for EVERY selector evaluated over the table — exactly the reference's
    own semantics, where a :matchText query mutates the document."""
    docs = docs.select(F.col(id_col).cast("string").alias("doc_id"),
                       F.col(html_col).alias("html"))
    tcols = tuple(dict.fromkeys(
        (("text",) if include_elem_text else ()) + tuple(text_columns)))
    text_names = tuple(_TEXT_COLUMN_NAMES[k] for k in tcols)
    extra_fields = [StructField(n, StringType()) for n in text_names]
    if match_text:
        extra_fields.append(StructField("pseudo", IntegerType()))
    schema = StructType(NODE_TABLE_SCHEMA.fields + extra_fields)
    copy_keys = ("node_id", "parent_id", "depth", "kind", "tag",
                 "ns", "sibling_index", "elem_sibling_index",
                 "first_child", "next_sibling", "subtree_end", "text")
    copy_keys = copy_keys + text_names
    if match_text:
        copy_keys = copy_keys + ("pseudo",)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..kernel.selector import prepare_match_text
        for batch in batches:
            ids = batch.column(0).to_pylist()
            htmls = batch.column(1).to_pylist()
            cols: dict[str, list] = {f.name: [] for f in schema.fields}
            for did, h in zip(ids, htmls):
                doc = _parse(h or "")
                if match_text:
                    prepare_match_text(doc)
                t = doc.to_table(text_columns=tcols,
                                 include_pseudo=match_text)
                n = len(t["node_id"])
                cols["doc_id"].extend([did] * n)
                for key in copy_keys:
                    cols[key].extend(t[key])
                cols["attrs"].extend(t["attrs"])
            arrays = [
                pa.array(cols["doc_id"], type=pa.string()),
                pa.array(cols["node_id"], type=pa.int32()),
                pa.array(cols["parent_id"], type=pa.int32()),
                pa.array(cols["depth"], type=pa.int32()),
                pa.array(cols["kind"], type=pa.int32()),
                pa.array(cols["tag"], type=pa.string()),
                pa.array(cols["ns"], type=pa.int32()),
                pa.array(cols["sibling_index"], type=pa.int32()),
                pa.array(cols["elem_sibling_index"], type=pa.int32()),
                pa.array(cols["first_child"], type=pa.int32()),
                pa.array(cols["next_sibling"], type=pa.int32()),
                pa.array(cols["subtree_end"], type=pa.int32()),
                pa.array(cols["text"], type=pa.string()),
                pa.array(cols["attrs"], type=pa.map_(pa.string(), pa.string())),
            ]
            for n_ in text_names:
                arrays.append(pa.array(cols[n_], type=pa.string()))
            if match_text:
                arrays.append(pa.array(cols["pseudo"], type=pa.int32()))
            yield pa.RecordBatch.from_arrays(
                arrays, names=[f.name for f in schema.fields])

    return docs.mapInArrow(kernel, schema)


# node-kind codes re-exported for DataFrame-side filters
KIND_DOCUMENT = dom.DOCUMENT
KIND_ELEMENT = dom.ELEMENT
KIND_TEXT = dom.TEXT
KIND_DATA = dom.DATA
KIND_COMMENT = dom.COMMENT
KIND_CDATA = dom.CDATA


def extract_spans_from_bytes_df(docs: DataFrame, bytes_col: str = "content",
                                id_col: str = "doc_id",
                                charset_col: str | None = None) -> DataFrame:
    """(doc_id, content:binary[, charset hint]) -> (doc_id, spans).

    Runs the full charset pipeline per document before parsing: gzip magic,
    BOM sniff (overrides everything), declared-charset detection from the
    first 5KB (meta/xml-decl trial scan), hint fallback, then UTF-8 —
    DataUtil.load semantics (helper/DataUtil.kt:38-259). Pairs with
    spark.read.format("binaryFile") for raw crawl archives.
    """
    from ..kernel.charset import decode_html_bytes

    cols = [F.col(id_col).cast("string").alias("doc_id"),
            F.col(bytes_col).alias("content")]
    if charset_col:
        cols.append(F.col(charset_col).alias("charset"))
    docs = docs.select(*cols)
    has_hint = charset_col is not None

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        arrow_spans_type = pa.list_(
            pa.struct(
                [
                    ("kind", pa.string()),
                    ("text", pa.string()),
                    ("media_ref", pa.string()),
                    ("offset", pa.int32()),
                ]
            )
        )
        for batch in batches:
            ids = batch.column(0)
            payloads = batch.column(1).to_pylist()
            hints = batch.column(2).to_pylist() if has_hint else [None] * len(payloads)
            out = [
                extract_spans_from_html(
                    decode_html_bytes(b or b"", h) if b is not None else ""
                )
                for b, h in zip(payloads, hints)
            ]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out, type=arrow_spans_type)],
                names=["doc_id", "spans"],
            )

    return docs.mapInArrow(kernel, SPANS_SCHEMA)


SELECTED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("match_index", IntegerType()),
        StructField("tag", StringType()),
        StructField("text", StringType()),
        StructField("own_text", StringType()),
        StructField("attrs", MapType(StringType(), StringType())),
    ]
)


def select_elements_df(docs: DataFrame, css: str, html_col: str = "html",
                       id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide Element.select: one output row per matched element in
    document order, carrying tag/text()/ownText()/attrs.

    The CSS query compiles once on the driver (validated eagerly) and again
    per executor from the broadcast closure's string (QueryParser caches).
    """
    from ..kernel import selector as _sel
    from ..kernel import textops as _tx
    from ..kernel.treebuilder import parse as _p

    _sel.parse_query(css)  # validate on driver
    docs = docs.select(F.col(id_col).cast("string").alias("doc_id"),
                       F.col(html_col).alias("html"))

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        q = _sel.parse_query(css)
        for batch in batches:
            ids = batch.column(0).to_pylist()
            htmls = batch.column(1).to_pylist()
            out = {k: [] for k in
                   ("doc_id", "match_index", "tag", "text", "own_text", "attrs")}
            for did, h in zip(ids, htmls):
                d = _p(h or "")
                for mi, node in enumerate(_sel.select(d, q)):
                    out["doc_id"].append(did)
                    out["match_index"].append(mi)
                    out["tag"].append(d.tag[node])
                    out["text"].append(_tx.element_text(d, node))
                    out["own_text"].append(_tx.own_text(d, node))
                    out["attrs"].append(d.attrs[node])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out["doc_id"], type=pa.string()),
                    pa.array(out["match_index"], type=pa.int32()),
                    pa.array(out["tag"], type=pa.string()),
                    pa.array(out["text"], type=pa.string()),
                    pa.array(out["own_text"], type=pa.string()),
                    pa.array(out["attrs"], type=pa.map_(pa.string(), pa.string())),
                ],
                names=["doc_id", "match_index", "tag", "text", "own_text", "attrs"],
            )

    return docs.mapInArrow(kernel, SELECTED_SCHEMA)
