"""Internal binary-payload staging table for multi-pass pipelines.

The INGEST span schema (kind, text, media_ref, offset — all-string text,
pdf bytes base64-in-string) is pinned by the task contract
(BASELINE.json:input_hint) and never changes. But a multi-pass pipeline —
stage once, then re-read the corpus for extraction, dedup, quality, ANN
passes — should not pay the base64 tax on every pass: the 10x profiling run
(BENCH/BASELINE.md) measured that after kernel optimizations the residual
cost is dominated by bytes moved across scan/shuffle/Arrow, and base64
inflates every PDF byte by 4/3 AND forces a per-doc ``b64decode`` in every
consumer.

So the engine stages internally as::

    staged(doc_id STRING,
           spans ARRAY<STRUCT<kind:STRING, payload:BINARY,
                              media_ref:STRING, offset:INT>>)

- ``stage_documents`` converts ingest -> staged in ONE vectorized Arrow
  pass: pdf base64 is strictly decoded exactly once (same ``validate=True``
  semantics as the direct kernel — ``core.extractor.stage_span``; a payload
  that fails strict decode is staged as NULL, the tombstone the parse stage
  turns into the contract's parse-failure). Text/html payloads become their
  UTF-8 bytes (free: parquet stores string pages as UTF-8 already).
- ``extract_documents_staged`` is the binary-input twin of
  ``pipeline.extract_documents`` — same salted size-bucket balancing
  (``octet_length`` on binary), same Arrow kernel shape, byte-identical
  output (differential-tested in ``tests/test_staging.py``).

Scale math (why this is the right 100-TB shape): a PDF-heavy corpus staged
this way shrinks the *on-disk* table ~25% (base64 also defeats parquet's
byte-stream-split/dictionary tricks), and every downstream pass saves that
25% again in scan + shuffle + Arrow transfer, plus one b64decode per doc
per pass. Measured numbers live in BENCH/BASELINE.md §"Binary staging".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .pipeline import (
    EXTRACTED_SCHEMA,
    assign_part_id,
    balance_partitions,
)

STAGED_SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

STAGED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(STAGED_SPAN_STRUCT)),
    ]
)


def _stage_batches_arrow(batches):
    """documents(doc_id, spans<text>) -> staged(doc_id, spans<binary>).

    Flat per-span conversion: list offsets pass through untouched (staging
    never reorders or renumbers — the parse stage owns offset semantics),
    only the payload encoding changes. No per-span dicts, no pandas.
    """
    import pyarrow as pa

    from pdf_extractor_spark.core.extractor import stage_span

    staged_type = pa.struct(
        [
            ("kind", pa.string()),
            ("payload", pa.binary()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )

    for rb in batches:
        names = rb.schema.names
        doc_ids = rb.column(names.index("doc_id"))
        spans_col = rb.column(names.index("spans"))

        lengths = spans_col.value_lengths().to_pylist()
        flat = spans_col.flatten()
        in_kind = flat.field(0).to_pylist()
        in_text = flat.field(1).to_pylist()
        in_ref = flat.field(2)
        in_off = flat.field(3)

        payloads = [stage_span(k or "", t) for k, t in zip(in_kind, in_text)]

        struct = pa.StructArray.from_arrays(
            [
                flat.field(0),
                pa.array(payloads, pa.binary()),
                in_ref,
                in_off,
            ],
            fields=list(staged_type),
        )
        list_offsets = [0]
        for ln in lengths:
            list_offsets.append(list_offsets[-1] + (ln or 0))
        spans_out = pa.ListArray.from_arrays(pa.array(list_offsets, pa.int32()), struct)
        yield pa.RecordBatch.from_arrays([doc_ids, spans_out], names=["doc_id", "spans"])


def stage_documents(df: DataFrame) -> DataFrame:
    """One-time ingest -> staging conversion (lazy; write with
    ``df.write.parquet`` / ``writeTo(...)`` to materialize the staging
    table). Narrow — no shuffle; pipelines straight out of the ingest scan.
    """
    return df.select("doc_id", "spans").mapInArrow(
        _stage_batches_arrow, schema=STAGED_SCHEMA
    )


def _extract_staged_batches_arrow(batches):
    """Binary twin of ``pipeline._extract_batches_arrow``: same columnar
    span plumbing, but the payload field is raw bytes — no base64 in the
    kernel, ~25% fewer bytes through the Arrow boundary on PDF spans."""
    import pyarrow as pa

    from pdf_extractor_spark.core.extractor import extract_document_staged

    span_type = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )

    for rb in batches:
        names = rb.schema.names
        doc_ids = rb.column(names.index("doc_id")).to_pylist()
        spans_col = rb.column(names.index("spans"))
        has_part = "part_id" in names
        parts = rb.column(names.index("part_id")).to_pylist() if has_part else None
        n = len(doc_ids)

        lengths = spans_col.value_lengths().to_pylist()
        flat = spans_col.flatten()
        in_kind = flat.field(0).to_pylist()
        in_payload = flat.field(1).to_pylist()
        in_ref = flat.field(2).to_pylist()
        in_off = flat.field(3).to_pylist()

        out_kind: list[str] = []
        out_text: list[str] = []
        out_ref: list[str] = []
        out_off: list[int] = []
        list_offsets = [0]
        pages_l: list[int] = []
        emitted_l: list[int] = []
        failures_l: list[int] = []
        duration_l: list[int] = []
        score_keys: list[str] = []
        score_vals: list[float] = []
        score_offsets = [0]

        pos = 0
        for i in range(n):
            ln = lengths[i] or 0
            spans = list(
                zip(
                    in_kind[pos : pos + ln],
                    in_payload[pos : pos + ln],
                    in_ref[pos : pos + ln],
                    in_off[pos : pos + ln],
                )
            )
            pos += ln
            res = extract_document_staged(spans)
            for k, t, m, o in res.spans:
                out_kind.append(k)
                out_text.append(t)
                out_ref.append(m)
                out_off.append(o)
            list_offsets.append(len(out_kind))
            pages_l.append(res.pages_parsed)
            emitted_l.append(res.spans_emitted)
            failures_l.append(res.parse_failures)
            duration_l.append(res.duration_ms)
            for k, v in res.scores.items():
                score_keys.append(k)
                score_vals.append(v)
            score_offsets.append(len(score_keys))

        struct = pa.StructArray.from_arrays(
            [
                pa.array(out_kind, pa.string()),
                pa.array(out_text, pa.string()),
                pa.array(out_ref, pa.string()),
                pa.array(out_off, pa.int32()),
            ],
            fields=list(span_type),
        )
        spans_out = pa.ListArray.from_arrays(pa.array(list_offsets, pa.int32()), struct)
        scores_out = pa.MapArray.from_arrays(
            pa.array(score_offsets, pa.int32()),
            pa.array(score_keys, pa.string()),
            pa.array(score_vals, pa.float64()),
        )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(doc_ids, pa.string()),
                spans_out,
                pa.array(pages_l, pa.int32()),
                pa.array(emitted_l, pa.int32()),
                pa.array(failures_l, pa.int32()),
                pa.array(duration_l, pa.int64()),
                scores_out,
                pa.array(parts if has_part else [-1] * n, pa.int32()),
            ],
            names=[
                "doc_id",
                "spans",
                "pages_parsed",
                "spans_emitted",
                "parse_failures",
                "duration_ms",
                "scores",
                "part_id",
            ],
        )


def extract_documents_staged(
    df: DataFrame,
    n_parts: int = 256,
    num_partitions: int | None = None,
    balance: bool = True,
) -> DataFrame:
    """staged(doc_id, spans<binary>) -> extracted(...) — same output schema
    and byte-identical values as ``pipeline.extract_documents`` on the
    un-staged input; the shuffle ahead of the kernel moves binary payloads
    (3/4 the bytes of their base64 form)."""
    df = df.select("doc_id", "spans")
    df = assign_part_id(df, n_parts)
    if balance:
        df = balance_partitions(
            df, num_partitions or max(n_parts // 2, 32), payload_field="payload"
        )
    return df.mapInArrow(_extract_staged_batches_arrow, schema=EXTRACTED_SCHEMA)


def read_staged(spark: SparkSession, path: str) -> DataFrame:
    """Read a materialized staging table (parquet / Iceberg path)."""
    return spark.read.schema(STAGED_SCHEMA).parquet(path)
