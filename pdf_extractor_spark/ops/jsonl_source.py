"""JSONL document source (S-family widening): the lingua franca of LLM
corpus interchange, read with an EXPLICIT schema + corrupt-line quarantine.

The reference ingests files a manifest names (SURVEY §2.1); large-scale
corpora additionally arrive as newline-delimited JSON. The engine's
contract for any source holds here: explicit schema (inference is a full
extra pass and nondeterministic under drift), malformed input quarantined
into metrics — never an aborted job (S3 gate semantics), and everything
hash-verified against a DuckDB oracle over the same bytes.

Scale shape: `spark.read.json` with a provided schema is a streaming
single-pass scan (no inference pass), splittable per file, column-pruned;
PERMISSIVE mode turns each corrupt line into an all-null row captured by
``columnNameOfCorruptRecord`` instead of failing the task. Valid-row
filtering keys on ``doc_id IS NOT NULL`` (Spark forbids referencing only
the internal corrupt column without materializing; the pytest that counts
quarantined lines caches first, per the documented Spark contract).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_JSONL_DOCS = 120  # per file
_JSONL_FILES = 3

JSONL_SCHEMA = (
    "doc_id string, source string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "_corrupt string"
)


def jsonl_fixture_root() -> str:
    """Deterministic JSONL corpus: 3 files x 120 docs with interleaved
    text/media spans, plus per file one truncated-JSON line and one valid
    line with no spans (metadata-only doc). Content is formula-driven —
    bytes depend on nothing but this code."""
    root = os.path.join(tempfile.gettempdir(), "pes-jsonl-fixture-v1")
    done = os.path.join(root, ".complete")
    if os.path.exists(done):
        return root
    os.makedirs(root, exist_ok=True)
    for f in range(_JSONL_FILES):
        lines = []
        for i in range(_JSONL_DOCS):
            n = f * _JSONL_DOCS + i
            spans = [
                '{"kind":"text","text":"doc %d line %d","media_ref":"","offset":0}'
                % (n, n % 7)
            ]
            if n % 3 == 0:
                spans.append(
                    '{"kind":"media","text":"","media_ref":"media://%d","offset":1}'
                    % n
                )
            lines.append(
                '{"doc_id":"j-%05d","source":"s%d","spans":[%s]}'
                % (n, f, ",".join(spans))
            )
        # one metadata-only doc (valid JSON, no spans key)
        lines.append('{"doc_id":"j-meta-%d","source":"s%d"}' % (f, f))
        # one corrupt line (truncated) — must quarantine, never abort
        lines.append('{"doc_id":"j-bad-%d","source":' % f)
        with open(os.path.join(root, f"part-{f}.jsonl"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
    with open(done, "w") as fh:
        fh.write("ok")
    return root


def read_jsonl_documents(spark: SparkSession, path: str) -> DataFrame:
    """documents(doc_id, spans, source) from a JSONL directory, corrupt
    lines quarantined into the ``_corrupt`` column (all other fields
    null)."""
    return (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def q_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid-row view of the JSONL fixture with per-doc span stats —
    the hash gate for the whole source path (schema projection, nested
    array decode, null-spans docs, corrupt-line exclusion)."""
    df = read_jsonl_documents(spark, jsonl_fixture_root())
    return (
        df.where(F.col("doc_id").isNotNull())
        .select(
            "doc_id",
            "source",
            F.coalesce(F.size("spans"), F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce(F.element_at("spans", 1)["kind"], F.lit("")).alias(
                "first_kind"
            ),
            F.coalesce(
                F.aggregate(
                    "spans",
                    F.lit(0).cast("bigint"),
                    lambda acc, s: acc + F.length(s["text"]),
                ),
                F.lit(0),
            ).alias("text_chars"),
        )
        .orderBy("doc_id")
    )


def _jsonl_ingest_sql() -> str:
    root = jsonl_fixture_root()
    return f"""
SELECT doc_id, source,
       coalesce(len(spans), 0) AS n_spans,
       coalesce(spans[1].kind, '') AS first_kind,
       CAST(coalesce(list_sum(list_transform(spans, s -> length(s.text))), 0)
            AS BIGINT) AS text_chars
FROM read_json('{root}/part-*.jsonl',
               format='newline_delimited', ignore_errors=true,
               columns={{'doc_id': 'VARCHAR', 'source': 'VARCHAR',
                        'spans': 'STRUCT(kind VARCHAR, text VARCHAR,
                                  media_ref VARCHAR, "offset" INTEGER)[]'}})
WHERE doc_id IS NOT NULL
ORDER BY doc_id
"""


QUERIES: dict[str, tuple] = {
    "jsonl_ingest": (q_jsonl_ingest, _jsonl_ingest_sql),
}
