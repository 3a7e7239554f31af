"""Multimodal (image/audio/video) column plumbing.

The engine treats media payloads as opaque ``binary`` columns with typed
metadata, exactly as a 100 TB training-data pipeline must: bytes never pass
through Python row-at-a-time — they move as Arrow buffers into
``mapInPandas`` batches. The actual codec work (image decode, resize, audio
resample, video frame-sample) is STUBBED deterministically because the
image/audio libraries are not in this container; the Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape — is real and tested.

``media_features`` is oracle-checked: the metadata features it computes
(byte length, md5 digest, stub dimensions) have closed-form SQL equivalents,
so the whole binary round-trip (string -> binary column -> Arrow -> pandas
bytes -> features) is value-hash verified against DuckDB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("content_md5", StringType()),
        StructField("stub_width", IntegerType()),
        StructField("stub_height", IntegerType()),
        StructField("decode_status", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int]:
    """Image decode STUB — deterministic fake dimensions from the payload.

    A real deployment drops in PIL/libvips here; the container has neither,
    so dimensions derive from the content digest (stable, testable). The
    Spark plumbing around this call is the real contract.
    """
    d = hashlib.md5(payload).digest()
    return (64 + d[0] % 192, 64 + d[1] % 192)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        rows = {k: [] for k in MEDIA_FEATURES_SCHEMA.fieldNames()}
        for i in range(len(b)):
            raw = b["payload"].iat[i]
            rows["doc_id"].append(int(b["doc_id"].iat[i]))
            if raw is None:
                # a NULL payload (NULL text upstream) must yield a
                # null-featured ROW, matching the SQL oracle — bytes(None)
                # used to TypeError the whole task (review finding)
                rows["n_bytes"].append(None)
                rows["content_md5"].append(None)
                rows["stub_width"].append(None)
                rows["stub_height"].append(None)
                rows["decode_status"].append("null")
                continue
            payload = bytes(raw)
            w, h = decode_image(payload)
            rows["n_bytes"].append(len(payload))
            rows["content_md5"].append(hashlib.md5(payload).hexdigest())
            rows["stub_width"].append(w)
            rows["stub_height"].append(h)
            rows["decode_status"].append("stub")
        yield pd.DataFrame(rows)


def media_features(df: DataFrame) -> DataFrame:
    """(doc_id, payload:binary) -> typed feature rows via Arrow batches."""
    return df.select("doc_id", "payload").mapInPandas(
        _feature_batches, schema=MEDIA_FEATURES_SCHEMA
    )


def _frame_sample_batches(every: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
            for i in range(len(b)):
                raw = b["payload"].iat[i]
                if raw is None:
                    continue  # NULL payload: no frames, like an empty one
                payload = bytes(raw)
                # frame-sample STUB: a real build hands payload to a video
                # demuxer; here every Nth 16-byte block stands in for a frame
                for idx, start in enumerate(range(0, len(payload), 16 * every)):
                    out["doc_id"].append(int(b["doc_id"].iat[i]))
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(payload[start : start + 16])
            yield pd.DataFrame(out)

    return gen


def frame_sample(df: DataFrame, every: int = 4) -> DataFrame:
    """One-to-many frame sampling: (doc, payload) -> (doc, frame_idx, bytes).

    The mapInPandas shape matters: output cardinality differs from input, so
    this cannot be a scalar pandas_udf — it is the same contract a real
    video frame-sampler needs.
    """
    return df.select("doc_id", "payload").mapInPandas(
        _frame_sample_batches(every), schema=FRAME_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("resized_md5", StringType()),
        StructField("resize_status", StringType()),
    ]
)


def resize_image_stub(payload: bytes, width: int, height: int) -> bytes:
    """Image resize STUB — deterministic surrogate for the resized bytes.

    A real build calls PIL/libvips resize; the surrogate is a pure function
    of (content digest, target dims) so the whole Arrow round-trip is
    value-checkable: md5hex(payload) || '|WxH' utf-8 encoded.
    """
    return f"{hashlib.md5(payload).hexdigest()}|{width}x{height}".encode()


def _resize_batches(width: int, height: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k: [] for k in RESIZE_SCHEMA.fieldNames()}
            for i in range(len(b)):
                raw = b["payload"].iat[i]
                rows["doc_id"].append(int(b["doc_id"].iat[i]))
                rows["out_width"].append(width)
                rows["out_height"].append(height)
                if raw is None:  # null-featured row, matching the oracle
                    rows["resized_md5"].append(None)
                    rows["resize_status"].append("null")
                    continue
                payload = bytes(raw)
                resized = resize_image_stub(payload, width, height)
                rows["resized_md5"].append(hashlib.md5(resized).hexdigest())
                rows["resize_status"].append("stub")
            yield pd.DataFrame(rows)

    return gen


def resize_images(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """(doc_id, payload:binary) -> resized-image metadata via Arrow batches."""
    return df.select("doc_id", "payload").mapInPandas(
        _resize_batches(width, height), schema=RESIZE_SCHEMA
    )


# --- oracle-checked query ---------------------------------------------------

def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat each document's text bytes as an opaque media payload."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return media_features(payloads).select(
        "doc_id", "n_bytes", "content_md5", "stub_width", "stub_height", "decode_status"
    ).orderBy("doc_id")


MEDIA_FEATURES_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       md5(text) AS content_md5,
       CAST(64 + (('0x' || substr(md5(text), 1, 2))::INTEGER % 192) AS INTEGER)
         AS stub_width,
       CAST(64 + (('0x' || substr(md5(text), 3, 2))::INTEGER % 192) AS INTEGER)
         AS stub_height,
       CASE WHEN text IS NULL THEN 'null' ELSE 'stub' END AS decode_status
FROM documents ORDER BY doc_id
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing over binary payloads (first 50 docs)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = docs.where(F.col("doc_id") < 50).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    frames = frame_sample(payloads, every=4)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.sum(F.octet_length("frame_bytes")).alias("frame_bytes_total"),
        )
        .orderBy("doc_id")
    )


FRAME_SAMPLE_SQL = """
SELECT doc_id,
       CAST(ceil(n / 64.0) AS BIGINT) AS n_frames,
       CAST(sum_bytes AS BIGINT) AS frame_bytes_total
FROM (
  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n,
         -- every 4th 16-byte block: full blocks of 16 plus the tail block
         (CASE WHEN n % 64 = 0 OR n % 64 >= 16
               THEN (n // 64) * 16 + (CASE WHEN n % 64 >= 16 THEN 16 ELSE 0 END)
               ELSE (n // 64) * 16 + n % 64 END) AS sum_bytes
  FROM documents
  -- a NULL or zero-byte payload samples NO frames on the Spark side
  -- (the kernel's range is empty), so it must yield no row here either,
  -- not an (n_frames=0) row (review finding)
  WHERE doc_id < 50 AND text IS NOT NULL AND octet_length(encode(text)) > 0)
ORDER BY doc_id
"""


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over binary payloads (stubbed codec, real Arrow path)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return resize_images(payloads, width=32, height=32).orderBy("doc_id")


MEDIA_RESIZE_SQL = """
SELECT doc_id,
       CAST(32 AS INTEGER) AS out_width,
       CAST(32 AS INTEGER) AS out_height,
       md5(md5(text) || '|32x32') AS resized_md5,
       CASE WHEN text IS NULL THEN 'null' ELSE 'stub' END AS resize_status
FROM documents ORDER BY doc_id
"""


def q_polygon_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-geometry normalization: an 8-number polygon
    (x0,y0,...,x3,y3) collapses to its axis-aligned bbox
    (min x, min y, max x, max y) — the reference's F7
    (azure_ai_processor.py:111-116, stride slices poly[0::2]/poly[1::2]).
    Polygons are synthesized from the first 8 embedding components so the
    op runs on driver testdata without external geometry.

    Scale shape: map-only JVM expressions (element_at + least/greatest),
    pipelines into the scan, zero shuffles before the output sort.
    Exactness: float -> double widening is exact; both engines floor the
    identical IEEE product (floor-micros rule)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = F.col("embedding")
    xs = [e[i].cast("double") for i in (0, 2, 4, 6)]
    ys = [e[i].cast("double") for i in (1, 3, 5, 7)]
    m = lambda c: F.floor(c * 1_000_000.0).cast("bigint")
    return emb.select(
        "vec_id",
        m(F.least(*xs)).alias("x_min_micros"),
        m(F.least(*ys)).alias("y_min_micros"),
        m(F.greatest(*xs)).alias("x_max_micros"),
        m(F.greatest(*ys)).alias("y_max_micros"),
    ).orderBy("vec_id")


POLYGON_BBOX_SQL = """
SELECT vec_id,
       CAST(floor(least(CAST(embedding[1] AS DOUBLE), CAST(embedding[3] AS DOUBLE),
                        CAST(embedding[5] AS DOUBLE), CAST(embedding[7] AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS x_min_micros,
       CAST(floor(least(CAST(embedding[2] AS DOUBLE), CAST(embedding[4] AS DOUBLE),
                        CAST(embedding[6] AS DOUBLE), CAST(embedding[8] AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS y_min_micros,
       CAST(floor(greatest(CAST(embedding[1] AS DOUBLE), CAST(embedding[3] AS DOUBLE),
                           CAST(embedding[5] AS DOUBLE), CAST(embedding[7] AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS x_max_micros,
       CAST(floor(greatest(CAST(embedding[2] AS DOUBLE), CAST(embedding[4] AS DOUBLE),
                           CAST(embedding[6] AS DOUBLE), CAST(embedding[8] AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS y_max_micros
FROM embeddings ORDER BY vec_id
"""


QUERIES: dict[str, tuple] = {
    "media_features": (q_media_features, MEDIA_FEATURES_SQL),
    "frame_sample": (q_frame_sample, FRAME_SAMPLE_SQL),
    "media_resize": (q_media_resize, MEDIA_RESIZE_SQL),
    "polygon_bbox": (q_polygon_bbox, POLYGON_BBOX_SQL),
}
