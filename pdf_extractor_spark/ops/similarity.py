"""Approximate-nearest-neighbor search over an embedding column.

Two paths, as a training-data pipeline needs them:

- ``ann_bruteforce``: exact cosine top-k — broadcast the (small) query set
  against the full corpus; one shuffle on query_id for the per-query top-k
  window. The correctness baseline.
- ``ann_lsh``: the scale path — embeddings are bucketed by an 8-bit
  sign-code (axis-aligned hyperplane LSH: bit_j = [v_j > 0]); queries only
  meet candidates in their own bucket, turning the O(Q*N) cross join into a
  per-bucket join keyed on the code. At 100 TB the bucket code is a
  partition column, so a query touches 1/256th of the corpus.

Dot products fold the array in index order with doubles on both engines, so
ranking compares exactly (ties broken by vec_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DIM = 64
N_QUERIES = 10  # vec_id < 10 are the query set
TOP_K = 5
LSH_BITS = 8


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        "label",
        v.alias("v"),
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)).alias("norm"),
    )


def _cosine(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(F.col(f"{a}.v"), F.col(f"{b}.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (F.col(f"{a}.norm") * F.col(f"{b}.norm"))


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for each query vector (vec_id < 10)."""
    emb = _embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") < N_QUERIES).alias("q")
    c = emb.alias("c")
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            _cosine("q", "c").alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("cos") * 1000000.0).cast("bigint").alias("cosine_micros"),
        )
        .orderBy("query_id", "rank")
    )


def _dot_sql(a: str, b: str) -> str:
    return " + ".join(f"({a}[{i}] * {b}[{i}])" for i in range(1, DIM + 1))


def _norm_sql(a: str) -> str:
    return "sqrt(" + " + ".join(f"({a}[{i}] * {a}[{i}])" for i in range(1, DIM + 1)) + ")"


ANN_BRUTEFORCE_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, {_norm_sql('v')} AS nrm FROM e),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ({_dot_sql('q.v', 'c.v')}) / (q.nrm * c.nrm) AS cos
  FROM n q, n c
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank,
       CAST(floor(cos * 1000000.0) AS BIGINT) AS cosine_micros
FROM ranked WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""


def lsh_code(v_col: str):
    """8-bit sign code over the first 8 dims (axis-aligned hyperplanes)."""
    code = None
    for j in range(LSH_BITS):
        bit = F.when(F.element_at(F.col(v_col), j + 1) > 0, F.lit(2**j)).otherwise(F.lit(0))
        code = bit if code is None else code + bit
    return code.cast("int")


def _lsh_code_sql(v: str) -> str:
    return (
        "("
        + " + ".join(f"(CASE WHEN {v}[{j + 1}] > 0 THEN {2**j} ELSE 0 END)" for j in range(LSH_BITS))
        + ")"
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed top-3: candidates share the query's 8-bit sign code.

    The join key is the bucket code — no cross join; this is the plan shape
    that survives 100 TB (code becomes a partition column, per-bucket joins
    are local).
    """
    emb = _embeddings(spark, sf_dir).withColumn("code", lsh_code("v"))
    q = emb.where(F.col("vec_id") < N_QUERIES).alias("q")
    c = emb.alias("c")
    scored = (
        c.join(F.broadcast(q), F.col("q.code") == F.col("c.code"))
        .where(F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            _cosine("q", "c").alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("cos") * 1000000.0).cast("bigint").alias("cosine_micros"),
        )
        .orderBy("query_id", "rank")
    )


ANN_LSH_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, {_norm_sql('v')} AS nrm, {_lsh_code_sql('v')} AS code FROM e),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ({_dot_sql('q.v', 'c.v')}) / (q.nrm * c.nrm) AS cos
  FROM n q JOIN n c USING (code)
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank,
       CAST(floor(cos * 1000000.0) AS BIGINT) AS cosine_micros
FROM ranked WHERE rank <= 3 ORDER BY query_id, rank
"""


QUERIES: dict[str, tuple] = {
    "ann_bruteforce": (q_ann_bruteforce, ANN_BRUTEFORCE_SQL),
    "ann_lsh": (q_ann_lsh, ANN_LSH_SQL),
}
