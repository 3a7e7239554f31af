"""Advanced relational + grouped-UDF operators.

Spark capabilities the reference never had but a complete engine exposes
"for free" once the data is a DataFrame (SURVEY.md §2.4 note): rollup
grouping sets, gap-based sessionization windows, corpus word counts, and a
grouped ``applyInPandas`` kernel (per-group pandas logic — the grouped
sibling of the extraction pipeline's ``mapInPandas``). Each has an exact
DuckDB oracle; all money/ratio outputs use the integer-exact conventions
from analytics.py (cents / floor-micros, never raw double sums).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .portable import tokens, tokens_sql


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- rollup / grouping sets ------------------------------------------------

def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup over (mktsegment, orderpriority) incl. grand total."""
    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    return (
        joined.rollup("c_mktsegment", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias("revenue_cents"),
        )
        .select(
            F.coalesce("c_mktsegment", F.lit("<all>")).alias("mktsegment"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("orderpriority"),
            "n_orders",
            "revenue_cents",
        )
        .orderBy("mktsegment", "orderpriority")
    )


ROLLUP_REVENUE_SQL = """
SELECT coalesce(c_mktsegment, '<all>') AS mktsegment,
       coalesce(o_orderpriority, '<all>') AS orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
ORDER BY mktsegment, orderpriority
"""


# --- gap-based sessionization ----------------------------------------------

SESSION_GAP_MIN = 30


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions: a new session starts after a >30-minute gap.

    lag + running sum over (user, ts, event_id) — the classic event-stream
    sessionization; at scale this is one shuffle on user_id and each
    window is evaluated within its partition.
    """
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # TIMESTAMP_NTZ has no direct long cast in Spark 4; go through an
    # explicit UTC timestamp -> whole epoch seconds (sessions pin
    # spark.sql.session.timeZone=UTC so this is tz-independent and matches
    # the oracle's floor(epoch(ts)))
    epoch = F.unix_timestamp(F.to_timestamp(F.col("ts")))
    gap_s = epoch - F.lag(epoch).over(w)
    new_session = F.when(
        gap_s.isNull() | (gap_s > SESSION_GAP_MIN * 60), F.lit(1)
    ).otherwise(F.lit(0))
    sessions = ev.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.sum("n_events").alias("total_events"),
        )
        .orderBy("user_id")
    )


SESSIONIZE_SQL = f"""
WITH flagged AS (
  -- floor(epoch()) matches Spark's timestamp->long cast (whole seconds);
  -- DuckDB's epoch() alone keeps fractional seconds and would split
  -- boundary gaps differently
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR CAST(floor(epoch(ts)) AS BIGINT)
                      - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT)
                      > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
numbered AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM numbered GROUP BY 1, 2)
SELECT user_id,
       count(*) AS n_sessions,
       max(n_events) AS max_session_events,
       CAST(sum(n_events) AS BIGINT) AS total_events
FROM per_session GROUP BY user_id ORDER BY user_id
"""


# --- corpus word count top-k ----------------------------------------------

def q_wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus tokens (partial-agg combine before the shuffle)."""
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(50)
    )


WORDCOUNT_TOPK_SQL = f"""
SELECT token, count(*) AS n
FROM (SELECT unnest({tokens_sql('text')}) AS token FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT 50
"""


# --- grouped applyInPandas: per-language deviation ------------------------

_ZSCORE_SCHEMA = (
    "doc_id bigint, lang string, n_chars bigint, lang_mean_micros bigint, "
    "dev_micros bigint"
)


def _lang_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    # exact integer sum -> one double division: bit-identical to the oracle's
    # CAST(sum AS DOUBLE)/count, immune to accumulation-order effects
    mean = float(pdf["n_chars"].sum()) / len(pdf)
    import math

    out = pdf[["doc_id", "lang", "n_chars"]].copy()
    out["lang_mean_micros"] = int(math.floor(mean * 1_000_000.0))
    out["dev_micros"] = [
        int(math.floor((c - mean) * 1_000_000.0)) for c in pdf["n_chars"]
    ]
    return out


def q_lang_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc-length deviation via grouped ``applyInPandas``.

    The grouped sibling of the extraction pipeline's mapInPandas: one
    shuffle on the group key, then per-group pandas logic on the executor.
    """
    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return (
        docs.groupBy("lang")
        .applyInPandas(_lang_stats, schema=_ZSCORE_SCHEMA)
        .orderBy("doc_id")
    )


LANG_DEVIATION_SQL = """
WITH stats AS (
  SELECT lang,
         CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean
  FROM documents GROUP BY lang)
SELECT doc_id, d.lang, n_chars,
       CAST(floor(mean * 1000000.0) AS BIGINT) AS lang_mean_micros,
       CAST(floor((n_chars - mean) * 1000000.0) AS BIGINT) AS dev_micros
FROM documents d JOIN stats USING (lang)
ORDER BY doc_id
"""


QUERIES: dict[str, tuple] = {
    "rollup_revenue": (q_rollup_revenue, ROLLUP_REVENUE_SQL),
    "sessionize": (q_sessionize, SESSIONIZE_SQL),
    "wordcount_topk": (q_wordcount_topk, WORDCOUNT_TOPK_SQL),
    "lang_deviation": (q_lang_deviation, LANG_DEVIATION_SQL),
}
