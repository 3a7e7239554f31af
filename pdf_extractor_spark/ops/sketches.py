"""Cardinality / frequency sketches — the 100 TB answer to COUNT(DISTINCT).

At scale, exact distinct counts and exact per-key frequencies are shuffle
monsters: ``COUNT(DISTINCT user_id)`` shuffles every distinct key, and a
full per-key frequency table is as large as the key space. The canonical
fix is a sketch: a small, mergeable summary built map-side whose size is
independent of the input. This module implements two classics with
*bit-identical* Spark/DuckDB arithmetic (integer-only estimators — no
libm, no float pow — per the CLAUDE.md cross-engine exactness rules):

- **KMV (k-minimum-values)** distinct estimator [Bar-Yossef et al. 2002]:
  keep the k smallest 52-bit hashes per group; if the group has >= k
  distinct values, estimate D ~= (k-1) * 2^52 / h_(k) (integer division).
  Standard error ~ 1/sqrt(k-2), ~12.7% at k=64.
- **Threshold (proportional) sampling** estimator: keep distinct hashes
  below 2^52 / R and estimate D ~= n_kept * R. Unlike KMV this needs *no
  per-group sort at all* — a map-side filter, one distinct, one count —
  so it is the pure-scale path; KMV adapts its precision to small groups.
- **Count-min sketch** [Cormode & Muthukrishnan 2005]: d=4 hash rows x
  w=1024 counters; per-key frequency estimate = min over rows of the
  addressed counter. Collisions only ever *over*-estimate, and the sketch
  is w*d integers regardless of input size — it broadcasts.

Scale shape: the KMV per-group top-k uses a row_number window (one
exchange on the group key, per-group sort over the *distinct hashes*
only). For extreme-cardinality groups, prefix the window with the same
``h < 2^52/R`` threshold filter (safe whenever a cardinality lower bound
of k*R is known) so the sort sees a 1/R sample; the threshold estimator
columns in the same output are the sort-free fallback. The CMS build is
one map-side-combined groupBy over *per-key counts* (not raw events), and
the point-query join broadcasts the <= d*w = 4096-row sketch.

Reference parity: the reference's only cardinality op is an exact
``len(set(...))`` on the driver (see S-P8, `app/utils/metrics.py` — exact
distinct counters); these are the distributed/approximate siblings a
100 TB corpus requires, per SURVEY.md §2.4's "beyond reference" note.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .dedup import _persisted

KMV_K = 128  # k smallest hashes kept per group; SE ~ 1/sqrt(k-2) ~= 8.9%
THRESH_R = 8  # proportional sampling rate 1/R
H52_MAX = 1 << 52  # 13 hex digits of md5: uniform in [0, 2^52)
# (KMV_K - 1) * 2^52 -- precomputed so the Spark plan and the oracle SQL
# embed the identical literal; 127 * 2^52 = 5.7e17 < 2^63 (no overflow in
# either engine; DuckDB errors on BIGINT overflow, the JVM wraps).
KMV_NUM = (KMV_K - 1) * H52_MAX
CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_TOPK = 10


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _h52(c) -> F.Column:
    """Portable 52-bit hash (md5 prefix — identical in Spark and DuckDB)."""
    return F.conv(F.substring(F.md5(c), 1, 13), 16, 10).cast("bigint")


def _h52_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 13))::BIGINT)"


# --- approx distinct: KMV + threshold sampling -------------------------------

def q_approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users: exact vs KMV vs threshold estimates.

    One distinct on (event_type, h) feeds both estimators; the exact
    count rides along for calibration (at 100 TB you would drop it — it
    is the expensive column). All estimator arithmetic is BIGINT: the
    KMV estimate is ``(k-1)*2^52 DIV h_(k)`` and the threshold estimate
    is ``n_kept * R``, so both engines agree bit-for-bit.
    """
    ev = _read(spark, sf_dir, "events")
    # staged (CLAUDE.md): hashed feeds the KMV and threshold branches —
    # un-staged, the md5+distinct shuffle ran twice and events.parquet was
    # scanned 3x (kmv/thresh/exact branches). Measured at sf0.1: staged
    # 0.9s vs unstaged 0.6s — barrier overhead at toy scale; the stage
    # exists for the regime where the distinct shuffle dominates.
    hashed = _persisted(
        ev.select("event_type", _h52(F.col("user_id").cast("string")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kmv = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.max("h").alias("kth"), F.count("*").alias("n_kept"))
        .select(
            "event_type",
            F.when(F.col("n_kept") < KMV_K, F.col("n_kept"))
            .otherwise(F.expr(f"{KMV_NUM} DIV kth"))
            .alias("kmv_est"),
        )
    )
    thresh = (
        hashed.filter(F.col("h") < H52_MAX // THRESH_R)
        .groupBy("event_type")
        .agg((F.count("*") * THRESH_R).alias("thresh_est"))
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return (
        exact.join(kmv, "event_type", "left")
        .join(thresh, "event_type", "left")
        .na.fill({"kmv_est": 0, "thresh_est": 0})
        .orderBy("event_type")
    )


APPROX_DISTINCT_KMV_SQL = f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         {_h52_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events),
ranked AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashed),
kmv AS (
  SELECT event_type,
         CASE WHEN count(*) < {KMV_K} THEN count(*)
              ELSE {KMV_NUM} // max(h) END AS kmv_est
  FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type),
thresh AS (
  SELECT event_type, count(*) * {THRESH_R} AS thresh_est
  FROM hashed WHERE h < {H52_MAX // THRESH_R} GROUP BY event_type),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact
  FROM events GROUP BY event_type)
SELECT e.event_type, e.n_exact,
       coalesce(k.kmv_est, 0) AS kmv_est,
       coalesce(t.thresh_est, 0) AS thresh_est
FROM exact e
LEFT JOIN kmv k USING (event_type)
LEFT JOIN thresh t USING (event_type)
ORDER BY event_type
"""


# --- count-min sketch: heavy-hitter frequency estimates -----------------------

def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by event count: true count vs count-min estimate.

    The sketch is built from *per-key* counts (one map-side-combined
    groupBy), not raw events — the d-way explode touches one row per
    distinct key. The point query joins the <=4096-row sketch back to
    the candidate keys; Spark broadcasts it. CMS never under-counts, so
    ``est_n >= true_n`` always (pinned in tests); residual collisions
    (1.5k keys into 4x1024 counters at sf0.1) still surface on a cell or
    two, which is honest sketch behavior, not a bug.
    """
    ev = _read(spark, sf_dir, "events")
    # staged: counts feeds the sketch build AND the top-k probe side
    counts = _persisted(
        ev.groupBy("user_id").agg(F.count("*").alias("true_n"))
    )
    cells = counts.select(
        "true_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.pmod(
                            _h52(
                                F.concat(
                                    F.lit(f"{j}:"), F.col("user_id").cast("string")
                                )
                            ),
                            F.lit(CMS_WIDTH),
                        ).alias("bucket"),
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("cell"),
    )
    sketch = (
        cells.select("cell.j", "cell.bucket", "true_n")
        .groupBy("j", "bucket")
        .agg(F.sum("true_n").alias("cell_sum"))
    )
    top = counts.orderBy(F.desc("true_n"), "user_id").limit(CMS_TOPK)
    probes = top.select(
        "user_id",
        "true_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.pmod(
                            _h52(
                                F.concat(
                                    F.lit(f"{j}:"), F.col("user_id").cast("string")
                                )
                            ),
                            F.lit(CMS_WIDTH),
                        ).alias("bucket"),
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("cell"),
    ).select("user_id", "true_n", "cell.j", "cell.bucket")
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("cell_sum").alias("est_n"))
        .orderBy(F.desc("true_n"), "user_id")
    )


def _cms_bucket_sql(j: int) -> str:
    key = f"'{j}:' || CAST(user_id AS VARCHAR)"
    return f"({_h52_sql(key)} % {CMS_WIDTH})"


_CMS_CELLS_SQL = " UNION ALL ".join(
    f"SELECT user_id, true_n, {j} AS j, {_cms_bucket_sql(j)} AS bucket FROM counts"
    for j in range(CMS_DEPTH)
)

HEAVY_HITTERS_CMS_SQL = f"""
WITH counts AS (
  SELECT user_id, count(*) AS true_n FROM events GROUP BY user_id),
cells AS ({_CMS_CELLS_SQL}),
sketch AS (
  SELECT j, bucket, CAST(sum(true_n) AS BIGINT) AS cell_sum
  FROM cells GROUP BY j, bucket),
top AS (
  SELECT user_id, true_n FROM counts
  ORDER BY true_n DESC, user_id LIMIT {CMS_TOPK}),
probes AS (
  SELECT t.user_id, t.true_n, c.j, c.bucket
  FROM top t JOIN cells c ON t.user_id = c.user_id)
SELECT p.user_id, p.true_n, min(s.cell_sum) AS est_n
FROM probes p JOIN sketch s ON p.j = s.j AND p.bucket = s.bucket
GROUP BY p.user_id, p.true_n
ORDER BY p.true_n DESC, p.user_id
"""


# --- HyperLogLog distinct estimator -------------------------------------------

HLL_B = 8  # register-index bits
HLL_M = 1 << HLL_B  # 256 registers; SE ~ 1.04/sqrt(m) ~= 6.5%
HLL_WBITS = 52 - HLL_B  # 44 remaining hash bits feed rho (the _h52 width)
HLL_RHO_MAX = HLL_WBITS + 1  # rho(w) = WBITS - bitlen(w) + 1; w=0 => RHO_MAX
# alpha_256 = 0.7213/(1 + 1.079/256), embedded as the identical integer-
# micros literal in both engines (no float pow/log crosses the boundary).
HLL_ALPHA_MICROS = 718273
# E = alpha * m^2 / sum_j 2^(-M_j).  Scaling the harmonic sum by 2^WBITS
# would leave the max-rho register at 2^-1 = 0.5, so scale by 2^RHO_MAX
# instead: S = sum_j 2^(RHO_MAX - M_j), empty register => 2^RHO_MAX,
# smallest term 2^0.  ENUM = m^2 * 2^RHO_MAX = 2^61 < 2^63; the alpha
# multiply happens after ENUM DIV 10^6 so nothing overflows (DuckDB errors
# on BIGINT overflow, the JVM wraps — both are wrong answers).
HLL_ENUM = HLL_M * HLL_M * (1 << HLL_RHO_MAX)


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag (and merged-ALL) distinct orderkeys: exact vs HLL.

    The 100 TB point of HLL over KMV/threshold: there is NO distinct and
    NO shuffle on the key at all.  Each input row maps to (register j,
    rank rho); ``groupBy(scope, j).max(rho)`` has at most groups*256
    cells, so map-side combine collapses the entire scan to <= 768 rows
    crossing the exchange — COUNT(DISTINCT) without deduplicating
    anything.  Registers are mergeable by max: the ALL row is derived by
    folding the per-flag register tables, demonstrating the property that
    lets per-partition/per-day sketches roll up without rescanning
    (Flajolet et al. 2007, HyperLogLog).

    rho = leading zeros of the WBITS (44) low hash bits + 1, computed
    portably as ``RHO_MAX - length(bin(w))`` (w=0 => RHO_MAX, i.e. 45).
    The estimate is the raw HLL
    harmonic mean in integer micros; the small-range linear-counting
    correction needs ln() (not portable bit-exactly), so the zero-register
    count ``v_zero`` rides along — at scale a driver-side correction on
    the 256-int summary is free, and the accuracy bound is pinned in
    tests at sf0.01 where the raw regime (n >= 2.5m) holds.

    Reference parity: like the KMV/CMS ops, the distributed sibling of
    the reference's exact driver-side ``len(set(...))`` counters
    (`app/utils/metrics.py`), per SURVEY.md §2.4.
    """
    li = _read(spark, sf_dir, "lineitem")
    rows = li.select(
        F.col("l_returnflag").alias("scope"),
        _h52(F.col("l_orderkey").cast("string")).alias("h"),
    ).select(
        "scope",
        (F.col("h") % HLL_M).alias("j"),
        F.shiftright(F.col("h"), HLL_B).alias("w"),
    ).select(
        "scope",
        "j",
        F.when(F.col("w") == 0, F.lit(HLL_RHO_MAX))
        .otherwise(F.lit(HLL_RHO_MAX) - F.length(F.bin(F.col("w"))))
        .alias("rho"),
    )
    regs = _persisted(rows.groupBy("scope", "j").agg(F.max("rho").alias("m")))
    regs_all = regs.groupBy("j").agg(F.max("m").alias("m")).select(
        F.lit("ALL").alias("scope"), "j", "m"
    )
    est = (
        regs.unionByName(regs_all)
        .groupBy("scope")
        .agg(
            F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_MAX} - m)")).alias("s_used"),
            F.count("*").alias("n_regs"),
        )
        .select(
            "scope",
            (F.lit(HLL_M) - F.col("n_regs")).alias("v_zero"),
            F.expr(
                f"CAST({HLL_ALPHA_MICROS}L * {HLL_ENUM // 1_000_000}L"
                f" DIV (s_used + ({HLL_M} - n_regs) * {1 << HLL_RHO_MAX}L)"
                " AS BIGINT)"
            ).alias("hll_est"),
        )
    )
    exact = (
        li.rollup("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n_exact"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("scope"), "n_exact"
        )
    )
    return exact.join(est, "scope").orderBy("scope")


HLL_DISTINCT_SQL = f"""
WITH rows_h AS (
  SELECT l_returnflag AS scope,
         {_h52_sql("CAST(l_orderkey AS VARCHAR)")} AS h
  FROM lineitem),
rows_jw AS (
  SELECT scope, h % {HLL_M} AS j, h // {HLL_M} AS w FROM rows_h),
rows_rho AS (
  SELECT scope, j,
         CASE WHEN w = 0 THEN {HLL_RHO_MAX} ELSE {HLL_RHO_MAX} - length(bin(w)) END AS rho
  FROM rows_jw),
regs AS (
  SELECT scope, j, max(rho) AS m FROM rows_rho GROUP BY scope, j),
regs_u AS (
  SELECT scope, j, m FROM regs
  UNION ALL
  SELECT 'ALL' AS scope, j, max(m) AS m FROM regs GROUP BY j),
est AS (
  SELECT scope,
         {HLL_M} - count(*) AS v_zero,
         CAST({HLL_ALPHA_MICROS} * {HLL_ENUM // 1_000_000}
              // (sum(1::BIGINT << ({HLL_RHO_MAX} - m))
                  + ({HLL_M} - count(*)) * {1 << HLL_RHO_MAX}) AS BIGINT) AS hll_est
  FROM regs_u GROUP BY scope),
exact AS (
  SELECT coalesce(l_returnflag, 'ALL') AS scope,
         count(DISTINCT l_orderkey) AS n_exact
  FROM lineitem GROUP BY ROLLUP (l_returnflag))
SELECT e.scope, e.n_exact, s.v_zero, s.hll_est
FROM exact e JOIN est s USING (scope)
ORDER BY e.scope
"""


# --- mergeable log-histogram quantiles --------------------------------------

QH_SUB = 16  # linear sub-buckets per power of two: relative error <= 1/16
QH_PS = (50, 90, 99)


def _qh_bucket(v) -> F.Column:
    """HDR-histogram-style bucket id of a POSITIVE integer: 16 linear
    sub-buckets inside each power-of-two range. Integer-only and
    engine-portable (``length(bin(v))`` is the bit length on both Spark
    and DuckDB; no log/pow). Strictly monotone in v, <= 64*16 ids over
    the BIGINT range — the histogram is a bounded, MERGEABLE summary."""
    b = F.expr(f"length(bin({v}))")
    pow_ = F.expr(f"shiftleft(1L, length(bin({v})) - 1)")
    return (b - 1) * QH_SUB + ((F.col(v) - pow_) * QH_SUB / pow_).cast(
        "bigint"
    )


def q_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-language quantiles (p50/p90/p99 of document
    length) from a mergeable log-histogram — the quantile sibling of the
    KMV/CMS/HLL sketches: exact percentiles at 100 TB need a global sort
    (or Spark's GK sketch, whose merge order isn't bit-reproducible);
    the HDR-style histogram is one map-side-combined groupBy into
    <= 64*16 cells per group, merges by cell-wise addition across
    partitions/partial corpora, and answers any quantile after the fact
    with relative error <= 1/16 (the sub-bucket width). The reported
    value is the answering bucket's LOWER BOUND — deterministic integer
    arithmetic end to end, so Spark and DuckDB agree bit-for-bit.

    Scale shape: the only full-data exchange is the (lang, bucket)
    partial agg; the cumulative scan runs over the <= 1024-cell
    histogram per group, and the 3-row percentile table broadcasts.
    """
    docs = _read(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").cast("bigint").alias("v")
    )
    # staged: the histogram feeds BOTH the per-group totals and the
    # cumulative scan, and Catalyst does no cross-branch CSE — un-staged
    # the corpus would be scanned and re-bucketed twice (scan budget
    # pinned <= 1 in plan_audit); the cache is <= 1024 cells per group
    hist = _persisted(
        docs.groupBy("lang", _qh_bucket("v").alias("b")).agg(
            F.count("*").alias("c")
        )
    )
    total = hist.groupBy("lang").agg(F.sum("c").alias("n"))
    w = Window.partitionBy("lang").orderBy("b")
    cum = hist.withColumn("cum", F.sum("c").over(w)).join(
        F.broadcast(total), "lang"
    )
    ps = spark.createDataFrame([(p,) for p in QH_PS], "p bigint")
    sel = (
        cum.join(F.broadcast(ps))
        .where(F.expr("cum >= (p * n + 99) div 100"))
        .groupBy("lang", "p")
        .agg(F.min("b").alias("b"))
    )
    low = F.expr(
        f"shiftleft(1L, int(b div {QH_SUB})) + "
        f"((b % {QH_SUB}) * shiftleft(1L, int(b div {QH_SUB}))) div {QH_SUB}"
    )
    return sel.select(
        "lang", "p", low.cast("bigint").alias("approx_n_chars")
    ).orderBy("lang", "p")


QUANTILE_HIST_SQL = f"""
WITH h AS (
  SELECT lang,
         (length(bin(n_chars)) - 1) * {QH_SUB}
           + (n_chars - (CAST(1 AS BIGINT) << (length(bin(n_chars)) - 1)))
             * {QH_SUB}
             // (CAST(1 AS BIGINT) << (length(bin(n_chars)) - 1)) AS b,
         count(*) AS c
  FROM documents GROUP BY lang, b),
t AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY lang),
cum AS (
  SELECT lang, b,
         CAST(sum(c) OVER (PARTITION BY lang ORDER BY b) AS BIGINT) AS cum
  FROM h),
ps AS (SELECT CAST(unnest([{", ".join(str(p) for p in QH_PS)}]) AS BIGINT) AS p),
sel AS (
  SELECT lang, p, min(b) AS b
  FROM cum JOIN t USING (lang) CROSS JOIN ps
  WHERE cum >= (p * n + 99) // 100
  GROUP BY lang, p)
SELECT lang, p,
       CAST((CAST(1 AS BIGINT) << CAST(b // {QH_SUB} AS INTEGER))
            + ((b % {QH_SUB})
               * (CAST(1 AS BIGINT) << CAST(b // {QH_SUB} AS INTEGER)))
              // {QH_SUB} AS BIGINT) AS approx_n_chars
FROM sel ORDER BY lang, p
"""


QUERIES: dict[str, tuple] = {
    "approx_distinct_kmv": (q_approx_distinct_kmv, APPROX_DISTINCT_KMV_SQL),
    "heavy_hitters_cms": (q_heavy_hitters_cms, HEAVY_HITTERS_CMS_SQL),
    "hll_distinct": (q_hll_distinct, HLL_DISTINCT_SQL),
    "quantile_hist": (q_quantile_hist, QUANTILE_HIST_SQL),
}
