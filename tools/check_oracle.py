"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count + column names + order-insensitive values (columns sorted by
name, rows sorted, cell-normalized). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return f"{v:.9g}"
    return str(v)


def frame_signature(df) -> tuple[int, list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(r[c]) for c in cols) for _, r in df.iterrows()]
    rows.sort()
    return len(rows), cols, rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pdf_extractor_spark.spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.monotonic() - t0
        from pdf_extractor_spark.ops.dedup import release_caches

        release_caches()  # drop any query-builder cache (session hygiene)
        if name not in oracles:
            print(f"  {name:24s} rows-only: {len(sdf)} rows  ({t_spark:.1f}s)")
            if len(sdf) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        ddf = con.execute(oracles[name]).df()
        ns, cs, rs = frame_signature(sdf)
        nd, cd, rd = frame_signature(ddf)
        ok = (ns, cs, rs) == (nd, cd, rd)
        status = "OK " if ok else "FAIL"
        print(f"  {name:24s} {status} spark={ns} duck={nd} rows ({t_spark:.1f}s)")
        if not ok:
            msg = []
            if ns != nd:
                msg.append(f"row count {ns} != {nd}")
            if cs != cd:
                msg.append(f"cols {cs} != {cd}")
            elif rs != rd:
                for i, (a, b) in enumerate(zip(rs, rd)):
                    if a != b:
                        msg.append(f"first diff row {i}:\n  spark={a}\n  duck ={b}")
                        break
                else:
                    msg.append("row sets differ in tail")
            failures.append((name, "; ".join(msg)))
    spark.stop()
    if failures:
        print("\nFAILURES:")
        for name, msg in failures:
            print(f"- {name}: {msg}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
