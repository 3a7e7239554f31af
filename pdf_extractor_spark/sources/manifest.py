"""Manifest (dataset) reader: the reference's ``read_dataset`` as a source.

``app/utils/helper.py:72-98`` reads a CSV/Excel manifest into pandas with
``csv.Sniffer`` delimiter detection and lets the user pick the url/id columns
(dashboard.py:296-312). Spark-first version:

- delimiter is sniffed ONCE on the driver from a small head sample (a
  manifest is metadata — KBs to MBs — so a driver-side sniff is not a
  driver-side data path);
- the actual read is ``spark.read.csv`` with an explicit schema: never
  inferSchema at scale (SURVEY.md §1.4) — every column is read as string and
  the caller casts what it needs;
- ``.xlsx`` manifests (helper.py's Excel branch) go through the stdlib
  SpreadsheetML reader in :mod:`xlsx` on the driver, then
  ``spark.createDataFrame`` — same all-string contract;
- the (id_col, url_col) projection (P7) normalizes to (doc_id, url), the
  fetch stage's input contract (sources/fetch.py).
"""

from __future__ import annotations

import csv

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .xlsx import read_xlsx_rows

_SNIFF_BYTES = 64 * 1024
_DELIMS = ",;\t|"


def sniff_delimiter(path: str) -> str:
    """csv.Sniffer over the file head (helper.py:85-94), ',' fallback."""
    with open(path, newline="") as f:
        sample = f.read(_SNIFF_BYTES)
    try:
        return csv.Sniffer().sniff(sample, delimiters=_DELIMS).delimiter
    except csv.Error:
        return ","


def _header_columns(path: str, delim: str) -> list[str]:
    with open(path, newline="") as f:
        return next(csv.reader(f, delimiter=delim))


def read_manifest(
    spark: SparkSession,
    path: str,
    url_col: str,
    id_col: str | None = None,
) -> DataFrame:
    """CSV/XLSX manifest -> (doc_id, url) DataFrame with explicit string
    schema.

    Without ``id_col``, doc_id falls back to the URL basename stem — the
    reference's filename-derived id (helper.py:156-158, dashboard.py:597).
    """
    if path.lower().endswith((".xlsx", ".xlsm")):
        rows = read_xlsx_rows(path)
        if not rows:
            raise ValueError(f"empty xlsx manifest {path}")
        # a data row wider than the header pads the header with '' (the xlsx
        # reader returns dense uniform-width rows): name overflow columns
        # _c<N> like spark.read.csv does, so they stay addressable (ADVICE r02)
        cols = [c.strip() or f"_c{i}" for i, c in enumerate(rows[0])]
        schema = StructType([StructField(c, StringType()) for c in cols])
        df = spark.createDataFrame(
            [tuple(r) for r in rows[1:]], schema=schema
        )
    else:
        delim = sniff_delimiter(path)
        cols = _header_columns(path, delim)
        schema = StructType([StructField(c, StringType()) for c in cols])
        df = spark.read.csv(path, header=True, sep=delim, schema=schema)
    if url_col not in cols:
        raise ValueError(f"url column {url_col!r} not in manifest header {cols}")
    if id_col is not None and id_col not in cols:
        raise ValueError(f"id column {id_col!r} not in manifest header {cols}")
    if id_col is not None:
        ids = F.col(id_col)
    else:
        # basename stem of the URL path: .../report.v2.pdf -> report.v2
        base = F.element_at(F.split(F.split(F.col(url_col), r"\?").getItem(0), "/"), -1)
        ids = F.regexp_replace(base, r"\.[^.]*$", "")
    return df.select(ids.alias("doc_id"), F.col(url_col).alias("url"))
