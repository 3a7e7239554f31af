"""Distributed corpus fetcher: the reference's URL downloader as a Spark stage.

Re-expresses ``app/utils/helper.py:101-211`` (``Downloader``: per-URL HTTP GET
with UA header, 10 s timeout, <=3 retries with 0.5-1.5 s jittered backoff,
post-download PDF validity gate ``_is_pdf_valid`` helper.py:213-225) as a
``mapInPandas`` stage over a manifest DataFrame:

    manifest(doc_id, url) -> fetched(doc_id, url, status, attempts,
                                     n_bytes, content, error)

Differences from the reference, by design:
- the driver loop (one URL at a time, dashboard.py:419-489) becomes
  task-parallel fetching; ``repartition(num_partitions)`` spreads URLs so no
  executor serializes a slow host;
- failures NEVER abort the job: status='failed' (transport exhausted) or
  'invalid' (validity gate rejected) rows are quarantine rows the caller can
  anti-join for retry — the J1 retry-rematch pattern (dashboard.py:453-465);
- backoff jitter is deterministic per (url, attempt) so reruns are
  reproducible (the reference uses random.uniform, helper.py:186-188);
- the transport is injectable: production would pass an HTTP client; the
  sandbox default resolves only file:// URLs and refuses the network.

At 100 TB scale this stage writes to a staging table and the extraction
pipeline reads from it — fetch and parse are separate jobs so a parse bug
never refetches the corpus.
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Callable, Iterator
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FETCHED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("url", StringType()),
        StructField("status", StringType()),  # ok | failed | invalid
        StructField("attempts", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("content", BinaryType()),
        StructField("error", StringType()),
    ]
)

MAX_RETRIES = 3  # helper.py:111 (max_retries=3)
BACKOFF_RANGE_S = (0.5, 1.5)  # helper.py:186-188 jitter bounds


def local_file_transport(url: str, timeout_s: float) -> bytes:
    """Sandbox default: resolve file:// URLs only (no network egress)."""
    parsed = urlparse(url)
    if parsed.scheme != "file":
        raise OSError(f"transport refuses non-file URL scheme {parsed.scheme!r}")
    with open(parsed.path, "rb") as f:
        return f.read()


def pdf_validity_gate(content: bytes) -> bool:
    """Analogue of _is_pdf_valid (helper.py:213-225): header + one parseable
    object, without a full parse."""
    if not content.startswith(b"%PDF"):
        return False
    return b"endobj" in content


def _jitter_s(url: str, attempt: int, lo: float, hi: float) -> float:
    """Deterministic stand-in for random.uniform(0.5, 1.5): hash of
    (url, attempt) mapped into [lo, hi)."""
    h = hashlib.md5(f"{url}#{attempt}".encode()).digest()
    frac = int.from_bytes(h[:4], "big") / 2**32
    return lo + (hi - lo) * frac


def make_fetcher(
    transport: Callable[[str, float], bytes],
    validator: Callable[[bytes], bool] | None,
    max_retries: int,
    timeout_s: float,
    backoff_range_s: tuple[float, float],
):
    """Build the mapInPandas kernel (picklable via closure)."""

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "url", "status", "attempts", "n_bytes", "content", "error")}
            for doc_id, url in zip(pdf["doc_id"], pdf["url"]):
                content = None
                err = ""
                attempts = 0
                for attempt in range(1, max_retries + 1):
                    attempts = attempt
                    try:
                        content = transport(url, timeout_s)
                        break
                    except OSError as e:
                        err = str(e)
                        if attempt < max_retries:
                            time.sleep(_jitter_s(url, attempt, *backoff_range_s))
                if content is None:
                    status, n_bytes = "failed", 0
                elif validator is not None and not validator(content):
                    # reference deletes + refetches invalid PDFs (helper.py:
                    # 192-201); at scale that's a quarantine row, not a loop
                    status, n_bytes, err = "invalid", len(content), "validity gate"
                    content = None
                else:
                    status, n_bytes = "ok", len(content)
                out["doc_id"].append(str(doc_id))
                out["url"].append(url)
                out["status"].append(status)
                out["attempts"].append(attempts)
                out["n_bytes"].append(n_bytes)
                out["content"].append(content)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return fetch_batches


def fetch_documents(
    manifest: DataFrame,
    transport: Callable[[str, float], bytes] = local_file_transport,
    validator: Callable[[bytes], bool] | None = pdf_validity_gate,
    max_retries: int = MAX_RETRIES,
    timeout_s: float = 10.0,
    backoff_range_s: tuple[float, float] = BACKOFF_RANGE_S,
    num_partitions: int | None = None,
) -> DataFrame:
    """manifest(doc_id, url) -> fetched rows (ok/failed/invalid, see module doc)."""
    df = manifest.select("doc_id", "url")
    if num_partitions:
        df = df.repartition(num_partitions, "url")
    kernel = make_fetcher(transport, validator, max_retries, timeout_s, backoff_range_s)
    return df.mapInPandas(kernel, schema=FETCHED_SCHEMA)
