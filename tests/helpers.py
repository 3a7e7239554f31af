"""Shared fixture scaffold for the derived-stage test modules
(signals/curate/neardup/pack): a documents.parquet in the testdata shape."""

from __future__ import annotations

import pandas as pd


def write_docs(dest, texts: dict[int, str]) -> str:
    """Write ``dest/documents.parquet`` with columns
    (doc_id, text, lang, source, n_chars) — the `/root/testdata/sf*`
    documents shape every stage reads — and return ``str(dest)``.
    ``dest`` is a pathlib dir, created if missing."""
    dest.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": [texts[k] for k in texts],
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(texts[k]) for k in texts],
        }
    ).to_parquet(dest / "documents.parquet")
    return str(dest)
