"""Self-shipping: make the package importable on executors, always.

The Arrow kernels (mapInPandas/mapInArrow/applyInPandas) are serialized by
reference, so executor Python workers must be able to ``import
pdf_extractor_spark``. That held only while the driver's cwd was the repo
root (workers inherit cwd -> '' on sys.path); a caller importing
``__spark_entry__`` from anywhere else would crash every kernel query with
ModuleNotFoundError. ``ensure_shipped(spark)`` zips the package once per
process and registers it with ``sc.addPyFile`` once per SparkSession — the
runtime equivalent of ``spark-submit --py-files``.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_PKG_ROOT = os.path.dirname(os.path.abspath(__file__))
_shipped_apps: set[str] = set()
_zip_path: str | None = None


def _build_zip() -> str:
    global _zip_path
    if _zip_path is not None and os.path.exists(_zip_path):
        return _zip_path
    path = os.path.join(tempfile.gettempdir(), f"pes-pkg-{os.getpid()}.zip")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(_PKG_ROOT):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.join(
                    "pdf_extractor_spark", os.path.relpath(full, _PKG_ROOT)
                )
                zf.write(full, rel)
    _zip_path = path
    return path


def ensure_shipped(spark) -> None:
    """Idempotent per SparkSession; safe to call before every query."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _shipped_apps:
        return
    sc.addPyFile(_build_zip())
    _shipped_apps.add(app)
