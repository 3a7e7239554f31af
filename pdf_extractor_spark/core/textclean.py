"""Text normalization — byte-exact reimplementation of the reference semantics.

Reference: ``app/processor/pymu_tesseract_processor.py:150-154`` (``_clean_text``)
and ``:259-272`` (region/table framing). These functions are the single source
of truth shared by the local oracle and the Spark kernel, so span-sequence
equality cannot drift.
"""

from __future__ import annotations

import re

_MULTI_BLANK = re.compile(r"\n\s*\n+")


def clean_text(text: str) -> str:
    """Collapse blank runs, strip lines, tabs->space, outer strip.

    Byte-exact port of the reference's ``_clean_text``
    (pymu_tesseract_processor.py:150-154): the regex collapse runs FIRST on the
    raw text, then per-line strip, then tab replacement, then outer strip.
    Order matters for byte equality.
    """
    text = _MULTI_BLANK.sub("\n\n", text)
    text = "\n".join(line.strip() for line in text.splitlines())
    text = text.replace("\t", " ")
    return text.strip()


def frame_region(raw_text: str) -> str:
    """A text region contributes ``\\n\\n{raw_text}\\n\\n``
    (pymu_tesseract_processor.py:261,272)."""
    return f"\n\n{raw_text}\n\n"


def frame_table(label: str, rows: list[list[str | None]]) -> str:
    """A table contributes ``\\n\\n{label}:\\n\\n`` then one ``{row}\\n\\n`` per
    row, where the row is rendered via Python list repr — part of the output
    contract (pymu_tesseract_processor.py:263-269)."""
    out = f"\n\n{label}:\n\n"
    for row in rows:
        out += f"{row}\n\n"
    return out
