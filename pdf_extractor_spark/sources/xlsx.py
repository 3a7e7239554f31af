"""Minimal .xlsx reader — stdlib only (zipfile + ElementTree).

The reference's ``read_dataset`` accepts Excel manifests via
``pd.read_excel`` (``app/utils/helper.py:72-98``); this container has no
openpyxl, and a manifest is driver-side metadata anyway (KBs to MBs), so a
small SpreadsheetML reader is the dependency-free equivalent: first
worksheet, shared strings, inline strings, cell references with gaps.
Values come back as strings (the manifest contract — the caller casts),
matching the CSV path's explicit all-string schema.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


class XlsxError(ValueError):
    pass


def _col_index(ref: str | None) -> int | None:
    """'B7' -> 1 (zero-based column); None when the cell has no r attr."""
    if not ref:
        return None
    m = _CELL_REF_RE.fullmatch(ref)
    if not m:
        raise XlsxError(f"bad cell reference {ref!r}")
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        data = z.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).findall(f"{_NS}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _first_sheet_path(z: zipfile.ZipFile) -> str:
    sheets = sorted(
        n for n in z.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
    )
    if not sheets:
        raise XlsxError("workbook has no worksheets")
    # numeric order, not lexicographic (sheet10 after sheet9)
    sheets.sort(key=lambda n: int(re.search(r"(\d+)\.xml$", n).group(1)))
    return sheets[0]


def _cell_value(c: ET.Element, shared: list[str]) -> str:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        if is_el is None:
            return ""
        return "".join(x.text or "" for x in is_el.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return ""
    if t == "s":
        idx = int(v.text)
        if idx >= len(shared):
            raise XlsxError(f"shared-string index {idx} out of range")
        return shared[idx]
    return v.text  # numbers/booleans/dates stay as their raw lexical form


def read_xlsx_rows(path: str) -> list[list[str]]:
    """First worksheet as dense string rows (missing cells = '')."""
    try:
        with zipfile.ZipFile(path) as z:
            shared = _shared_strings(z)
            root = ET.fromstring(z.read(_first_sheet_path(z)))
    except (zipfile.BadZipFile, KeyError, ET.ParseError) as e:
        raise XlsxError(f"not a readable xlsx file: {e}") from e
    rows: list[list[str]] = []
    width = 0
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, str] = {}
        next_col = 0
        for c in row.findall(f"{_NS}c"):
            col = _col_index(c.get("r"))
            if col is None:
                col = next_col
            cells[col] = _cell_value(c, shared)
            next_col = col + 1
        w = max(cells) + 1 if cells else 0
        width = max(width, w)
        rows.append([cells.get(i, "") for i in range(w)])
    return [r + [""] * (width - len(r)) for r in rows]
