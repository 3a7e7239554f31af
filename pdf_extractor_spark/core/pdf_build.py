"""Synthetic PDF builder for the test corpus.

Emits small, well-formed PDF 1.4 files whose content streams use the real text
operators (BT/ET, Tf, TL, Td, TD, Tm, T*, Tj, TJ, ') and ruled-line table
grids (re/S), optionally Flate-compressed — so the layout parser in
``pdf_parse.py`` has genuine work to do (page -> textbox -> line ordering),
per the scope bound in SURVEY.md §7.4. Deterministic: byte output depends only
on the page specs.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

PAGE_W = 612.0
PAGE_H = 792.0


@dataclass
class TextBox:
    """A block of lines anchored at (x, y_top) in top-down page coords."""

    x: float
    y_top: float
    lines: list[str]
    font_size: float = 12.0
    leading: float = 14.0
    # which operator family the builder uses to place the box — exercises
    # different parser paths while producing identical layout
    style: str = "td"  # td | tm | quote | tj_array


@dataclass
class Table:
    """Ruled-line grid at (x, y_top); rows of cell strings ('' = empty cell)."""

    x: float
    y_top: float
    rows: list[list[str]]
    col_width: float = 90.0
    row_height: float = 22.0


@dataclass
class PageSpec:
    boxes: list[TextBox] = field(default_factory=list)
    tables: list[Table] = field(default_factory=list)


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _textbox_ops(box: TextBox) -> str:
    y0 = PAGE_H - box.y_top  # PDF y-up baseline of the first line
    ops = [f"BT /F1 {box.font_size:g} Tf {box.leading:g} TL"]
    if box.style == "tm":
        ops.append(f"1 0 0 1 {box.x:g} {y0:g} Tm")
    else:
        ops.append(f"{box.x:g} {y0:g} Td")
    for i, line in enumerate(box.lines):
        if i > 0:
            if box.style == "quote":
                ops.append(f"({_esc(line)}) '")
                continue
            if box.style == "tm":
                ops.append(f"1 0 0 1 {box.x:g} {y0 - i * box.leading:g} Tm")
            elif box.style == "td":
                ops.append(f"0 {-box.leading:g} Td")
            else:
                ops.append("T*")
        if i == 0 or box.style != "quote":
            if box.style == "tj_array":
                # split the line across a TJ array with kerning numbers
                mid = max(1, len(line) // 2)
                ops.append(
                    f"[({_esc(line[:mid])}) -20 ({_esc(line[mid:])})] TJ"
                )
            else:
                ops.append(f"({_esc(line)}) Tj")
    ops.append("ET")
    return "\n".join(ops)


def _table_ops(tbl: Table) -> str:
    ops = []
    n_rows = len(tbl.rows)
    n_cols = max(len(r) for r in tbl.rows)
    for r in range(n_rows):
        for c in range(n_cols):
            cx = tbl.x + c * tbl.col_width
            cy_top = tbl.y_top + r * tbl.row_height
            y = PAGE_H - cy_top - tbl.row_height  # rect lower-left
            ops.append(
                f"{cx:g} {y:g} {tbl.col_width:g} {tbl.row_height:g} re S"
            )
            text = tbl.rows[r][c] if c < len(tbl.rows[r]) else ""
            if text:
                tx = cx + 3
                ty = y + 6
                ops.append(f"BT /F1 9 Tf {tx:g} {ty:g} Td ({_esc(text)}) Tj ET")
    return "\n".join(ops)


def build_pdf(pages: list[PageSpec], compress: bool = False) -> bytes:
    """Assemble a complete PDF (header, objects, xref, trailer)."""
    objs: list[bytes] = []  # 1-indexed bodies, object n = index n-1

    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # obj 1
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # obj 2

    content_bodies: list[bytes] = []
    for i, page in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:g} "
                f"{PAGE_H:g}] /Contents {content_num} 0 R "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
            ).encode()
        )
        parts = [_table_ops(t) for t in page.tables]
        parts += [_textbox_ops(b) for b in page.boxes]
        content = "\n".join(parts).encode("latin-1", errors="replace")
        if compress:
            data = zlib.compress(content)
            body = (
                f"<< /Length {len(data)} /Filter /FlateDecode >>\nstream\n".encode()
                + data
                + b"\nendstream"
            )
        else:
            body = (
                f"<< /Length {len(content)} >>\nstream\n".encode()
                + content
                + b"\nendstream"
            )
        content_bodies.append(body)

    # interleave page/content objects in numbering order
    final_objs: list[bytes] = objs[:2]
    for i in range(n_pages):
        final_objs.append(objs[2 + i])
        final_objs.append(content_bodies[i])
    final_objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for n, body in enumerate(final_objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(final_objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(final_objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
