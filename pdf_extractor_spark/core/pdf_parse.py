"""Minimal PDF byte-stream parser + layout analysis (pdfminer-style).

Replaces the reference's rasterize -> YOLO -> per-region Tesseract pipeline
(``app/processor/pymu_tesseract_processor.py:189-287``) with digital text
extraction from content streams: page -> textbox -> line ordering, plus
ruled-line table detection (the analogue of ``page.find_tables(
strategy="lines_strict")``, pymu_tesseract_processor.py:204-211).

Scope (SURVEY.md §7.4): PDF 1.4, raw or /FlateDecode content streams, text
operators BT/ET Tf TL Td TD Tm T* Tj TJ ', rect operator re. One font. This is
exactly the subset the corpus generator emits; anything outside it raises
``PdfParseError`` and the pipeline records a parse failure (the analogue of
the invalid-PDF gate, ``app/utils/helper.py:213-225``) instead of aborting.

Pure Python + zlib only — importable on executors and as the local oracle.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

from .textclean import clean_text, frame_region, frame_table

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")

# layout constants
_LINE_Y_TOL = 2.0  # show-ops within this y distance belong to one line
_BOX_GAP_FACTOR = 1.8  # vertical gap > factor*leading starts a new textbox
_RECT_SNAP = 1.0  # grid-line coordinate snapping tolerance


class PdfParseError(ValueError):
    pass


@dataclass
class _TextItem:
    x: float
    y_top: float
    text: str


@dataclass
class _Rect:
    x0: float
    y0_top: float
    x1: float
    y1_top: float


@dataclass
class TextBoxOut:
    """A detected textbox: ordered lines, bbox top-y/left-x for reading order."""

    y_top: float
    x: float
    lines: list[str] = field(default_factory=list)

    @property
    def text(self) -> str:
        return "\n".join(self.lines)


@dataclass
class TableOut:
    y_top: float
    x: float
    rows: list[list[str | None]] = field(default_factory=list)


@dataclass
class PageOut:
    boxes: list[TextBoxOut]
    tables: list[TableOut]


# ---------------------------------------------------------------- object layer


def _index_objects(data: bytes) -> dict[int, bytes]:
    """num -> object body (dict + optional stream). Stream bytes are located
    via the declared /Length, so binary Flate data never confuses the scan."""
    objs: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_RE.search(data, pos)
        if not m:
            break
        start = m.end()
        stream_at = data.find(b"stream", start)
        endobj_at = data.find(b"endobj", start)
        if endobj_at == -1:
            raise PdfParseError("unterminated object")
        if stream_at != -1 and stream_at < endobj_at:
            lm = _LENGTH_RE.search(data, start, stream_at)
            if not lm:
                raise PdfParseError("stream without /Length")
            length = int(lm.group(1))
            sdata_start = stream_at + len(b"stream")
            if data[sdata_start : sdata_start + 2] == b"\r\n":
                sdata_start += 2
            elif data[sdata_start : sdata_start + 1] == b"\n":
                sdata_start += 1
            end = data.find(b"endobj", sdata_start + length)
            if end == -1:
                raise PdfParseError("unterminated stream object")
            objs[int(m.group(1))] = data[start:end]
            pos = end + 6
        else:
            objs[int(m.group(1))] = data[start:endobj_at]
            pos = endobj_at + 6
    if not objs:
        raise PdfParseError("no objects found")
    return objs


def _stream_bytes(body: bytes) -> bytes:
    at = body.find(b"stream")
    if at == -1:
        raise PdfParseError("object has no stream")
    lm = _LENGTH_RE.search(body, 0, at)
    if not lm:
        raise PdfParseError("stream without /Length")
    length = int(lm.group(1))
    start = at + len(b"stream")
    if body[start : start + 2] == b"\r\n":
        start += 2
    elif body[start : start + 1] == b"\n":
        start += 1
    raw = body[start : start + length]
    if b"/FlateDecode" in body[:at]:
        try:
            return zlib.decompress(raw)
        except zlib.error as e:  # corrupt stream -> parse failure, not crash
            raise PdfParseError(f"flate error: {e}") from e
    return raw


# --------------------------------------------------------------- content layer

_STR_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}

# hot-path scanners: compiled regexes consume whole token spans in C instead
# of a Python loop per byte (>3x kernel throughput on the heavy corpus)
_WS_SET = frozenset(b" \t\r\n")
_NUM_RE = re.compile(rb"[+\-.0-9]+")
_BARE_RE = re.compile(rb"[^ \t\r\n()\[\]<>/%]*")
_STR_SPECIAL_RE = re.compile(rb"[\\()]")


def _scan_string(stream: bytes, i: int, n: int, octal: bool, keep_unknown: bool):
    """Scan a ( ) string body starting just past '('; returns (new_pos, text).

    Bulk-copies runs between specials via regex search. Two escape dialects
    (both preserved from the original byte-at-a-time scanners, byte-exact):
    - main tokenizer: octal escapes decoded, unknown escapes dropped;
    - array scanner: unknown escapes kept verbatim, no octal.
    """
    buf = bytearray()
    depth = 1
    search = _STR_SPECIAL_RE.search
    while i < n and depth:
        m = search(stream, i)
        if m is None:
            buf += stream[i:n]
            i = n
            break
        j = m.start()
        buf += stream[i:j]
        ch = stream[j]
        if ch == 0x5C:  # backslash
            nxt = stream[j + 1 : j + 2]
            if nxt in _STR_ESCAPES:
                buf += _STR_ESCAPES[nxt]
                i = j + 2
            elif octal and nxt in (b"0", b"1", b"2", b"3", b"4", b"5", b"6", b"7"):
                oct_digits = stream[j + 1 : j + 4]
                k = 0
                while k < len(oct_digits) and 0x30 <= oct_digits[k] <= 0x37:
                    k += 1
                buf.append(int(oct_digits[:k], 8) & 0xFF)
                i = j + 1 + k
            else:
                if keep_unknown:
                    buf += nxt
                i = j + 2
        elif ch == 0x28:  # (
            depth += 1
            buf += b"("
            i = j + 1
        else:  # )
            depth -= 1
            if depth:
                buf += b")"
            i = j + 1
    return i, buf.decode("latin-1")


def _tokenize(stream: bytes, stack: list | None = None):
    """Tokenize a content stream.

    Default mode yields ('num', float) | ('str', str) | ('arr', list) |
    ('op', str) | ('name', str) tuples. With ``stack`` (the interpreter hot
    path), operand VALUES are pushed raw onto the given list and only bare
    operator strings are yielded — no per-operand tuple is ever built, and
    TJ arrays are pre-joined to their concatenated string (the only use the
    interpreter has for them).
    """
    push = stack.append if stack is not None else None
    i, n = 0, len(stream)
    while i < n:
        c = stream[i]
        if c in _WS_SET:
            i += 1
        elif c == 0x25:  # %
            j = stream.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif c == 0x28:  # (
            i, s = _scan_string(stream, i + 1, n, octal=True, keep_unknown=False)
            if push is None:
                yield ("str", s)
            else:
                push(s)
        elif c == 0x5B:  # [
            i += 1
            arr: list = []
            for tok in _tokenize_until(stream, i):
                if tok is None:
                    break
                kind, val, i = tok
                arr.append((kind, val))
            if push is None:
                yield ("arr", arr)
            else:
                push("".join(v for k, v in arr if k == "str"))
            i += 1  # past ']'
        elif c == 0x2F:  # /
            m = _BARE_RE.match(stream, i + 1)
            if push is None:
                yield ("name", m.group().decode("latin-1"))
            else:
                push(m.group().decode("latin-1"))
            i = m.end()
        elif c == 0x2B or c == 0x2D or c == 0x2E or 0x30 <= c <= 0x39:  # + - . 0-9
            m = _NUM_RE.match(stream, i)
            if push is None:
                yield ("num", float(m.group()))
            else:
                push(float(m.group()))
            i = m.end()
        else:
            m = _BARE_RE.match(stream, i)
            if m.end() == i:
                i += 1  # skip stray delimiter like ] or >
                continue
            op = m.group().decode("latin-1")
            yield ("op", op) if push is None else op
            i = m.end()


def _tokenize_until(stream: bytes, start: int):
    """Helper for array parsing: yields (kind, val, new_pos) until ']'."""
    i, n = start, len(stream)
    while i < n:
        c = stream[i]
        if c in _WS_SET:
            i += 1
            continue
        if c == 0x5D:  # ]
            # signal end; caller reads position via last yielded new_pos
            yield None
            return
        if c == 0x28:  # (
            j, s = _scan_string(stream, i + 1, n, octal=False, keep_unknown=True)
            yield ("str", s, j)
            i = j
        elif c == 0x2B or c == 0x2D or c == 0x2E or 0x30 <= c <= 0x39:
            m = _NUM_RE.match(stream, i)
            yield ("num", float(m.group()), m.end())
            i = m.end()
        else:
            i += 1
    yield None


def _interpret(stream: bytes, page_h: float) -> tuple[list[_TextItem], list[_Rect]]:
    """Execute the text/graphics subset, collecting show-ops and rects in
    top-down coordinates."""
    items: list[_TextItem] = []
    rects: list[_Rect] = []
    stack: list = []
    x = y = 0.0  # current text-line origin (PDF y-up)
    leading = 0.0

    def show(s: str) -> None:
        if not isinstance(s, str):  # e.g. `5 Tj` in a malformed stream
            raise PdfParseError(f"show operator on non-string operand {s!r}")
        items.append(_TextItem(x=x, y_top=page_h - y, text=s))

    # stack mode: the tokenizer pushes operand values directly and yields
    # only operator strings — no per-operand tuples on the hot path
    for op in _tokenize(stream, stack):
        try:
            if op == "Td":
                ty = stack[-1]
                tx = stack[-2]
                x += tx
                y += ty
            elif op == "TD":
                ty = stack[-1]
                tx = stack[-2]
                leading = -ty
                x += tx
                y += ty
            elif op == "Tm":
                y = stack[-1]
                x = stack[-2]
            elif op == "T*":
                y -= leading
            elif op == "TL":
                leading = stack[-1]
            elif op == "Tj":
                show(stack[-1])
            elif op == "'":
                y -= leading
                show(stack[-1])
            elif op == "TJ":
                show(stack[-1])  # array pre-joined by the tokenizer
            elif op == "BT":
                x = y = 0.0
            elif op == "re":
                h = stack[-1]
                w = stack[-2]
                ry = stack[-3]
                rx = stack[-4]
                rects.append(
                    _Rect(x0=rx, y0_top=page_h - (ry + h), x1=rx + w, y1_top=page_h - ry)
                )
            # ET, Tf, S, f, q, Q, cm, w, m, l, h, W, n, gs, rg, g: no state we track
        except (IndexError, TypeError) as e:
            raise PdfParseError(f"malformed operands for {op}: {e}") from e
        stack.clear()
    return items, rects


# ---------------------------------------------------------------- layout layer


def _snap(vals: list[float]) -> list[float]:
    """Cluster near-equal coordinates (ruled-line grid axes)."""
    out: list[float] = []
    for v in sorted(vals):
        if not out or v - out[-1] > _RECT_SNAP:
            out.append(v)
    return out


def _detect_tables(rects: list[_Rect], items: list[_TextItem]) -> tuple[list[TableOut], set[int]]:
    """Cluster cell rects into grid tables; claim contained text items.

    Returns tables plus the indices of items consumed by a table (so they are
    excluded from textbox grouping) — the analogue of find_tables + the
    reference's region merge (pymu_tesseract_processor.py:204-231).
    """
    if len(rects) < 2:
        return [], set()
    # connected-component clustering by adjacency (shared edges within snap tol)
    parent = list(range(len(rects)))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        parent[find(a)] = find(b)

    for i in range(len(rects)):
        for j in range(i + 1, len(rects)):
            a, b = rects[i], rects[j]
            touch_x = a.x0 <= b.x1 + _RECT_SNAP and b.x0 <= a.x1 + _RECT_SNAP
            touch_y = a.y0_top <= b.y1_top + _RECT_SNAP and b.y0_top <= a.y1_top + _RECT_SNAP
            if touch_x and touch_y:
                union(i, j)

    clusters: dict[int, list[int]] = {}
    for i in range(len(rects)):
        clusters.setdefault(find(i), []).append(i)

    tables: list[TableOut] = []
    used_items: set[int] = set()
    for members in clusters.values():
        if len(members) < 2:
            continue
        cells = [rects[i] for i in members]
        row_tops = _snap([c.y0_top for c in cells])
        col_lefts = _snap([c.x0 for c in cells])
        n_rows, n_cols = len(row_tops), len(col_lefts)
        if n_rows * n_cols < 2:
            continue
        grid: list[list[str | None]] = [[None] * n_cols for _ in range(n_rows)]
        x0 = min(c.x0 for c in cells)
        x1 = max(c.x1 for c in cells)
        y0 = min(c.y0_top for c in cells)
        y1 = max(c.y1_top for c in cells)
        for idx, it in enumerate(items):
            if x0 - _RECT_SNAP <= it.x <= x1 + _RECT_SNAP and y0 - _RECT_SNAP <= it.y_top <= y1 + _RECT_SNAP:
                # row/col by containment: last grid line at or above the item
                r = max(
                    (k for k, t in enumerate(row_tops) if t <= it.y_top + _RECT_SNAP),
                    default=0,
                )
                c = max(
                    (k for k, l in enumerate(col_lefts) if l <= it.x + _RECT_SNAP),
                    default=0,
                )
                cur = grid[r][c]
                grid[r][c] = it.text if cur is None else f"{cur} {it.text}"
                used_items.add(idx)
        tables.append(TableOut(y_top=y0, x=x0, rows=grid))
    tables.sort(key=lambda t: (t.y_top, t.x))
    return tables, used_items


def _group_textboxes(items: list[_TextItem]) -> list[TextBoxOut]:
    """Lines (merge show-ops at ~equal y) then textboxes (vertical adjacency
    within a column), sorted into reading order by (top-y, left-x).

    This is the load-bearing ordering invariant — the reference's
    sort-by-bbox-y (pymu_tesseract_processor.py:233-235) extended with an x
    tiebreak so multi-column layouts are deterministic.
    """
    if not items:
        return []
    # 1. lines: bucket by y AND x origin — same-y items in different columns
    # must stay separate lines (two-column layouts), so a show-op only joins
    # the current line when it shares the line origin
    items = sorted(items, key=lambda it: (it.y_top, it.x))
    lines: list[tuple[float, float, str]] = []  # (y_top, x0, text)
    cur_y, cur_x, parts = items[0].y_top, items[0].x, [items[0].text]
    for it in items[1:]:
        if abs(it.y_top - cur_y) <= _LINE_Y_TOL and abs(it.x - cur_x) <= 1.0:
            parts.append(it.text)
        else:
            lines.append((cur_y, cur_x, "".join(parts)))
            cur_y, cur_x, parts = it.y_top, it.x, [it.text]
    lines.append((cur_y, cur_x, "".join(parts)))

    # 2. boxes: a line joins a box sharing its column (x within tol) whose last
    # line is vertically adjacent
    boxes: list[TextBoxOut] = []
    open_boxes: list[tuple[TextBoxOut, float, float]] = []  # (box, last_y, leading)
    for y_top, x0, text in lines:
        placed = False
        for k, (box, last_y, lead) in enumerate(open_boxes):
            if abs(x0 - box.x) <= 20.0 and 0 < y_top - last_y <= _BOX_GAP_FACTOR * lead:
                box.lines.append(text)
                open_boxes[k] = (box, y_top, y_top - last_y if y_top > last_y else lead)
                placed = True
                break
        if not placed:
            box = TextBoxOut(y_top=y_top, x=x0, lines=[text])
            boxes.append(box)
            open_boxes.append((box, y_top, 16.0))
    boxes.sort(key=lambda b: (b.y_top, b.x))
    return boxes


# ------------------------------------------------------------------ public API


def parse_pdf(data: bytes) -> list[PageOut]:
    """Parse a PDF byte string into per-page textboxes + tables."""
    if not data.startswith(b"%PDF"):
        raise PdfParseError("not a PDF (bad header)")
    objs = _index_objects(data)

    # page order: follow /Kids if a Pages node exists, else numeric order
    page_nums: list[int] = []
    for num, body in sorted(objs.items()):
        head = body.split(b"stream", 1)[0]
        if b"/Type" in head and b"/Pages" in head and b"/Kids" in head:
            km = _KIDS_RE.search(head)
            if km:
                page_nums = [int(r) for r in _REF_RE.findall(km.group(1))]
            break
    if not page_nums:
        page_nums = [
            n for n, b in sorted(objs.items()) if _PAGE_RE.search(b.split(b"stream", 1)[0])
        ]
    if not page_nums:
        raise PdfParseError("no pages")

    pages: list[PageOut] = []
    for pn in page_nums:
        body = objs.get(pn)
        if body is None:
            raise PdfParseError(f"missing page object {pn}")
        mb = _MEDIABOX_RE.search(body)
        page_h = float(mb.group(4)) if mb else 792.0
        cm = _CONTENTS_RE.search(body)
        if not cm:
            pages.append(PageOut(boxes=[], tables=[]))
            continue
        content_obj = objs.get(int(cm.group(1)))
        if content_obj is None:
            raise PdfParseError(f"missing content object {cm.group(1)}")
        stream = _stream_bytes(content_obj)
        items, rects = _interpret(stream, page_h)
        tables, used = _detect_tables(rects, items)
        free_items = [it for i, it in enumerate(items) if i not in used]
        boxes = _group_textboxes(free_items)
        pages.append(PageOut(boxes=boxes, tables=tables))
    return pages


def page_to_text(page: PageOut) -> str:
    """Assemble one page's content string with the reference's framing and
    cleaning (pymu_tesseract_processor.py:259-274): regions merged in reading
    order (sorted by top-y, then x), text regions framed ``\\n\\n{t}\\n\\n``,
    tables framed ``\\n\\n{label}:\\n\\n`` + list-repr rows, then clean_text."""
    regions: list[tuple[float, float, str]] = []
    n_tables = len(page.tables)
    for i, tbl in enumerate(page.tables, start=1):
        label = f"Table{i}" if n_tables > 1 else "Table"
        regions.append((tbl.y_top, tbl.x, frame_table(label, tbl.rows)))
    for box in page.boxes:
        regions.append((box.y_top, box.x, frame_region(box.text)))
    regions.sort(key=lambda r: (r[0], r[1]))
    return clean_text("".join(r[2] for r in regions))


def extract_pdf_text(data: bytes) -> list[str]:
    """Full pipeline: bytes -> ordered per-page cleaned content strings."""
    return [page_to_text(p) for p in parse_pdf(data)]
