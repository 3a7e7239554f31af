"""Synthetic PDF builder for the test corpus.

Emits small, well-formed PDFs whose content streams use the real text
operators (BT/ET, Tf, TL, Td, TD, Tm, T*, Tj, TJ, ') and ruled-line table
grids (re/S) — so the layout parser in ``pdf_parse.py`` has genuine work to
do (page -> textbox -> line ordering), per the scope bound in SURVEY.md §7.4.

Round-2 feature coverage (generator <-> parser subset contract, §7.4):

- literal AND <hex> show strings (``style="hex"``);
- a second font with an /Encoding /Differences remap (``font="F2"`` boxes,
  ``differences=[(code, glyphname, char), ...]``) — text bytes are written
  through the inverse map, so the parser must decode through the glyph list;
- per-box ``cm`` CTM transforms wrapped in q/Q (translate+scale, the builder
  emits pre-transformed user-space coordinates);
- classic xref tables (optionally with physically shuffled object order —
  offsets must come from the xref, not file order), PDF 1.5 xref streams
  (``xref_mode="stream"``), object streams (``objstm=True``), PNG Up
  predictor on the xref stream (``predictor=True``);
- incremental updates: ``append_incremental_page_update`` appends a second
  revision whose xref /Prev-chains to the first — newest revision wins;
- embedded images (round 3): ``ImageBox`` places an Image XObject (``/Im<k>
  Do`` under a ``cm`` scale) or an inline image (``BI..ID..EI``) — the
  parser records placement as media regions, never pixels.

Deterministic: byte output depends only on the arguments.
"""

from __future__ import annotations

import random
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
    style: str = "td"  # td | tm | quote | tj_array | tex | hex | words
    font: str = "F1"  # F2 = /Differences remap; F4 = named base encoding
    # optional CTM (a, b, c, d, e, f) applied via "q ... cm ... Q"; the
    # builder emits pre-transformed coordinates so the DEVICE-space layout
    # (and therefore the extracted text) is unchanged. b = c = 0 required.
    ctm: tuple | None = None


@dataclass
class Table:
    """Ruled-line grid at (x, y_top); rows of cell strings ('' = empty cell).

    ``ruled=True`` draws the grid as m/l/S stroked RULE lines (the
    docbook/passivetex/LaTeX shape) instead of per-cell ``re`` rectangles —
    the parser must reconstruct cells from rule intersections
    (``_cells_from_rule_segments``) and extract the identical table."""

    x: float
    y_top: float
    rows: list[list[str]]
    col_width: float = 90.0
    row_height: float = 22.0
    ruled: bool = False


@dataclass
class ImageBox:
    """A placed image at (x, y_top) in top-down page coords.

    ``inline=False`` -> an Image XObject (resource name /Im<k>, k = index
    among the page's XObject images) drawn via ``q w 0 0 h x y cm /Im<k>
    Do Q``; ``inline=True`` -> a BI..ID..EI inline image under the same CTM.
    Pixel payload is a fixed 2x2 gray stub — the parser records placement,
    never pixels."""

    x: float
    y_top: float
    w: float = 80.0
    h: float = 60.0
    inline: bool = False


@dataclass
class PageSpec:
    boxes: list[TextBox] = field(default_factory=list)
    tables: list[Table] = field(default_factory=list)
    images: list[ImageBox] = field(default_factory=list)
    # /Rotate value (0/90/180/270). Box coordinates stay in DISPLAY space —
    # the builder inverse-maps them into PDF space and places every line by
    # absolute Tm, so the displayed (and extracted) layout is identical to
    # the unrotated page. Tables and images on rotated pages are unsupported.
    rotate: int = 0


def _esc(s: str, inv_diff: dict[str, int] | None = None, strict_high: bool = False) -> str:
    """Escape a literal string body; chars in the /Differences inverse map
    are emitted as their remapped code (octal escape). ``strict_high``
    (base-encoded F4 boxes): a non-ASCII char missing from the encoding
    raises instead of silently falling through as its latin-1 byte — the
    returned PageSpec is the test oracle, so a silent fallthrough would
    corrupt the ground truth, not just the PDF."""
    out = []
    for ch in s:
        if inv_diff and ch in inv_diff:
            out.append(f"\\{inv_diff[ch]:03o}")
        elif ch == "\\":
            out.append(r"\\")
        elif ch == "(":
            out.append(r"\(")
        elif ch == ")":
            out.append(r"\)")
        else:
            if strict_high and ord(ch) > 0x7F:
                raise ValueError(f"char {ch!r} not in the base encoding")
            out.append(ch)
    return "".join(out)


def _hex_str(
    s: str, inv_diff: dict[str, int] | None = None, strict_high: bool = False
) -> str:
    """<hex> form of a string (codes through the /Differences inverse map)."""
    codes = []
    for ch in s:
        if inv_diff and ch in inv_diff:
            codes.append(inv_diff[ch])
        else:
            if strict_high and ord(ch) > 0x7F:
                raise ValueError(f"char {ch!r} not in the base encoding")
            codes.append(ord(ch))
    if any(c > 255 for c in codes):
        raise ValueError("non-latin-1 char outside the differences map")
    return "<" + "".join(f"{c:02x}" for c in codes) + ">"


# simple-font base encodings the builder (and parser) support by name:
# /Encoding /WinAnsiEncoding | /MacRomanEncoding on the font dict. Encode
# tables are the inverses of the parser's Annex D decode tables (one
# authoritative source, core/encodings.py), so any non-ASCII line char is
# written as the ENCODING's byte, not its latin-1 value — for MacRoman the
# two disagree on every high byte.
from .encodings import BASE_ENC_INVERSE


def _base_inverse(enc_name: str) -> dict[str, int]:
    return BASE_ENC_INVERSE[enc_name]


# CID codes the synthetic Type0 font maps beyond the identity-ASCII range
CID_EACUTE = 0x0100  # -> "é" (bfchar)
CID_FFL = 0x0101  # -> "ffl" (bfchar, multi-char ligature target)


def _cid_hex(s: str) -> str:
    """Encode a line as Identity-H 2-byte CIDs for the synthetic F3 font:
    ASCII 0x20-0x7e identity (covered by one bfrange), é and the ffl
    ligature via dedicated bfchar codes."""
    out: list[int] = []
    i = 0
    while i < len(s):
        if s.startswith("ffl", i):
            out.append(CID_FFL)
            i += 3
        elif s[i] == "é":
            out.append(CID_EACUTE)
            i += 1
        else:
            o = ord(s[i])
            if not 0x20 <= o <= 0x7E:
                raise ValueError(f"char {s[i]!r} not in the synthetic CID map")
            out.append(o)
            i += 1
    return "<" + "".join(f"{c:04x}" for c in out) + ">"


# the non-Identity embedded CMap's 2-byte code page (codespace <8000><80ff>)
EMB_EACUTE = 0x8001  # -> "é"
EMB_FFL = 0x8002  # -> "ffl"


def _cid_hex_embedded(s: str) -> str:
    """Encode for the embedded-CMap F3 variant: MIXED code widths — ASCII as
    single bytes (codespace <20><7e>), é / ffl as 2-byte <80xx> codes. The
    parser must split the byte string by codespacerange to decode this."""
    out: list[str] = []
    i = 0
    while i < len(s):
        if s.startswith("ffl", i):
            out.append(f"{EMB_FFL:04x}")
            i += 3
        elif s[i] == "é":
            out.append(f"{EMB_EACUTE:04x}")
            i += 1
        else:
            o = ord(s[i])
            if not 0x20 <= o <= 0x7E:
                raise ValueError(f"char {s[i]!r} not in the embedded CMap")
            out.append(f"{o:02x}")
            i += 1
    return "<" + "".join(out) + ">"


def _cid_hex_ucs2(s: str) -> str:
    """Encode for the predefined UniGB-UCS2-H F3 variant: 2-byte codes that
    ARE the UCS-2 values (no ToUnicode needed)."""
    return "<" + s.encode("utf-16-be").hex() + ">"


_CID_TOKS = {
    "identity": _cid_hex,
    "embedded": _cid_hex_embedded,
    "ucs2": _cid_hex_ucs2,
}


def _textbox_ops(
    box: TextBox,
    inv_diff: dict[str, int] | None = None,
    cid_tok=_cid_hex,
    inv_base: dict[str, int] | None = None,
) -> str:
    inv = inv_diff if box.font == "F2" else inv_base if box.font == "F4" else None
    # with a CTM, coordinates/leading are emitted in user space so that the
    # device-space result is identical to the untransformed box
    if box.ctm is not None:
        a, b, c, d, e, f = box.ctm
        if b or c or a <= 0 or d <= 0:
            raise ValueError("builder CTMs must be axis-aligned with positive scale")
    else:
        a = d = 1.0
        e = f = 0.0
    y0_dev = PAGE_H - box.y_top  # PDF y-up baseline of the first line
    x_u = (box.x - e) / a
    y0_u = (y0_dev - f) / d
    lead_u = box.leading / d
    ops = []
    if box.ctm is not None:
        ops.append(f"q {a:g} {b:g} {c:g} {d:g} {e:g} {f:g} cm")
    ops.append(f"BT /{box.font} {box.font_size:g} Tf {lead_u:g} TL")
    if box.style == "tm":
        ops.append(f"1 0 0 1 {x_u:g} {y0_u:g} Tm")
    else:
        ops.append(f"{x_u:g} {y0_u:g} Td")
    strict = box.font == "F4"
    if box.font == "F3":
        tok = cid_tok  # Type0: every show string is CID hex (per encoding)
    elif box.style == "hex":
        tok = lambda s: _hex_str(s, inv, strict_high=strict)
    else:
        tok = lambda s: f"({_esc(s, inv, strict_high=strict)})"
    if box.style == "words":
        # one show-op per positioned word (how real writers emit text):
        # advances follow the same 0.5 em/char + 0.3 em gap width model the
        # parser's word-assembly uses, emitted in user space
        for i, line in enumerate(box.lines):
            wy = y0_u - i * lead_u
            wx = x_u
            for w in line.split(" "):
                if w:
                    ops.append(f"1 0 0 1 {wx:g} {wy:g} Tm")
                    ops.append(f"{tok(w)} Tj")
                    wx += (0.5 * len(w) + 0.3) * box.font_size * d / a
                else:
                    wx += 0.3 * box.font_size * d / a
        ops.append("ET")
        if box.ctm is not None:
            ops.append("Q")
        return "\n".join(ops)
    for i, line in enumerate(box.lines):
        if i > 0:
            if box.style == "quote":
                ops.append(f"{tok(line)} '")
                continue
            if box.style == "tm":
                ops.append(f"1 0 0 1 {x_u:g} {y0_u - i * lead_u:g} Tm")
            elif box.style == "td":
                ops.append(f"0 {-lead_u:g} Td")
            else:
                ops.append("T*")
        if i == 0 or box.style != "quote":
            if box.style == "tj_array":
                # split the line across a TJ array with kerning numbers
                mid = max(1, len(line) // 2)
                ops.append(f"[{tok(line[:mid])} -20 {tok(line[mid:])}] TJ")
            elif box.style == "tex":
                # pdfTeX shape: NO space glyphs — inter-word spacing is
                # pure TJ kerning ("[(This)-371(man)28(ual)]TJ"); the
                # parser's _join_tj_array must read the wide gaps back as
                # spaces for the roundtrip to hold byte-exact
                parts = " -350 ".join(tok(w) for w in line.split(" "))
                ops.append(f"[{parts}] TJ")
            else:
                ops.append(f"{tok(line)} Tj")
    ops.append("ET")
    if box.ctm is not None:
        ops.append("Q")
    return "\n".join(ops)


def _rotated_textbox_ops(
    box: TextBox,
    rotate: int,
    inv_diff: dict[str, int] | None = None,
    cid_tok=_cid_hex,
    inv_base: dict[str, int] | None = None,
) -> str:
    """Per-line absolute Tm placement for a /Rotate'd page: each DISPLAY
    position (x, y_top + i*leading) is inverse-rotated into PDF top-down
    coords (the exact inverse of the parser's _apply_rotation maps)."""
    inv = inv_diff if box.font == "F2" else inv_base if box.font == "F4" else None
    if rotate == 90:
        back = lambda X, Yt: (Yt, PAGE_H - X)
    elif rotate == 180:
        back = lambda X, Yt: (PAGE_W - X, PAGE_H - Yt)
    elif rotate == 270:
        back = lambda X, Yt: (PAGE_W - Yt, X)
    else:
        raise ValueError(f"unsupported rotate {rotate}")
    strict = box.font == "F4"
    if box.font == "F3":
        tok = cid_tok
    elif box.style == "hex":
        tok = lambda s: _hex_str(s, inv, strict_high=strict)
    else:
        tok = lambda s: f"({_esc(s, inv, strict_high=strict)})"
    ops = [f"BT /{box.font} {box.font_size:g} Tf"]
    for i, line in enumerate(box.lines):
        x_pdf, ytop_pdf = back(box.x, box.y_top + i * box.leading)
        y = PAGE_H - ytop_pdf
        ops.append(f"1 0 0 1 {x_pdf:g} {y:g} Tm")
        ops.append(f"{tok(line)} Tj")
    ops.append("ET")
    return "\n".join(ops)


# 2x2 gray inline/XObject pixel stub; bytes chosen to never contain "EI"
_IMG_PAYLOAD = b"\x10\x30\x50\x70"


def _image_ops(img: ImageBox, xobj_name: str | None) -> str:
    """Placement ops: unit square scaled to (w, h) at the image's lower-left.

    ``xobj_name`` None -> inline image (BI..ID..EI) under the same CTM."""
    y = PAGE_H - img.y_top - img.h  # PDF y-up lower-left corner
    cm = f"q {img.w:g} 0 0 {img.h:g} {img.x:g} {y:g} cm"
    if xobj_name is not None:
        return f"{cm} /{xobj_name} Do Q"
    payload = _IMG_PAYLOAD.decode("latin-1")
    return f"{cm} BI /W 2 /H 2 /CS /G /BPC 8 ID {payload} EI Q"


def _table_ops(tbl: Table) -> str:
    ops = []
    n_rows = len(tbl.rows)
    n_cols = max(len(r) for r in tbl.rows)
    if tbl.ruled:
        # grid as stroked rules: n_rows+1 horizontal + n_cols+1 vertical
        x0 = tbl.x
        x1 = tbl.x + n_cols * tbl.col_width
        for r in range(n_rows + 1):
            y = PAGE_H - (tbl.y_top + r * tbl.row_height)
            ops.append(f"{x0:g} {y:g} m {x1:g} {y:g} l S")
        y_hi = PAGE_H - tbl.y_top
        y_lo = PAGE_H - (tbl.y_top + n_rows * tbl.row_height)
        for c in range(n_cols + 1):
            x = tbl.x + c * tbl.col_width
            ops.append(f"{x:g} {y_lo:g} m {x:g} {y_hi:g} l S")
        for r in range(n_rows):
            for c in range(n_cols):
                text = tbl.rows[r][c] if c < len(tbl.rows[r]) else ""
                if text:
                    tx = tbl.x + c * tbl.col_width + 3
                    ty = PAGE_H - (tbl.y_top + (r + 1) * tbl.row_height) + 6
                    ops.append(
                        f"BT /F1 9 Tf {tx:g} {ty:g} Td ({_esc(text)}) Tj ET"
                    )
        return "\n".join(ops)
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


# object-slot count of the F3 family per encoding variant:
# identity: F3 + descendant + ToUnicode; ucs2: F3 + descendant (no
# ToUnicode); embedded: + the /Encoding CMap stream
_CID_N_OBJS = {"identity": 3, "ucs2": 2, "embedded": 4}


def _page_objects(
    pages: list[PageSpec],
    compress: bool,
    differences: list[tuple[int, str, str]] | None,
    cid: bool = False,
    cid_encoding: str = "identity",
    base_encoding: str | None = None,
) -> tuple[list[tuple[int, bytes, bool]], int]:
    """Assemble numbered object bodies.

    Returns ([(num, body, is_stream)], size). Numbering: 1 catalog, 2 pages
    node, then per page i: page 3+2i / contents 4+2i, then fonts (F1; F2 if
    differences; the F3 Type0 family if cid — see _CID_N_OBJS; F4 if
    base_encoding), then image XObjects.
    """
    inv_diff = {ch: code for code, _name, ch in (differences or [])}
    inv_base = _base_inverse(base_encoding) if base_encoding else None
    cid_tok = _CID_TOKS[cid_encoding]
    n_pages = len(pages)
    f1_num = 3 + 2 * n_pages
    f2_num = f1_num + 1
    objs: list[tuple[int, bytes, bool]] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append((1, b"<< /Type /Catalog /Pages 2 0 R >>", False))
    objs.append(
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(), False)
    )
    font_res = f"/F1 {f1_num} 0 R"
    if differences:
        font_res += f" /F2 {f2_num} 0 R"
    f3_num = f2_num + 1 if differences else f1_num + 1
    if cid:
        font_res += f" /F3 {f3_num} 0 R"
    f4_num = (
        f1_num
        + 1
        + (1 if differences else 0)
        + (_CID_N_OBJS[cid_encoding] if cid else 0)
    )
    if base_encoding:
        font_res += f" /F4 {f4_num} 0 R"
    # image XObjects are numbered after every font object
    img_base = f4_num + (1 if base_encoding else 0)
    img_objs: list[tuple[int, bytes, bool]] = []
    for i, page in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        rot = f" /Rotate {page.rotate}" if page.rotate else ""
        # per-page XObject resources: /Im<k> for the non-inline images
        img_parts: list[str] = []
        xobj_res = ""
        k = 0
        for img in page.images:
            if img.inline:
                img_parts.append(_image_ops(img, None))
            else:
                num = img_base + len(img_objs)
                name = f"Im{k}"
                k += 1
                xobj_res += f" /{name} {num} 0 R"
                img_objs.append(
                    (
                        num,
                        (
                            "<< /Type /XObject /Subtype /Image /Width 2 "
                            "/Height 2 /ColorSpace /DeviceGray "
                            f"/BitsPerComponent 8 /Length {len(_IMG_PAYLOAD)} "
                            ">>\nstream\n"
                        ).encode()
                        + _IMG_PAYLOAD
                        + b"\nendstream",
                        True,
                    )
                )
                img_parts.append(_image_ops(img, name))
        xobj_dict = f" /XObject <<{xobj_res} >>" if xobj_res else ""
        objs.append(
            (
                page_num,
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:g} "
                    f"{PAGE_H:g}]{rot} /Contents {content_num} 0 R "
                    f"/Resources << /Font << {font_res} >>{xobj_dict} >> >>"
                ).encode(),
                False,
            )
        )
        if page.rotate:
            if page.tables or page.images:
                raise ValueError("tables/images on rotated pages are unsupported")
            parts = [
                _rotated_textbox_ops(
                    b, page.rotate, inv_diff, cid_tok=cid_tok, inv_base=inv_base
                )
                for b in page.boxes
            ]
        else:
            parts = [_table_ops(t) for t in page.tables]
            parts += [
                _textbox_ops(b, inv_diff, cid_tok=cid_tok, inv_base=inv_base)
                for b in page.boxes
            ]
            parts += img_parts
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
        objs.append((content_num, body, True))
    objs.append(
        (f1_num, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>", False)
    )
    size = f1_num + 1
    if differences:
        diff_items = " ".join(f"{code} /{name}" for code, name, _ch in differences)
        objs.append(
            (
                f2_num,
                (
                    "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                    f"/Encoding << /Type /Encoding /Differences [{diff_items}] >> >>"
                ).encode(),
                False,
            )
        )
        size = f2_num + 1
    if cid:
        desc_num = f3_num + 1
        if cid_encoding == "identity":
            enc_entry = "/Encoding /Identity-H"
            tu_num = f3_num + 2
            tu_entry = f" /ToUnicode {tu_num} 0 R"
            ordering = "Identity"
            size = tu_num + 1
            # identity-ASCII bfrange + two bfchar extras (é, ffl ligature)
            tu_cmap = (
                "/CIDInit /ProcSet findresource begin\n"
                "1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
                "1 beginbfrange\n<0020> <007e> <0020>\nendbfrange\n"
                "2 beginbfchar\n"
                f"<{CID_EACUTE:04x}> <00e9>\n"
                f"<{CID_FFL:04x}> <00660066006c>\n"
                "endbfchar\nend\n"
            ).encode()
        elif cid_encoding == "ucs2":
            # predefined CMap: 2-byte codes ARE UCS-2; no ToUnicode at all —
            # the parser must decode from the encoding name
            enc_entry = "/Encoding /UniGB-UCS2-H"
            tu_entry = ""
            ordering = "GB1"
            size = desc_num + 1
        else:  # embedded: non-Identity CMap stream with MIXED code widths
            cmap_num = f3_num + 2
            tu_num = f3_num + 3
            enc_entry = f"/Encoding {cmap_num} 0 R"
            tu_entry = f" /ToUnicode {tu_num} 0 R"
            ordering = "PesCustom"
            size = tu_num + 1
            enc_cmap = (
                "/CIDInit /ProcSet findresource begin\n"
                "12 dict begin\nbegincmap\n"
                "/CIDSystemInfo << /Registry (PES) /Ordering (PesCustom) "
                "/Supplement 0 >> def\n"
                "/CMapName /PES-Custom def\n/CMapType 1 def\n"
                "2 begincodespacerange\n<20> <7e>\n<8000> <80ff>\n"
                "endcodespacerange\n"
                "1 begincidrange\n<20> <7e> 100\nendcidrange\n"
                "2 begincidchar\n"
                f"<{EMB_EACUTE:04x}> 501\n<{EMB_FFL:04x}> 502\n"
                "endcidchar\nendcmap\nend\n"
            ).encode()
            # ToUnicode keyed by the SAME mixed-width codes
            tu_cmap = (
                "/CIDInit /ProcSet findresource begin\n"
                "2 begincodespacerange\n<20> <7e>\n<8000> <80ff>\n"
                "endcodespacerange\n"
                "1 beginbfrange\n<20> <7e> <0020>\nendbfrange\n"
                "2 beginbfchar\n"
                f"<{EMB_EACUTE:04x}> <00e9>\n"
                f"<{EMB_FFL:04x}> <00660066006c>\n"
                "endbfchar\nend\n"
            ).encode()
        objs.append(
            (
                f3_num,
                (
                    "<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic "
                    f"{enc_entry} /DescendantFonts [{desc_num} 0 R]"
                    f"{tu_entry} >>"
                ).encode(),
                False,
            )
        )
        objs.append(
            (
                desc_num,
                (
                    "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synthetic "
                    f"/CIDSystemInfo << /Registry (Adobe) /Ordering ({ordering}) "
                    "/Supplement 0 >> >>"
                ).encode(),
                False,
            )
        )
        if cid_encoding == "embedded":
            objs.append(
                (
                    cmap_num,
                    (
                        "<< /Type /CMap /CMapName /PES-Custom "
                        f"/Length {len(enc_cmap)} >>\nstream\n"
                    ).encode()
                    + enc_cmap
                    + b"\nendstream",
                    True,
                )
            )
        if cid_encoding != "ucs2":
            objs.append(
                (
                    tu_num,
                    f"<< /Length {len(tu_cmap)} >>\nstream\n".encode()
                    + tu_cmap
                    + b"\nendstream",
                    True,
                )
            )
            size = tu_num + 1
    if base_encoding:
        objs.append(
            (
                f4_num,
                (
                    "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                    f"/Encoding /{base_encoding} >>"
                ).encode(),
                False,
            )
        )
        size = f4_num + 1
    assert size == img_base
    objs.extend(img_objs)
    return objs, img_base + len(img_objs)


def _png_up_predict(data: bytes, columns: int) -> bytes:
    """Apply the PNG Up filter (type 2) per row of `columns` bytes."""
    out = bytearray()
    prev = bytes(columns)
    for i in range(0, len(data), columns):
        row = data[i : i + columns]
        row = row + bytes(columns - len(row))
        out.append(2)
        out += bytes((row[k] - prev[k]) & 0xFF for k in range(columns))
        prev = row
    return bytes(out)


def _encrypt_stream_body(body: bytes, num: int, crypt) -> bytes:
    """Encrypt one builder stream object's payload in place (dict /Length
    updated — AES grows the payload by IV + PKCS#7 padding)."""
    import re as _re

    h_end = body.find(b">>\nstream\n")
    assert h_end != -1, "not a builder stream body"
    payload = body[h_end + len(b">>\nstream\n") : -len(b"\nendstream")]
    enc = crypt.encrypt(num, 0, payload)
    head = _re.sub(
        rb"/Length \d+", b"/Length %d" % len(enc), body[:h_end], count=1
    )
    return head + b">>\nstream\n" + enc + b"\nendstream"


def build_pdf(
    pages: list[PageSpec],
    compress: bool = False,
    xref_mode: str = "table",
    objstm: bool = False,
    predictor: bool = False,
    differences: list[tuple[int, str, str]] | None = None,
    order_rng: random.Random | None = None,
    cid: bool = False,
    cid_encoding: str = "identity",
    base_encoding: str | None = None,
    encrypt: str | None = None,
    owner_pw: bytes = b"owner",
    user_pw: bytes = b"",
) -> bytes:
    """Assemble a complete PDF.

    xref_mode="table": classic cross-reference table (PDF 1.4). With
    ``order_rng`` the physical object order is shuffled — a parser that
    scans file order instead of honoring xref offsets still works (offsets
    point wherever the objects landed), but object streams below do not.

    xref_mode="stream": PDF 1.5 cross-reference STREAM (/Type /XRef, /W
    columns, Flate, optional PNG Up predictor); with ``objstm=True`` all
    non-stream objects are packed into one compressed object stream
    (/Type /ObjStm) referenced by type-2 xref entries.

    base_encoding="WinAnsiEncoding" | "MacRomanEncoding": adds a fourth
    simple font (``font="F4"`` boxes) whose /Encoding is the NAMED base
    encoding — text bytes are written through that codec's high range, so
    the parser must decode through the encoding table, not latin-1.

    encrypt="rc4-40" | "rc4-128" | "aes-128": standard security handler
    with the given ``user_pw`` (default empty — the owner-password-only
    files the parser must open transparently). Every stream payload is
    encrypted with its per-object key; the AES IV is derived from the
    object id so output stays deterministic. Strings in object dicts are
    left plaintext (spec deviation, mirrored by the parser's streams-only
    decryption — content extraction never reads them).
    """
    import hashlib

    objs, size = _page_objects(
        pages,
        compress,
        differences,
        cid=cid,
        cid_encoding=cid_encoding,
        base_encoding=base_encoding,
    )
    if order_rng is not None:
        objs = list(objs)
        order_rng.shuffle(objs)

    enc_extra = ""  # trailer / xref-dict additions
    if encrypt is not None:
        from .pdf_crypt import (
            MODES,
            StandardCrypt,
            compute_o,
            compute_u,
            compute_v5_entries,
            file_key,
        )

        v, r, bits, aes = MODES[encrypt]
        n = bits // 8
        fid = hashlib.md5(
            b"pes-id" + owner_pw + user_pw + bytes([len(pages) & 0xFF])
        ).digest()
        p = -44
        if v == 5:
            # AES-256: the file key is chosen, not derived; deterministic
            # for fixture reproducibility (never do this for real secrecy)
            key = hashlib.sha256(b"pes-v5-key" + fid).digest()
            ent = compute_v5_entries(user_pw, owner_pw, key, p, r)
            crypt = StandardCrypt(key, aes=True, per_object=False)
            enc_body = (
                f"<< /Filter /Standard /V 5 /R {r} /Length 256 /P {p} "
                f"/O <{ent['O'].hex()}> /U <{ent['U'].hex()}> "
                f"/OE <{ent['OE'].hex()}> /UE <{ent['UE'].hex()}> "
                f"/Perms <{ent['Perms'].hex()}> "
                "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
                "/StmF /StdCF /StrF /StdCF >>"
            )
        else:
            o = compute_o(owner_pw, user_pw, r, n)
            key = file_key(user_pw, o, p, fid, r, n)
            u = compute_u(key, fid, r)
            crypt = StandardCrypt(key, aes)
            enc_body = (
                f"<< /Filter /Standard /V {v} /R {r} /Length {bits} /P {p} "
                f"/O <{o.hex()}> /U <{u.hex()}>"
            )
            if v == 4:
                enc_body += (
                    " /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                    "/StmF /StdCF /StrF /StdCF"
                )
            enc_body += " >>"
        objs = [
            (num, _encrypt_stream_body(body, num, crypt) if is_s else body, is_s)
            for num, body, is_s in objs
        ]
        enc_num = size
        size += 1
        # the /Encrypt dict itself is never encrypted and (by spec) must not
        # live in an object stream: mark is_stream so the objstm path writes
        # it directly
        objs = list(objs) + [(enc_num, enc_body.encode(), True)]
        enc_extra = f" /Encrypt {enc_num} 0 R /ID [<{fid.hex()}> <{fid.hex()}>]"
    else:
        crypt = None

    if xref_mode == "table":
        out = bytearray(b"%PDF-1.4\n")
        offsets: dict[int, int] = {}
        for num, body, _is_stream in objs:
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_at = len(out)
        out += f"xref\n0 {size}\n".encode()
        out += b"0000000000 65535 f \n"
        for num in range(1, size):
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {size} /Root 1 0 R{enc_extra} >>\n"
            f"startxref\n{xref_at}\n%%EOF\n"
        ).encode()
        return bytes(out)

    if xref_mode != "stream":
        raise ValueError(f"unknown xref_mode {xref_mode!r}")

    out = bytearray(b"%PDF-1.5\n")
    xref_num = size
    # entry per object: ("n", offset) | ("s", objstm_num, idx)
    entries: dict[int, tuple] = {}
    if objstm:
        stm_num = size + 1
        members = [(num, body) for num, body, is_s in objs if not is_s]
        streams = [(num, body) for num, body, is_s in objs if is_s]
        header = []
        payload = bytearray()
        for num, body in members:
            header.append(f"{num} {len(payload)}")
            payload += body + b"\n"
        hdr = (" ".join(header) + "\n").encode()
        stm_data = zlib.compress(hdr + bytes(payload))
        if crypt is not None:
            # the ObjStm is a stream: encrypted wholesale with its own key;
            # member objects are never encrypted individually (spec)
            stm_data = crypt.encrypt(stm_num, 0, stm_data)
        for idx, (num, _body) in enumerate(members):
            entries[num] = ("s", stm_num, idx)
        for num, body in streams:
            entries[num] = ("n", len(out))
            out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
        entries[stm_num] = ("n", len(out))
        out += (
            f"{stm_num} 0 obj\n<< /Type /ObjStm /N {len(members)} "
            f"/First {len(hdr)} /Length {len(stm_data)} /Filter /FlateDecode "
            ">>\nstream\n".encode()
            + stm_data
            + b"\nendstream\nendobj\n"
        )
        xref_num = stm_num + 1
        total = xref_num + 1
    else:
        for num, body, _is_s in objs:
            entries[num] = ("n", len(out))
            out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
        total = xref_num + 1

    # xref stream: W = [1 4 2], rows for 0..total-1
    xref_at = len(out)
    entries[xref_num] = ("n", xref_at)
    rows = bytearray()
    for num in range(total):
        e = entries.get(num)
        if e is None:
            rows += (0).to_bytes(1, "big") + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
        elif e[0] == "n":
            rows += (1).to_bytes(1, "big") + e[1].to_bytes(4, "big") + (0).to_bytes(2, "big")
        else:
            rows += (2).to_bytes(1, "big") + e[1].to_bytes(4, "big") + e[2].to_bytes(2, "big")
    parms = ""
    if predictor:
        rows = bytearray(_png_up_predict(bytes(rows), 7))
        parms = " /DecodeParms << /Predictor 12 /Columns 7 >>"
    xdata = zlib.compress(bytes(rows))
    out += (
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {total} /W [1 4 2] "
        f"/Root 1 0 R{enc_extra} /Length {len(xdata)} /Filter /FlateDecode{parms} "
        ">>\nstream\n".encode()
        + xdata
        + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)


def append_incremental_page_update(
    base: bytes, page_index: int, new_page: PageSpec, n_pages: int
) -> bytes:
    """Append an incremental-update revision replacing one page's content
    stream; the new xref table /Prev-chains to the base revision's xref.
    Only valid for classic-table, un-shuffled builds (object numbering is
    positional: content object = 4 + 2*page_index)."""
    m = None
    import re as _re

    for m in _re.finditer(rb"startxref\s+(\d+)", base):
        pass
    if m is None:
        raise ValueError("base has no startxref")
    prev_xref = int(m.group(1))
    # carry the base revision's actual /Size: recomputing it positionally
    # undercounts when the base carries diff/CID font objects (ADVICE r02 —
    # spec-invalid trailer for external readers)
    sm = None
    for sm in _re.finditer(rb"/Size\s+(\d+)", base):
        pass
    size = int(sm.group(1)) if sm is not None else 3 + 2 * n_pages + 1
    content_num = 4 + 2 * page_index
    parts = [_table_ops(t) for t in new_page.tables]
    parts += [_textbox_ops(b) for b in new_page.boxes]
    content = "\n".join(parts).encode("latin-1", errors="replace")
    body = (
        f"<< /Length {len(content)} >>\nstream\n".encode()
        + content
        + b"\nendstream"
    )
    out = bytearray(base)
    obj_at = len(out)
    out += f"{content_num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n{content_num} 1\n{obj_at:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {size} /Root 1 0 R /Prev {prev_xref} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
