"""Named simple-font base encodings (ISO 32000-1 Annex D, table D.2).

One authoritative table per encoding, shared by the parser (decode) and the
synthetic builder (inverse/encode) so the two can never drift. The tables
start from the closest Python codec and then apply the Annex D deltas the
codecs get wrong:

- WinAnsiEncoding (base cp1252): note 3 — unused codes above 40 octal map
  to the BULLET character (cp1252 leaves 0x81/0x8D/0x8F/0x90/0x9D
  undefined); note 6 — SPACE is also encoded at 0240, and HYPHEN at 0255
  (cp1252 reads those as NBSP / soft hyphen).
- MacRomanEncoding (base mac_roman): the Annex predates Mac OS 8.5, so
  0333 (0xDB) is CURRENCY SIGN, not the euro Python's codec returns; 0360
  (the Apple logo position) is undefined; note 6 — SPACE is also encoded
  at 0312 (codec: NBSP).

Codes below 0x80 match ASCII in every encoding here, so tables carry only
the high range; a decoder applies them via str.translate and unmapped
codes fall through to latin-1.
"""

from __future__ import annotations

_BASE_CODECS = {
    "WinAnsiEncoding": "cp1252",
    "MacRomanEncoding": "mac_roman",
}

_ANNEX_D_DELTAS: dict[str, dict[int, str]] = {
    "WinAnsiEncoding": {
        0x81: "•", 0x8D: "•", 0x8F: "•", 0x90: "•", 0x9D: "•",  # note 3
        0xA0: " ",  # note 6: space alias
        0xAD: "-",  # note 6: hyphen alias (cp1252: soft hyphen)
    },
    "MacRomanEncoding": {
        0xDB: "¤",  # currency sign (pre-8.5 Mac; codec says euro)
        0xF0: "�",  # Apple logo position — undefined in the Annex
        0xCA: " ",  # note 6: space alias (codec: NBSP)
    },
}


def _build_map(enc_name: str) -> dict[int, str]:
    codec = _BASE_CODECS[enc_name]
    out: dict[int, str] = {}
    for c in range(0x80, 0x100):
        try:
            out[c] = bytes([c]).decode(codec)
        except UnicodeDecodeError:
            out[c] = "�"
    out.update(_ANNEX_D_DELTAS[enc_name])
    return out


#: code -> unicode decode tables, high range only
BASE_ENC_MAPS: dict[str, dict[int, str]] = {
    name: _build_map(name) for name in _BASE_CODECS
}


def _build_inverse(enc_name: str) -> dict[str, int]:
    """unicode -> code for writing. Codec-canonical positions win (a real
    writer puts bullet at 0x95, not at the note-3 alias 0x81); Annex-only
    chars (MacRoman currency) fill in after. ASCII targets and undefined
    positions are excluded — ASCII always encodes as itself."""
    codec = _BASE_CODECS[enc_name]
    table = BASE_ENC_MAPS[enc_name]
    inv: dict[str, int] = {}
    for code, ch in table.items():
        if ord(ch) < 0x80 or ch == "�":
            continue
        try:
            if bytes([code]).decode(codec) == ch:
                inv[ch] = code
        except UnicodeDecodeError:
            pass
    for code, ch in sorted(table.items()):
        if ord(ch) >= 0x80 and ch != "�" and ch not in inv:
            inv[ch] = code
    return inv


#: unicode -> code encode tables for the builder
BASE_ENC_INVERSE: dict[str, dict[str, int]] = {
    name: _build_inverse(name) for name in _BASE_CODECS
}
