"""PDF standard security handler (ISO 32000-1 §7.6) — pure Python.

Decrypts the empty-user-password case that dominates real-world "encrypted"
PDFs (owner-password-only documents): RC4 40/128-bit (/V 1-2, /R 2-3),
AES-128-CBC (/V 4 /R 4 /CFM AESV2), and AES-256-CBC (/V 5 /R 5-6 /CFM
AESV3, the PDF 2.0 / Acrobat X+ default). The reference opens all of these
transparently (``pymupdf.open``, pymu_tesseract_processor.py:84); documents
that need a real user password still quarantine as parse failures
(helper.py:213-225).

Also provides the ENcryption direction so ``pdf_build`` can emit encrypted
fixtures deterministically. Implementation is from the published spec only:
ISO 32000-1 Algorithm 2 (file key), 3 (/O), 4/5 (/U), 1 (per-object key);
ISO 32000-2 Algorithm 2.A (V5 file key from /UE) and 2.B (R6 hardened
hash); plus textbook RC4 and AES-128/256 (FIPS-197) in pure Python —
fixture-scale streams are tiny, so table-driven AES is plenty.

Scope notes (documented limitations, both irrelevant to text extraction):
- STRING decryption is not implemented — content comes from streams, which
  are decrypted wholesale (string objects inside a decrypted content stream
  or object stream need no second pass). Document-info strings would stay
  ciphertext; the engine never reads them.
"""

from __future__ import annotations

import functools
import hashlib
import struct

# 32-byte padding string, ISO 32000-1 Table 7.6.3.3
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


class PdfCryptError(ValueError):
    pass


def _pad(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


# ------------------------------------------------------------------------ RC4


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------- AES-128/256
# FIPS-197 table-driven implementation (128- and 256-bit keys, CBC mode).

_SBOX = [
    0x63, 0x7C, 0x77, 0x7B, 0xF2, 0x6B, 0x6F, 0xC5, 0x30, 0x01, 0x67, 0x2B,
    0xFE, 0xD7, 0xAB, 0x76, 0xCA, 0x82, 0xC9, 0x7D, 0xFA, 0x59, 0x47, 0xF0,
    0xAD, 0xD4, 0xA2, 0xAF, 0x9C, 0xA4, 0x72, 0xC0, 0xB7, 0xFD, 0x93, 0x26,
    0x36, 0x3F, 0xF7, 0xCC, 0x34, 0xA5, 0xE5, 0xF1, 0x71, 0xD8, 0x31, 0x15,
    0x04, 0xC7, 0x23, 0xC3, 0x18, 0x96, 0x05, 0x9A, 0x07, 0x12, 0x80, 0xE2,
    0xEB, 0x27, 0xB2, 0x75, 0x09, 0x83, 0x2C, 0x1A, 0x1B, 0x6E, 0x5A, 0xA0,
    0x52, 0x3B, 0xD6, 0xB3, 0x29, 0xE3, 0x2F, 0x84, 0x53, 0xD1, 0x00, 0xED,
    0x20, 0xFC, 0xB1, 0x5B, 0x6A, 0xCB, 0xBE, 0x39, 0x4A, 0x4C, 0x58, 0xCF,
    0xD0, 0xEF, 0xAA, 0xFB, 0x43, 0x4D, 0x33, 0x85, 0x45, 0xF9, 0x02, 0x7F,
    0x50, 0x3C, 0x9F, 0xA8, 0x51, 0xA3, 0x40, 0x8F, 0x92, 0x9D, 0x38, 0xF5,
    0xBC, 0xB6, 0xDA, 0x21, 0x10, 0xFF, 0xF3, 0xD2, 0xCD, 0x0C, 0x13, 0xEC,
    0x5F, 0x97, 0x44, 0x17, 0xC4, 0xA7, 0x7E, 0x3D, 0x64, 0x5D, 0x19, 0x73,
    0x60, 0x81, 0x4F, 0xDC, 0x22, 0x2A, 0x90, 0x88, 0x46, 0xEE, 0xB8, 0x14,
    0xDE, 0x5E, 0x0B, 0xDB, 0xE0, 0x32, 0x3A, 0x0A, 0x49, 0x06, 0x24, 0x5C,
    0xC2, 0xD3, 0xAC, 0x62, 0x91, 0x95, 0xE4, 0x79, 0xE7, 0xC8, 0x37, 0x6D,
    0x8D, 0xD5, 0x4E, 0xA9, 0x6C, 0x56, 0xF4, 0xEA, 0x65, 0x7A, 0xAE, 0x08,
    0xBA, 0x78, 0x25, 0x2E, 0x1C, 0xA6, 0xB4, 0xC6, 0xE8, 0xDD, 0x74, 0x1F,
    0x4B, 0xBD, 0x8B, 0x8A, 0x70, 0x3E, 0xB5, 0x66, 0x48, 0x03, 0xF6, 0x0E,
    0x61, 0x35, 0x57, 0xB9, 0x86, 0xC1, 0x1D, 0x9E, 0xE1, 0xF8, 0x98, 0x11,
    0x69, 0xD9, 0x8E, 0x94, 0x9B, 0x1E, 0x87, 0xE9, 0xCE, 0x55, 0x28, 0xDF,
    0x8C, 0xA1, 0x89, 0x0D, 0xBF, 0xE6, 0x42, 0x68, 0x41, 0x99, 0x2D, 0x0F,
    0xB0, 0x54, 0xBB, 0x16,
]
_INV_SBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


# T-tables: one 32-bit word lookup folds SubBytes + ShiftRows + MixColumns
# (encrypt) / InvMixColumns (decrypt) — the classic software-AES layout.
# Algorithm 2.B below encrypts hundreds of KB through this cipher per
# encrypted document, so the naive per-byte _gmul form (kept above for the
# table builders) is ~20x too slow in pure Python.
def _build_te() -> list[list[int]]:
    te = [[0] * 256 for _ in range(4)]
    for x in range(256):
        s = _SBOX[x]
        w = (_gmul(s, 2) << 24) | (s << 16) | (s << 8) | _gmul(s, 3)
        for t in range(4):
            te[t][x] = ((w >> (8 * t)) | (w << (32 - 8 * t))) & 0xFFFFFFFF
    return te


def _build_td() -> list[list[int]]:
    td = [[0] * 256 for _ in range(4)]
    for b in range(256):
        w = (
            (_gmul(b, 14) << 24)
            | (_gmul(b, 9) << 16)
            | (_gmul(b, 13) << 8)
            | _gmul(b, 11)
        )
        for t in range(4):
            td[t][b] = ((w >> (8 * t)) | (w << (32 - 8 * t))) & 0xFFFFFFFF
    return td


_TE0, _TE1, _TE2, _TE3 = _build_te()
_TD0, _TD1, _TD2, _TD3 = _build_td()


def _expand_key(key: bytes) -> list[list[int]]:
    """Round keys as four 32-bit big-endian words per round: 11 rounds for
    AES-128 (Nk=4, Nr=10), 15 for AES-256 (Nk=8, Nr=14) — FIPS-197 §5.2."""
    nk = len(key) // 4
    if nk not in (4, 8) or len(key) % 4:
        raise PdfCryptError(f"bad AES key length {len(key)}")
    nr = nk + 6
    w = list(struct.unpack(f">{nk}I", key))
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = (
                (_SBOX[(t >> 24) & 0xFF] << 24)
                | (_SBOX[(t >> 16) & 0xFF] << 16)
                | (_SBOX[(t >> 8) & 0xFF] << 8)
                | _SBOX[t & 0xFF]
            )
            t ^= _RCON[i // nk - 1] << 24
        elif nk == 8 and i % nk == 4:
            t = (
                (_SBOX[(t >> 24) & 0xFF] << 24)
                | (_SBOX[(t >> 16) & 0xFF] << 16)
                | (_SBOX[(t >> 8) & 0xFF] << 8)
                | _SBOX[t & 0xFF]
            )
        w.append(w[i - nk] ^ t)
    return [w[4 * r : 4 * r + 4] for r in range(nr + 1)]


def _aes_encrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    nr = len(rks) - 1
    rk = rks[0]
    w0, w1, w2, w3 = struct.unpack(">4I", block)
    w0 ^= rk[0]
    w1 ^= rk[1]
    w2 ^= rk[2]
    w3 ^= rk[3]
    for rnd in range(1, nr):
        rk = rks[rnd]
        n0 = (
            _TE0[(w0 >> 24) & 0xFF]
            ^ _TE1[(w1 >> 16) & 0xFF]
            ^ _TE2[(w2 >> 8) & 0xFF]
            ^ _TE3[w3 & 0xFF]
            ^ rk[0]
        )
        n1 = (
            _TE0[(w1 >> 24) & 0xFF]
            ^ _TE1[(w2 >> 16) & 0xFF]
            ^ _TE2[(w3 >> 8) & 0xFF]
            ^ _TE3[w0 & 0xFF]
            ^ rk[1]
        )
        n2 = (
            _TE0[(w2 >> 24) & 0xFF]
            ^ _TE1[(w3 >> 16) & 0xFF]
            ^ _TE2[(w0 >> 8) & 0xFF]
            ^ _TE3[w1 & 0xFF]
            ^ rk[2]
        )
        n3 = (
            _TE0[(w3 >> 24) & 0xFF]
            ^ _TE1[(w0 >> 16) & 0xFF]
            ^ _TE2[(w1 >> 8) & 0xFF]
            ^ _TE3[w2 & 0xFF]
            ^ rk[3]
        )
        w0, w1, w2, w3 = n0, n1, n2, n3
    rk = rks[nr]
    sb = _SBOX
    n0 = (
        (sb[(w0 >> 24) & 0xFF] << 24)
        | (sb[(w1 >> 16) & 0xFF] << 16)
        | (sb[(w2 >> 8) & 0xFF] << 8)
        | sb[w3 & 0xFF]
    ) ^ rk[0]
    n1 = (
        (sb[(w1 >> 24) & 0xFF] << 24)
        | (sb[(w2 >> 16) & 0xFF] << 16)
        | (sb[(w3 >> 8) & 0xFF] << 8)
        | sb[w0 & 0xFF]
    ) ^ rk[1]
    n2 = (
        (sb[(w2 >> 24) & 0xFF] << 24)
        | (sb[(w3 >> 16) & 0xFF] << 16)
        | (sb[(w0 >> 8) & 0xFF] << 8)
        | sb[w1 & 0xFF]
    ) ^ rk[2]
    n3 = (
        (sb[(w3 >> 24) & 0xFF] << 24)
        | (sb[(w0 >> 16) & 0xFF] << 16)
        | (sb[(w1 >> 8) & 0xFF] << 8)
        | sb[w2 & 0xFF]
    ) ^ rk[3]
    return struct.pack(">4I", n0, n1, n2, n3)


def _aes_decrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    nr = len(rks) - 1
    rk = rks[nr]
    w0, w1, w2, w3 = struct.unpack(">4I", block)
    w0 ^= rk[0]
    w1 ^= rk[1]
    w2 ^= rk[2]
    w3 ^= rk[3]
    isb = _INV_SBOX
    for rnd in range(nr - 1, 0, -1):
        rk = rks[rnd]
        # InvShiftRows + InvSubBytes + AddRoundKey on words...
        n0 = (
            (isb[(w0 >> 24) & 0xFF] << 24)
            | (isb[(w3 >> 16) & 0xFF] << 16)
            | (isb[(w2 >> 8) & 0xFF] << 8)
            | isb[w1 & 0xFF]
        ) ^ rk[0]
        n1 = (
            (isb[(w1 >> 24) & 0xFF] << 24)
            | (isb[(w0 >> 16) & 0xFF] << 16)
            | (isb[(w3 >> 8) & 0xFF] << 8)
            | isb[w2 & 0xFF]
        ) ^ rk[1]
        n2 = (
            (isb[(w2 >> 24) & 0xFF] << 24)
            | (isb[(w1 >> 16) & 0xFF] << 16)
            | (isb[(w0 >> 8) & 0xFF] << 8)
            | isb[w3 & 0xFF]
        ) ^ rk[2]
        n3 = (
            (isb[(w3 >> 24) & 0xFF] << 24)
            | (isb[(w2 >> 16) & 0xFF] << 16)
            | (isb[(w1 >> 8) & 0xFF] << 8)
            | isb[w0 & 0xFF]
        ) ^ rk[3]
        # ...then InvMixColumns via the TD tables
        w0 = (
            _TD0[(n0 >> 24) & 0xFF]
            ^ _TD1[(n0 >> 16) & 0xFF]
            ^ _TD2[(n0 >> 8) & 0xFF]
            ^ _TD3[n0 & 0xFF]
        )
        w1 = (
            _TD0[(n1 >> 24) & 0xFF]
            ^ _TD1[(n1 >> 16) & 0xFF]
            ^ _TD2[(n1 >> 8) & 0xFF]
            ^ _TD3[n1 & 0xFF]
        )
        w2 = (
            _TD0[(n2 >> 24) & 0xFF]
            ^ _TD1[(n2 >> 16) & 0xFF]
            ^ _TD2[(n2 >> 8) & 0xFF]
            ^ _TD3[n2 & 0xFF]
        )
        w3 = (
            _TD0[(n3 >> 24) & 0xFF]
            ^ _TD1[(n3 >> 16) & 0xFF]
            ^ _TD2[(n3 >> 8) & 0xFF]
            ^ _TD3[n3 & 0xFF]
        )
    rk = rks[0]
    n0 = (
        (isb[(w0 >> 24) & 0xFF] << 24)
        | (isb[(w3 >> 16) & 0xFF] << 16)
        | (isb[(w2 >> 8) & 0xFF] << 8)
        | isb[w1 & 0xFF]
    ) ^ rk[0]
    n1 = (
        (isb[(w1 >> 24) & 0xFF] << 24)
        | (isb[(w0 >> 16) & 0xFF] << 16)
        | (isb[(w3 >> 8) & 0xFF] << 8)
        | isb[w2 & 0xFF]
    ) ^ rk[1]
    n2 = (
        (isb[(w2 >> 24) & 0xFF] << 24)
        | (isb[(w1 >> 16) & 0xFF] << 16)
        | (isb[(w0 >> 8) & 0xFF] << 8)
        | isb[w3 & 0xFF]
    ) ^ rk[2]
    n3 = (
        (isb[(w3 >> 24) & 0xFF] << 24)
        | (isb[(w2 >> 16) & 0xFF] << 16)
        | (isb[(w1 >> 8) & 0xFF] << 8)
        | isb[w0 & 0xFF]
    ) ^ rk[3]
    return struct.pack(">4I", n0, n1, n2, n3)


def _cbc_encrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt with NO padding and NO IV prefix (len(data) % 16 == 0)."""
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _aes_encrypt_block(blk, rks)
        out += prev
    return bytes(out)


def _cbc_decrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt with NO padding and NO IV prefix (len(data) % 16 == 0)."""
    if len(data) % 16:
        raise PdfCryptError("bad AES block length")
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        dec = _aes_decrypt_block(blk, rks)
        out += bytes(a ^ b for a, b in zip(dec, prev))
        prev = blk
    return bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2/AESV3 stream layout: 16-byte IV prefix, PKCS#7-padded CBC
    body. Key length selects AES-128 vs AES-256."""
    if len(data) < 32 or len(data) % 16:
        raise PdfCryptError("bad AES stream length")
    out = _cbc_decrypt_raw(key, data[:16], data[16:])
    padlen = out[-1]
    if not 1 <= padlen <= 16:
        raise PdfCryptError("bad AES padding")
    return out[:-padlen]


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    padlen = 16 - len(data) % 16
    return iv + _cbc_encrypt_raw(key, iv, data + bytes([padlen]) * padlen)


# ------------------------------------------------------- standard handler core


def file_key(
    user_pw: bytes,
    o_entry: bytes,
    p: int,
    file_id: bytes,
    r: int,
    n: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key from the (padded) user password."""
    h = hashlib.md5()
    h.update(_pad(user_pw))
    h.update(o_entry[:32])
    # /P is a signed 32-bit value, but several real-world writers store the
    # unsigned form (4294963392 instead of -4004) — mask to the low 32 bits
    # so the hash sees identical bytes either way; struct.pack('<i') on the
    # unsigned form would raise struct.error and abort the whole task
    h.update(struct.pack("<I", p & 0xFFFFFFFF))
    h.update(file_id)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def compute_o(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    """Algorithm 3: the /O entry."""
    key = hashlib.md5(_pad(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    key = key[:n]
    o = rc4(key, _pad(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u(key: bytes, file_id: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3+): the /U entry (32 bytes)."""
    if r == 2:
        return rc4(key, PAD)
    u = hashlib.md5(PAD + file_id).digest()
    u = rc4(key, u)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16  # 16 arbitrary trailing bytes per spec


def object_key(key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: per-object key."""
    h = hashlib.md5()
    h.update(key)
    h.update(struct.pack("<i", num)[:3])
    h.update(struct.pack("<i", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(key) + 5, 16)]


# ----------------------------------------------- V5 (AES-256) key derivation


@functools.lru_cache(maxsize=256)
def hash_2b(password: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    """ISO 32000-2 Algorithm 2.B (R6 hardened hash); plain SHA-256 for the
    deprecated R5 (Adobe Extension Level 3 AESV3).

    2.B is a deliberate work factor (>= 64 chained AES-CBC passes over a
    multi-KB buffer) costing ~0.3 s here even with the T-table cipher; the
    lru_cache makes repeated derivations (deterministic fixtures sharing a
    file key, one worker parsing many same-key docs) free while real corpora
    with distinct salts simply miss it."""
    k = hashlib.sha256(password + salt + udata).digest()
    if r == 5:
        return k
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _cbc_encrypt_raw(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[sum(e[:16]) % 3](
            e
        ).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def v5_file_key(
    u_entry: bytes, ue_entry: bytes, r: int, password: bytes = b""
) -> bytes:
    """Algorithm 2.A, USER-password path: authenticate against /U (hash +
    validation salt + key salt), then unwrap the file key from /UE. The
    default empty password is the owner-password-only case the reference
    opens transparently; callers may supply a real user password (truncated
    to 127 bytes per ISO 32000-2 7.6.4.3.3)."""
    if len(u_entry) < 48 or len(ue_entry) < 32:
        raise PdfCryptError("bad /U or /UE entry")
    pw = password[:127]
    vsalt, ksalt = u_entry[32:40], u_entry[40:48]
    if hash_2b(pw, vsalt, b"", r) != u_entry[:32]:
        raise PdfCryptError("password required (empty user password rejected)")
    ikey = hash_2b(pw, ksalt, b"", r)
    return _cbc_decrypt_raw(ikey, b"\x00" * 16, ue_entry[:32])


def v5_owner_file_key(
    o_entry: bytes, oe_entry: bytes, u_entry: bytes, r: int, password: bytes
) -> bytes:
    """Algorithm 2.A, OWNER-password path: the owner hash salts come from
    /O and the full 48-byte /U participates as udata (ISO 32000-2
    7.6.4.4.7); the file key unwraps from /OE."""
    if len(o_entry) < 48 or len(oe_entry) < 32 or len(u_entry) < 48:
        raise PdfCryptError("bad /O, /OE, or /U entry")
    pw = password[:127]
    udata = u_entry[:48]
    vsalt, ksalt = o_entry[32:40], o_entry[40:48]
    if hash_2b(pw, vsalt, udata, r) != o_entry[:32]:
        raise PdfCryptError("owner password rejected")
    ikey = hash_2b(pw, ksalt, udata, r)
    return _cbc_decrypt_raw(ikey, b"\x00" * 16, oe_entry[:32])


def owner_to_user_pw(owner_pw: bytes, o_entry: bytes, r: int, n: int) -> bytes:
    """Algorithm 7 (legacy /V 1-4): invert /O with the owner-password key to
    recover the PADDED user password (32 bytes). The result feeds Algorithm
    2 directly — ``_pad`` truncates at 32 so the padded form round-trips —
    and a wrong owner password simply yields garbage that then fails the
    /U check, so no separate validation step exists (per spec)."""
    key = hashlib.md5(_pad(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    key = key[:n]
    data = o_entry[:32]
    if r == 2:
        return rc4(key, data)
    # inverse of compute_o's forward loop (i = 1..19 ascending): peel with
    # key^19 .. key^1, then the unXORed key (i = 0)
    for i in range(19, -1, -1):
        data = rc4(bytes(b ^ i for b in key), data)
    return data


def compute_v5_entries(
    user_pw: bytes, owner_pw: bytes, file_key: bytes, p: int, r: int = 6
) -> dict[str, bytes]:
    """ENcryption direction: /U /UE /O /OE /Perms for a chosen 32-byte file
    key (ISO 32000-2 7.6.4.4.6-8). Salts are derived deterministically from
    the passwords + key so fixtures are byte-reproducible (never do this for
    real secrecy)."""
    salt = hashlib.sha256(b"pes-v5" + user_pw + owner_pw + file_key).digest()
    u_vs, u_ks, o_vs, o_ks = (salt[i : i + 8] for i in range(0, 32, 8))
    u = hash_2b(user_pw, u_vs, b"", r) + u_vs + u_ks
    ue = _cbc_encrypt_raw(hash_2b(user_pw, u_ks, b"", r), b"\x00" * 16, file_key)
    o = hash_2b(owner_pw, o_vs, u, r) + o_vs + o_ks
    oe = _cbc_encrypt_raw(hash_2b(owner_pw, o_ks, u, r), b"\x00" * 16, file_key)
    perms_clear = (  # low 32 bits: tolerate unsigned-form /P (see file_key)
        struct.pack("<I", p & 0xFFFFFFFF) + b"\xff\xff\xff\xff" + b"Tadb" + salt[:4]
    )
    # /Perms is a single AES-256-ECB block == raw CBC with a zero IV
    perms = _cbc_encrypt_raw(file_key, b"\x00" * 16, perms_clear)
    return {"U": u, "UE": ue, "O": o, "OE": oe, "Perms": perms}


class StandardCrypt:
    """Both directions of the standard security handler for one file key.

    ``per_object=False`` is the V5/AESV3 mode: every object is encrypted
    with the FILE key directly (ISO 32000-2 7.6.3.3 drops Algorithm 1's
    per-object rekeying for AES-256)."""

    def __init__(self, key: bytes, aes: bool, per_object: bool = True):
        self.key = key
        self.aes = aes
        self.per_object = per_object

    def _obj_key(self, num: int, gen: int) -> bytes:
        if not self.per_object:
            return self.key
        return object_key(self.key, num, gen, self.aes)

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
        k = self._obj_key(num, gen)
        if self.aes:
            return aes_cbc_decrypt(k, data)
        return rc4(k, data)

    def encrypt(self, num: int, gen: int, data: bytes) -> bytes:
        k = self._obj_key(num, gen)
        if self.aes:
            # deterministic IV derived from the object id: fixtures must be
            # byte-reproducible (never do this for real secrecy)
            iv = hashlib.md5(b"pes-iv" + struct.pack("<ii", num, gen)).digest()
            return aes_cbc_encrypt(k, iv, data)
        return rc4(k, data)


def _candidate_seq(passwords: tuple[bytes, ...]) -> tuple[bytes, ...]:
    """Empty password first (reference parity), then the caller's
    candidates, deduplicated in order — hash_2b's R6 work factor makes a
    repeated V5 derivation worth skipping."""
    seen = {b""}
    out = [b""]
    for pw in passwords:
        if pw not in seen:
            seen.add(pw)
            out.append(pw)
    return tuple(out)


MODES = {
    # mode -> (V, R, key bits, aes)
    "rc4-40": (1, 2, 40, False),
    "rc4-128": (2, 3, 128, False),
    "aes-128": (4, 4, 128, True),
    "aes-256": (5, 6, 256, True),
    "aes-256-r5": (5, 5, 256, True),  # deprecated Adobe ext. level 3 AESV3
}


def make_decryptor(
    enc: dict,
    file_id: bytes,
    resolve,
    passwords: tuple[bytes, ...] = (),
) -> StandardCrypt:
    """Build a decryptor from a resolved /Encrypt dict.

    Authenticates the EMPTY user password first (the owner-password-only
    case the reference opens transparently), then each candidate in
    ``passwords`` as a USER password, then each as an OWNER password
    (Algorithm 7 for /V 1-4; the /O + /OE path for /V 5) — the password-list
    workflow of a real ingest manifest. Raises PdfCryptError for unsupported
    handlers or when no candidate authenticates (-> parse-failure
    quarantine)."""
    filt = str(resolve(enc.get("Filter")) or "")
    if filt != "Standard":
        raise PdfCryptError(f"unsupported security handler {filt!r}")
    v = int(resolve(enc.get("V", 0)) or 0)
    r = int(resolve(enc.get("R", 0)) or 0)
    if v not in (1, 2, 4, 5) or r not in (2, 3, 4, 5, 6):
        raise PdfCryptError(f"unsupported /V {v} /R {r}")
    if v == 5:
        if r not in (5, 6):
            raise PdfCryptError(f"unsupported /V 5 /R {r}")
        stmf = str(resolve(enc.get("StmF")) or "Identity")
        if stmf != "StdCF":
            raise PdfCryptError(f"unsupported /StmF {stmf!r}")
        cf = resolve(enc.get("CF")) or {}
        stdcf = resolve(cf.get("StdCF")) or {}
        cfm = str(resolve(stdcf.get("CFM")) or "")
        if cfm != "AESV3":
            raise PdfCryptError(f"unsupported /CFM {cfm!r} for /V 5")
        u_entry = str(resolve(enc.get("U")) or "").encode("latin-1")
        ue_entry = str(resolve(enc.get("UE")) or "").encode("latin-1")
        key = None
        last_err: PdfCryptError | None = None
        for pw in _candidate_seq(passwords):
            try:
                key = v5_file_key(u_entry, ue_entry, r, pw)
                break
            except PdfCryptError as e:
                last_err = e
        if key is None and passwords:
            o_entry = str(resolve(enc.get("O")) or "").encode("latin-1")
            oe_entry = str(resolve(enc.get("OE")) or "").encode("latin-1")
            for pw in _candidate_seq(passwords):
                try:
                    key = v5_owner_file_key(o_entry, oe_entry, u_entry, r, pw)
                    break
                except PdfCryptError as e:
                    last_err = e
        if key is None:
            if passwords:
                raise PdfCryptError(
                    "password required (no supplied candidate matched)"
                )
            raise last_err or PdfCryptError("password required")
        perms = str(resolve(enc.get("Perms")) or "").encode("latin-1")
        if len(perms) >= 16:
            clear = _cbc_decrypt_raw(key, b"\x00" * 16, perms[:16])
            if clear[9:12] != b"adb":
                raise PdfCryptError("bad /Perms (wrong file key)")
        return StandardCrypt(key, aes=True, per_object=False)
    n = 5 if v == 1 else int(resolve(enc.get("Length", 40)) or 40) // 8
    if not 5 <= n <= 16:
        raise PdfCryptError(f"bad key length {n * 8}")
    aes = False
    if v == 4:
        cf = resolve(enc.get("CF")) or {}
        stdcf = resolve(cf.get("StdCF")) or {}
        cfm = str(resolve(stdcf.get("CFM")) or "")
        stmf = str(resolve(enc.get("StmF")) or "Identity")
        if stmf != "StdCF":
            raise PdfCryptError(f"unsupported /StmF {stmf!r}")
        if cfm == "AESV2":
            aes = True
            n = 16
        elif cfm != "V2":
            raise PdfCryptError(f"unsupported /CFM {cfm!r}")
    o_entry = str(resolve(enc.get("O")) or "").encode("latin-1")
    u_entry = str(resolve(enc.get("U")) or "").encode("latin-1")
    if len(o_entry) < 32 or len(u_entry) < 32:
        raise PdfCryptError("bad /O or /U entry")
    p = int(resolve(enc.get("P", -1)))
    em = resolve(enc.get("EncryptMetadata", True))
    em = True if em is None else bool(em)
    def _user_key(pw: bytes) -> bytes | None:
        key = file_key(pw, o_entry, p, file_id, r, n, encrypt_metadata=em)
        expect_u = compute_u(key, file_id, r)
        got = u_entry[:32] if r == 2 else u_entry[:16]
        want = expect_u if r == 2 else expect_u[:16]
        return key if got == want else None

    for pw in _candidate_seq(passwords):
        key = _user_key(pw)
        if key is not None:
            return StandardCrypt(key, aes)
    # owner-password candidates: Algorithm 7 recovers the padded user
    # password, which must then pass the normal /U check (a wrong owner
    # password yields garbage that fails it)
    for pw in passwords:
        key = _user_key(owner_to_user_pw(pw, o_entry, r, n))
        if key is not None:
            return StandardCrypt(key, aes)
    if passwords:
        raise PdfCryptError("password required (no supplied candidate matched)")
    raise PdfCryptError("password required (empty user password rejected)")
