"""PDF standard security handler (ISO 32000-1 §7.6) — pure Python.

Decrypts the empty-user-password case that dominates real-world "encrypted"
PDFs (owner-password-only documents): RC4 40/128-bit (/V 1-2, /R 2-3) and
AES-128-CBC (/V 4 /R 4 /CFM AESV2). The reference opens these transparently
(``pymupdf.open``, pymu_tesseract_processor.py:84); documents that need a
real user password still quarantine as parse failures (helper.py:213-225).

Also provides the ENcryption direction so ``pdf_build`` can emit encrypted
fixtures deterministically. Implementation is from the published spec only:
Algorithm 2 (file key), 3 (/O), 4/5 (/U), 1 (per-object key), plus textbook
RC4 and AES-128 (FIPS-197) in pure Python — fixture-scale streams are tiny,
so table-driven AES is plenty.

Scope notes (documented limitations, both irrelevant to text extraction):
- STRING decryption is not implemented — content comes from streams, which
  are decrypted wholesale (string objects inside a decrypted content stream
  or object stream need no second pass). Document-info strings would stay
  ciphertext; the engine never reads them.
- /V 5 (AES-256, PDF 2.0) is unsupported and fails cleanly.
"""

from __future__ import annotations

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


# -------------------------------------------------------------------- AES-128
# FIPS-197 table-driven implementation (128-bit key, CBC mode).

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


def _expand_key(key: bytes) -> list[list[int]]:
    """11 round keys of 16 bytes each (AES-128)."""
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([w[i - 4][k] ^ t[k] for k in range(4)])
    return [sum((w[4 * r + c] for c in range(4)), []) for r in range(11)]


def _add_rk(state: list[int], rk: list[int]) -> None:
    for i in range(16):
        state[i] ^= rk[i]


def _shift_rows(s: list[int], inv: bool) -> list[int]:
    out = [0] * 16
    for c in range(4):
        for r in range(4):
            # column-major state: byte (r, c) at index 4*c + r
            src_c = (c + r) % 4 if not inv else (c - r) % 4
            out[4 * c + r] = s[4 * src_c + r]
    return out


def _aes_encrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    s = list(block)
    _add_rk(s, rks[0])
    for rnd in range(1, 10):
        s = [_SBOX[b] for b in s]
        s = _shift_rows(s, inv=False)
        ns = [0] * 16
        for c in range(4):
            col = s[4 * c : 4 * c + 4]
            ns[4 * c + 0] = _gmul(col[0], 2) ^ _gmul(col[1], 3) ^ col[2] ^ col[3]
            ns[4 * c + 1] = col[0] ^ _gmul(col[1], 2) ^ _gmul(col[2], 3) ^ col[3]
            ns[4 * c + 2] = col[0] ^ col[1] ^ _gmul(col[2], 2) ^ _gmul(col[3], 3)
            ns[4 * c + 3] = _gmul(col[0], 3) ^ col[1] ^ col[2] ^ _gmul(col[3], 2)
        s = ns
        _add_rk(s, rks[rnd])
    s = [_SBOX[b] for b in s]
    s = _shift_rows(s, inv=False)
    _add_rk(s, rks[10])
    return bytes(s)


def _aes_decrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    s = list(block)
    _add_rk(s, rks[10])
    for rnd in range(9, 0, -1):
        s = _shift_rows(s, inv=True)
        s = [_INV_SBOX[b] for b in s]
        _add_rk(s, rks[rnd])
        ns = [0] * 16
        for c in range(4):
            col = s[4 * c : 4 * c + 4]
            ns[4 * c + 0] = (
                _gmul(col[0], 14) ^ _gmul(col[1], 11) ^ _gmul(col[2], 13) ^ _gmul(col[3], 9)
            )
            ns[4 * c + 1] = (
                _gmul(col[0], 9) ^ _gmul(col[1], 14) ^ _gmul(col[2], 11) ^ _gmul(col[3], 13)
            )
            ns[4 * c + 2] = (
                _gmul(col[0], 13) ^ _gmul(col[1], 9) ^ _gmul(col[2], 14) ^ _gmul(col[3], 11)
            )
            ns[4 * c + 3] = (
                _gmul(col[0], 11) ^ _gmul(col[1], 13) ^ _gmul(col[2], 9) ^ _gmul(col[3], 14)
            )
        s = ns
    s = _shift_rows(s, inv=True)
    s = [_INV_SBOX[b] for b in s]
    _add_rk(s, rks[0])
    return bytes(s)


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2 stream layout: 16-byte IV prefix, PKCS#7-padded CBC body."""
    if len(data) < 32 or len(data) % 16:
        raise PdfCryptError("bad AES stream length")
    rks = _expand_key(key)
    iv = data[:16]
    out = bytearray()
    prev = iv
    for i in range(16, len(data), 16):
        blk = data[i : i + 16]
        dec = _aes_decrypt_block(blk, rks)
        out += bytes(a ^ b for a, b in zip(dec, prev))
        prev = blk
    padlen = out[-1]
    if not 1 <= padlen <= 16:
        raise PdfCryptError("bad AES padding")
    return bytes(out[:-padlen])


def aes128_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    rks = _expand_key(key)
    padlen = 16 - len(data) % 16
    data = data + bytes([padlen]) * padlen
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _aes_encrypt_block(blk, rks)
        out += prev
    return bytes(out)


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
    h.update(struct.pack("<i", p))
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


class StandardCrypt:
    """Both directions of the standard security handler for one file key."""

    def __init__(self, key: bytes, aes: bool):
        self.key = key
        self.aes = aes

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
        k = object_key(self.key, num, gen, self.aes)
        if self.aes:
            return aes128_cbc_decrypt(k, data)
        return rc4(k, data)

    def encrypt(self, num: int, gen: int, data: bytes) -> bytes:
        k = object_key(self.key, num, gen, self.aes)
        if self.aes:
            # deterministic IV derived from the object id: fixtures must be
            # byte-reproducible (never do this for real secrecy)
            iv = hashlib.md5(b"pes-iv" + struct.pack("<ii", num, gen)).digest()
            return aes128_cbc_encrypt(k, iv, data)
        return rc4(k, data)


MODES = {
    # mode -> (V, R, key bits, aes)
    "rc4-40": (1, 2, 40, False),
    "rc4-128": (2, 3, 128, False),
    "aes-128": (4, 4, 128, True),
}


def make_decryptor(enc: dict, file_id: bytes, resolve) -> StandardCrypt:
    """Build a decryptor from a resolved /Encrypt dict, authenticating the
    EMPTY user password; raises PdfCryptError for unsupported handlers or
    when a real user password is required (-> parse-failure quarantine)."""
    filt = str(resolve(enc.get("Filter")) or "")
    if filt != "Standard":
        raise PdfCryptError(f"unsupported security handler {filt!r}")
    v = int(resolve(enc.get("V", 0)) or 0)
    r = int(resolve(enc.get("R", 0)) or 0)
    if v not in (1, 2, 4) or r not in (2, 3, 4):
        raise PdfCryptError(f"unsupported /V {v} /R {r}")
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
    key = file_key(b"", o_entry, p, file_id, r, n, encrypt_metadata=em)
    expect_u = compute_u(key, file_id, r)
    got = u_entry[:32] if r == 2 else u_entry[:16]
    want = expect_u if r == 2 else expect_u[:16]
    if got != want:
        raise PdfCryptError("password required (empty user password rejected)")
    return StandardCrypt(key, aes)
