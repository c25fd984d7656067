"""Gorilla-family time-series block codec in pure numpy.

Encodes a sorted series of (int64 timestamp, float64 value) points into
two bit-packed blocks, per the Gorilla design (Pelkonen et al., VLDB
2015; XOR-family framing also surveyed by Chimp, VLDB 2022 — see
PAPERS.md):

Timestamps — delta-of-delta with prefix classes:
    '0'                      dod == 0
    '10'   +  7 bits         dod in [-63, 64]
    '110'  +  9 bits         dod in [-255, 256]
    '1110' + 12 bits         dod in [-2047, 2048]
    '1111' + 64 bits         otherwise (widened vs the paper's 32 so
                             arbitrary crawl gaps in seconds fit)
First timestamp is stored raw (64 bits); the first delta is encoded as
a dod against an implicit prior delta of 0.

Values — XOR with the previous value:
    '0'                      xor == 0
    '11' + 5b lz + 6b (len-1) + meaningful bits
(The paper's '10' reuse-window branch is intentionally not emitted: a
stateless emitter is what makes the ENCODER fully vectorizable — every
code word is a pure function of (x[i-1], x[i]). The decoder still
accepts only what we emit. Cost: a few % block size; gain: zero
per-point Python on the write path.)

ENCODING IS FULLY VECTORIZED: classify all points, compute all code
words and lengths, then scatter bits with the cumsum/repeat expansion
trick and ``np.packbits``. Decoding is a sequential bit reader (reads
are off the hot write path).
"""

from __future__ import annotations

import zlib

import numpy as np

__all__ = ["encode_ts", "decode_ts", "encode_vals", "decode_vals", "block_crc"]


def _pack_codes(vals: np.ndarray, lens: np.ndarray) -> bytes:
    """Concatenate variable-length big-endian codes into packed bytes.

    vals: uint64 code words (right-aligned), lens: bit lengths (<=64).
    Fully vectorized, O(n) elements (NOT O(total bits)): each code
    straddles at most two 64-bit output words, so two masked
    ``bitwise_or.at`` scatters place everything; words serialize
    big-endian so the stream stays MSB-first.
    """
    vals = vals.astype(np.uint64)
    lens = lens.astype(np.int64)
    keep = lens > 0
    vals, lens = vals[keep], lens[keep]
    total = int(lens.sum())
    if total == 0:
        return b""
    ends = np.cumsum(lens)
    offs = ends - lens
    out = np.zeros((total + 63) // 64 + 1, dtype=np.uint64)  # +1 spill word
    word = offs >> 6
    bit = (offs & 63).astype(np.int64)
    fit = 64 - bit  # bits available in the first word
    left_len = np.minimum(lens, fit)
    right_len = lens - left_len
    left_chunk = (vals >> right_len.astype(np.uint64)) << (
        (fit - left_len).astype(np.uint64)
    )
    np.bitwise_or.at(out, word, left_chunk)
    has_r = right_len > 0
    if has_r.any():
        rl = right_len[has_r].astype(np.uint64)
        right_chunk = (
            vals[has_r] & ((np.uint64(1) << rl) - np.uint64(1))
        ) << (np.uint64(64) - rl)
        np.bitwise_or.at(out, word[has_r] + 1, right_chunk)
    return out.astype(">u8").tobytes()[: (total + 7) // 8]


class _BitReader:
    def __init__(self, buf: bytes):
        self.buf = bytes(buf)
        self.pos = 0

    def read(self, n: int) -> int:
        start = self.pos
        end = start + n
        self.pos = end
        b0, b1 = start >> 3, (end + 7) >> 3
        chunk = int.from_bytes(self.buf[b0:b1], "big")
        return (chunk >> ((b1 << 3) - end)) & ((1 << n) - 1)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (binary search, exact)."""
    x = x.astype(np.uint64)
    res = np.zeros(x.shape, dtype=np.int64)
    cur = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        hi = cur >> np.uint64(s)
        has = hi != 0
        res = np.where(has, res, res + s)
        cur = np.where(has, hi, cur)
    return np.where(x == 0, 64, res)


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (exact)."""
    x = x.astype(np.uint64)
    res = np.zeros(x.shape, dtype=np.int64)
    cur = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        lo = cur & ((np.uint64(1) << np.uint64(s)) - np.uint64(1))
        zero_lo = lo == 0
        res = np.where(zero_lo, res + s, res)
        cur = np.where(zero_lo, cur >> np.uint64(s), cur)
    return np.where(x == 0, 64, res)


def encode_ts(ts: np.ndarray) -> bytes:
    """ts: sorted int64 array -> packed delta-of-delta block."""
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    header = ts[0:1].astype(">i8").tobytes() if n else b""
    if n <= 1:
        return header
    deltas = np.diff(ts)
    dod = np.diff(np.concatenate(([0], deltas)))  # first delta vs implicit 0

    vals = np.zeros(n - 1, dtype=np.uint64)
    lens = np.zeros(n - 1, dtype=np.int64)

    c0 = dod == 0
    c1 = ~c0 & (dod >= -63) & (dod <= 64)
    c2 = ~c0 & ~c1 & (dod >= -255) & (dod <= 256)
    c3 = ~c0 & ~c1 & ~c2 & (dod >= -2047) & (dod <= 2048)
    c4 = ~(c0 | c1 | c2 | c3)

    vals[c0], lens[c0] = 0, 1
    vals[c1] = (np.uint64(0b10) << np.uint64(7)) | (dod[c1] + 63).astype(np.uint64)
    lens[c1] = 2 + 7
    vals[c2] = (np.uint64(0b110) << np.uint64(9)) | (dod[c2] + 255).astype(np.uint64)
    lens[c2] = 3 + 9
    vals[c3] = (np.uint64(0b1110) << np.uint64(12)) | (dod[c3] + 2047).astype(np.uint64)
    lens[c3] = 4 + 12
    # '1111' prefix emitted as its own 4-bit code, then raw 64-bit dod.
    # c4 elements contribute two codes; scatter into a single code stream
    # at positions offset by the running count of preceding extras.
    ext_payload = dod[c4].astype(np.int64).view(np.uint64)
    order = np.arange(n - 1)
    n_codes = (n - 1) + int(c4.sum())
    all_vals = np.zeros(n_codes, dtype=np.uint64)
    all_lens = np.zeros(n_codes, dtype=np.int64)
    extra = np.cumsum(np.concatenate(([0], c4[:-1].astype(np.int64))))
    first_pos = order + extra
    all_vals[first_pos] = np.where(c4, np.uint64(0b1111), vals)
    all_lens[first_pos] = np.where(c4, 4, lens)
    sec_pos = first_pos[c4] + 1
    all_vals[sec_pos] = ext_payload
    all_lens[sec_pos] = 64
    return header + _pack_codes(all_vals, all_lens)


def decode_ts(buf: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.int64)
    t0 = int(np.frombuffer(buf[:8], dtype=">i8")[0])
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    r = _BitReader(buf[8:])
    delta = 0
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            raw = r.read(64)
            dod = int(np.uint64(raw).view(np.int64)) if raw < (1 << 63) else raw - (1 << 64)
        delta += dod
        out[i] = out[i - 1] + delta
    return out


def encode_vals(values: np.ndarray) -> bytes:
    """values: float64 array -> packed XOR block."""
    v = np.ascontiguousarray(np.asarray(values, dtype=np.float64)).view(np.uint64)
    n = len(v)
    header = v[0:1].astype(">u8").tobytes() if n else b""
    if n <= 1:
        return header
    xor = v[1:] ^ v[:-1]
    zero = xor == 0
    lz = np.minimum(_clz64(xor), 31)
    tz = _ctz64(xor)
    mlen = np.where(zero, 0, 64 - lz - tz)  # meaningful bits

    n_codes = (n - 1) + int((~zero).sum())
    all_vals = np.zeros(n_codes, dtype=np.uint64)
    all_lens = np.zeros(n_codes, dtype=np.int64)
    order = np.arange(n - 1)
    extra = np.cumsum(np.concatenate(([0], (~zero)[:-1].astype(np.int64))))
    first_pos = order + extra

    ctrl = (
        (np.uint64(0b11) << np.uint64(11))
        | (lz.astype(np.uint64) << np.uint64(6))
        | (mlen - 1).clip(0).astype(np.uint64)
    )
    all_vals[first_pos] = np.where(zero, np.uint64(0), ctrl)
    all_lens[first_pos] = np.where(zero, 1, 13)

    nz = ~zero
    payload = (xor[nz] >> tz[nz].astype(np.uint64)) & (
        (np.uint64(0xFFFFFFFFFFFFFFFF)) >> (np.uint64(64) - mlen[nz].astype(np.uint64))
    )
    all_vals[first_pos[nz] + 1] = payload
    all_lens[first_pos[nz] + 1] = mlen[nz]
    return header + _pack_codes(all_vals, all_lens)


def decode_vals(buf: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.float64)
    out = np.empty(n, dtype=np.uint64)
    out[0] = np.frombuffer(buf[:8], dtype=">u8")[0]
    r = _BitReader(buf[8:])
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = out[i - 1]
            continue
        ctrl = r.read(1)  # always 1 in our emitter
        assert ctrl == 1, "unexpected reuse-window control bit"
        lz = r.read(5)
        mlen = r.read(6) + 1
        payload = r.read(mlen)
        tz = 64 - lz - mlen
        xor = np.uint64(payload) << np.uint64(tz)
        out[i] = out[i - 1] ^ xor
    return out.view(np.float64)


def block_crc(ts_block: bytes, val_block: bytes) -> int:
    return zlib.crc32(val_block, zlib.crc32(ts_block))
