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

BOTH DIRECTIONS ARE VECTORIZED, multi-block: the encoder classifies
all points of all blocks at once and scatters bits into per-block word
regions of one buffer (encode_*_multi); the decoder runs LANE-PARALLEL
across blocks — each iteration decodes one code in every still-active
block, so variable-length sequential streams still decode at numpy
speed when a batch holds many blocks (decode_*_multi). Sequential
single-block decoders are kept as the differential-test reference.
"""

from __future__ import annotations

import zlib

import numpy as np

__all__ = [
    "encode_ts",
    "decode_ts",
    "encode_vals",
    "decode_vals",
    "encode_ts_multi",
    "encode_vals_multi",
    "decode_ts_multi",
    "decode_vals_multi",
    "block_crc",
]


def _scatter_or(out: np.ndarray, word: np.ndarray, chunk: np.ndarray) -> None:
    """out[word] |= chunk with duplicate word indices, vectorized.

    ``word`` is non-decreasing by construction (bit offsets grow within
    a segment; segment word regions grow across segments), so duplicate
    runs are contiguous: OR-reduce each run with ``bitwise_or.reduceat``
    and assign once per distinct word — orders of magnitude faster than
    ``np.bitwise_or.at`` (a per-element C loop) on multi-million-code
    batches.
    """
    if not len(word):
        return
    first = np.concatenate(([0], np.flatnonzero(np.diff(word) > 0) + 1))
    out[word[first]] |= np.bitwise_or.reduceat(chunk, first)


def _pack_codes_multi(
    vals: np.ndarray,
    lens: np.ndarray,
    seg_counts: np.ndarray,
    headers: np.ndarray,
) -> list[bytes]:
    """Pack G independent variable-length big-endian code streams.

    ``vals``: uint64 code words (right-aligned), ``lens``: bit lengths
    (1..64), ``seg_counts``: codes per segment (concatenated in order;
    ``sum == len(vals)``), ``headers``: one raw uint64 word per segment
    stored verbatim ahead of its code bits (the Gorilla first-value
    header). Every segment packs into its own word-aligned region of
    ONE output buffer, so the whole call is a handful of vectorized ops
    over ALL segments at once — the only per-segment Python is the
    final buffer slicing. Each code straddles at most two 64-bit words,
    so two monotone OR-scatters place everything; words serialize
    big-endian so each stream stays MSB-first. Per-segment bytes are
    identical to packing each stream alone.
    """
    seg_counts = np.asarray(seg_counts, dtype=np.int64)
    n_seg = len(seg_counts)
    if n_seg == 0:
        return []
    seg_id = np.repeat(np.arange(n_seg), seg_counts)
    # exact: per-segment bit totals are < 2^53 so float64 bincount is safe
    seg_bits = np.bincount(seg_id, weights=lens, minlength=n_seg).astype(np.int64)
    seg_bit_base = np.concatenate(([0], np.cumsum(seg_bits)[:-1]))
    ends = np.cumsum(lens)
    offs = (ends - lens) - seg_bit_base[seg_id]  # bit offset inside segment
    # region: header word + code words + 1 spill word
    seg_words = (seg_bits + 63) // 64 + 2
    seg_word_base = np.concatenate(([0], np.cumsum(seg_words)[:-1]))
    out = np.zeros(int(seg_words.sum()), dtype=np.uint64)
    out[seg_word_base] = headers
    word = seg_word_base[seg_id] + 1 + (offs >> 6)
    bit = offs & 63
    fit = 64 - bit  # bits available in the first word
    left_len = np.minimum(lens, fit)
    right_len = lens - left_len
    left_chunk = (vals >> right_len.astype(np.uint64)) << (
        (fit - left_len).astype(np.uint64)
    )
    _scatter_or(out, word, left_chunk)
    has_r = right_len > 0
    if has_r.any():
        rl = right_len[has_r].astype(np.uint64)
        right_chunk = (
            vals[has_r] & ((np.uint64(1) << rl) - np.uint64(1))
        ) << (np.uint64(64) - rl)
        _scatter_or(out, word[has_r] + 1, right_chunk)
    buf = out.astype(">u8").tobytes()
    starts = seg_word_base * 8
    nbytes = 8 + (seg_bits + 7) // 8  # header + packed code bytes
    return [buf[s : s + ln] for s, ln in zip(starts.tolist(), nbytes.tolist())]


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


def encode_ts_multi(ts: np.ndarray, starts: np.ndarray) -> list[bytes]:
    """Encode MANY sorted int64 series in one vectorized pass.

    ``ts`` holds G series concatenated; ``starts`` are their start
    indices (``starts[0] == 0``, strictly increasing). Returns one
    packed delta-of-delta block per series, byte-identical to calling
    the single-series encoder per slice — per-point arithmetic,
    classification, c4 two-code expansion, and bit packing all run once
    over the concatenation, so millions of tiny series cost zero
    per-series Python (the many-tiny-groups write path of
    operators/gorilla.encode_tier_blocks).
    """
    ts = np.asarray(ts, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    n, n_seg = len(ts), len(starts)
    if n_seg == 0:
        return []
    headers = ts[starts].view(np.uint64)
    sizes = np.diff(np.append(starts, n))
    if n == n_seg:  # every series is a single point: headers only
        return _pack_codes_multi(
            np.empty(0, np.uint64), np.empty(0, np.int64),
            np.zeros(n_seg, np.int64), headers,
        )

    is_start = np.zeros(n, dtype=bool)
    is_start[starts] = True
    d = np.empty(n, dtype=np.int64)
    d[0] = 0
    d[1:] = ts[1:] - ts[:-1]  # garbage across boundaries; masked below
    prev_d = np.concatenate(([0], d[:-1]))
    # second point of a series: dod vs implicit prior delta 0
    second = np.concatenate(([False], is_start[:-1])) & ~is_start
    dod_full = np.where(second, d, d - prev_d)
    code_mask = ~is_start
    dod = dod_full[code_mask]
    m = len(dod)

    vals = np.zeros(m, dtype=np.uint64)
    lens = np.zeros(m, dtype=np.int64)

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
    order = np.arange(m)
    n_codes = m + int(c4.sum())
    all_vals = np.zeros(n_codes, dtype=np.uint64)
    all_lens = np.zeros(n_codes, dtype=np.int64)
    extra = np.cumsum(np.concatenate(([0], c4[:-1].astype(np.int64))))
    first_pos = order + extra
    all_vals[first_pos] = np.where(c4, np.uint64(0b1111), vals)
    all_lens[first_pos] = np.where(c4, 4, lens)
    sec_pos = first_pos[c4] + 1
    all_vals[sec_pos] = ext_payload
    all_lens[sec_pos] = 64

    # codes stay series-contiguous: per-series count = (size-1) + extras
    code_seg = np.repeat(np.arange(n_seg), sizes - 1)
    extras_per_seg = np.bincount(code_seg[c4], minlength=n_seg)
    seg_counts = (sizes - 1) + extras_per_seg
    return _pack_codes_multi(all_vals, all_lens, seg_counts, headers)


def encode_ts(ts: np.ndarray) -> bytes:
    """ts: sorted int64 array -> packed delta-of-delta block."""
    ts = np.asarray(ts, dtype=np.int64)
    if len(ts) == 0:
        return b""
    return encode_ts_multi(ts, np.zeros(1, dtype=np.int64))[0]


def _decode_ts_seq(buf: bytes, n: int) -> np.ndarray:
    """Sequential reference decoder (kept as the differential-test twin
    of the vectorized :func:`decode_ts_multi`)."""
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


def _lane_prep(bufs) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate block buffers for lane-parallel decoding.

    Returns ``(U, B8, boff)``: ``U[k]`` is the big-endian uint64 read at
    byte offset k of the concatenation (zero-padded past the end),
    ``B8[k]`` is byte k+8 as uint64 (the spill byte a mid-byte 64-bit
    peek needs), ``boff`` each block's byte offset. Windows near a
    block's tail read into the NEXT block's bytes — harmless, because
    every field extraction masks to exactly the bits its code owns.
    """
    cat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    lens = np.fromiter((len(b) for b in bufs), np.int64, count=len(bufs))
    boff = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pad = np.concatenate([cat, np.zeros(16, dtype=np.uint8)])
    # +4 bytes of window margin: the decoders peek unconditionally at
    # pos+13 (vals payload) / pos+4 (ts c4 payload) even on a block's
    # final short code, reaching up to 2 bytes past the data end
    sw = np.lib.stride_tricks.sliding_window_view(pad, 8)[: len(cat) + 4]
    U = np.zeros(len(sw), dtype=np.uint64)
    for j in range(8):
        U |= sw[:, j].astype(np.uint64) << np.uint64(56 - 8 * j)
    # B8 stays uint8 (8x less memory than widening the whole array);
    # _peek64 widens only the gathered per-lane elements
    B8 = pad[8 : len(cat) + 12]
    return U, B8, boff


def _peek64(U: np.ndarray, B8: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Exact 64-bit big-endian window starting at BIT position pos."""
    k = pos >> 3
    s = (pos & 7).astype(np.uint64)
    return (U[k] << s) | (B8[k].astype(np.uint64) >> (np.uint64(8) - s))


def decode_ts_multi(bufs, ns: np.ndarray) -> np.ndarray:
    """Decode MANY delta-of-delta blocks lane-parallel; returns the
    concatenated int64 timestamps (block g occupies ``ns[:g].sum()``
    onward).

    One iteration decodes ONE point in EVERY still-active block — all
    field extraction is vectorized across blocks, so total work is
    proportional to total points with numpy-op (not per-point Python)
    constants. Lanes drop out as their blocks finish. This is the
    read-path dual of encode_*_multi: a serving read decodes thousands
    of pruned blocks per Arrow batch, not one.
    """
    ns = np.asarray(ns, dtype=np.int64)
    total = int(ns.sum())
    out = np.zeros(total, dtype=np.int64)
    if total == 0:
        return out
    U, B8, boff = _lane_prep(bufs)
    oof = np.concatenate(([0], np.cumsum(ns)[:-1]))
    ne = ns > 0
    out[oof[ne]] = U[boff[ne]].view(np.int64)  # raw 64-bit headers

    act = ns > 1
    pos = (boff[act] << 3) + 64
    cur = U[boff[act]].view(np.int64).copy()
    delta = np.zeros(act.sum(), dtype=np.int64)
    rem = ns[act] - 1
    opos = oof[act] + 1
    c64 = np.uint64(64)
    while len(pos):
        W = _peek64(U, B8, pos)
        t4 = W >> np.uint64(60)
        c0 = t4 < np.uint64(0b1000)
        c1 = (t4 >> np.uint64(2)) == np.uint64(0b10)
        c2 = (t4 >> np.uint64(1)) == np.uint64(0b110)
        c3 = t4 == np.uint64(0b1110)
        c4 = t4 == np.uint64(0b1111)
        d1 = ((W >> (c64 - np.uint64(9))) & np.uint64(127)).astype(np.int64) - 63
        d2 = ((W >> (c64 - np.uint64(12))) & np.uint64(511)).astype(np.int64) - 255
        d3 = ((W >> (c64 - np.uint64(16))) & np.uint64(4095)).astype(np.int64) - 2047
        d4 = _peek64(U, B8, pos + 4).view(np.int64)
        dod = np.where(
            c0, 0, np.where(c1, d1, np.where(c2, d2, np.where(c3, d3, d4)))
        )
        step = np.where(
            c0, 1, np.where(c1, 9, np.where(c2, 12, np.where(c3, 16, 68)))
        )
        delta += dod
        cur += delta
        out[opos] = cur
        pos += step
        opos += 1
        rem -= 1
        done = rem == 0
        if done.any():
            keep = ~done
            pos, cur, delta = pos[keep], cur[keep], delta[keep]
            rem, opos = rem[keep], opos[keep]
    return out


def decode_ts(buf: bytes, n: int) -> np.ndarray:
    return decode_ts_multi([buf], np.array([n], dtype=np.int64))


def encode_vals_multi(values: np.ndarray, starts: np.ndarray) -> list[bytes]:
    """Encode MANY float64 series in one vectorized pass.

    Same multi-series contract as :func:`encode_ts_multi`; returns one
    packed XOR block per series, byte-identical to per-slice encoding.
    """
    v = np.ascontiguousarray(np.asarray(values, dtype=np.float64)).view(np.uint64)
    starts = np.asarray(starts, dtype=np.int64)
    n, n_seg = len(v), len(starts)
    if n_seg == 0:
        return []
    headers = v[starts]
    sizes = np.diff(np.append(starts, n))
    if n == n_seg:  # every series is a single point: headers only
        return _pack_codes_multi(
            np.empty(0, np.uint64), np.empty(0, np.int64),
            np.zeros(n_seg, np.int64), headers,
        )

    is_start = np.zeros(n, dtype=bool)
    is_start[starts] = True
    xor_full = np.empty(n, dtype=np.uint64)
    xor_full[0] = 0
    xor_full[1:] = v[1:] ^ v[:-1]  # garbage across boundaries; masked below
    code_mask = ~is_start
    xor = xor_full[code_mask]
    m = len(xor)

    zero = xor == 0
    lz = np.minimum(_clz64(xor), 31)
    tz = _ctz64(xor)
    mlen = np.where(zero, 0, 64 - lz - tz)  # meaningful bits

    n_codes = m + int((~zero).sum())
    all_vals = np.zeros(n_codes, dtype=np.uint64)
    all_lens = np.zeros(n_codes, dtype=np.int64)
    order = np.arange(m)
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

    code_seg = np.repeat(np.arange(n_seg), sizes - 1)
    extras_per_seg = np.bincount(code_seg[nz], minlength=n_seg)
    seg_counts = (sizes - 1) + extras_per_seg
    return _pack_codes_multi(all_vals, all_lens, seg_counts, headers)


def encode_vals(values: np.ndarray) -> bytes:
    """values: float64 array -> packed XOR block."""
    if len(values) == 0:
        return b""
    return encode_vals_multi(values, np.zeros(1, dtype=np.int64))[0]


def _decode_vals_seq(buf: bytes, n: int) -> np.ndarray:
    """Sequential reference decoder (differential-test twin of the
    vectorized :func:`decode_vals_multi`)."""
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


def decode_vals_multi(bufs, ns: np.ndarray) -> np.ndarray:
    """Decode MANY XOR blocks lane-parallel; returns the concatenated
    float64 values. Same lane discipline as :func:`decode_ts_multi`."""
    ns = np.asarray(ns, dtype=np.int64)
    total = int(ns.sum())
    out = np.zeros(total, dtype=np.uint64)
    if total == 0:
        return out.view(np.float64)
    U, B8, boff = _lane_prep(bufs)
    oof = np.concatenate(([0], np.cumsum(ns)[:-1]))
    ne = ns > 0
    out[oof[ne]] = U[boff[ne]]  # raw 64-bit headers

    act = ns > 1
    pos = (boff[act] << 3) + 64
    cur = U[boff[act]].copy()
    rem = ns[act] - 1
    opos = oof[act] + 1
    c64 = np.uint64(64)
    while len(pos):
        W = _peek64(U, B8, pos)
        zero = (W >> np.uint64(63)) == 0
        lz = (W >> np.uint64(57)) & np.uint64(31)
        ml = ((W >> np.uint64(51)) & np.uint64(63)) + np.uint64(1)
        payload = _peek64(U, B8, pos + 13) >> (c64 - ml)
        # on zero lanes lz/ml are other codes' bits and 64-lz-ml can
        # wrap; clamp the shift into range — the lane is masked anyway
        tz = np.minimum(c64 - lz - ml, np.uint64(63))
        cur = np.where(zero, cur, cur ^ (payload << tz))
        out[opos] = cur
        pos += np.where(zero, 1, 13 + ml.astype(np.int64))
        opos += 1
        rem -= 1
        done = rem == 0
        if done.any():
            keep = ~done
            pos, cur, rem, opos = pos[keep], cur[keep], rem[keep], opos[keep]
    return out.view(np.float64)


def decode_vals(buf: bytes, n: int) -> np.ndarray:
    return decode_vals_multi([buf], np.array([n], dtype=np.int64))


def block_crc(ts_block: bytes, val_block: bytes) -> int:
    return zlib.crc32(val_block, zlib.crc32(ts_block))
