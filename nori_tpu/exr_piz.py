"""PIZ (wavelet + Huffman) decompression for OpenEXR scanline chunks.

Implements the decode side of the PIZ codec from the public OpenEXR
format specification (ImfPizCompressor/ImfHuf/ImfWav semantics):

  chunk := u16 minNonZero, u16 maxNonZero,
           u8 bitmap[maxNonZero - minNonZero + 1],
           i32 compressedLength, huffman-coded data
  pipeline := huffman decode -> per-channel 2D wavelet decode ->
              LUT expansion -> scanline interleave

Used by nori_tpu.bitmap.read_exr for compression type 4 (e.g. the
fork's stored reference image python/living-room_final.exr).  Pure
numpy/python; speed is adequate for one-off reference reads.
"""

from __future__ import annotations

import struct

import numpy as np

BITMAP_SIZE = 8192
USHORT_RANGE = 1 << 16
HUF_ENCBITS = 16
HUF_ENCSIZE = (1 << HUF_ENCBITS) + 1
SHORT_ZEROCODE_RUN = 59
LONG_ZEROCODE_RUN = 63
SHORTEST_LONG_RUN = 2 + LONG_ZEROCODE_RUN - SHORT_ZEROCODE_RUN
A_OFFSET = 1 << 15
MOD_MASK = (1 << 16) - 1


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------

class _BitReader:
    __slots__ = ("data", "pos", "c", "lc")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.c = 0
        self.lc = 0

    def get_bits(self, n: int) -> int:
        while self.lc < n:
            self.c = (self.c << 8) | self.data[self.pos]
            self.pos += 1
            self.lc += 8
        self.lc -= n
        return (self.c >> self.lc) & ((1 << n) - 1)


def _unpack_enc_table(reader: _BitReader, im: int, iM: int) -> np.ndarray:
    """Code lengths with zero-run escapes (hufUnpackEncTable)."""
    lengths = np.zeros(HUF_ENCSIZE, np.int64)
    i = im
    while i <= iM:
        l = reader.get_bits(6)
        if l == LONG_ZEROCODE_RUN:
            zerun = reader.get_bits(8) + SHORTEST_LONG_RUN
            i += zerun
        elif l >= SHORT_ZEROCODE_RUN:
            zerun = l - SHORT_ZEROCODE_RUN + 2
            i += zerun
        else:
            lengths[i] = l
            i += 1
    return lengths


def _canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Canonical code assignment (hufCanonicalCodeTable)."""
    n = np.zeros(59, np.int64)
    for l in lengths:
        n[l] += 1
    c = 0
    for i in range(58, 0, -1):
        nc = (c + n[i]) >> 1
        n[i] = c
        c = nc
    codes = np.zeros_like(lengths)
    for sym in range(len(lengths)):
        l = lengths[sym]
        if l > 0:
            codes[sym] = n[l]
            n[l] += 1
    return codes


HUF_DECBITS = 14


def _huf_decode_fast(data: bytes, im: int, iM: int, nbits: int,
                     lengths: np.ndarray, codes: np.ndarray,
                     n_out: int) -> np.ndarray:
    """Hybrid table decode like hufBuildDecTable/hufDecode: a
    2^14-entry fast table for codes <= 14 bits, plus per-prefix lists
    searched linearly for longer codes."""
    used = lengths > 0
    if not used.any():
        return np.zeros(n_out, np.uint16)

    size = 1 << HUF_DECBITS
    sym_t = np.full(size, -1, np.int64)
    len_t = np.zeros(size, np.int64)
    long_codes = {}  # prefix (14 bits) -> list[(l, code, sym)]
    for sym in np.nonzero(used)[0]:
        l = int(lengths[sym])
        code = int(codes[sym])
        if l <= HUF_DECBITS:
            base = code << (HUF_DECBITS - l)
            span = 1 << (HUF_DECBITS - l)
            sym_t[base:base + span] = sym
            len_t[base:base + span] = l
        else:
            prefix = code >> (l - HUF_DECBITS)
            long_codes.setdefault(prefix, []).append((l, code, int(sym)))
    for v in long_codes.values():
        v.sort()

    rlc = iM
    out = np.zeros(n_out, np.uint32)
    oi = 0
    c = 0
    lc = 0
    pos = 0
    buf = data + b"\x00" * 16
    nbuf = len(data)
    mask64 = (1 << 64) - 1
    while oi < n_out:
        while lc < HUF_DECBITS + 16:
            c = ((c << 8) | buf[pos]) & mask64
            pos += 1
            lc += 8
        idx = (c >> (lc - HUF_DECBITS)) & (size - 1)
        l = int(len_t[idx])
        if l > 0:
            sym = int(sym_t[idx])
            lc -= l
        else:
            cand = long_codes.get(int(idx))
            sym = -1
            if cand:
                for (cl, ccode, csym) in cand:
                    if lc >= cl and ((c >> (lc - cl))
                                     & ((1 << cl) - 1)) == ccode:
                        sym = csym
                        lc -= cl
                        break
            if sym < 0:
                break  # padding / corrupt stream
        if sym == rlc:
            if lc < 8:
                c = ((c << 8) | buf[pos]) & mask64
                pos += 1
                lc += 8
            run = (c >> (lc - 8)) & 0xFF
            lc -= 8
            out[oi:oi + run] = out[oi - 1]
            oi += run
        else:
            out[oi] = sym
            oi += 1
    return out.astype(np.uint16)


def huf_uncompress(data: bytes, n_out: int) -> np.ndarray:
    im, iM, _table_len, nbits, _room = struct.unpack_from("<5I", data, 0)
    reader = _BitReader(data[20:])
    lengths = _unpack_enc_table(reader, im, iM)
    codes = _canonical_codes(lengths)
    bitstream = data[20 + reader.pos:]
    return _huf_decode_fast(bitstream, im, iM, nbits, lengths, codes, n_out)


# ---------------------------------------------------------------------------
# 2D wavelet decode (ImfWav.cpp wav2Decode)
# ---------------------------------------------------------------------------

def _wdec14(l, h):
    ls = l.astype(np.int16).astype(np.int64)
    hs = h.astype(np.int16).astype(np.int64)
    ai = ls + (hs & 1) + (hs >> 1)
    a = ai
    b = ai - hs
    return (a & 0xFFFF).astype(np.uint16), (b & 0xFFFF).astype(np.uint16)


def _wdec16(l, h):
    m = l.astype(np.int64)
    d = h.astype(np.int64)
    bb = (m - (d >> 1)) & MOD_MASK
    aa = (d + bb - A_OFFSET) & MOD_MASK
    return aa.astype(np.uint16), bb.astype(np.uint16)


def wav2_decode(a: np.ndarray, nx: int, ny: int, mx: int):
    """In-place 2D wavelet decode of an (ny, nx) uint16 array."""
    w14 = mx < (1 << 14)
    dec = _wdec14 if w14 else _wdec16
    n = min(nx, ny)
    p = 1
    while p <= n:
        p <<= 1
    p >>= 1
    p2 = p
    p >>= 1

    while p >= 1:
        # iterate 2x2 blocks with stride p2, offsets p
        ey = ((ny - 1) // p2) * p2
        ex = ((nx - 1) // p2) * p2
        ys = np.arange(0, ey + 1, p2)
        xs = np.arange(0, ex + 1, p2)
        has_y1 = ys + p <= ny - 1
        has_x1 = xs + p <= nx - 1

        Y0, X0 = np.meshgrid(ys, xs, indexing="ij")
        # full 2x2 blocks
        by = has_y1[:, None] & np.ones_like(has_x1)[None, :]
        bx = np.ones_like(has_y1)[:, None] & has_x1[None, :]
        full = by & bx
        y0f, x0f = Y0[full], X0[full]
        if len(y0f):
            i00 = a[y0f, x0f]
            i01 = a[y0f, x0f + p]
            i10 = a[y0f + p, x0f]
            i11 = a[y0f + p, x0f + p]
            t00, t10 = dec(i00, i10)
            t01, t11 = dec(i01, i11)
            o00, o01 = dec(t00, t01)
            o10, o11 = dec(t10, t11)
            a[y0f, x0f] = o00
            a[y0f, x0f + p] = o01
            a[y0f + p, x0f] = o10
            a[y0f + p, x0f + p] = o11
        # row-only blocks (no x+p): vertical pair decode
        rowonly = by & ~bx
        y0r, x0r = Y0[rowonly], X0[rowonly]
        if len(y0r):
            i00 = a[y0r, x0r]
            i10 = a[y0r + p, x0r]
            o00, o10 = dec(i00, i10)
            a[y0r, x0r] = o00
            a[y0r + p, x0r] = o10
        # col-only blocks (no y+p): horizontal pair decode
        colonly = ~by & bx
        y0c, x0c = Y0[colonly], X0[colonly]
        if len(y0c):
            i00 = a[y0c, x0c]
            i01 = a[y0c, x0c + p]
            o00, o01 = dec(i00, i01)
            a[y0c, x0c] = o00
            a[y0c, x0c + p] = o01
        p2 = p
        p >>= 1
    return a


# ---------------------------------------------------------------------------
# chunk decode
# ---------------------------------------------------------------------------

def piz_uncompress(chunk: bytes, channels, width: int, nlines: int):
    """Decode one PIZ scanline block.

    channels: list of (name, numpy dtype) in file order.  Returns raw
    bytes in the standard scanline-interleaved layout (per line, per
    channel) so read_exr's existing unpacking applies.
    """
    min_nz, max_nz = struct.unpack_from("<2H", chunk, 0)
    pos = 4
    bitmap = np.zeros(BITMAP_SIZE, np.uint8)
    if min_nz <= max_nz:
        count = max_nz - min_nz + 1
        bitmap[min_nz:max_nz + 1] = np.frombuffer(
            chunk, np.uint8, count, pos)
        pos += count
    (comp_len,) = struct.unpack_from("<i", chunk, pos)
    pos += 4

    # forward LUT: value -> compact index; reverse: index -> value
    bits = np.unpackbits(bitmap, bitorder="little")
    present = np.nonzero(bits)[0]
    # value 0 is always representable even if not in the bitmap
    reverse_lut = present.astype(np.uint16)
    if len(reverse_lut) == 0 or reverse_lut[0] != 0:
        reverse_lut = np.concatenate(
            [[0], present]).astype(np.uint16)
    max_value = len(reverse_lut) - 1

    # total u16 count: channels assumed full-sampled
    n_half = sum(
        (dt.itemsize // 2) * width * nlines for _, dt in channels
    )
    data = huf_uncompress(chunk[pos:pos + comp_len], n_half)

    # per-channel planar wavelet decode
    out_planes = []
    off = 0
    for name, dt in channels:
        sz = dt.itemsize // 2  # u16 words per sample
        plane = data[off:off + sz * width * nlines].copy()
        off += sz * width * nlines
        plane = plane.reshape(nlines, width * sz)
        wav2_decode(plane, width * sz, nlines, max_value)
        plane = reverse_lut[np.minimum(plane, max_value)]
        out_planes.append(plane)

    # interleave to scanline layout
    raw = bytearray()
    for ln in range(nlines):
        for (name, dt), plane in zip(channels, out_planes):
            raw += plane[ln].astype("<u2").tobytes()
    return bytes(raw)
