"""EXR / PNG image I/O.

Replaces src/bitmap.cpp:32-134 (OpenEXR read/write + sRGB PNG via stb).
No EXR library is available in this environment, so this is a minimal
self-contained OpenEXR 2.0 scanline codec implemented from the public
file-format specification: float/half RGB channels, NONE/ZIPS/ZIP
compression, increasing-Y line order.  Matches the reference's
conventions: RGB channel naming on read (suffix match), float channels +
a "comments" attribute on write, and sRGB tonemapped 8-bit PNG output.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from nori_tpu.registry import NoriError
from nori_tpu.core.color import np_to_srgb

_MAGIC = 20000630
_PXTYPE_UINT, _PXTYPE_HALF, _PXTYPE_FLOAT = 0, 1, 2
_COMP_NONE, _COMP_RLE, _COMP_ZIPS, _COMP_ZIP, _COMP_PIZ = 0, 1, 2, 3, 4
_LINES_PER_BLOCK = {_COMP_NONE: 1, _COMP_ZIPS: 1, _COMP_ZIP: 16,
                    _COMP_PIZ: 32}


# ---------------------------------------------------------------------------
# ZIP predictor + byte-reorder transform (per the OpenEXR spec)
# ---------------------------------------------------------------------------

def _zip_postdecode(data: bytes) -> np.ndarray:
    t = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
    # undo delta predictor: stored d[i] = t[i]-t[i-1]+384 (mod 256)
    t[1:] -= 384
    t = np.cumsum(t) & 0xFF
    # undo reorder: first half = even positions, second half = odd
    n = t.shape[0]
    half = (n + 1) // 2
    out = np.empty(n, dtype=np.uint8)
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return out


def _zip_preencode(raw: np.ndarray) -> bytes:
    n = raw.shape[0]
    half = (n + 1) // 2
    t = np.empty(n, dtype=np.uint8)
    t[:half] = raw[0::2]
    t[half:] = raw[1::2]
    d = t.astype(np.int32)
    d[1:] = (d[1:] - d[:-1] + 384) & 0xFF
    return d.astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# Reading
# ---------------------------------------------------------------------------

def _read_attr_string(buf, pos):
    end = buf.index(b"\x00", pos)
    return buf[pos:end].decode("latin-1"), end + 1


def read_exr(filename: str) -> np.ndarray:
    """Read an EXR into an (H, W, 3) float32 array of linear RGB.

    Mirrors Bitmap::Bitmap(filename) (src/bitmap.cpp:32-79): channels
    whose names equal or end with R/G/B are selected; missing channels
    raise.
    """
    with open(filename, "rb") as f:
        buf = f.read()

    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != _MAGIC:
        raise NoriError(f"'{filename}': not an OpenEXR file")
    if version & 0x200:
        raise NoriError(f"'{filename}': tiled EXR not supported")

    pos = 8
    channels = []  # list of (name, pixel_type)
    compression = _COMP_NONE
    data_window = None
    while True:
        if buf[pos] == 0:
            pos += 1
            break
        name, pos = _read_attr_string(buf, pos)
        atype, pos = _read_attr_string(buf, pos)
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        payload = buf[pos:pos + size]
        pos += size
        if name == "channels":
            cpos = 0
            while payload[cpos] != 0:
                cname, cpos = _read_attr_string(payload, cpos)
                ptype, _plin, _xs, _ys = struct.unpack_from(
                    "<iB3xii", payload, cpos
                )
                cpos += 16
                channels.append((cname, ptype))
        elif name == "compression":
            compression = payload[0]
        elif name == "dataWindow":
            data_window = struct.unpack("<4i", payload)

    if data_window is None:
        raise NoriError(f"'{filename}': missing dataWindow")
    xmin, ymin, xmax, ymax = data_window
    width, height = xmax - xmin + 1, ymax - ymin + 1

    if compression not in _LINES_PER_BLOCK:
        raise NoriError(
            f"'{filename}': unsupported compression {compression} "
            "(only NONE/ZIPS/ZIP)"
        )
    lines_per_block = _LINES_PER_BLOCK[compression]
    num_blocks = (height + lines_per_block - 1) // lines_per_block

    # channel -> rgb slot, by exact or suffix match (src/bitmap.cpp:49-63)
    slot = {}
    for ci, (cname, ptype) in enumerate(channels):
        for want, si in (("R", 0), ("G", 1), ("B", 2)):
            if cname == want or cname.endswith("." + want):
                slot[ci] = si
    if len(slot) < 3:
        raise NoriError(f"'{filename}': could not find RGB channels {channels}")

    chan_dtypes = [
        np.dtype(np.float16) if pt == _PXTYPE_HALF else np.dtype(np.float32)
        for _, pt in channels
    ]
    if any(pt == _PXTYPE_UINT for _, pt in channels):
        raise NoriError(f"'{filename}': UINT channels not supported")
    bytes_per_px = sum(dt.itemsize for dt in chan_dtypes)

    # skip line offset table
    offsets = struct.unpack_from(f"<{num_blocks}q", buf, pos)
    img = np.zeros((height, width, 3), dtype=np.float32)

    for off in offsets:
        y, size = struct.unpack_from("<ii", buf, off)
        data = buf[off + 8:off + 8 + size]
        block_y0 = y - ymin
        nlines = min(lines_per_block, height - block_y0)
        raw_size = bytes_per_px * width * nlines
        if compression == _COMP_PIZ and size < raw_size:
            if any(dt.itemsize != 2 for dt in chan_dtypes):
                raise NoriError(
                    f"'{filename}': PIZ with non-HALF channels unsupported")
            from nori_tpu.exr_piz import piz_uncompress

            raw = piz_uncompress(
                data, [(n, dt) for (n, _), dt in zip(channels, chan_dtypes)],
                width, nlines,
            )
        elif compression in (_COMP_ZIP, _COMP_ZIPS) and size < raw_size:
            raw = _zip_postdecode(zlib.decompress(data)).tobytes()
        else:
            raw = data
        rpos = 0
        for ln in range(nlines):
            for ci, dt in enumerate(chan_dtypes):
                n = width * dt.itemsize
                vals = np.frombuffer(raw, dtype=dt, count=width, offset=rpos)
                rpos += n
                if ci in slot:
                    img[block_y0 + ln, :, slot[ci]] = vals.astype(np.float32)
    return img


# ---------------------------------------------------------------------------
# Writing
# ---------------------------------------------------------------------------

def _attr(name: str, atype: str, payload: bytes) -> bytes:
    return (
        name.encode() + b"\x00" + atype.encode() + b"\x00"
        + struct.pack("<i", len(payload)) + payload
    )


def write_exr(filename: str, img: np.ndarray, half: bool = False):
    """Write (H, W, 3) linear RGB as a ZIP-compressed scanline EXR.

    Writes R/G/B channels (stored alphabetically B, G, R per the spec)
    plus a "comments" attribute like the reference
    (src/bitmap.cpp:96 "Generated by Nori").
    """
    img = np.asarray(img, dtype=np.float32)
    if img.ndim != 3 or img.shape[2] != 3:
        raise NoriError(f"write_exr: expected (H, W, 3), got {img.shape}")
    h, w = img.shape[:2]
    dt = np.dtype(np.float16) if half else np.dtype(np.float32)
    ptype = _PXTYPE_HALF if half else _PXTYPE_FLOAT

    chlist = b""
    for cname in (b"B", b"G", b"R"):
        chlist += cname + b"\x00" + struct.pack("<iB3xii", ptype, 0, 1, 1)
    chlist += b"\x00"

    header = struct.pack("<ii", _MAGIC, 2)
    header += _attr("channels", "chlist", chlist)
    header += _attr("comments", "string", b"Generated by nori_tpu")
    header += _attr("compression", "compression", bytes([_COMP_ZIP]))
    header += _attr("dataWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += _attr("displayWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += _attr("lineOrder", "lineOrder", b"\x00")
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<2f", 0.0, 0.0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    lines_per_block = _LINES_PER_BLOCK[_COMP_ZIP]
    num_blocks = (h + lines_per_block - 1) // lines_per_block
    chunks = []
    for b in range(num_blocks):
        y0 = b * lines_per_block
        nlines = min(lines_per_block, h - y0)
        # per scanline: B row, G row, R row
        rows = img[y0:y0 + nlines][:, :, ::-1]  # BGR
        raw = np.ascontiguousarray(
            rows.transpose(0, 2, 1).astype(dt)
        ).view(np.uint8).ravel()
        comp = zlib.compress(_zip_preencode(raw), 6)
        if len(comp) >= raw.nbytes:
            comp = raw.tobytes()
        chunks.append((y0, comp))

    table_pos = len(header)
    data_pos = table_pos + 8 * num_blocks
    offsets = []
    cur = data_pos
    for y0, comp in chunks:
        offsets.append(cur)
        cur += 8 + len(comp)

    with open(filename, "wb") as f:
        f.write(header)
        f.write(struct.pack(f"<{num_blocks}q", *offsets))
        for y0, comp in chunks:
            f.write(struct.pack("<ii", y0, len(comp)))
            f.write(comp)


def write_png(filename: str, img: np.ndarray):
    """sRGB-tonemap linear RGB to an 8-bit PNG (src/bitmap.cpp:110-134)."""
    from PIL import Image

    img = np.asarray(img, dtype=np.float32)
    srgb = np_to_srgb(np.clip(img, 0.0, None))
    out = np.clip(srgb * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(out, mode="RGB").save(filename)
