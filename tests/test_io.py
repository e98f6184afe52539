"""IO tests: EXR codec, OBJ loader, XML parser, film."""

import numpy as np
import jax.numpy as jnp
import pytest

from nori_tpu.bitmap import write_exr, read_exr, write_png
from nori_tpu.obj_loader import load_obj
from nori_tpu.core.transform import Transform
from nori_tpu import load_from_xml
from nori_tpu.registry import NoriError
from nori_tpu.props import PropertyList
from nori_tpu.film import FilmSpec, new_accumulator, splat, to_bitmap, spiral_blocks
from nori_tpu.rfilter import GaussianFilter, BoxFilter


def test_exr_roundtrip(tmp_path):
    img = np.random.RandomState(0).rand(33, 57, 3).astype(np.float32) * 8
    p = str(tmp_path / "t.exr")
    write_exr(p, img, half=False)
    assert np.abs(read_exr(p) - img).max() == 0.0


def test_exr_half_default(tmp_path):
    # default write is half-float ZIP like the reference's OpenEXR
    # output (src/bitmap.cpp:81-108): exact in f16
    img = np.random.RandomState(1).rand(16, 16, 3).astype(np.float32)
    p = str(tmp_path / "h.exr")
    write_exr(p, img)
    back = read_exr(p)
    assert np.array_equal(back, img.astype(np.float16).astype(np.float32))


@pytest.mark.parametrize("comp", ["none", "rle", "zips", "zip", "pxr24",
                                  "piz"])
@pytest.mark.parametrize("half", [True, False])
def test_exr_compression_roundtrip(tmp_path, comp, half):
    rng = np.random.RandomState(3)
    img = (rng.rand(37, 53, 3) ** 2 * 10).astype(np.float32)
    p = str(tmp_path / f"c_{comp}_{half}.exr")
    write_exr(p, img, half=half, compression=comp)
    back = read_exr(p)
    want = img.astype(np.float16).astype(np.float32) if half else img
    if comp == "pxr24" and not half:
        # PXR24 truncates float32 to 24 bits (lossy by design)
        assert np.abs(back - want).max() < 1e-4 * img.max()
    else:
        assert np.array_equal(back, want), comp


@pytest.mark.parametrize("comp", ["b44", "b44a"])
def test_exr_b44_encode_roundtrip(tmp_path, comp):
    # B44 quantizes 4x4 blocks to 6-bit running deltas: lossy, with
    # per-block error bounded by the block's dynamic range / 62
    h, w = 37, 53   # exercises edge-replicated partial blocks
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        0.3 + 0.25 * np.sin(xx / 7.0) * np.cos(yy / 5.0),
        np.abs(yy - h / 2) / h,
        np.exp(-((xx - 20) ** 2 + (yy - 15) ** 2) / 60.0),
    ], axis=-1).astype(np.float32)
    p = str(tmp_path / f"enc_{comp}.exr")
    write_exr(p, img, half=True, compression=comp)
    back = read_exr(p)
    want = img.astype(np.float16).astype(np.float32)
    assert np.abs(back - want).max() < 4e-3   # smooth blocks: tiny loss
    # sign handling: negative values survive the half transform.
    # Sign-straddling blocks span a huge transformed range, so their
    # shift (and quantization step) is large — inherent to B44, which
    # only promises accuracy within low-dynamic-range blocks.
    img2 = np.where(img > 0.4, -img, img).astype(np.float32)
    write_exr(p, img2, half=True, compression=comp)
    back2 = read_exr(p)
    want2 = img2.astype(np.float16).astype(np.float32)
    assert np.abs(back2 - want2).max() < 0.5
    # most pixels sit in single-sign blocks and stay accurate
    assert np.median(np.abs(back2 - want2)) < 4e-3


def test_exr_b44a_encode_flat_compression(tmp_path):
    # constant 4x4 blocks become 3-byte B44A blocks: smaller file,
    # exact round-trip
    flat = np.full((64, 48, 3), 0.25, np.float32)
    pa = str(tmp_path / "fa.exr")
    pb = str(tmp_path / "fb.exr")
    write_exr(pa, flat, compression="b44a")
    write_exr(pb, flat, compression="b44")
    import os
    assert os.path.getsize(pa) * 3 < os.path.getsize(pb)
    assert np.array_equal(read_exr(pa), flat)


def test_exr_channel_subset_writer(tmp_path):
    # write_exr_channels: arbitrary channel names/subsets, mixed
    # half/float, stored alphabetically; read_exr picks out R/G/B
    from nori_tpu.bitmap import write_exr_channels

    rng = np.random.RandomState(7)
    h, w = 21, 17
    img = (rng.rand(h, w, 3) * 4).astype(np.float32)
    chans = {
        "R": img[:, :, 0].astype(np.float16),
        "G": img[:, :, 1].astype(np.float16),
        "B": img[:, :, 2].astype(np.float16),
        "A": np.ones((h, w), np.float16),
        "Z": 1.0 + rng.rand(h, w).astype(np.float32),   # FLOAT depth
    }
    p = str(tmp_path / "chans.exr")
    for comp in ("none", "zip", "piz", "pxr24"):
        write_exr_channels(p, chans, compression=comp)
        back = read_exr(p)
        want = img.astype(np.float16).astype(np.float32)
        assert np.array_equal(back, want), comp


def test_exr_b44a_flat_blocks(tmp_path):
    # hand-built B44A file: every 4x4 block is a flat 3-byte block
    # (ImfB44Compressor pack3/unpack3 semantics)
    import struct

    h, w = 10, 13   # exercises edge cropping of padded blocks
    rng = np.random.RandomState(4)
    nby, nbx = (h + 3) // 4, (w + 3) // 4
    block_vals = (rng.rand(nby, nbx).astype(np.float32) * 4)
    img = np.zeros((h, w, 3), np.float32)
    for by in range(nby):
        for bx in range(nbx):
            img[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4, :] = \
                block_vals[by, bx]

    def fwd(hbits):
        if (hbits & 0x7C00) == 0x7C00:
            return 0x8000
        return (~hbits) & 0xFFFF if (hbits & 0x8000) else (hbits | 0x8000)

    chlist = b""
    for cname in (b"B", b"G", b"R"):
        chlist += cname + b"\x00" + struct.pack("<iB3xii", 1, 0, 1, 1)
    chlist += b"\x00"

    def attr(name, atype, payload):
        return (name.encode() + b"\x00" + atype.encode() + b"\x00"
                + struct.pack("<i", len(payload)) + payload)

    header = struct.pack("<ii", 20000630, 2)
    header += attr("channels", "chlist", chlist)
    header += attr("compression", "compression", bytes([7]))  # B44A
    header += attr("dataWindow", "box2i",
                   struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += attr("displayWindow", "box2i",
                   struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += attr("lineOrder", "lineOrder", b"\x00")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f",
                   struct.pack("<2f", 0.0, 0.0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    chunk = bytearray()
    for _ in range(3):   # channels B, G, R (same values per block)
        for by in range(nby):
            for bx in range(nbx):
                hb = int(np.float16(block_vals[by, bx]).view(np.uint16))
                s = fwd(hb)
                chunk += bytes([(s >> 8) & 0xFF, s & 0xFF, 0xFC])
    data = bytes(chunk)
    table_pos = len(header)
    off = table_pos + 8
    p = tmp_path / "b44a.exr"
    with open(p, "wb") as f:
        f.write(header)
        f.write(struct.pack("<q", off))
        f.write(struct.pack("<ii", 0, len(data)))
        f.write(data)
    back = read_exr(str(p))
    want = img.astype(np.float16).astype(np.float32)
    assert np.array_equal(back, want)


def test_exr_b44_unpack14_uniform_deltas():
    # a 14-byte block whose 6-bit fields all equal the bias (0x20 at
    # shift 0) decodes to sixteen copies of s0
    from nori_tpu.bitmap import _b44_unpack14

    hval = int(np.float16(1.5).view(np.uint16))
    s0 = hval | 0x8000   # forward half transform for positive finite
    bits = 0
    nbits = 0
    for n, v in [(16, s0), (6, 0)] + [(6, 0x20)] * 15:
        bits = (bits << n) | v
        nbits += n
    assert nbits == 112
    b = np.array([[(bits >> (104 - 8 * i)) & 0xFF for i in range(14)]],
                 np.uint8)
    out = _b44_unpack14(b)
    assert np.all(out == hval)


def test_png(tmp_path):
    img = np.random.RandomState(2).rand(8, 8, 3).astype(np.float32)
    write_png(str(tmp_path / "t.png"), img)


def test_obj_quad_split_and_dedup(tmp_path):
    p = tmp_path / "q.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3 4\n"
    )
    m = load_obj(str(p))
    assert m.num_faces == 2
    assert m.num_vertices == 4  # dedup across the two triangles
    assert np.allclose(m.surface_areas().sum(), 1.0)


def test_obj_toworld_normals(tmp_path):
    p = tmp_path / "n.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
        "f 1//1 2//2 3//3\n"
    )
    t = Transform.scale([2, 1, 1])
    m = load_obj(str(p), t)
    assert np.allclose(m.positions[1], [2, 0, 0])
    # normals transform with inverse transpose then renormalize
    assert np.allclose(m.normals[0], [0, 0, 1], atol=1e-6)


def test_parser_bunny(ref_scenes):
    root = load_from_xml(f"{ref_scenes}/pa1/bunny.xml")
    assert root.class_kind == "scene"
    assert root.camera.width == 768
    assert root.sampler.sample_count == 1
    assert len(root.meshes) == 1
    assert root.meshes[0].data.num_faces == 2000


def test_parser_cbox_children(ref_scenes):
    root = load_from_xml(f"{ref_scenes}/pa5/cbox/cbox_mis.xml")
    assert len(root.meshes) == 6
    kinds = [m.bsdf.plugin_name for m in root.meshes]
    assert "mirror" in kinds and "dielectric" in kinds
    assert any(m.is_emitter() for m in root.meshes)
    sd = root.compile()
    assert float(sd.em_area) > 0


def test_parser_rejects_bad_attribute(tmp_path):
    p = tmp_path / "bad.xml"
    p.write_text('<scene><integrator type="normals" foo="1"/></scene>')
    with pytest.raises(NoriError):
        load_from_xml(str(p))


def test_film_energy_conservation_box():
    spec_filter = BoxFilter(PropertyList())
    spec = FilmSpec.for_filter(16, 16, spec_filter)
    accum = new_accumulator(spec)
    pos = jnp.asarray(
        np.random.RandomState(0).rand(500, 2).astype(np.float32) * 16
    )
    vals = jnp.ones((500, 3), jnp.float32)
    accum, dropped = splat(spec, spec_filter, accum, pos, vals)
    img = to_bitmap(spec, accum)
    assert int(dropped) == 0
    # every valid pixel equals 1 exactly after weight normalization
    w = np.asarray(accum[..., 3])
    assert np.allclose(np.asarray(img)[w[..., ] > 0][..., 0], 1.0, atol=1e-6)


def test_film_drops_invalid_samples():
    f = GaussianFilter(PropertyList())
    spec = FilmSpec.for_filter(8, 8, f)
    accum = new_accumulator(spec)
    pos = jnp.asarray([[4.0, 4.0], [2.0, 2.0]], jnp.float32)
    vals = jnp.asarray([[1.0, 1.0, 1.0], [np.nan, 1.0, 1.0]], jnp.float32)
    accum, dropped = splat(spec, f, accum, pos, vals)
    assert int(dropped) == 1
    assert np.isfinite(np.asarray(accum)).all()


def test_spiral_covers_all_blocks():
    tiles = list(spiral_blocks(100, 70, 32))
    assert len(tiles) == 4 * 3
    seen = set((x, y) for x, y, _, _ in tiles)
    assert len(seen) == 12
    # sizes clipped at the border
    assert all(x + w <= 100 and y + h <= 70 for x, y, w, h in tiles)


def test_piz_reader_on_reference_exr():
    """PIZ (wavelet+Huffman) decode of the fork's stored reference image
    (python/living-room_final.exr, compression type 4)."""
    import os
    path = "/root/reference/python/living-room_final.exr"
    if not os.path.exists(path):
        pytest.skip("reference EXR not available")
    img = read_exr(path)
    assert img.shape == (720, 1280, 3)
    assert np.isfinite(img).all()
    assert 0.01 < img.mean() < 10.0
    # natural image: neighboring pixels strongly correlated
    assert np.abs(np.diff(img, axis=1)).mean() < 0.2 * img.mean() + 0.05


def test_piz_reencode_reference_exr(tmp_path):
    """Re-encode the reference living-room EXR with our PIZ encoder and
    read it back bit-exactly (the file is half, so half re-encode is
    lossless)."""
    import os
    path = "/root/reference/python/living-room_final.exr"
    if not os.path.exists(path):
        pytest.skip("reference EXR not available")
    img = read_exr(path)
    out = str(tmp_path / "lr_piz.exr")
    write_exr(out, img, half=True, compression="piz")
    back = read_exr(out)
    assert np.array_equal(back, img)
    # our canonical-Huffman PIZ should land near OpenEXR's own size
    assert os.path.getsize(out) < 1.2 * os.path.getsize(path)


def test_warptest_cli_square():
    from nori_tpu import warptest

    rc = warptest.main(["square"])
    assert rc == 0
