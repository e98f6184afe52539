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
    write_exr(p, img)
    assert np.abs(read_exr(p) - img).max() == 0.0


def test_exr_half(tmp_path):
    img = np.random.RandomState(1).rand(16, 16, 3).astype(np.float32)
    p = str(tmp_path / "h.exr")
    write_exr(p, img, half=True)
    assert np.abs(read_exr(p) - img).max() < 1e-3


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


def test_warptest_cli_square():
    from nori_tpu import warptest

    rc = warptest.main(["square"])
    assert rc == 0
