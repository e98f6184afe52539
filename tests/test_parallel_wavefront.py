"""Sharded persistent-wavefront renderer (parallel.py) on the virtual
8-device CPU mesh.

Determinism contract: work item q keys the counter-based RNG, so
per-sample radiance is independent of lane scheduling and of WHICH
device renders it; the film is folded left-associatively in q order.
Consequently the image is bit-identical under any permutation of the
q->device assignment (same compiled program, different placement) and
across repeat runs.  A 1-device mesh compiles a DIFFERENT partitioned
program, where XLA's fusion choices may reassociate float math; 1- vs
8-device images therefore agree to float-ulp scale (<= ~1e-6), not
necessarily bitwise (XLA does not promise bitwise-stable compilation
across partitionings).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nori_tpu.scenes_builtin import cornell_box
from nori_tpu.parallel import (
    make_mesh, make_sharded_wavefront, render_sharded_wavefront)
from nori_tpu.integrators.path import MIS

W, H, SPP = 48, 32, 2
TOTAL_Q = W * H * SPP
CHUNK_DEV = ((-(-TOTAL_Q // 8)) // SPP) * SPP


def _scene():
    return cornell_box(width=W, height=H, spp=SPP, integrator="path_mis",
                       sphere_subdiv=1)


@pytest.fixture(scope="module")
def eight_dev_render():
    scene = _scene()
    img, stats = render_sharded_wavefront(
        scene, make_mesh(8), spp=SPP, n_lanes_dev=2048,
        chunk_dev=CHUNK_DEV)
    return scene, img, stats


def test_sharded_wavefront_renders(eight_dev_render):
    _, img, stats = eight_dev_render
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    assert 0.05 < img.mean() < 2.0
    assert stats["devices"] == 8
    assert stats["rays"] > TOTAL_Q  # at least one bounce somewhere


def test_sharded_wavefront_repeat_bit_identical(eight_dev_render):
    scene, img, _ = eight_dev_render
    img2, _ = render_sharded_wavefront(
        scene, make_mesh(8), spp=SPP, n_lanes_dev=2048,
        chunk_dev=CHUNK_DEV)
    assert np.array_equal(img, img2)


def test_sharded_wavefront_device_permutation_bit_identical(
        eight_dev_render):
    # reversing the device order of the mesh changes which physical
    # device renders which q-range; the image must not change a bit
    scene, img, _ = eight_dev_render
    devs = jax.devices()[:8][::-1]
    from jax.sharding import Mesh

    mesh_rev = Mesh(np.asarray(devs), ("batch",))
    scene2 = _scene()
    img2, _ = render_sharded_wavefront(
        scene2, mesh_rev, spp=SPP, n_lanes_dev=2048, chunk_dev=CHUNK_DEV)
    assert np.array_equal(img, img2)


def test_sharded_wavefront_matches_single_device(eight_dev_render):
    _, img, _ = eight_dev_render
    scene1 = _scene()
    img1, stats1 = render_sharded_wavefront(
        scene1, make_mesh(1), spp=SPP, n_lanes_dev=2048,
        chunk_dev=CHUNK_DEV)
    assert stats1["devices"] == 1
    # same RNG streams, same splat order; only compiled-program float
    # reassociation differs
    assert np.abs(img - img1).max() < 1e-5
    # and against the production single-device renderer
    from nori_tpu.wavefront import render_wavefront

    scene_w = _scene()
    img_w, _ = render_wavefront(
        scene_w, spp=SPP, n_lanes=2048, chunk=CHUNK_DEV)
    assert np.abs(img - img_w).max() < 1e-5


def test_sharded_wavefront_shrinks_like_single_device(eight_dev_render):
    # the drain tail must run in the narrow pool on every device, just
    # like the single-device driver: with one device and matching
    # lane/chunk config the two drivers must take the SAME number of
    # wide steps (full-width sweeps are what the shrink refinement
    # saves at scale)
    from nori_tpu.wavefront import render_wavefront

    scene1 = _scene()
    _, stats1 = render_sharded_wavefront(
        scene1, make_mesh(1), spp=SPP, n_lanes_dev=2048,
        chunk_dev=CHUNK_DEV)
    scene_w = _scene()
    _, stats_w = render_wavefront(
        scene_w, spp=SPP, n_lanes=2048, chunk=CHUNK_DEV)
    assert stats1["wide_steps"] < stats1["steps"], \
        "sharded drain tail never entered the narrow pool"
    # pipelined-check granularity (check_every) aside, both phases must
    # match the single-device driver's step counts
    assert abs(stats1["wide_steps"] - stats_w["wide_steps"]) <= 32
    assert abs(stats1["steps"] - stats_w["steps"]) <= 48


def test_sharded_wavefront_checkpoint_resume(tmp_path):
    # interrupt after the first global chunk, resume, and match the
    # uninterrupted image bit-for-bit
    ck = str(tmp_path / "swf_ck.npz")
    small_chunk = ((-(-TOTAL_Q // 16)) // SPP) * SPP
    scene_a = _scene()
    img_full, _ = render_sharded_wavefront(
        scene_a, make_mesh(8), spp=SPP, n_lanes_dev=1024,
        chunk_dev=small_chunk)

    class Stop(Exception):
        pass

    scene_b = _scene()
    import nori_tpu.parallel as par

    orig = np.savez
    calls = {"n": 0}

    def savez_then_stop(*a, **kw):
        orig(*a, **kw)
        calls["n"] += 1
        if calls["n"] == 1:
            raise Stop()

    np.savez = savez_then_stop
    try:
        with pytest.raises(Stop):
            render_sharded_wavefront(
                scene_b, make_mesh(8), spp=SPP, n_lanes_dev=1024,
                chunk_dev=small_chunk, checkpoint_path=ck)
    finally:
        np.savez = orig
    import os
    os.replace(ck + ".tmp.npz", ck)  # the dump the stop interrupted
    assert os.path.exists(ck)
    scene_c = _scene()
    img_res, stats = render_sharded_wavefront(
        scene_c, make_mesh(8), spp=SPP, n_lanes_dev=1024,
        chunk_dev=small_chunk, checkpoint_path=ck)
    assert stats["done"]
    assert not os.path.exists(ck)
    assert np.array_equal(img_full, img_res)


def test_sharded_wavefront_lane_count_independent():
    # per-sample values must not depend on pool width (scheduling)
    scene_a = _scene()
    img_a, _ = render_sharded_wavefront(
        scene_a, make_mesh(8), spp=SPP, n_lanes_dev=1024,
        chunk_dev=CHUNK_DEV)
    scene_b = _scene()
    img_b, _ = render_sharded_wavefront(
        scene_b, make_mesh(8), spp=SPP, n_lanes_dev=4096,
        chunk_dev=CHUNK_DEV)
    assert np.abs(img_a - img_b).max() < 1e-5
