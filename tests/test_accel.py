"""Acceleration-structure correctness: BVH and Pallas sweep vs the
brute-force oracle on random soups and reference scenes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nori_tpu import load_from_xml
from nori_tpu.accel import traverse as tr


def _random_rays(sd, n, seed):
    r = np.random.RandomState(seed)
    lo = np.asarray(sd.bbox_min)
    hi = np.asarray(sd.bbox_max)
    span = hi - lo
    o = lo + r.rand(n, 3) * span
    d = r.randn(n, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.full((n,), 1e-4, jnp.float32), jnp.full((n,), 1e30, jnp.float32),
    )


@pytest.fixture(scope="module")
def cbox(ref_scenes):
    root = load_from_xml(f"{ref_scenes}/pa5/cbox/cbox_mis.xml")
    return root.compile()


def test_bvh_matches_brute_force(cbox):
    o, d, mint, maxt = _random_rays(cbox, 2048, 0)
    hb = tr.intersect_brute(cbox, o, d, mint, maxt)
    hv = tr.intersect_bvh(cbox, o, d, mint, maxt)
    assert np.array_equal(np.asarray(hb.valid), np.asarray(hv.valid))
    v = np.asarray(hb.valid)
    assert np.allclose(np.asarray(hb.t)[v], np.asarray(hv.t)[v], rtol=1e-6)
    assert np.array_equal(np.asarray(hb.tri)[v], np.asarray(hv.tri)[v])


def test_pallas_interpret_matches_brute_force(cbox):
    o, d, mint, maxt = _random_rays(cbox, 512, 1)
    hb = tr.intersect_brute(cbox, o, d, mint, maxt)
    hp = tr._intersect_pallas(cbox, o, d, mint, maxt)
    assert np.array_equal(np.asarray(hb.valid), np.asarray(hp.valid))
    v = np.asarray(hb.valid)
    assert np.array_equal(np.asarray(hb.tri)[v], np.asarray(hp.tri)[v])


def test_occlusion_consistency(cbox):
    o, d, mint, maxt = _random_rays(cbox, 1024, 2)
    h = tr.intersect_brute(cbox, o, d, mint, maxt)
    occ = tr.intersect_bvh(cbox, o, d, mint, maxt, any_hit=True).valid
    assert np.array_equal(np.asarray(h.valid), np.asarray(occ))


def test_shadow_ray_respects_maxt(cbox):
    o, d, mint, maxt = _random_rays(cbox, 512, 3)
    h = tr.intersect_brute(cbox, o, d, mint, maxt)
    v = np.asarray(h.valid)
    # shorten maxt to just below each hit: nothing may be found
    t = np.asarray(h.t)
    short = jnp.asarray(np.where(v, t * 0.99, 1e-4), jnp.float32)
    h2 = tr.intersect_brute(cbox, o, d, mint, short)
    assert not np.any(np.asarray(h2.valid)[v] & (np.asarray(h2.t)[v] >= t[v]))


def test_mint_excludes_near_hits(cbox):
    o, d, mint, maxt = _random_rays(cbox, 512, 4)
    h = tr.intersect_brute(cbox, o, d, mint, maxt)
    v = np.asarray(h.valid)
    t = np.asarray(h.t)
    past = jnp.asarray(np.where(v, t * 1.0001, 1e-4), jnp.float32)
    h2 = tr.intersect_brute(cbox, o, d, past, maxt)
    # any new hit must be strictly farther
    both = v & np.asarray(h2.valid)
    assert np.all(np.asarray(h2.t)[both] >= t[both])


def test_mxu_sweep_matches_plain():
    """The MXU (matmul) form of the resident sweep agrees with the VPU
    Moller-Trumbore block (same winning triangle and t)."""
    import jax.numpy as jnp
    from nori_tpu.scenes_builtin import cornell_box
    from nori_tpu.accel.pallas_mt import mt_sweep_resident, pack_rays

    scene = cornell_box(width=16, height=16, spp=1, sphere_subdiv=2)
    sd = scene.compile()
    rs = np.random.RandomState(0)
    N = 1024
    o = (np.array([0, 1, 0], np.float32)
         + rs.randn(N, 3).astype(np.float32) * 0.5)
    d = rs.randn(N, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    mint = np.full(N, 1e-4, np.float32)
    maxt = np.full(N, 1e30, np.float32)
    rays, n = pack_rays(jnp.asarray(o), jnp.asarray(d),
                        jnp.asarray(mint), jnp.asarray(maxt))
    t0, i0 = mt_sweep_resident(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rays)
    t1, i1 = mt_sweep_resident(
        sd.tri_mxu, sd.tri_tile_bounds, sd.scene_bounds, rays,
        use_mxu=True)
    i0, i1 = np.asarray(i0), np.asarray(i1)
    assert (i0 >= 0).mean() > 0.5  # origins near the box: many hits
    assert (i0 == i1).mean() > 0.999
    same = (i0 == i1) & (i0 >= 0)
    t0, t1 = np.asarray(t0), np.asarray(t1)
    assert np.max(np.abs(t0[same] - t1[same])
                  / np.maximum(t0[same], 1e-3)) < 1e-4


def test_pallas_hit_barycentrics_match_scan():
    """Regression: the resident sweep must return real (u, v) — legacy
    consumers (fill_interaction, whitted/ao, dump tracer) interpolate
    position/uv/normals from them."""
    import jax.numpy as jnp
    from nori_tpu import config
    from nori_tpu.accel.traverse import intersect
    from nori_tpu.scenes_builtin import cornell_box

    scene = cornell_box(width=16, height=16, spp=1, sphere_subdiv=2)
    sd = scene.compile()
    rs = np.random.RandomState(5)
    N = 512
    o = (np.array([0, 1, 0], np.float32)
         + rs.randn(N, 3).astype(np.float32) * 0.4)
    d = rs.randn(N, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    args = (jnp.asarray(o), jnp.asarray(d),
            jnp.full(N, 1e-4, jnp.float32), jnp.full(N, 1e30, jnp.float32))
    prev = config.accel_mode
    try:
        config.accel_mode = "pallas"
        hp = intersect(sd, *args)
        config.accel_mode = "scan"
        hs = intersect(sd, *args)
    finally:
        config.accel_mode = prev
    hp_tri, hs_tri = np.asarray(hp.tri), np.asarray(hs.tri)
    same = (hp_tri == hs_tri) & (hp_tri >= 0)
    assert same.sum() > 0.5 * N
    for a, b in ((hp.u, hs.u), (hp.v, hs.v), (hp.t, hs.t)):
        assert np.allclose(np.asarray(a)[same], np.asarray(b)[same],
                           rtol=1e-3, atol=1e-4)


def test_streamed_sweep_matches_resident():
    """The 2-D streamed kernel (mt_sweep, used when the soup exceeds
    the resident VMEM budget or accel is forced) agrees with the
    resident kernel."""
    import jax.numpy as jnp
    from nori_tpu.scenes_builtin import cornell_box
    from nori_tpu.accel.pallas_mt import (
        mt_sweep, mt_sweep_resident, pack_rays)

    scene = cornell_box(width=16, height=16, spp=1, sphere_subdiv=2)
    sd = scene.compile()
    rs = np.random.RandomState(7)
    N = 512
    o = (np.array([0, 1, 0], np.float32)
         + rs.randn(N, 3).astype(np.float32) * 0.4)
    d = rs.randn(N, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays, n = pack_rays(
        jnp.asarray(o), jnp.asarray(d),
        jnp.full(N, 1e-4, jnp.float32), jnp.full(N, 1e30, jnp.float32))
    t0, i0 = mt_sweep_resident(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rays)
    t1, i1, u1, v1 = mt_sweep(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rays)
    i0, i1 = np.asarray(i0), np.asarray(i1)
    assert np.array_equal(i0, i1)
    hit = i0 >= 0
    assert np.allclose(np.asarray(t0)[hit], np.asarray(t1)[hit],
                       rtol=1e-6)
    # any-hit form of the streamed kernel
    ta, ia, _, _ = mt_sweep(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rays,
        any_hit=True)
    assert np.array_equal(np.asarray(ia) >= 0, hit)
