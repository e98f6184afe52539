"""Mixed (merged closest+shadow) dual-query sweep contracts.

One pallas launch serves closest-hit ray tiles and any-hit ray tiles
via a prefetched per-ray-tile flag (pallas_mt.mt_sweep_resident_mixed,
scripts/tpu_jobs/README.md next-step design #2).  Interpret-mode
equivalence against the separate sweeps and the brute-force oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nori_tpu.scenes_builtin import cornell_box
from nori_tpu.accel.traverse import intersect_brute, intersect_mixed
from nori_tpu.accel.pallas_mt import (
    TILE_N, mt_sweep_resident, mt_sweep_resident_mixed, pack_rays)


@pytest.fixture(scope="module")
def sd():
    return cornell_box(width=32, height=32, spp=1,
                       sphere_subdiv=2).compile()


@pytest.fixture(scope="module")
def rays(sd):
    rng = np.random.RandomState(23)
    n = 3 * TILE_N
    center = np.asarray(sd.scene_bounds)[0, 0:3]
    half = float(np.asarray(sd.scene_bounds)[0, 3])
    o = center + (rng.rand(n, 3).astype(np.float32) - 0.5) * half
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    mint = np.full((n,), 1e-4, np.float32)
    maxt = np.full((n,), 1e30, np.float32)
    mint[::13], maxt[::13] = 1.0, -1.0   # idle lanes
    # shadow-like finite segments on a second population
    maxt2 = np.where(rng.rand(n) < 0.7, rng.rand(n).astype(np.float32)
                     * 2 * half, 1e30).astype(np.float32)
    return (jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(mint), jnp.asarray(maxt), jnp.asarray(maxt2))


def test_mixed_matches_separate_sweeps(sd, rays):
    o, d, mint, maxt, maxt2 = rays
    rp_c, _ = pack_rays(o, d, mint, maxt)
    rp_s, _ = pack_rays(o, d, mint, maxt2)
    t_ref, i_ref = mt_sweep_resident(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp_c)
    _, i_any = mt_sweep_resident(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp_s,
        any_hit=True)

    rays_all = jnp.concatenate([rp_c, rp_s], axis=1)
    n_rt_c = rp_c.shape[1] // TILE_N
    n_rt = rays_all.shape[1] // TILE_N
    flags = (jnp.arange(n_rt, dtype=jnp.int32) >= n_rt_c).astype(
        jnp.int32)
    t_m, i_m = mt_sweep_resident_mixed(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds,
        rays_all, flags)
    Nc = rp_c.shape[1]
    # closest half: exact agreement with the closest-only sweep
    assert np.array_equal(np.asarray(i_m[:Nc]), np.asarray(i_ref))
    v = np.asarray(i_ref >= 0)
    np.testing.assert_array_equal(
        np.asarray(t_m[:Nc])[v], np.asarray(t_ref)[v])
    # shadow half: same occlusion verdicts as the any-hit-only sweep
    assert np.array_equal(np.asarray(i_m[Nc:] >= 0),
                          np.asarray(i_any >= 0))


def test_mixed_closest_matches_oracle(sd, rays):
    o, d, mint, maxt, maxt2 = rays
    oracle = intersect_brute(sd, o, d, mint, maxt)
    occ_oracle = intersect_brute(sd, o, d, mint, maxt2).valid
    hit, occ = intersect_mixed(sd, o, d, mint, maxt, o, d, mint, maxt2)
    assert np.array_equal(np.asarray(hit.valid), np.asarray(oracle.valid))
    v = np.asarray(oracle.valid)
    assert np.array_equal(np.asarray(hit.tri)[v], np.asarray(oracle.tri)[v])
    np.testing.assert_allclose(
        np.asarray(hit.t)[v], np.asarray(oracle.t)[v], rtol=1e-5)
    assert np.array_equal(np.asarray(occ), np.asarray(occ_oracle))


def test_mixed_raw_contract(sd, rays):
    o, d, mint, maxt, maxt2 = rays
    hit, occ = intersect_mixed(sd, o, d, mint, maxt, o, d, mint, maxt2)
    t, idx, occ_r = intersect_mixed(
        sd, o, d, mint, maxt, o, d, mint, maxt2, raw=True)
    n = o.shape[0]
    assert np.array_equal(np.asarray(idx[:n] >= 0), np.asarray(hit.valid))
    assert np.array_equal(np.asarray(occ_r), np.asarray(occ))
    v = np.asarray(hit.valid)
    np.testing.assert_array_equal(
        np.asarray(t[:n])[v], np.asarray(hit.t)[v])


def test_merged_wavefront_bit_exact(monkeypatch):
    """The merged single-launch step must produce the SAME image as
    the two-launch step: vis enters through the same multiplicative
    where, and permutation commutes with the elementwise adds.

    On CPU the unmerged step's scan path returns brute-force (u, v)
    while the merged step reconstructs them through
    sweep_hit_epilogue (exactly as BOTH paths do on TPU, where the
    sweep kernels track only (t, idx)).  The ULP-level u/v difference
    re-seeds bounce directions and diverges paths chaotically, so the
    unmerged reference is pinned to the same epilogue here — the test
    then checks the merged BOOKKEEPING (pending-NEE carry, record
    surgery, hit carry across the permutation) bit-exactly."""
    from nori_tpu import config
    from nori_tpu import wavefront as wf
    from nori_tpu.accel import traverse as tv

    def intersect_epi(sd, o, d, mint, maxt):
        h = tv.intersect(sd, o, d, mint, maxt)
        rp, n = pack_rays(o, d, mint, maxt)
        t = jnp.where(h.valid, h.t, jnp.inf)
        idx = jnp.where(h.valid, h.tri, -1)
        return tv.sweep_hit_epilogue(sd, rp, t, idx, n)

    monkeypatch.setattr(wf, "intersect", intersect_epi)
    scene = cornell_box(width=24, height=16, spp=4, sphere_subdiv=2)
    img_ref, _ = wf.render_wavefront(scene, spp=4, n_lanes=4096, seed=3)
    scene2 = cornell_box(width=24, height=16, spp=4, sphere_subdiv=2)
    old = config.MERGED_SWEEP
    config.MERGED_SWEEP = True
    try:
        img_m, _ = wf.render_wavefront(scene2, spp=4, n_lanes=4096,
                                       seed=3)
    finally:
        config.MERGED_SWEEP = old
    assert np.array_equal(np.asarray(img_ref), np.asarray(img_m))


def test_merged_wavefront_unaligned_pool():
    """The merged step must handle n_lanes that is not a TILE_N
    multiple (pack_rays pads rays; the carried hits are padded to
    match) and produce the lane-count-independent image."""
    from nori_tpu import config
    from nori_tpu.wavefront import render_wavefront

    old = config.MERGED_SWEEP
    config.MERGED_SWEEP = True
    try:
        s1 = cornell_box(width=16, height=8, spp=2, sphere_subdiv=2)
        a, _ = render_wavefront(s1, spp=2, n_lanes=1000, seed=4)
        s2 = cornell_box(width=16, height=8, spp=2, sphere_subdiv=2)
        b, _ = render_wavefront(s2, spp=2, n_lanes=4096, seed=4)
    finally:
        config.MERGED_SWEEP = old
    assert np.array_equal(np.asarray(a), np.asarray(b))
