"""Invariants of the prekeyed sweep path (candidate tables carried
through the wavefront's coherence sort instead of per-sweep slab
passes).

Correctness hinges on two properties, each pinned here against exact
oracles in interpret mode:

* candidacy is NEVER under-inclusive: a tile some lane's slab test
  accepts must appear in the derived per-ray-tile candidate set —
  a missed closest-hit tile is a wrong image, a missed shadow tile is
  a light leak;
* the packed keys' entry words are true LOWER bounds on any lane's
  slab entry t, so the resident kernel's skyline exit stays
  conservative (same argument as the exact-entry scheme).
"""

import numpy as np
import jax.numpy as jnp

from nori_tpu.scenes_builtin import living_room
from nori_tpu.accel.traverse import intersect_brute
from nori_tpu.accel.pallas_mt import (
    TILE_N, box_gap_lb, lane_sort_keys, lane_sort_keys_masks,
    lane_mask_words, mt_sweep_resident, mt_sweep_resident_keyed,
    pack_rays, per_rt_bounds, rt_cand_from_lane_masks,
    shadow_segment_keys, sorted_keys_from_cand_lb,
)

import pytest


@pytest.fixture(scope="module")
def sd():
    s = living_room(width=32, height=32, spp=1, detail=3).compile()
    assert s.tri_tile_bounds.shape[0] > 28
    return s


@pytest.fixture(scope="module")
def rays(sd):
    rng = np.random.RandomState(3)
    n = 2 * TILE_N
    center = np.asarray(sd.scene_bounds)[0, 0:3]
    half = float(np.asarray(sd.scene_bounds)[0, 3])
    o = center + (rng.rand(n, 3).astype(np.float32) - 0.5) * half
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    mint = np.full((n,), 1e-4, np.float32)
    maxt = np.full((n,), 1e30, np.float32)
    mint[::13], maxt[::13] = 1.0, -1.0   # idle lanes
    return (jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(mint), jnp.asarray(maxt))


def _exact_lane_cand_entry(sd, rp):
    """Oracle per-lane slab candidacy + entry distances (N, n_tt)."""
    tb = np.asarray(sd.tri_tile_bounds)
    o = np.asarray(rp[0:3]).T[:, None, :]
    dv = np.asarray(rp[3:6]).T[:, None, :]
    mint = np.asarray(rp[6])[:, None]
    maxt = np.asarray(rp[7])[:, None]
    inv = 1.0 / np.where(np.abs(dv) < 1e-20,
                         np.where(dv < 0, -1e-20, 1e-20), dv)
    t0 = (tb[None, :, 0:3] - o) * inv
    t1 = (tb[None, :, 3:6] - o) * inv
    tn = np.max(np.minimum(t0, t1), -1)
    tf = np.min(np.maximum(t0, t1), -1)
    cand = (tn <= tf) & (tf >= mint) & (tn <= maxt) & (mint <= maxt)
    return cand, np.maximum(tn, 0.0)


def test_mask_words_match_lane_mask_oracle(sd, rays):
    o, d, mint, maxt = rays
    rp, _ = pack_rays(o, d, mint, maxt)
    k1, k2, masks = lane_sort_keys_masks(sd.tri_tile_bounds, rp)
    ref = lane_mask_words(sd.tri_tile_bounds, rp)
    assert np.array_equal(np.asarray(masks), np.asarray(ref))
    r1, r2 = lane_sort_keys(sd.tri_tile_bounds, rp)
    assert np.array_equal(np.asarray(k1), np.asarray(r1))
    assert np.array_equal(np.asarray(k2), np.asarray(r2))


def test_rt_cand_is_exact_or_of_lane_slabs(sd, rays):
    o, d, mint, maxt = rays
    rp, _ = pack_rays(o, d, mint, maxt)
    n_tt = sd.tri_tile_bounds.shape[0]
    _, _, masks = lane_sort_keys_masks(sd.tri_tile_bounds, rp)
    cand_rt = np.asarray(rt_cand_from_lane_masks(masks, n_tt))
    lane_cand, _ = _exact_lane_cand_entry(sd, rp)
    ref = lane_cand.reshape(-1, TILE_N, n_tt).any(axis=1)
    assert np.array_equal(cand_rt, ref)


def test_box_gap_lb_is_conservative(sd, rays):
    o, d, mint, maxt = rays
    rp, _ = pack_rays(o, d, mint, maxt)
    lane_cand, lane_entry = _exact_lane_cand_entry(sd, rp)
    live = np.asarray(rp[6]) <= np.asarray(rp[7])
    lo, hi = per_rt_bounds(jnp.asarray(rp[0:3]).T, jnp.asarray(live))
    lb = np.asarray(box_gap_lb(lo, hi, sd.tri_tile_bounds))
    # for every candidate (lane, tile) with real geometry: lb <= exact
    # entry.  Fully-padded tiles carry INVERTED (+inf/-inf) bounds —
    # they pass every slab test with entry 0 but hold only sentinel
    # triangles, so the geometric bounds may (correctly) skip them.
    tb = np.asarray(sd.tri_tile_bounds)
    real_tile = tb[:, 0] <= tb[:, 3]
    rt = np.repeat(np.arange(lb.shape[0]), TILE_N)
    mask = lane_cand & live[:, None] & real_tile[None, :]
    slack = 1e-3 + 1e-3 * np.abs(lane_entry)
    assert np.all(lb[rt][mask] * 0.999
                  <= lane_entry[mask] + slack[mask])


def test_keyed_sweep_matches_plain_resident(sd, rays):
    o, d, mint, maxt = rays
    oracle = intersect_brute(sd, o, d, mint, maxt)
    rp, n = pack_rays(o, d, mint, maxt)
    n_tt = sd.tri_tile_bounds.shape[0]
    _, _, masks = lane_sort_keys_masks(sd.tri_tile_bounds, rp)
    cand = rt_cand_from_lane_masks(masks, n_tt)
    live = rp[6] <= rp[7]
    lo, hi = per_rt_bounds(rp[0:3].T, live)
    lb = box_gap_lb(lo, hi, sd.tri_tile_bounds)
    keys, ib = sorted_keys_from_cand_lb(cand, lb, n_tt)
    t, idx = mt_sweep_resident_keyed(sd.tri_packed, keys, ib, rp)
    t, idx = t[:n], idx[:n]
    v = np.asarray(oracle.valid)
    assert np.array_equal(np.asarray(idx >= 0), v)
    assert np.array_equal(np.asarray(idx)[v], np.asarray(oracle.tri)[v])
    np.testing.assert_allclose(
        np.asarray(t)[v], np.asarray(oracle.t)[v], rtol=1e-5)


def test_shadow_segment_keys_cover_exact_candidates(sd):
    """Segment-bundle candidacy must be a SUPERSET of every ok lane's
    slab candidacy (under-inclusion = light leak)."""
    rng = np.random.RandomState(7)
    n = 2 * TILE_N
    center = np.asarray(sd.scene_bounds)[0, 0:3]
    half = float(np.asarray(sd.scene_bounds)[0, 3])
    # clustered receivers (coherence-sorted lanes cluster in space)
    p = (center + (rng.rand(n // TILE_N, 1, 3) - 0.5) * half
         + (rng.rand(n, 3).reshape(-1, TILE_N, 3) - 0.5) * 0.2 * half
         ).reshape(n, 3).astype(np.float32)
    y = (center + np.float32([0.1, 0.4, 0.0])
         + (rng.rand(n, 3).astype(np.float32) - 0.5) * 0.05 * half)
    ok = rng.rand(n) < 0.6
    dvec = y - p
    dist = np.linalg.norm(dvec, axis=1)
    wo = dvec / dist[:, None]
    mint = np.full((n,), 1e-4, np.float32)
    maxt = np.where(ok, dist * (1 - 1e-4), -1.0).astype(np.float32)
    rp, _ = pack_rays(jnp.asarray(p), jnp.asarray(wo),
                      jnp.asarray(mint), jnp.asarray(maxt))
    lane_cand, _ = _exact_lane_cand_entry(sd, rp)
    keys, ib = shadow_segment_keys(
        sd.tri_tile_bounds, jnp.asarray(p), jnp.asarray(y),
        jnp.asarray(ok))
    n_tt = sd.tri_tile_bounds.shape[0]
    idx_mask = (1 << ib) - 1
    kk = np.asarray(keys)
    inf_bits = np.float32(np.inf).view(np.int32)
    cand_rt = np.zeros((kk.shape[0], n_tt), bool)
    for r in range(kk.shape[0]):
        for kword in kk[r]:
            if (kword & ~idx_mask) < (inf_bits & ~idx_mask):
                cand_rt[r, kword & idx_mask] = True
    tb = np.asarray(sd.tri_tile_bounds)
    real_tile = tb[:, 0] <= tb[:, 3]     # see box-gap test
    lane_rt = (lane_cand & ok[:, None]).reshape(-1, TILE_N, n_tt)
    missing = lane_rt.any(axis=1) & ~cand_rt & real_tile[None, :]
    assert not missing.any(), np.argwhere(missing)[:5]


def test_wavefront_prekeyed_gate(sd):
    """living_room at detail>=3 takes the prekeyed path (on TPU, or on
    CPU under the interpret-force flag); the stepper state must carry
    mask words sized to the padded tile count."""
    from nori_tpu import config
    from nori_tpu.wavefront import make_wavefront_stepper
    from nori_tpu.integrators.path import MIS

    scene = living_room(width=32, height=32, spp=2, detail=3)
    old = (config.FORCE_PALLAS_INTERPRET, config.PREKEYED_SWEEPS)
    config.FORCE_PALLAS_INTERPRET = True
    config.PREKEYED_SWEEPS = True
    try:
        init, step, n_act, _ = make_wavefront_stepper(
            scene, MIS, n_lanes=512, chunk=1024, sort_rays=True)
        carry = init(jnp.uint32(1), jnp.uint32(0), jnp.uint32(1024))
        assert "cmask" in carry[0]
        n_tt = scene.compile().tri_tile_bounds.shape[0]
        assert carry[0]["cmask"].shape == (
            512, (-(-n_tt // 128) * 128) // 32)
        carry = step(scene.compile(), carry, jnp.uint32(1))
        assert "cmask" in carry[0]
        assert int(n_act(carry)) > 0
    finally:
        config.FORCE_PALLAS_INTERPRET, config.PREKEYED_SWEEPS = old


def test_wavefront_prekeyed_render_matches_plain(sd):
    """End-to-end: the prekeyed wavefront (forced in interpret mode)
    must match the unsorted plain-machinery render.  On CPU the plain
    path runs the brute scan — a DIFFERENT kernel whose closest-hit
    fold associates float ops differently — so the comparison is
    last-ULP tolerant (observed: <= 6e-8 on a handful of pixels).  On
    TPU, where both paths run the same resident kernel, prekeyed vs
    plain is bit-identical (verified on hardware)."""
    from nori_tpu import config
    from nori_tpu.wavefront import render_wavefront

    scene = living_room(width=24, height=24, spp=2, detail=3)
    old = (config.FORCE_PALLAS_INTERPRET, config.PREKEYED_SWEEPS)
    config.FORCE_PALLAS_INTERPRET = True
    config.PREKEYED_SWEEPS = True
    try:
        a, _ = render_wavefront(scene, n_lanes=512, seed=7,
                                sort_rays=True)
    finally:
        config.FORCE_PALLAS_INTERPRET, config.PREKEYED_SWEEPS = old
    scene2 = living_room(width=24, height=24, spp=2, detail=3)
    b, _ = render_wavefront(scene2, n_lanes=512, seed=7,
                            sort_rays=False)
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-7)
