"""Interpret-mode coverage for TPU-only intersection paths.

The resident Pallas sweep, its MXU variant and the big-scene sort-key
machinery only execute on TPU in production (config.resolve_accel
dispatches CPU runs to the scan path), so a CPU-green suite can miss
epilogue-contract bugs in them — the round-2 (u, v) regression
escaped exactly this way.  These tests force the Pallas kernels in
interpret mode and pin their contracts against the brute-force oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nori_tpu.scenes_builtin import cornell_box
from nori_tpu.accel.traverse import intersect_brute, _intersect_pallas
from nori_tpu.accel.pallas_mt import (
    FINE_T, TILE_N, mt_sweep_resident, pack_rays, ray_tile_entry_keys)


@pytest.fixture(scope="module")
def sd():
    return cornell_box(width=32, height=32, spp=1,
                       sphere_subdiv=2).compile()


@pytest.fixture(scope="module")
def rays(sd):
    # mixed population: coherent primaries + incoherent bounce-like
    rng = np.random.RandomState(11)
    n = 2 * TILE_N
    center = np.asarray(sd.scene_bounds)[0, 0:3]
    half = float(np.asarray(sd.scene_bounds)[0, 3])
    o = center + (rng.rand(n, 3).astype(np.float32) - 0.5) * half
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    mint = np.full((n,), 1e-4, np.float32)
    maxt = np.full((n,), 1e30, np.float32)
    # a few degenerate/idle lanes (mint > maxt) like the wavefront's
    mint[::17], maxt[::17] = 1.0, -1.0
    return (jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(mint), jnp.asarray(maxt))


def test_resident_sweep_matches_brute(sd, rays):
    o, d, mint, maxt = rays
    oracle = intersect_brute(sd, o, d, mint, maxt)
    rp, n = pack_rays(o, d, mint, maxt)
    t, idx = mt_sweep_resident(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp)
    t, idx = t[:n], idx[:n]
    assert np.array_equal(np.asarray(idx >= 0), np.asarray(oracle.valid))
    v = np.asarray(oracle.valid)
    assert np.array_equal(np.asarray(idx)[v], np.asarray(oracle.tri)[v])
    np.testing.assert_allclose(
        np.asarray(t)[v], np.asarray(oracle.t)[v], rtol=1e-5)


@pytest.mark.parametrize("visit_w", [1, 2, 4])
def test_resident_sweep_visit_widths(sd, rays, visit_w):
    # W-wide candidate visits over-test at the walk boundary (clamped
    # ranks re-test folded or non-candidate tiles); the fold must stay
    # exact for every width
    o, d, mint, maxt = rays
    oracle = intersect_brute(sd, o, d, mint, maxt)
    rp, n = pack_rays(o, d, mint, maxt)
    t, idx = mt_sweep_resident(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp,
        visit_w=visit_w)
    t, idx = t[:n], idx[:n]
    v = np.asarray(oracle.valid)
    assert np.array_equal(np.asarray(idx >= 0), v)
    assert np.array_equal(np.asarray(idx)[v], np.asarray(oracle.tri)[v])
    np.testing.assert_allclose(
        np.asarray(t)[v], np.asarray(oracle.t)[v], rtol=1e-5)


def test_resident_sweep_any_hit(sd, rays):
    o, d, mint, maxt = rays
    oracle = intersect_brute(sd, o, d, mint, maxt)
    rp, n = pack_rays(o, d, mint, maxt)
    t, idx = mt_sweep_resident(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp,
        any_hit=True)
    # any-hit promises only the hit/miss bit
    assert np.array_equal(
        np.asarray(idx[:n] >= 0), np.asarray(oracle.valid))


def test_intersect_pallas_epilogue_contract(sd, rays):
    # the resident kernel returns (t, idx) ONLY; _intersect_pallas must
    # reconstruct valid barycentrics for every hit (the round-2 u=v=0
    # regression broke fill_interaction for non-wavefront consumers)
    o, d, mint, maxt = rays
    hit = _intersect_pallas(sd, o, d, mint, maxt)
    oracle = intersect_brute(sd, o, d, mint, maxt)
    v = np.asarray(oracle.valid)
    np.testing.assert_allclose(
        np.asarray(hit.u)[v], np.asarray(oracle.u)[v], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(hit.v)[v], np.asarray(oracle.v)[v], atol=1e-4)


def test_resident_sweep_mxu_variant(sd, rays):
    o, d, mint, maxt = rays
    oracle = intersect_brute(sd, o, d, mint, maxt)
    rp, n = pack_rays(o, d, mint, maxt)
    t, idx = mt_sweep_resident(
        sd.tri_mxu, sd.tri_tile_bounds, sd.scene_bounds, rp,
        use_mxu=True)
    t, idx = t[:n], idx[:n]
    v = np.asarray(oracle.valid)
    # fp32 matmul accumulation: same hits, slightly looser t
    assert np.array_equal(np.asarray(idx >= 0), np.asarray(oracle.valid))
    np.testing.assert_allclose(
        np.asarray(t)[v], np.asarray(oracle.t)[v], rtol=1e-4)


def test_resident_sweep_bw_variant(sd, rays):
    # Baldwin-Weber transform path (config.USE_BW_SWEEP): same hit SET
    # as Moller-Trumbore (the |n.d| cutoff equals MT's |det| cutoff),
    # t differs only at ULP level
    o, d, mint, maxt = rays
    oracle = intersect_brute(sd, o, d, mint, maxt)
    rp, n = pack_rays(o, d, mint, maxt)
    t, idx = mt_sweep_resident(
        sd.tri_bw, sd.tri_tile_bounds, sd.scene_bounds, rp,
        use_bw=True)
    t, idx = t[:n], idx[:n]
    v = np.asarray(oracle.valid)
    assert np.array_equal(np.asarray(idx >= 0), v)
    # t comes from the plane equation instead of MT's scaled triple
    # product: equal to a few ULPs, not to MT's own rounding
    np.testing.assert_allclose(
        np.asarray(t)[v], np.asarray(oracle.t)[v], rtol=1e-4, atol=1e-5)
    # the closest-hit WINNER may legitimately flip between the two
    # formulas when two candidates' t values near-tie (observed
    # bit-identical on this fixture, but don't pin that): accept a
    # winner mismatch only where the oracle shows a near-tie
    got_i = np.asarray(idx)[v]
    ref_i = np.asarray(oracle.tri)[v]
    mism = got_i != ref_i
    if mism.any():
        tt = np.asarray(t)[v][mism]
        rt = np.asarray(oracle.t)[v][mism]
        np.testing.assert_allclose(tt, rt, rtol=1e-5, atol=1e-6)


def test_resident_sweep_bw_any_hit(sd, rays):
    o, d, mint, maxt = rays
    oracle = intersect_brute(sd, o, d, mint, maxt)
    rp, n = pack_rays(o, d, mint, maxt)
    _, idx = mt_sweep_resident(
        sd.tri_bw, sd.tri_tile_bounds, sd.scene_bounds, rp,
        any_hit=True, use_bw=True)
    assert np.array_equal(
        np.asarray(idx[:n] >= 0), np.asarray(oracle.valid))


def test_lane_sort_key_kernel_matches_jnp(sd, rays):
    # the Pallas first3-key kernel (TPU production path for the
    # wavefront coherence sort) must agree with the jnp fallback
    from nori_tpu import config
    from nori_tpu.accel.pallas_mt import lane_sort_keys

    o, d, mint, maxt = rays
    rp, n = pack_rays(o, d, mint, maxt)
    ref1, ref2 = lane_sort_keys(sd.tri_tile_bounds, rp)
    config.FORCE_PALLAS_INTERPRET = True
    try:
        got1, got2 = lane_sort_keys(sd.tri_tile_bounds, rp)
    finally:
        config.FORCE_PALLAS_INTERPRET = False
    assert np.array_equal(np.asarray(ref1), np.asarray(got1))
    assert np.array_equal(np.asarray(ref2), np.asarray(got2))


def test_occluded_presort_matches_plain(sd, rays):
    # the shadow query's own-sort path must be a pure perf transform
    from nori_tpu.accel.traverse import occluded
    from nori_tpu import config

    o, d, mint, maxt = rays
    old = config.accel_mode
    config.accel_mode = "pallas"
    try:
        plain = occluded(sd, o, d, mint, maxt, presort=False)
        sorted_ = occluded(sd, o, d, mint, maxt, presort=True)
    finally:
        config.accel_mode = old
    assert np.array_equal(np.asarray(plain), np.asarray(sorted_))


def test_streamed_sweep_matches_brute(sd, rays):
    # the HBM-streamed kernel (ajax-scale production path) in
    # interpret mode, with tile bounds rebuilt at its DMA granularity
    from nori_tpu.accel.pallas_mt import STREAM_T, mt_sweep_streamed

    o, d, mint, maxt = rays
    oracle = intersect_brute(sd, o, d, mint, maxt)
    rp, n = pack_rays(o, d, mint, maxt)
    # coarsen the scene's FINE_T bounds to STREAM_T groups
    tb = np.asarray(sd.tri_tile_bounds)
    grp = STREAM_T // FINE_T
    n_tt = tb.shape[0] // grp
    tb_s = np.zeros((n_tt, 8), np.float32)
    tb_s[:, 0:3] = tb[:n_tt * grp, 0:3].reshape(n_tt, grp, 3).min(1)
    tb_s[:, 3:6] = tb[:n_tt * grp, 3:6].reshape(n_tt, grp, 3).max(1)
    t, idx = mt_sweep_streamed(
        sd.tri_packed[:, :n_tt * grp * FINE_T], jnp.asarray(tb_s), rp)
    t, idx = t[:n], idx[:n]
    # oracle restricted to the covered triangle range
    cover = n_tt * grp * FINE_T
    vo = np.asarray(oracle.valid) & (np.asarray(oracle.tri) < cover)
    assert np.array_equal(np.asarray(idx >= 0), vo)
    np.testing.assert_allclose(
        np.asarray(t)[vo], np.asarray(oracle.t)[vo], rtol=1e-5)


def test_streamed_sweep_bw_matches_mt(sd, rays):
    # the Baldwin-Weber streamed operand (production default for
    # streamed-scale scenes, traverse._sweep_any) must produce the
    # SAME hit set as the MT layout: the |n.d| cutoff equals |det|
    from nori_tpu.accel.pallas_mt import STREAM_T, mt_sweep_streamed

    o, d, mint, maxt = rays
    rp, n = pack_rays(o, d, mint, maxt)
    tb = np.asarray(sd.tri_tile_bounds)
    grp = STREAM_T // FINE_T
    n_tt = tb.shape[0] // grp
    tb_s = np.zeros((n_tt, 8), np.float32)
    tb_s[:, 0:3] = tb[:n_tt * grp, 0:3].reshape(n_tt, grp, 3).min(1)
    tb_s[:, 3:6] = tb[:n_tt * grp, 3:6].reshape(n_tt, grp, 3).max(1)
    cover = n_tt * grp * FINE_T
    t0, i0 = mt_sweep_streamed(
        sd.tri_packed[:, :cover], jnp.asarray(tb_s), rp)
    t1, i1 = mt_sweep_streamed(
        sd.tri_bw[:, :cover], jnp.asarray(tb_s), rp, use_bw=True)
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    hit = np.asarray(i0) >= 0
    # t is rounded through different arithmetic (plane equation vs MT
    # determinant ratio): identical hit SET, ULP-scale t differences
    np.testing.assert_allclose(
        np.asarray(t1)[hit], np.asarray(t0)[hit], rtol=1e-4)


def test_entry_keys_cover_all_candidates(sd, rays):
    # the packed-key table must include every candidate tile of every
    # ray tile, in ascending entry order, with a conservative bound
    o, d, mint, maxt = rays
    rp, _ = pack_rays(o, d, mint, maxt)
    keys, idx_bits = ray_tile_entry_keys(sd.tri_tile_bounds, rp)
    keys = np.asarray(keys)
    mask = (1 << idx_bits) - 1
    n_tt = sd.tri_tile_bounds.shape[0]

    # reference: exact per-ray-tile candidate set from the slab tests
    tb = np.asarray(sd.tri_tile_bounds)
    o_, d_ = np.asarray(rp[0:3]).T, np.asarray(rp[3:6]).T
    mn, mx = np.asarray(rp[6]), np.asarray(rp[7])
    inv = 1.0 / np.where(np.abs(d_) < 1e-20,
                         np.where(d_ < 0, -1e-20, 1e-20), d_)
    t0 = (tb[None, :, 0:3] - o_[:, None]) * inv[:, None]
    t1 = (tb[None, :, 3:6] - o_[:, None]) * inv[:, None]
    tn = np.max(np.minimum(t0, t1), -1)
    tf = np.min(np.maximum(t0, t1), -1)
    cand = ((tn <= tf) & (tf >= mn[:, None]) & (tn <= mx[:, None])
            & (mn <= mx)[:, None])
    entry = np.where(cand, np.maximum(tn, 0.0), np.inf)
    n_rt = cand.shape[0] // TILE_N
    for rt in range(n_rt):
        seg = entry[rt * TILE_N:(rt + 1) * TILE_N]
        want = np.min(seg, axis=0)
        finite = np.isfinite(want)
        row = keys[rt]
        got_idx = row & mask
        lb = (row & ~mask).view(np.float32) if row.dtype == np.int32 \
            else None
        lb = np.asarray(row & ~np.int32(mask)).view(np.float32)
        k_fin = np.isfinite(lb)
        # every true candidate tile appears among the finite-bound keys
        assert set(np.nonzero(finite)[0]) == set(got_idx[k_fin])
        # ascending order and conservative bounds
        assert np.all(np.diff(lb[k_fin]) >= 0)
        assert np.all(lb[k_fin] <= want[got_idx[k_fin]] + 1e-6)


@pytest.mark.parametrize("cap", [1, 2, 4])
def test_resident_sweep_key_cap_overflow(sd, rays, cap):
    # K-capped candidate rows (ray_tile_entry_keys cap column): tiny
    # caps force most rows through the kernel's exact all-tiles
    # fallback loop; results must be bit-identical to the uncapped
    # walk for both query types
    o, d, mint, maxt = rays
    rp, n = pack_rays(o, d, mint, maxt)
    t0, i0 = mt_sweep_resident(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp)
    t1, i1 = mt_sweep_resident(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp,
        key_cap=cap)
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    v = np.asarray(i0) >= 0
    assert np.array_equal(np.asarray(t0)[v], np.asarray(t1)[v])
    _, a0 = mt_sweep_resident(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp,
        any_hit=True)
    _, a1 = mt_sweep_resident(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp,
        any_hit=True, key_cap=cap)
    assert np.array_equal(np.asarray(a0) >= 0, np.asarray(a1) >= 0)


def test_capped_entry_keys_flag_exactness(sd, rays):
    # the overflow flag must be set IFF the row holds more candidates
    # than the cap (the kernels' fallback correctness hinges on it)
    o, d, mint, maxt = rays
    rp, _ = pack_rays(o, d, mint, maxt)
    full, idx_bits = ray_tile_entry_keys(sd.tri_tile_bounds, rp)
    mask = (1 << idx_bits) - 1
    n_tt = sd.tri_tile_bounds.shape[0]
    counts = np.sum(
        np.asarray(full & ~np.int32(mask)).view(np.float32)
        < np.inf, axis=1)
    cap = 2
    assert cap + 1 < n_tt, "fixture scene too small for this test"
    capped, _ = ray_tile_entry_keys(sd.tri_tile_bounds, rp, cap=cap)
    capped = np.asarray(capped)
    assert capped.shape[1] == cap + 1
    assert np.array_equal(capped[:, cap] != 0, counts > cap)
    # stored keys are exactly the cap nearest-entry ones
    assert np.array_equal(capped[:, :cap], np.asarray(full)[:, :cap])


def test_streamed_sweep_key_cap_overflow(sd, rays):
    # same contract for the HBM-streamed kernel: the fallback streams
    # every slab in index order with its own DMA chain
    from nori_tpu.accel.pallas_mt import STREAM_T, mt_sweep_streamed

    o, d, mint, maxt = rays
    rp, n = pack_rays(o, d, mint, maxt)
    tb = np.asarray(sd.tri_tile_bounds)
    grp = STREAM_T // FINE_T
    n_tt = tb.shape[0] // grp
    tb_s = np.zeros((n_tt, 8), np.float32)
    tb_s[:, 0:3] = tb[:n_tt * grp, 0:3].reshape(n_tt, grp, 3).min(1)
    tb_s[:, 3:6] = tb[:n_tt * grp, 3:6].reshape(n_tt, grp, 3).max(1)
    tris = sd.tri_packed[:, :n_tt * grp * FINE_T]
    t0, i0 = mt_sweep_streamed(tris, jnp.asarray(tb_s), rp)
    t1, i1 = mt_sweep_streamed(tris, jnp.asarray(tb_s), rp, key_cap=1)
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    v = np.asarray(i0) >= 0
    assert np.array_equal(np.asarray(t0)[v], np.asarray(t1)[v])


def test_streamed_sweep_subslab_cull_matches_brute(sd, rays):
    # the sub-slab culling branch (n_sub > 1: per-128-tri AABB gates
    # inside each DMA'd slab) — a measured NEGATIVE result kept for
    # hardware with cheaper scalar branches (config.STREAM_CULL_T);
    # must stay EXACT.  Requires the MT operand (use_bw=False): the
    # sub-block AABBs come from the [v0|e1|e2] rows.
    from nori_tpu.accel.pallas_mt import STREAM_T, mt_sweep_streamed

    o, d, mint, maxt = rays
    oracle = intersect_brute(sd, o, d, mint, maxt)
    rp, n = pack_rays(o, d, mint, maxt)
    tb = np.asarray(sd.tri_tile_bounds)
    grp = STREAM_T // FINE_T
    n_tt = tb.shape[0] // grp
    tb_s = np.zeros((n_tt, 8), np.float32)
    tb_s[:, 0:3] = tb[:n_tt * grp, 0:3].reshape(n_tt, grp, 3).min(1)
    tb_s[:, 3:6] = tb[:n_tt * grp, 3:6].reshape(n_tt, grp, 3).max(1)
    cover = n_tt * grp * FINE_T
    t, idx = mt_sweep_streamed(
        sd.tri_packed[:, :cover], jnp.asarray(tb_s), rp, cull_t=128)
    t, idx = t[:n], idx[:n]
    vo = np.asarray(oracle.valid) & (np.asarray(oracle.tri) < cover)
    assert np.array_equal(np.asarray(idx >= 0), vo)
    np.testing.assert_allclose(
        np.asarray(t)[vo], np.asarray(oracle.t)[vo], rtol=1e-5)
    # and the config-resolved path must see a live config value (the
    # non-jitted wrapper resolves STREAM_CULL_T outside the jit cache)
    from nori_tpu import config
    old = config.STREAM_CULL_T
    config.STREAM_CULL_T = 128
    try:
        t2, i2 = mt_sweep_streamed(
            sd.tri_packed[:, :cover], jnp.asarray(tb_s), rp)
    finally:
        config.STREAM_CULL_T = old
    assert np.array_equal(np.asarray(i2), np.asarray(idx))
