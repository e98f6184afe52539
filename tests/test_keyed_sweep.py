"""mt_sweep_resident_keyed: the caller-keyed resident sweep entry
point (a caller computes the packed candidate-key table once — e.g.
to share it across several sweeps — instead of paying the in-call
entry-key slab pass per sweep).

Pinned in interpret mode against the brute-force oracle: feeding the
keyed sweep the exact keys ray_tile_entry_keys produces must give the
SAME hits as the self-keying sweep and the oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nori_tpu import config
from nori_tpu.scenes_builtin import living_room
from nori_tpu.accel.traverse import intersect_brute
from nori_tpu.accel.pallas_mt import (
    TILE_N, mt_sweep_resident, mt_sweep_resident_keyed, pack_rays,
    ray_tile_entry_keys,
)


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


def test_keyed_sweep_matches_oracle_and_self_keyed(sd, rays):
    o, d, mint, maxt = rays
    rp, n = pack_rays(o, d, mint, maxt)
    old = config.FORCE_PALLAS_INTERPRET
    config.FORCE_PALLAS_INTERPRET = True
    try:
        keys, ib = ray_tile_entry_keys(sd.tri_tile_bounds, rp)
        t_k, i_k = mt_sweep_resident_keyed(sd.tri_packed, keys, ib, rp)
        t_s, i_s = mt_sweep_resident(
            sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp)
    finally:
        config.FORCE_PALLAS_INTERPRET = old
    ref = intersect_brute(sd, o, d, mint, maxt)
    assert np.array_equal(np.asarray(i_k), np.asarray(i_s))
    hit_k = np.asarray(i_k[:n] >= 0)
    assert np.array_equal(hit_k, np.asarray(ref.valid))
    np.testing.assert_allclose(
        np.asarray(t_k[:n])[hit_k], np.asarray(ref.t)[hit_k], rtol=1e-5)
    assert np.array_equal(np.asarray(i_k[:n])[hit_k],
                          np.asarray(ref.tri)[hit_k])


def test_keyed_sweep_any_hit(sd, rays):
    o, d, mint, maxt = rays
    rp, n = pack_rays(o, d, mint, maxt)
    old = config.FORCE_PALLAS_INTERPRET
    config.FORCE_PALLAS_INTERPRET = True
    try:
        keys, ib = ray_tile_entry_keys(sd.tri_tile_bounds, rp)
        _, i_k = mt_sweep_resident_keyed(
            sd.tri_packed, keys, ib, rp, any_hit=True)
    finally:
        config.FORCE_PALLAS_INTERPRET = old
    ref = intersect_brute(sd, o, d, mint, maxt)
    # any-hit agrees on WHETHER something is hit (not necessarily which)
    assert np.array_equal(np.asarray(i_k[:n] >= 0), np.asarray(ref.valid))
