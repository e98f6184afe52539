"""Component-level cost probe for the resident sweep machinery on the
dumped living-room bounce distribution (/tmp/lr_rays.npz from 016).

Answers:
  - entry-key cost (slab pass + per-ray-tile sort) alone
  - sweep launch floor (all-idle rays)
  - lane_sort_keys kernel alone vs the 2-key lax.sort alone
  - TILE_N=128/512 ray tiles (run in fresh processes: argv[1])
  - single-key vs two-key lax.sort cost
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

import nori_tpu.accel.pallas_mt as pm

if len(sys.argv) > 1:
    pm.TILE_N = int(sys.argv[1])
print(f"TILE_N={pm.TILE_N} FINE_T={pm.FINE_T}")

import nori_tpu.scenes_builtin as sb

scene = sb.living_room(width=1280, height=720, spp=8, detail=5)
sd = scene.compile()

d = np.load("/tmp/lr_rays.npz")
o = jnp.asarray(d["o"]); dv = jnp.asarray(d["d"])
mint = jnp.asarray(d["mint"]); maxt = jnp.asarray(d["maxt"])
N = o.shape[0]


def timeit(f, *a, reps=16):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / reps * 1e3


@jax.jit
def keys_only(sd, o, dv, mint, maxt):
    rp, _ = pm.pack_rays(o, dv, mint, maxt, pad_to=pm.TILE_N)
    return pm.lane_sort_keys(sd.tri_tile_bounds, rp)


@jax.jit
def sort2_only(k1, k2):
    iota = jnp.arange(N, dtype=jnp.int32)
    _, _, p = jax.lax.sort((k1, k2, iota), num_keys=2)
    return p


@jax.jit
def sort1_only(k1):
    iota = jnp.arange(N, dtype=jnp.int32)
    _, p = jax.lax.sort((k1, iota), num_keys=1)
    return p


@jax.jit
def entry_only(sd, o, dv, mint, maxt):
    rp, _ = pm.pack_rays(o, dv, mint, maxt, pad_to=pm.TILE_N)
    return pm.ray_tile_entry_keys(sd.tri_tile_bounds, rp)[0]


k1, k2 = keys_only(sd, o, dv, mint, maxt)
k1, k2 = k1[:N], k2[:N]
perm = sort2_only(k1, k2)
o2, d2, m2, x2 = o[perm], dv[perm], mint[perm], maxt[perm]


@jax.jit
def sweep_sorted(sd, o, dv, mint, maxt):
    rp, _ = pm.pack_rays(o, dv, mint, maxt, pad_to=pm.TILE_N)
    return pm.mt_sweep_resident(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp)


@jax.jit
def sweep_any_sorted(sd, o, dv, mint, maxt):
    rp, _ = pm.pack_rays(o, dv, mint, maxt, pad_to=pm.TILE_N)
    return pm.mt_sweep_resident(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp,
        any_hit=True)


idle_mint = jnp.ones_like(mint)
idle_maxt = jnp.full_like(maxt, -1.0)

print(f"lane keys kernel      : {timeit(keys_only, sd, o, dv, mint, maxt):.2f} ms")
print(f"2-key lax.sort        : {timeit(sort2_only, k1, k2):.2f} ms")
print(f"1-key lax.sort        : {timeit(sort1_only, k1):.2f} ms")
print(f"entry keys (rt x tt)  : {timeit(entry_only, sd, o, dv, mint, maxt):.2f} ms")
print(f"closest sweep (sorted): {timeit(sweep_sorted, sd, o2, d2, m2, x2):.2f} ms")
print(f"any-hit sweep (sorted): {timeit(sweep_any_sorted, sd, o2, d2, m2, x2):.2f} ms")
print(f"sweep floor (all idle): {timeit(sweep_sorted, sd, o, dv, idle_mint, idle_maxt):.2f} ms")

from nori_tpu.profiling import candidate_stats
s = candidate_stats(sd, o2, d2, m2, x2)
print(f"union pairs/ray sorted: {s['union_pairs_per_ray']:.0f} "
      f"(lane {s['lane_pairs_per_ray']:.0f}, ray tiles {N//pm.TILE_N})")
