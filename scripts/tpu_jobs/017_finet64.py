"""FINE_T=64 + visit_w scan on the dumped living-room bounce rays.

Finer candidate tiles halve the pairs swept per visit and shrink the
union (fewer false candidates per 256-lane ray tile), at the price of
2x slab work in the key kernels and 2x SMEM entry rows.  Monkeypatches
pallas_mt.FINE_T before any compile; needs /tmp/lr_rays.npz (016).

Run in a FRESH process (jit caches bake FINE_T into kernels).
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

import nori_tpu.accel.pallas_mt as pm

FT = int(sys.argv[1]) if len(sys.argv) > 1 else 64
pm.FINE_T = FT
if len(sys.argv) > 2:
    pm.TILE_N = int(sys.argv[2])
print(f"FINE_T={pm.FINE_T} TILE_N={pm.TILE_N}")

import nori_tpu.scenes_builtin as sb

scene = sb.living_room(width=1280, height=720, spp=8, detail=5)
sd = scene.compile()
print("tiles:", sd.tri_tile_bounds.shape[0])

d = np.load("/tmp/lr_rays.npz")
o = jnp.asarray(d["o"]); dv = jnp.asarray(d["d"])
mint = jnp.asarray(d["mint"]); maxt = jnp.asarray(d["maxt"])
N = o.shape[0]

# production first6 sort at THIS granularity
rp, n = pm.pack_rays(o, dv, mint, maxt)
t0 = time.time()
k1, k2 = pm.lane_sort_keys(sd.tri_tile_bounds, rp)
iota = jnp.arange(N, dtype=jnp.int32)
_, _, perm = jax.lax.sort((k1[:N], k2[:N], iota), num_keys=2)
jax.block_until_ready(perm)


def timeit(f, *a, reps=16):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / reps * 1e3


@jax.jit
def sortkeys(sd, rp):
    k1, k2 = pm.lane_sort_keys(sd.tri_tile_bounds, rp)
    iota = jnp.arange(N, dtype=jnp.int32)
    _, _, p = jax.lax.sort((k1[:N], k2[:N], iota), num_keys=2)
    return p


print(f"first6 keys+sort: {timeit(sortkeys, sd, rp):.2f} ms")

o2, d2 = o[perm], dv[perm]
m2, x2 = mint[perm], maxt[perm]
rp2, _ = pm.pack_rays(o2, d2, m2, x2)

for w in (2, 4, 8):
    def sweep(sd, rp2, w=w):
        return pm.mt_sweep_resident(
            sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp2,
            visit_w=w)
    t_, i_ = sweep(sd, rp2)
    jax.block_until_ready(i_)
    t0 = time.time()
    for _ in range(16):
        t_, i_ = sweep(sd, rp2)
    jax.block_until_ready(i_)
    dt = (time.time() - t0) / 16
    print(f"visit_w={w}: closest sweep {dt*1e3:.2f} ms "
          f"({N/dt/1e6:.1f} Mrays/s) hits={int(jnp.sum(i_ >= 0))}")
