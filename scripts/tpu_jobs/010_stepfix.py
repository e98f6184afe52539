"""Resident-sweep visit_w micro-benchmark on the dumped living-room
bounce distribution (sorted by the production first3 key), then the
full MIS step + e2e at the best width."""
import importlib
import time
import numpy as np
import jax
import jax.numpy as jnp

import nori_tpu.accel.pallas_mt as pm
importlib.reload(pm)

d = np.load("/tmp/lr_rays.npz")
o = jnp.asarray(d["o"]); dv = jnp.asarray(d["d"])
mint = jnp.asarray(d["mint"]); maxt = jnp.asarray(d["maxt"])
tb = jnp.asarray(d["tile_bounds"])

import nori_tpu.scenes_builtin as sb
lr = sb.living_room(width=1280, height=720, spp=8, detail=5)
sd = lr.compile()

rp, n = pm.pack_rays(o, dv, mint, maxt)
# production sort: first6 two-word lexicographic
k1, k2 = pm.lane_sort_keys(tb, rp)
k1, k2 = k1[:n], k2[:n]
iota = jnp.arange(n, dtype=jnp.int32)
_, _, perm = jax.lax.sort((k1, k2, iota), num_keys=2)
o2, d2 = o[perm], dv[perm]
m2, x2 = mint[perm], maxt[perm]
rp2, _ = pm.pack_rays(o2, d2, m2, x2)

for w in (1, 2, 4, 8):
    t_, i_ = pm.mt_sweep_resident(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp2,
        visit_w=w)
    jax.block_until_ready(i_)
    t0 = time.time()
    for _ in range(10):
        t_, i_ = pm.mt_sweep_resident(
            sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp2,
            visit_w=w)
    jax.block_until_ready(i_)
    dt = (time.time() - t0) / 10
    print(f"visit_w={w}: sweep {dt*1e3:.2f} ms "
          f"({n/dt/1e6:.1f} Mrays/s) hits={int(jnp.sum(i_ >= 0))}")

# any-hit flavor (shadow sweep) at 1 vs best
for w in (1, 2, 4):
    t_, i_ = pm.mt_sweep_resident(
        sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp2,
        any_hit=True, visit_w=w)
    jax.block_until_ready(i_)
    t0 = time.time()
    for _ in range(10):
        t_, i_ = pm.mt_sweep_resident(
            sd.tri_packed, sd.tri_tile_bounds, sd.scene_bounds, rp2,
            any_hit=True, visit_w=w)
    jax.block_until_ready(i_)
    dt = (time.time() - t0) / 10
    print(f"any_hit visit_w={w}: {dt*1e3:.2f} ms")
