"""Shadow-sweep ordering A/B on the living-room steady state.

The r3 step breakdown (011): MIS step 24.2 ms = closest 7.3 +
shadow-with-own-first6-sort 11.4 + bounce first6 sort 6.55 + rest.
The sort machinery is now the bottleneck.  Hypothesis: shadow rays
(point-to-light segments) can be grouped by the CHEAP key
(origin hit-tile, light cell) computed from values the step already
has, replacing the 2-word first6 Pallas key kernel + 3-operand
lax.sort + inverse sort.  Also dumps /tmp/lr_rays.npz for job 010.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import nori_tpu.scenes_builtin as sb
from nori_tpu.integrators.path import MIS
import nori_tpu.wavefront as wf
from nori_tpu.accel.traverse import occluded, intersect, _sweep_any
from nori_tpu.accel.pallas_mt import pack_rays, lane_sort_keys, FINE_T
from nori_tpu.interaction import fill_interaction_fast
from nori_tpu.integrators.base import (
    sample_emitter_point_fast, shadow_ray_args)
from nori_tpu.core import rng
from nori_tpu.core.vecmath import dot
from nori_tpu.profiling import candidate_stats

scene = sb.living_room(width=1280, height=720, spp=8, detail=5)
sd = scene.compile()
scene.integrator.preprocess(scene)
N = 131072
init, step, n_act, fin = wf.make_wavefront_stepper(scene, MIS, N, 64 * N)
seed = jnp.uint32(0)
carry = init(seed, jnp.uint32(0), jnp.uint32(64 * N))
for _ in range(24):
    carry = step(sd, carry, seed)
st = carry[0]
o, d, mint, maxt = st["o"], st["d"], st["mint"], st["maxt"]
jax.block_until_ready(o)
np.savez("/tmp/lr_rays.npz", o=np.asarray(o), d=np.asarray(d),
         mint=np.asarray(mint), maxt=np.asarray(maxt),
         tile_bounds=np.asarray(sd.tri_tile_bounds))
print("dumped /tmp/lr_rays.npz")


@jax.jit
def mk_shadow(sd, st, seed):
    q, depth = st["q"], st["depth"]
    o, d, mint, maxt = st["o"], st["d"], st["mint"], st["maxt"]
    active = st["active"]
    hit = intersect(sd, o, d, mint, maxt)
    its = fill_interaction_fast(sd, hit, o, d)
    live_hit = active & its.valid
    du = depth.astype(jnp.uint32) * jnp.uint32(8)
    u_pick = rng.uniform(seed, q, du + jnp.uint32(1))
    u2 = rng.uniform2(seed, q, du + jnp.uint32(2))
    y, n_y, le_y, pdf_area = sample_emitter_point_fast(sd, u_pick, u2)
    wo_w, dist, smint, smaxt = shadow_ray_args(its.p, y)
    cos_l = dot(n_y, -wo_w)
    ok = (cos_l > 1e-8) & live_hit
    smaxt = jnp.where(ok, smaxt, -1.0)
    return its.p, wo_w, smint, smaxt, hit.tri, y


so, sdir, smint, smaxt, htri, ly = mk_shadow(sd, st, seed)
jax.block_until_ready(so)
n_ok = int(jnp.sum(smaxt >= smint))
print(f"shadow rays live: {n_ok}/{N}")

M = 16


def timeit(f, *a):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(M):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / M * 1e3


@jax.jit
def occ_prod(sd, o, d, mint, maxt):
    return occluded(sd, o, d, mint, maxt)


@jax.jit
def occ_nosort(sd, o, d, mint, maxt):
    return occluded(sd, o, d, mint, maxt, presort=False)


# cheap key: origin hit tile (tri // FINE_T) and the sampled light
# point's cell (3 bits/axis morton over the scene bbox)
@jax.jit
def cheap_key(sd, htri, ly, smint, smaxt):
    tile = jnp.maximum(htri, 0) // FINE_T
    lo = sd.scene_bounds[0, 0:3] - sd.scene_bounds[0, 3]
    scale = 8.0 / (2.0 * sd.scene_bounds[0, 3] + 1e-9)
    c = jnp.clip(((ly - lo[None]) * scale).astype(jnp.int32), 0, 7)
    cell = (c[:, 0] << 6) | (c[:, 1] << 3) | c[:, 2]
    key = (tile << 9) | cell
    return jnp.where(smaxt >= smint, key, jnp.int32(1 << 29))


@jax.jit
def occ_cheap(sd, o, d, mint, maxt, htri, ly):
    key = cheap_key(sd, htri, ly, mint, maxt)
    iota = jnp.arange(o.shape[0], dtype=jnp.int32)
    _, perm = jax.lax.sort((key, iota), num_keys=1)
    rays, n = pack_rays(o[perm], d[perm], mint[perm], maxt[perm])
    _, idx = _sweep_any(sd, rays, any_hit=True)
    _, hitb = jax.lax.sort((perm, (idx[:n] >= 0).astype(jnp.int32)),
                           num_keys=1)
    return hitb > 0


@jax.jit
def occ_cheap_noinv(sd, o, d, mint, maxt, htri, ly):
    # sorted-order result (production would keep the whole state in
    # this order instead of inverting)
    key = cheap_key(sd, htri, ly, mint, maxt)
    iota = jnp.arange(o.shape[0], dtype=jnp.int32)
    _, perm = jax.lax.sort((key, iota), num_keys=1)
    rays, n = pack_rays(o[perm], d[perm], mint[perm], maxt[perm])
    _, idx = _sweep_any(sd, rays, any_hit=True)
    return idx[:n] >= 0, perm


v1 = occ_prod(sd, so, sdir, smint, smaxt)
v2 = occ_nosort(sd, so, sdir, smint, smaxt)
v3 = occ_cheap(sd, so, sdir, smint, smaxt, htri, ly)
ok_mask = np.asarray(smaxt >= smint)
a1, a2, a3 = np.asarray(v1), np.asarray(v2), np.asarray(v3)
print("agreement prod-vs-nosort:", np.array_equal(a1[ok_mask], a2[ok_mask]),
      " prod-vs-cheap:", np.array_equal(a1[ok_mask], a3[ok_mask]))

print(f"shadow own-first6-sort : {timeit(occ_prod, sd, so, sdir, smint, smaxt):.2f} ms")
print(f"shadow no-sort         : {timeit(occ_nosort, sd, so, sdir, smint, smaxt):.2f} ms")
print(f"shadow cheap-key       : {timeit(occ_cheap, sd, so, sdir, smint, smaxt, htri, ly):.2f} ms")
print(f"shadow cheap-key noinv : {timeit(occ_cheap_noinv, sd, so, sdir, smint, smaxt, htri, ly):.2f} ms")

# ordering quality: union pairs under each permutation
key = cheap_key(sd, htri, ly, smint, smaxt)
iota = jnp.arange(N, dtype=jnp.int32)
_, perm_c = jax.lax.sort((key, iota), num_keys=1)
rays_p, _ = pack_rays(so, sdir, smint, smaxt)
k1, k2 = lane_sort_keys(sd.tri_tile_bounds, rays_p)
_, _, perm_f6 = jax.lax.sort((k1[:N], k2[:N], iota), num_keys=2)
for name, pm_ in (("unsorted", None), ("first6", perm_f6), ("cheap", perm_c)):
    if pm_ is None:
        s = candidate_stats(sd, so, sdir, smint, smaxt)
    else:
        s = candidate_stats(sd, so[pm_], sdir[pm_], smint[pm_], smaxt[pm_])
    print(f"shadow union pairs/ray [{name:8s}]: "
          f"{s['union_pairs_per_ray']:.0f} (lane {s['lane_pairs_per_ray']:.0f})")
