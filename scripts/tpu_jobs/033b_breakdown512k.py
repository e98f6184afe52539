"""512k-lane living-room step component breakdown — the 'remaining
costs are floors' evidence for VERDICT item 8.  Times each phase of
the MIS step in isolation on the real steady-state distribution
(sweeps are VPU-saturated pair tests; keys/sort/gather are the fixed
machinery)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import nori_tpu.accel.pallas_mt as pm
import nori_tpu.accel.traverse as tv
import nori_tpu.wavefront as wf
import nori_tpu.scenes_builtin as sb

from nori_tpu.integrators.path import MIS

scene = sb.living_room(width=1280, height=720, spp=32, detail=5)
sd = scene.compile()
scene.integrator.preprocess(scene)
N = 524288
init, step, n_act, fin = wf.make_wavefront_stepper(
    scene, MIS, N, 64 * N)
seed = jnp.uint32(0)
carry = init(seed, jnp.uint32(0), jnp.uint32(64 * N))
for _ in range(24):
    carry = step(sd, carry, seed)
st = carry[0]
o, d, mint, maxt = st["o"], st["d"], st["mint"], st["maxt"]
jax.block_until_ready(o)

M = 12


def timeit(f, *a):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(M):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / M * 1e3


@jax.jit
def one_step(sd, carry, seed):
    return step(sd, carry, seed)


# full step (non-donated copy timing: run step on the live carry)
r = step(sd, carry, seed)
jax.block_until_ready(r[0]["o"])
t0 = time.time()
for _ in range(M):
    r = step(sd, r, seed)
jax.block_until_ready(r[0]["o"])
t_step = (time.time() - t0) / M * 1e3
print(f"full MIS step      : {t_step:.2f} ms", flush=True)


@jax.jit
def closest(sd, o, d, mint, maxt):
    return tv.intersect(sd, o, d, mint, maxt)


@jax.jit
def anyhit(sd, o, d, mint, maxt):
    return tv.occluded(sd, o, d, mint, maxt)


@jax.jit
def keys(sd, o, d, mint, maxt):
    rp, _ = pm.pack_rays(o, d, mint, maxt)
    return pm.lane_sort_keys(sd.tri_tile_bounds, rp)


@jax.jit
def sort2(k1, k2):
    iota = jnp.arange(N, dtype=jnp.int32)
    return jax.lax.sort((k1, k2, iota), num_keys=2)[2]


@jax.jit
def gather23(m, perm):
    return m[perm]


print(f"closest sweep      : {timeit(closest, sd, o, d, mint, maxt):.2f} ms",
      flush=True)
print(f"any-hit sweep      : {timeit(anyhit, sd, o, d, mint, maxt):.2f} ms",
      flush=True)
k1, k2 = keys(sd, o, d, mint, maxt)
k1, k2 = k1[:N], k2[:N]
print(f"lane-key kernel    : {timeit(keys, sd, o, d, mint, maxt):.2f} ms",
      flush=True)
print(f"2-key lax.sort     : {timeit(sort2, k1, k2):.2f} ms", flush=True)
perm = sort2(k1, k2)
m = jnp.zeros((N, 23), jnp.float32)
print(f"(N,23) state gather: {timeit(gather23, m, perm):.2f} ms",
      flush=True)

from nori_tpu.profiling import candidate_stats
s = candidate_stats(sd, o[:65536], d[:65536], mint[:65536], maxt[:65536])
print(f"candidates: union {s['union_pairs_per_ray']:.0f} "
      f"lane {s['lane_pairs_per_ray']:.0f} pairs/ray", flush=True)
print("done", flush=True)
