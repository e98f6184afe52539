"""Post-change step component breakdown on living_room 1280x720."""
import importlib
import time
import numpy as np
import jax
import jax.numpy as jnp

import nori_tpu.accel.pallas_mt as pm
import nori_tpu.accel.traverse as tv
import nori_tpu.core.dpdf as dpdf
import nori_tpu.emitter as em
import nori_tpu.integrators.base as ibase
import nori_tpu.wavefront as wf2
for m in (pm, tv, dpdf, em, ibase, wf2):
    importlib.reload(m)

import nori_tpu.scenes_builtin as sb
from nori_tpu.integrators.path import MIS

scene = sb.living_room(width=1280, height=720, spp=8, detail=5)
sd = scene.compile()
scene.integrator.preprocess(scene)
N = 131072
chunk = 64 * N
init, step, n_act, fin = wf2.make_wavefront_stepper(scene, MIS, N, chunk)
seed = jnp.uint32(0)
carry = init(seed, jnp.uint32(0), jnp.uint32(chunk))
for _ in range(24):
    carry = step(sd, carry, seed)
jax.block_until_ready(carry[0]["o"])
M = 16
t0 = time.time()
for _ in range(M):
    carry = step(sd, carry, seed)
jax.block_until_ready(carry[0]["o"])
print(f"full MIS step: {(time.time()-t0)/M*1e3:.2f} ms")

st = carry[0]
o, d, mint, maxt = st["o"], st["d"], st["mint"], st["maxt"]


def timeit(f, *a):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(M):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / M * 1e3


@jax.jit
def only_intersect(sd, o, d, mint, maxt):
    h = tv.intersect(sd, o, d, mint, maxt)
    return h.t, h.tri


@jax.jit
def only_occ(sd, o, d, mint, maxt):
    return tv.occluded(sd, o, d, mint, maxt)


@jax.jit
def only_sort(sd, o, d, mint, maxt):
    rp, _ = pm.pack_rays(o, d, mint, maxt)
    k1, k2 = pm.lane_sort_keys(sd.tri_tile_bounds, rp)
    k1, k2 = k1[:N], k2[:N]
    iota = jnp.arange(N, dtype=jnp.int32)
    _, _, perm = jax.lax.sort((k1, k2, iota), num_keys=2)
    return perm


@jax.jit
def only_gather(sd, o, d, mint, maxt):
    m = jnp.concatenate([o, d, o, d, o, d, o, mint[:, None],
                         maxt[:, None]], axis=1)  # (N, 23)
    perm = jnp.argsort(maxt.astype(jnp.int32))
    return m[perm]


print(f"closest sweep : {timeit(only_intersect, sd, o, d, mint, maxt):.2f} ms")
print(f"shadow sweep  : {timeit(only_occ, sd, o, d, mint, maxt):.2f} ms")
print(f"2-key sort    : {timeit(only_sort, sd, o, d, mint, maxt):.2f} ms")
print(f"argsort+gather: {timeit(only_gather, sd, o, d, mint, maxt):.2f} ms")
