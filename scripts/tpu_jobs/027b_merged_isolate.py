"""Isolate the merged-step regression (12.89 -> 9.61 Mrays/s at 512k):
is the MIXED KERNEL slower than the two separate sweeps on identical
ray populations, or is the step restructure (cond-prime, dL gathers,
record surgery) the cost?  Uses a dumped 512k steady state."""
import importlib
import time

import numpy as np
import jax
import jax.numpy as jnp

import nori_tpu.config as cfg
importlib.reload(cfg)
import nori_tpu.accel.pallas_mt as pm
importlib.reload(pm)
import nori_tpu.accel.traverse as tv
importlib.reload(tv)
import nori_tpu.interaction as itx
importlib.reload(itx)
import nori_tpu.integrators.base as ib
importlib.reload(ib)
import nori_tpu.integrators.path as ip
importlib.reload(ip)
import nori_tpu.wavefront as wf
importlib.reload(wf)
import nori_tpu.scenes_builtin as sb

from nori_tpu.integrators.path import MIS
from nori_tpu.core import rng
from nori_tpu.core.vecmath import dot
from nori_tpu.interaction import fill_interaction_fast
from nori_tpu.integrators.base import (
    sample_emitter_point_fast, shadow_ray_args)

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
print(f"steady state: active={int(jnp.sum(st['active']))}", flush=True)


@jax.jit
def mk_shadow(sd, st, seed):
    q, depth = st["q"], st["depth"]
    o, d, mint, maxt = st["o"], st["d"], st["mint"], st["maxt"]
    active = st["active"]
    hit = tv.intersect(sd, o, d, mint, maxt)
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
    return its.p, wo_w, smint, smaxt


so, sdir, smint, smaxt = mk_shadow(sd, st, seed)
jax.block_until_ready(so)

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
def sep(sd, o, d, mint, maxt, so, sdir, smint, smaxt):
    h = tv.intersect(sd, o, d, mint, maxt)
    occ = tv.occluded(sd, so, sdir, smint, smaxt)
    return h.t, occ


@jax.jit
def mix(sd, o, d, mint, maxt, so, sdir, smint, smaxt):
    return tv.intersect_mixed(sd, o, d, mint, maxt,
                              so, sdir, smint, smaxt, raw=True)


@jax.jit
def mix_just_sweep(sd, o, d, mint, maxt, so, sdir, smint, smaxt):
    t, i, occ = tv.intersect_mixed(sd, o, d, mint, maxt,
                                   so, sdir, smint, smaxt, raw=True)
    return t, occ


t_sep = timeit(sep, sd, o, d, mint, maxt, so, sdir, smint, smaxt)
t_mix = timeit(mix, sd, o, d, mint, maxt, so, sdir, smint, smaxt)
print(f"separate closest+anyhit : {t_sep:.2f} ms", flush=True)
print(f"mixed single launch     : {t_mix:.2f} ms", flush=True)

# visit_w=2 variant for the mixed launch (shadow walks prefer W=2)
cfg.SWEEP_VISIT_W = 2
t_mix2 = timeit(mix_just_sweep, sd, o, d, mint, maxt,
                so, sdir, smint, smaxt)
cfg.SWEEP_VISIT_W = None
print(f"mixed launch W=2        : {t_mix2:.2f} ms", flush=True)

# correctness spot check
h = sep(sd, o, d, mint, maxt, so, sdir, smint, smaxt)
m = mix(sd, o, d, mint, maxt, so, sdir, smint, smaxt)
print("agree closest t:", bool(jnp.all(
    jnp.where(jnp.isinf(m[0]), jnp.inf, m[0])
    == jnp.where(jnp.isinf(h[0]) | (h[0] >= 1e30), jnp.inf, h[0]))
    ), " agree occ:", bool(jnp.all(m[2] == h[1])), flush=True)
print("done", flush=True)
