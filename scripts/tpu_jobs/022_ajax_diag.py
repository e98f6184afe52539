"""Ajax-scale (HBM-streamed sweep) cost breakdown + granularity A/B.

VERDICT r4 item 3: ajax rows run ~2-2.9 Mrays/s vs 12.5 resident.
Questions:
  1. where does an ajax batch go (sweep vs splat vs epilogue)?
  2. candidate stats on REAL camera/shadow rays at 512-tri slabs
  3. does STREAM_T=256 (finer slabs => fewer union pairs) win?
  4. does a bigger batch help?

No module reloads: the worker session predates no commits relevant
here; STREAM_T is patched on the live module (scene.compile reads it
at call time).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import nori_tpu.accel.pallas_mt as pm
import nori_tpu.accel.traverse as tv
import nori_tpu.render as rd

from nori_tpu import load_from_xml
from nori_tpu.core import rng
from nori_tpu.profiling import candidate_stats

AJN = "/root/reference/scenes/pa2/ajax-normals.xml"
AJR = "/root/reference/scenes/pa5/ajax/ajax-rough.xml"
STAT_N = 32768   # candidate_stats materializes (N, n_tt, 3); keep small


def timeit(f, *a, reps=8):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / reps * 1e3


@jax.jit
def closest(sd, o, d, mint, maxt):
    return tv.intersect(sd, o, d, mint, maxt)


@jax.jit
def anyhit(sd, o, d, mint, maxt):
    return tv.occluded(sd, o, d, mint, maxt)


def probe(tag, xml, spp):
    scene = load_from_xml(xml)
    sd = scene.compile()
    scene.sampler.sample_count = spp
    scene.integrator.preprocess(scene)
    n_tt = sd.tri_tile_bounds.shape[0]
    T = sd.tri_packed.shape[1]
    print(f"[{tag}] T={T} n_tt={n_tt} tile_t={T // n_tt}", flush=True)

    batch = 131072
    pass_fn = jax.jit(rd.make_sample_pass_q(scene, batch))
    seed = jnp.uint32(0)
    w, h = scene.camera.output_size
    q0 = jnp.uint32(((w * h * spp) // 2 // batch) * batch)
    t_pass = timeit(pass_fn, sd, seed, q0)
    print(f"[{tag}] mid-batch pass: {t_pass:.2f} ms "
          f"-> {batch / t_pass / 1e3:.2f} Mrays/s(camera)", flush=True)

    # sweep-only on the same camera rays
    cam = scene.camera
    q = q0 + jnp.arange(batch, dtype=jnp.uint32)
    pix = jnp.minimum(q // jnp.uint32(spp), jnp.uint32(w * h - 1))
    jitter = rng.uniform2(seed, q, jnp.uint32(rd.JITTER_STREAM))
    px = (pix % w).astype(jnp.float32)
    py = (pix // w).astype(jnp.float32)
    pos = jnp.stack([px, py], axis=-1) + jitter
    o, d, mint, maxt = type(cam).sample_rays(cam.ray_params(), pos)

    t_cl = timeit(closest, sd, o, d, mint, maxt)
    print(f"[{tag}] closest sweep(camera rays, 131k): {t_cl:.2f} ms",
          flush=True)
    s = candidate_stats(sd, o[:STAT_N], d[:STAT_N],
                        mint[:STAT_N], maxt[:STAT_N])
    print(f"[{tag}] camera-ray candidates: "
          f"union {s['union_pairs_per_ray']:.0f} "
          f"lane {s['lane_pairs_per_ray']:.0f} pairs/ray", flush=True)

    # shadow-ray picture: rays from hit points toward a fixed point
    # above the scene (ajax scenes have no area lights; this mimics
    # whitted's point-light NEE geometry)
    hit = closest(sd, o, d, mint, maxt)
    p = o + d * jnp.where(hit.valid, hit.t, 1.0)[:, None]
    target = jnp.asarray([
        float(sd.scene_bounds[0, 0]),
        float(sd.scene_bounds[0, 1]),
        float(sd.scene_bounds[0, 2]) + float(sd.scene_bounds[0, 3])])
    sdir = target[None, :] - p
    dist = jnp.linalg.norm(sdir, axis=-1, keepdims=True)
    sdir = sdir / jnp.maximum(dist, 1e-6)
    smint = jnp.full((batch,), 1e-4, jnp.float32)
    smaxt = jnp.where(hit.valid, dist[:, 0] * 0.999, -1.0)
    t_sh = timeit(anyhit, sd, p, sdir, smint, smaxt)
    print(f"[{tag}] any-hit sweep(shadow-ish, 131k): {t_sh:.2f} ms",
          flush=True)
    s2 = candidate_stats(sd, p[:STAT_N], sdir[:STAT_N],
                         smint[:STAT_N], smaxt[:STAT_N])
    print(f"[{tag}] shadow-ray candidates: "
          f"union {s2['union_pairs_per_ray']:.0f} "
          f"lane {s2['lane_pairs_per_ray']:.0f} pairs/ray", flush=True)


def e2e(tag, xml, spp, batch=None):
    scene = load_from_xml(xml)
    rd.render(scene, spp=spp, seed=0, batch=batch)
    img, st = rd.render(scene, spp=spp, seed=1, batch=batch)
    print(f"[{tag}] e2e spp={spp} batch={batch}: "
          f"{st['mrays_per_sec']:.2f} Mrays/s ({st['seconds']:.2f}s, "
          f"mean {float(np.mean(img)):.4f})", flush=True)


print(f"== baseline STREAM_T={pm.STREAM_T} ==", flush=True)
probe("ajn512", AJN, 4)
e2e("ajn512", AJN, 4)
e2e("ajn512-big", AJN, 4, batch=524288)
probe("ajr512", AJR, 4)
e2e("ajr512", AJR, 4)

print("== STREAM_T=256 ==", flush=True)
pm.STREAM_T = 256
try:
    probe("ajn256", AJN, 4)
    e2e("ajn256", AJN, 4)
    probe("ajr256", AJR, 4)
    e2e("ajr256", AJR, 4)
finally:
    pm.STREAM_T = 512
print("done", flush=True)
