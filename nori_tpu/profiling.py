"""Kernel-level performance accounting for the sweep intersection.

The reference's only instrumentation is wall-clock timers
(include/nori/timer.h, src/main.cpp:91); on TPU we additionally account
the sweep kernel's actual work: candidate ray-triangle pairs (exact,
from the same per-lane slab tests the kernel preamble performs), the
achieved pair-test rate, and the implied VPU FLOP rate (the
Moller-Trumbore block is ~50 VPU flops per tested pair).  bench.py
publishes these next to the throughput numbers.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def candidate_stats(scene_data, o, d, mint, maxt):
    """Exact candidate-tile statistics for a ray population.

    Returns a dict with per-LANE candidate pairs (the per-ray ideal the
    kernel would sweep with perfect per-lane scheduling) and the
    per-ray-TILE union pairs (what the 256-lane kernel actually
    sweeps, before the in-kernel skyline early-exit).
    """
    from nori_tpu.accel.pallas_mt import (
        FINE_T, TILE_N, pack_rays, ray_tile_entries)

    rays, n = pack_rays(o, d, mint, maxt)
    tb = scene_data.tri_tile_bounds
    _, N = rays.shape
    n_rt = N // TILE_N

    # per-lane slab test vs every fine tile (the preamble's math)
    ov = rays[0:3].T.reshape(N, 1, 3)
    dv = rays[3:6].T.reshape(N, 1, 3)
    mt = rays[6].reshape(N, 1)
    xt = rays[7].reshape(N, 1)
    inv = 1.0 / jnp.where(jnp.abs(dv) < 1e-20,
                          jnp.where(dv < 0, -1e-20, 1e-20), dv)
    t0 = (tb[None, :, 0:3] - ov) * inv
    t1 = (tb[None, :, 3:6] - ov) * inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    cand = (tn <= tf) & (tf >= mt) & (tn <= xt)
    lane_tiles = jnp.sum(cand, axis=1)
    live = (mt <= xt)[:, 0]
    lane_tiles = jnp.where(live, lane_tiles, 0)

    entry_rt, _, _ = ray_tile_entries(tb, rays)
    union_tiles = jnp.sum(jnp.isfinite(entry_rt), axis=1)  # (n_rt,)

    n_live = float(jnp.sum(live))
    return {
        "rays": int(n),
        "lane_pairs_per_ray": float(
            jnp.sum(lane_tiles) * FINE_T / max(n_live, 1)),
        "union_pairs_per_ray": float(
            jnp.sum(union_tiles) * FINE_T * TILE_N
            / max(n_live, 1)),
        "fine_tiles": int(tb.shape[0]),
    }


def time_intersect(scene_data, o, d, mint, maxt, repeats: int = 20):
    """Wall-clock the production closest-hit sweep on a ray set."""
    from nori_tpu.accel.traverse import intersect

    @jax.jit
    def probe(sd, o, d, mint, maxt):
        h = intersect(sd, o, d, mint, maxt)
        return h.t, h.tri

    r = probe(scene_data, o, d, mint, maxt)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(repeats):
        r = probe(scene_data, o, d, mint, maxt)
    jax.block_until_ready(r)
    return (time.time() - t0) / repeats


#: VPU flops per tested Moller-Trumbore pair in the sweep block
MT_FLOPS_PER_PAIR = 50


def kernel_report(scene, n_rays: int = 131072, seed: int = 0,
                  bounce_steps: int = 8):
    """Sweep-kernel report on a realistic mid-render ray distribution:
    run `bounce_steps` wavefront steps, then time the closest-hit sweep
    on the surviving lane population and relate it to the exact
    candidate-pair counts."""
    from nori_tpu.wavefront import make_wavefront_stepper
    from nori_tpu.integrators.path import MIS

    sd = scene.compile()
    scene.integrator.preprocess(scene)
    mode = getattr(scene.integrator, "mode", MIS)
    cache = getattr(scene, "_wf_cache", None)
    if cache is not None and cache[0][1] == n_rays:
        # reuse the render's compiled stepper (same lane width);
        # steppers = (init, stages, finalize), widest stage first
        init, step = cache[1][0], cache[1][1][0][0]
        chunk = cache[0][2]
    else:
        chunk = 64 * n_rays
        init, step, _, _ = make_wavefront_stepper(
            scene, mode, n_rays, chunk)
    seed_a = jnp.uint32(seed)
    carry = init(seed_a, jnp.uint32(0), jnp.uint32(chunk))
    for _ in range(bounce_steps):
        carry = step(sd, carry, seed_a)
    st = carry[0]
    o, d = st["o"], st["d"]
    mint, maxt = st["mint"], st["maxt"]

    stats = candidate_stats(sd, o, d, mint, maxt)
    dt = time_intersect(sd, o, d, mint, maxt)
    pairs = stats["union_pairs_per_ray"] * stats["rays"]
    stats.update({
        "sweep_ms": round(dt * 1e3, 3),
        "sweep_mrays_per_sec": round(stats["rays"] / dt / 1e6, 2),
        "pair_tests_per_sec": round(pairs / dt / 1e9, 2),  # G pairs/s
        "vpu_gflops_est": round(
            pairs * MT_FLOPS_PER_PAIR / dt / 1e9, 1),
    })
    return stats
