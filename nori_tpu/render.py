"""Render driver.

Replaces the reference's tile/thread execution engine (src/main.cpp:38-151:
BlockGenerator + tbb::parallel_for + per-thread sampler clones).  The
TPU-native execution model: one jitted "sample pass" renders EVERY pixel's
k-th sample as a single wavefront (camera ray generation -> integrator
-> filtered splat), and the host loops over sample indices, donating the
film accumulator.  Determinism comes from counter-based RNG keyed by
(seed, pixel*spp + sample) — the analogue of per-tile pcg32 seeding
(src/independent.cpp:48-53) but stable under ANY device sharding.

Multi-chip: `render_sharded` shards the lane axis across a
jax.sharding.Mesh; the film scatter-add happens on per-device partial
accumulators which XLA reduces with a psum-style sum at the end
(replaces the mutex-protected ImageBlock::put merge).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from nori_tpu.film import FilmSpec, new_accumulator, splat, to_bitmap
from nori_tpu.core import rng

JITTER_STREAM = 0xF000


def make_sample_pass(scene, spec: FilmSpec, batch: int):
    """Build the jitted wavefront pass over `batch` pixels of one sample
    index.  `pix0` is the first pixel id of the batch (lanes wrap with
    mode=drop outside the image so the last batch can be ragged)."""
    cam = scene.camera
    w, h = cam.output_size
    n_pixels = w * h
    spp = scene.sampler.sample_count
    rfilter = cam.rfilter
    cam_params = cam.ray_params()
    li = scene.integrator.make_li(scene)

    def sample_pass(sd, accum, seed, sample_idx, pix0):
        pix = pix0 + jnp.arange(batch, dtype=jnp.uint32)
        in_range = pix < n_pixels
        pix = jnp.minimum(pix, n_pixels - 1)
        lanes = pix * jnp.uint32(spp) + jnp.uint32(sample_idx)
        jitter = rng.uniform2(seed, lanes, jnp.uint32(JITTER_STREAM))
        px = (pix % w).astype(jnp.float32)
        py = (pix // w).astype(jnp.float32)
        pos = jnp.stack([px, py], axis=-1) + jitter
        o, d, mint, maxt = type(cam).sample_rays(cam_params, pos)
        vals, aux = li(sd, o, d, mint, maxt, seed, lanes)
        vals = jnp.where(in_range[:, None], vals, 0.0)
        pos = jnp.where(in_range[:, None], pos, -1e6)
        accum, dropped = splat(spec, rfilter, accum, pos, vals)
        return accum, dropped, aux.get("rays", jnp.int32(batch))

    return sample_pass


DEFAULT_BATCH = 131072


def render(scene, spp: int | None = None, seed: int = 0,
           verbose: bool = False, batch: int | None = None):
    """Render a scene; returns (image (H, W, 3) numpy, stats dict)."""
    sd = scene.compile()
    cam = scene.camera
    w, h = cam.output_size
    if spp is None:
        spp = scene.sampler.sample_count
    else:
        scene.sampler.sample_count = spp
    scene.integrator.preprocess(scene)

    n_pixels = w * h
    if batch is None:
        batch = min(DEFAULT_BATCH, n_pixels)
    spec = FilmSpec.for_filter(w, h, cam.rfilter)
    sample_pass = make_sample_pass(scene, spec, batch)
    jitted = jax.jit(sample_pass, donate_argnums=(1,))

    accum = new_accumulator(spec)
    seed_arr = jnp.uint32(seed)
    t0 = time.time()
    ray_counts = []
    n_batches = (n_pixels + batch - 1) // batch
    for s in range(spp):
        for b in range(n_batches):
            accum, dropped, rays = jitted(
                sd, accum, seed_arr, jnp.uint32(s), jnp.uint32(b * batch)
            )
            ray_counts.append(rays)
        if verbose and (s + 1) % max(1, spp // 10) == 0:
            accum.block_until_ready()
            print(f"  sample {s + 1}/{spp}  ({time.time() - t0:.2f}s)")
    img = to_bitmap(spec, accum)
    img_np = np.asarray(jax.device_get(img))
    elapsed = time.time() - t0
    total_rays = int(np.sum([int(r) for r in ray_counts]))
    stats = {
        "spp": spp,
        "seconds": elapsed,
        "pixels": w * h,
        "samples_per_sec": w * h * spp / max(elapsed, 1e-9),
        "rays": total_rays,
        "mrays_per_sec": total_rays / max(elapsed, 1e-9) / 1e6,
    }
    return img_np, stats


def render_to_files(scene, out_base: str, spp: int | None = None,
                    seed: int = 0, verbose: bool = False,
                    preview: bool = False, checkpoint: bool = False):
    """Render and write <base>.exr + tonemapped <base>.png
    (src/main.cpp:140-150).

    Path-family integrators use the persistent-wavefront renderer
    (nori_tpu.wavefront) — the production path; other integrators
    (normals/simple/ao/whitted) use the plain batched pass.
    checkpoint dumps resumable render state at <base>.ckpt after every
    chunk (removed on completion).
    """
    from nori_tpu.bitmap import write_exr, write_png

    if scene.integrator.plugin_name in (
            "path", "path_mats", "path_ems", "path_mis"):
        from nori_tpu.wavefront import render_wavefront

        img, stats = render_wavefront(
            scene, spp=spp, seed=seed, verbose=verbose,
            preview_path=(out_base + "_preview.png") if preview else None,
            checkpoint_path=(out_base + ".ckpt") if checkpoint else None)
    else:
        img, stats = render(scene, spp=spp, seed=seed, verbose=verbose)
    write_exr(out_base + ".exr", img)
    write_png(out_base + ".png", img)
    return img, stats
