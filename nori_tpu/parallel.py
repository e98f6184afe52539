"""Multi-chip execution: sample-space data parallelism over a device mesh.

The reference parallelizes with TBB worker threads pulling 32x32 tiles
and merging under a mutex (src/main.cpp:95-121, src/block.cpp:105-114).
The TPU-native equivalent: shard the megasample lane axis across a
`jax.sharding.Mesh`, render each shard's wavefront locally (scene data
replicated in every chip's HBM), scatter into a per-device partial film
and reduce with `psum` over ICI — the collective replaces the mutex.

Determinism: lanes are global sample ids feeding the counter-based RNG,
so the image is bit-identical for any device count.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from nori_tpu.film import FilmSpec, new_accumulator, splat, to_bitmap
from nori_tpu.core import rng
from nori_tpu.render import JITTER_STREAM


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_sharded_sample_pass(scene, spec: FilmSpec, batch: int, mesh: Mesh,
                             axis: str = "batch"):
    """Jitted pass rendering `batch` global lanes sharded over `mesh`.

    Returns fn(sd, accum, seed, sample_idx, pix0) -> (accum, rays).
    `accum` is replicated; each device splats its shard into a local
    zero film and the partials are psum-reduced over ICI.
    """
    cam = scene.camera
    w, h = cam.output_size
    n_pixels = w * h
    spp = scene.sampler.sample_count
    rfilter = cam.rfilter
    cam_params = cam.ray_params()
    li = scene.integrator.make_li(scene)
    n_dev = mesh.devices.size
    assert batch % n_dev == 0

    def shard_fn(sd, cam_p, pix, seed, sample_idx):
        # pix: this device's shard of global pixel ids
        in_range = pix < n_pixels
        pixc = jnp.minimum(pix, n_pixels - 1)
        lanes = pixc * jnp.uint32(spp) + sample_idx
        jitter = rng.uniform2(seed, lanes, jnp.uint32(JITTER_STREAM))
        px = (pixc % w).astype(jnp.float32)
        py = (pixc // w).astype(jnp.float32)
        pos = jnp.stack([px, py], axis=-1) + jitter
        o, d, mint, maxt = type(cam).sample_rays(cam_p, pos)
        vals, aux = li(sd, o, d, mint, maxt, seed, lanes)
        vals = jnp.where(in_range[:, None], vals, 0.0)
        pos = jnp.where(in_range[:, None], pos, -1e6)
        local = new_accumulator(spec)
        local, _ = splat(spec, rfilter, local, pos, vals)
        # ICI reduction replaces the reference's mutex-guarded merge
        local = jax.lax.psum(local, axis)
        rays = jax.lax.psum(aux.get("rays", jnp.int32(0)), axis)
        return local, rays

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )

    @jax.jit
    def sample_pass(sd, accum, seed, sample_idx, pix0):
        pix = pix0 + jnp.arange(batch, dtype=jnp.uint32)
        part, rays = sharded(sd, cam_params, pix, seed, sample_idx)
        return accum + part, rays

    return sample_pass


def render_sharded(scene, mesh: Mesh | None = None, spp: int | None = None,
                   seed: int = 0, batch: int | None = None):
    """Full sharded render; returns ((H, W, 3) numpy image, stats)."""
    import time

    if mesh is None:
        mesh = make_mesh()
    sd = scene.compile()
    cam = scene.camera
    w, h = cam.output_size
    if spp is not None:
        scene.sampler.sample_count = spp
    spp = scene.sampler.sample_count
    scene.integrator.preprocess(scene)
    n_pixels = w * h
    n_dev = mesh.devices.size
    if batch is None:
        batch = min(131072, ((n_pixels + n_dev - 1) // n_dev) * n_dev)
    batch = ((batch + n_dev - 1) // n_dev) * n_dev
    spec = FilmSpec.for_filter(w, h, cam.rfilter)
    sample_pass = make_sharded_sample_pass(scene, spec, batch, mesh)
    accum = new_accumulator(spec)
    t0 = time.time()
    rays_total = []
    n_batches = (n_pixels + batch - 1) // batch
    for s in range(spp):
        for b in range(n_batches):
            accum, rays = sample_pass(
                sd, accum, jnp.uint32(seed), jnp.uint32(s),
                jnp.uint32(b * batch),
            )
            rays_total.append(rays)
    img = np.asarray(jax.device_get(to_bitmap(spec, accum)))
    dt = time.time() - t0
    total = int(np.sum([int(r) for r in rays_total]))
    return img, {
        "spp": spp, "seconds": dt, "rays": total,
        "mrays_per_sec": total / max(dt, 1e-9) / 1e6,
        "devices": n_dev,
    }
