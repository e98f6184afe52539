"""Benchmark: path-MIS rendering throughput on the flagship workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): 100 Mrays/s on the pa5 living-room-class
workload.  The measured scene is the richest available: the reference
pa5 cbox_mis (800x600, path_mis, mirror+dielectric+diffuse+area light)
when the reference checkout is present, else the equivalent built-in
Cornell box.  Warmup passes are excluded (first-touch on the axon
tunnel costs minutes and is not render throughput).
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_MRAYS = 100.0
REF_CBOX = "/root/reference/scenes/pa5/cbox/cbox_mis.xml"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nori_tpu.film import FilmSpec, new_accumulator
    from nori_tpu.render import make_sample_pass

    if os.path.exists(REF_CBOX):
        from nori_tpu import load_from_xml

        scene = load_from_xml(REF_CBOX)
    else:
        from nori_tpu.scenes_builtin import cornell_box

        scene = cornell_box(width=800, height=600, spp=16)

    sd = scene.compile()
    scene.integrator.preprocess(scene)
    cam = scene.camera
    spec = FilmSpec.for_filter(cam.width, cam.height, cam.rfilter)
    batch = 131072
    fn = jax.jit(make_sample_pass(scene, spec, batch))

    # warm the tunnel + compile
    float(jnp.sum(sd.tri_v0))
    accum = new_accumulator(spec)
    accum, dropped, rays = fn(
        sd, accum, jnp.uint32(0), jnp.uint32(0), jnp.uint32(0)
    )
    int(rays)

    # timed passes
    n_pixels = cam.width * cam.height
    n_batches = (n_pixels + batch - 1) // batch
    spp = 4
    total_rays = 0
    t0 = time.time()
    ray_handles = []
    for s in range(spp):
        for b in range(n_batches):
            accum, dropped, rays = fn(
                sd, accum, jnp.uint32(1), jnp.uint32(s),
                jnp.uint32(b * batch),
            )
            ray_handles.append(rays)
    total_rays = int(np.sum([int(r) for r in ray_handles]))
    dt = time.time() - t0

    mrays = total_rays / dt / 1e6
    print(json.dumps({
        "metric": "mrays_per_sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
