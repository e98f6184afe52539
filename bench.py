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

    from nori_tpu.wavefront import render_wavefront

    if os.path.exists(REF_CBOX):
        from nori_tpu import load_from_xml

        scene = load_from_xml(REF_CBOX)
    else:
        from nori_tpu.scenes_builtin import cornell_box

        scene = cornell_box(width=800, height=600, spp=16)

    # warm the tunnel + compile with one full-config render (the
    # stepper jit cache is keyed by spp), then measure a second run
    sd = scene.compile()
    float(jnp.sum(sd.tri_v0))
    render_wavefront(scene, spp=16, n_lanes=131072, seed=0)
    img, stats = render_wavefront(scene, spp=16, n_lanes=131072, seed=1)
    mrays = stats["mrays_per_sec"]
    print(json.dumps({
        "metric": "mrays_per_sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
