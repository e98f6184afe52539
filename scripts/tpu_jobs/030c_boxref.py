"""Box-reconstruction reference + PT curve for the protocol's final
reconstruction-consistent evaluation (the dump writers are per-pixel
first-hit assignments = box; the production reference is gaussian —
comparing across filters floors the RMSE).  256 spp: reference noise
~0.013, small against the pg plateau ~0.08.  The merged comparison
itself happens host-side from the run checkpoints."""
import json
import time

import numpy as np

from nori_tpu import scenes_builtin as sb
from nori_tpu.registry import create_instance
from nori_tpu.props import PropertyList
from nori_tpu.wavefront import render_wavefront
from nori_tpu.bitmap import write_exr
from nori_tpu.pathgraph.merge import rmse

W, H = 1280, 720


def box_scene():
    sc = sb.living_room(width=W, height=H, spp=1, detail=5)
    sc.camera.rfilter = create_instance("box", PropertyList())
    return sc


t0 = time.time()
sc = box_scene()
ref, st = render_wavefront(sc, spp=256, n_lanes=524288, seed=11)
ref = np.asarray(ref)
print(f"box reference 256spp in {st['seconds']:.1f}s "
      f"({st['mrays_per_sec']:.2f} Mrays/s)", flush=True)
write_exr("/tmp/lr_box_256.exr", ref)

curve = []
for spp in (2, 8, 32):
    sc2 = box_scene()
    img, _ = render_wavefront(sc2, spp=spp, n_lanes=131072, seed=7)
    e = rmse(np.asarray(img), ref, clamp=10.0)
    curve.append([spp, round(float(e), 5)])
    print(f"PT(box) {spp} spp -> RMSE {e:.4f}", flush=True)
with open("/tmp/lr_box_curve.json", "w") as f:
    json.dump({"curve": curve, "ref_spp": 256, "seed": 11}, f)
print("done", flush=True)
