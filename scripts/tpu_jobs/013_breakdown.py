"""n_lanes=262144 living-room variant (post-change)."""
import importlib
import numpy as np
import nori_tpu.accel.pallas_mt as pm
import nori_tpu.accel.traverse as tv
import nori_tpu.wavefront as wf2
for m in (pm, tv, wf2):
    importlib.reload(m)
import nori_tpu.scenes_builtin as sb
lr = sb.living_room(width=1280, height=720, spp=8, detail=5)
wf2.render_wavefront(lr, spp=8, n_lanes=262144, seed=0)
img, st = wf2.render_wavefront(lr, spp=8, n_lanes=262144, seed=1)
print(f"living_room n_lanes=262144: {st['mrays_per_sec']:.2f} Mrays/s "
      f"({st['seconds']:.2f}s, occ {st['occupancy']:.3f}, "
      f"mean {float(np.mean(img)):.4f})")
