"""Living-room 1024 spp full-res at post-first6 HEAD: the BASELINE
metric observables (Mrays/s/chip, spp/sec; pair-RMSE -> MC noise)."""
import time

import numpy as np

import nori_tpu.scenes_builtin as sb
import nori_tpu.wavefront as wf

# modules were reloaded by job 014; reuse as-is
lr = sb.living_room(width=1280, height=720, spp=8, detail=5)
wf.render_wavefront(lr, spp=8, n_lanes=131072, seed=0)   # warm compile
t0 = time.time()
img, st = wf.render_wavefront(lr, spp=1024, n_lanes=131072, seed=11)
wall = time.time() - t0
print(f"1024spp: {st}")
print(f"wall={wall:.1f}s spp_per_sec={1024 / wall:.2f} "
      f"mean={float(np.mean(img)):.4f}")
np.savez("/tmp/lr1024_post.npz", img=img.astype(np.float32))
