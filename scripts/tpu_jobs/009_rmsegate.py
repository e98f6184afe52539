"""REGRESSION GATE (content swapped; rmse-gate moved to 012): step
time + e2e on all bench scenes with first6 sort + visit_w kernel."""
import importlib
import time
import numpy as np
import jax
import jax.numpy as jnp

import nori_tpu.accel.pallas_mt as pm
import nori_tpu.accel.traverse as tv
import nori_tpu.core.dpdf as dpdf
import nori_tpu.emitter as em
import nori_tpu.integrators.base as ibase
import nori_tpu.wavefront as wf2
for m in (pm, tv, dpdf, em, ibase, wf2):
    importlib.reload(m)

import nori_tpu.scenes_builtin as sb
from nori_tpu import load_from_xml
from nori_tpu.integrators.path import MIS

lr = sb.living_room(width=1280, height=720, spp=8, detail=5)
sd = lr.compile()
lr.integrator.preprocess(lr)
N = 131072
init, step, n_act, _ = wf2.make_wavefront_stepper(lr, MIS, N, 64 * N)
seed = jnp.uint32(0)
carry = init(seed, jnp.uint32(0), jnp.uint32(64 * N))
for _ in range(24):
    carry = step(sd, carry, seed)
jax.block_until_ready(carry[0]["o"])
t0 = time.time()
for _ in range(16):
    carry = step(sd, carry, seed)
jax.block_until_ready(carry[0]["o"])
print(f"living_room MIS step (CDF+first6+visitw2): "
      f"{(time.time()-t0)/16*1e3:.2f} ms (was 35.0)")

img, st = wf2.render_wavefront(lr, spp=8, n_lanes=131072, seed=1)
print(f"living_room e2e: {st['mrays_per_sec']:.2f} Mrays/s "
      f"({st['seconds']:.2f}s, occ {st['occupancy']:.3f}, "
      f"mean {float(np.mean(img)):.4f})")

cbox = load_from_xml("/root/reference/scenes/pa5/cbox/cbox_mis.xml")
wf2.render_wavefront(cbox, spp=16, n_lanes=131072, seed=0)
img, st = wf2.render_wavefront(cbox, spp=16, n_lanes=131072, seed=1)
print(f"cbox_mis e2e: {st['mrays_per_sec']:.2f} Mrays/s "
      f"({st['seconds']:.2f}s, mean {float(np.mean(img)):.4f})")

table = load_from_xml("/root/reference/scenes/pa5/table/table_mis.xml")
wf2.render_wavefront(table, spp=8, n_lanes=131072, seed=0)
img, st = wf2.render_wavefront(table, spp=8, n_lanes=131072, seed=1)
print(f"table_mis e2e: {st['mrays_per_sec']:.2f} Mrays/s "
      f"({st['seconds']:.2f}s, mean {float(np.mean(img)):.4f})")
