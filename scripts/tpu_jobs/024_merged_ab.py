"""MERGED_SWEEP A/B on the living-room flagship (512k lanes, spp=32)
and cbox/table: e2e Mrays/s with the two-launch step vs the merged
single-launch step (VERDICT r4 item 6)."""
import importlib

import numpy as np

import nori_tpu.config as cfg
importlib.reload(cfg)
import nori_tpu.accel.pallas_mt as pm
importlib.reload(pm)
import nori_tpu.accel.traverse as tv
importlib.reload(tv)
import nori_tpu.wavefront as wf
importlib.reload(wf)
import nori_tpu.scenes_builtin as sb
importlib.reload(sb)

from nori_tpu import load_from_xml


def run(scene, spp, n_lanes, tag):
    for merged in (False, True):
        cfg.MERGED_SWEEP = merged
        wf.render_wavefront(scene, spp=spp, n_lanes=n_lanes, seed=0)
        img, st = wf.render_wavefront(scene, spp=spp, n_lanes=n_lanes,
                                      seed=1)
        print(f"[{tag}] merged={merged}: {st['mrays_per_sec']:.2f} "
              f"Mrays/s ({st['seconds']:.2f}s, occ "
              f"{st['occupancy']:.3f}, mean {float(np.mean(img)):.4f})",
              flush=True)
    cfg.MERGED_SWEEP = False


lr = sb.living_room(width=1280, height=720, spp=32, detail=5)
run(lr, 32, 524288, "living_room-512k")
cbox = load_from_xml("/root/reference/scenes/pa5/cbox/cbox_mis.xml")
run(cbox, 32, 131072, "cbox-131k")
table = load_from_xml("/root/reference/scenes/pa5/table/table_mis.xml")
run(table, 32, 131072, "table-131k")
print("done", flush=True)
