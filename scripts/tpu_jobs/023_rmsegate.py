"""Matched-RMSE gate + BASELINE 1024-spp metric (VERDICT r4 item 2).
Retry of 021 with module reloads (the worker session predates the
MERGED_SWEEP config knob; reload config + accel + wavefront so the
module set is consistent)."""
import importlib
import os

import nori_tpu.config as cfg
importlib.reload(cfg)
import nori_tpu.accel.pallas_mt as pm
importlib.reload(pm)
import nori_tpu.accel.traverse as tv
importlib.reload(tv)
import nori_tpu.wavefront as wf
importlib.reload(wf)
import scripts.rmse_gate as rg
importlib.reload(rg)

assert os.path.exists(rg.REF_NPZ), "CPU ref missing - run --cpu-ref first"
out = rg.run_gate(spp_full=1024, n_lanes=524288,
                  save_full="/tmp/lr_1024.exr")
print("matched:", out["matched_gate"])
