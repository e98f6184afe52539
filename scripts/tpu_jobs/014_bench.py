"""Preview the full bench.py (all 5 scenes + kernel accounting) at
post-first6 HEAD — validates what the driver will run for BENCH_r03."""
import importlib
import sys

import nori_tpu.accel.pallas_mt as pm
import nori_tpu.accel.traverse as tv
import nori_tpu.core.dpdf as dpdf
import nori_tpu.emitter as em
import nori_tpu.integrators.base as ibase
import nori_tpu.film as film
import nori_tpu.scene as scene_mod
import nori_tpu.scenes_builtin as sb
import nori_tpu.wavefront as wf2
import nori_tpu.render as rnd
import nori_tpu.profiling as prof
for m in (pm, tv, dpdf, em, ibase, film, scene_mod, sb, wf2, rnd, prof):
    importlib.reload(m)

spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
bench.main()
