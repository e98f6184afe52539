"""Path-graph protocol, first increment: 2 runs at reference scale
(1280x720, k=16, i=3) against the 1024-spp reference from job 023.
Writes /tmp/pg_protocol.json; run checkpoints land in /tmp/pg_protocol
so later jobs extend --runs without redoing these.  This first
increment also tells us the per-run cost so the escalation schedule
can be planned (r3 lesson: the single 18-run job blew 8.5h unobserved).
Reloads the module set (config/accel/wavefront/integrators/pathgraph)
so the fast-helper dump.py lands."""
import importlib
import sys

import nori_tpu.config as cfg
importlib.reload(cfg)
import nori_tpu.accel.pallas_mt as pm
importlib.reload(pm)
import nori_tpu.accel.traverse as tv
importlib.reload(tv)
import nori_tpu.interaction as itx
importlib.reload(itx)
import nori_tpu.integrators.base as ib
importlib.reload(ib)
import nori_tpu.integrators.path as ip
importlib.reload(ip)
import nori_tpu.wavefront as wf
importlib.reload(wf)
import nori_tpu.pathgraph.dump as pd
importlib.reload(pd)
import scripts.pathgraph_eval as pe
importlib.reload(pe)

sys.argv = [
    "pathgraph_eval.py", "--scene", "living_room",
    "--width", "1280", "--height", "720", "--detail", "5",
    "--runs", "3", "--k", "16", "--iters", "3",
    "--ref-exr", "/tmp/lr_1024.exr",
    "--out", "/tmp/pg_protocol",
    "--json-out", "/tmp/pg_protocol.json",
]
pe.main()
