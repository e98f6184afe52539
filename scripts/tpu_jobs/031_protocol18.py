"""Path-graph protocol increment: extend to --runs 15 (checkpoints in
/tmp/pg_protocol resume completed runs).  No module reloads: the
worker state is already at HEAD-relevant versions (030 reloaded) and
reloading would only force jit recompiles."""
import sys

import scripts.pathgraph_eval as pe

sys.argv = [
    "pathgraph_eval.py", "--scene", "living_room",
    "--width", "1280", "--height", "720", "--detail", "5",
    "--runs", "18", "--k", "16", "--iters", "3",
    "--ref-exr", "/tmp/lr_1024.exr",
    "--out", "/tmp/pg_protocol",
    "--json-out", "/tmp/pg_protocol.json",
]
pe.main()
