"""Path-graph protocol at reference scale: full-res living room,
18 merged runs, k=16, i=3, opt — the fork's refDict observable."""
import sys
import importlib

sys.argv = [
    "pathgraph_eval.py", "--scene", "living_room",
    "--width", "1280", "--height", "720", "--detail", "5",
    "--runs", "18", "--k", "16", "--iters", "3",
    "--ref-exr", "/tmp/lr_1024.exr",
    "--out", "/tmp/pg_protocol",
    "--json-out", "/tmp/pg_protocol.json",
]
import scripts.pathgraph_eval as pe
importlib.reload(pe)
pe.main()
