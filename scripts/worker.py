"""Long-lived TPU worker: executes queued python snippets in one warm
process (the axon tunnel's first-fetch costs minutes and occasionally
hangs, so experiments share a single warmed session).

Usage: python scripts/worker.py &
Submit: write /tmp/nori_jobs/NNN_name.py; result -> NNN_name.out (+ .done)
"""

import io
import os
import sys
import time
import traceback
import contextlib

JOBS = "/tmp/nori_jobs"
os.makedirs(JOBS, exist_ok=True)

sys.path.insert(0, "/root/repo")

G = {"__name__": "__worker__"}

# warm the tunnel once
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

t0 = time.time()
float(jnp.sum(jnp.ones((128, 128))))
with open(os.path.join(JOBS, "WORKER_READY"), "w") as f:
    f.write(f"warm in {time.time() - t0:.1f}s devices={jax.devices()}\n")
print("worker ready", flush=True)

while True:
    jobs = sorted(
        f for f in os.listdir(JOBS)
        if f.endswith(".py") and not os.path.exists(
            os.path.join(JOBS, f + ".done"))
    )
    if not jobs:
        time.sleep(0.5)
        continue
    for job in jobs:
        path = os.path.join(JOBS, job)
        with open(path) as f:
            code = f.read()
        buf = io.StringIO()
        t0 = time.time()
        try:
            with contextlib.redirect_stdout(buf), \
                    contextlib.redirect_stderr(buf):
                exec(compile(code, job, "exec"), G)
            status = "OK"
        except Exception:
            buf.write(traceback.format_exc())
            status = "FAIL"
        out = buf.getvalue()
        with open(path + ".out", "w") as f:
            f.write(f"[{status} {time.time() - t0:.1f}s]\n{out}")
        with open(path + ".done", "w") as f:
            f.write(status)
        print(f"{job}: {status} ({time.time() - t0:.1f}s)", flush=True)
