"""Long-lived TPU worker: executes queued python snippets in one warm
process (the axon tunnel's first-fetch costs minutes and occasionally
hangs, so experiments share a single warmed session).

Usage: python scripts/worker.py &
Submit: write /tmp/nori_jobs/NNN_name.py; result -> NNN_name.out (+ .done)

Observability/salvage (added after a 8.5 h job died unobserved):
  CURRENT            which job is running + since when
  <job>.partial      the job's captured stdout so far (2 s cadence)
  SIGTERM            interrupts the running job, writes its partial
                     output as [INTERRUPTED], and exits cleanly — so
                     a graceful kill releases the single-client
                     tunnel WITHOUT losing the evidence collected so
                     far.  Never SIGKILL the worker first.
"""

import contextlib
import io
import os
import signal
import sys
import threading
import time
import traceback

JOBS = os.environ.get("NORI_JOBS", "/tmp/nori_jobs")
os.makedirs(JOBS, exist_ok=True)

sys.path.insert(0, "/root/repo")

G = {"__name__": "__worker__"}


class _Shutdown(Exception):
    pass


def _on_term(signum, frame):
    raise _Shutdown()


signal.signal(signal.SIGTERM, _on_term)

# warm the tunnel once
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

t0 = time.time()
float(jnp.sum(jnp.ones((128, 128))))
with open(os.path.join(JOBS, "WORKER_READY"), "w") as f:
    f.write(f"warm in {time.time() - t0:.1f}s devices={jax.devices()}\n")
print("worker ready", flush=True)


def _mirror(buf, path, stop):
    """Snapshot the captured stdout to <job>.partial every 2 s."""
    last = ""
    while not stop.wait(2.0):
        cur = buf.getvalue()
        if cur != last:
            with open(path, "w") as f:
                f.write(cur)
            last = cur


def run_one(job):
    path = os.path.join(JOBS, job)
    try:
        with open(path) as f:
            code = f.read()
    except FileNotFoundError:
        # job was renamed/deleted between the directory listing and
        # execution (observed 2026-08-21: a mid-batch rename killed
        # the whole worker loop); skip, the next listing is truth
        print(f"{job}: vanished before execution; skipping", flush=True)
        return "SKIPPED"
    buf = io.StringIO()
    cur = os.path.join(JOBS, "CURRENT")
    with open(cur, "w") as f:
        f.write(f"{job} started {time.strftime('%H:%M:%S')}\n")
    stop = threading.Event()
    t = threading.Thread(target=_mirror, args=(buf, path + ".partial",
                                               stop), daemon=True)
    t.start()
    t0 = time.time()
    try:
        with contextlib.redirect_stdout(buf), \
                contextlib.redirect_stderr(buf):
            exec(compile(code, job, "exec"), G)
        status = "OK"
    except _Shutdown:
        status = "INTERRUPTED"
    except Exception:
        buf.write(traceback.format_exc())
        status = "FAIL"
    finally:
        stop.set()
        t.join(timeout=5.0)
    out = buf.getvalue()
    with open(path + ".out", "w") as f:
        f.write(f"[{status} {time.time() - t0:.1f}s]\n{out}")
    if status != "INTERRUPTED":
        # interrupted jobs stay queued: a restarted worker retries them
        # (jobs are expected to checkpoint/resume their own long work)
        with open(path + ".done", "w") as f:
            f.write(status)
    for p in (path + ".partial", cur):
        if os.path.exists(p):
            os.remove(p)
    print(f"{job}: {status} ({time.time() - t0:.1f}s)", flush=True)
    return status


try:
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
            if run_one(job) == "INTERRUPTED":
                raise _Shutdown()
except _Shutdown:
    print("worker: shutdown requested; tunnel released", flush=True)
