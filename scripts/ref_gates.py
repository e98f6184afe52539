"""Run the six reference statistical fixtures as an automated gate.

The reference ships six test-mode XMLs (src/ttest.cpp:58-219,
src/chi2test.cpp:42-226 semantics):

    pa5/tests/ttest-microfacet.xml     5 t-tests
    pa5/tests/test-direct.xml         15 t-tests (scene mode)
    pa5/tests/test-furnace.xml         6 t-tests (scene mode)
    pa5/tests/chi2test-microfacet.xml 15 chi^2 tests
    pa4/tests/test-mesh.xml            5 t-tests (scene mode)
    pa4/tests/test-mesh-furnace.xml    2 t-tests (scene mode)

Round 4 verified all six pass when run by hand but nothing recorded
it; this script runs them all in ONE warm backend session at FULL
reference strength and writes the pass counts to REF_GATES.json at the
repo root, so a regression in the full-strength gates is visible and
the artifact is regenerable (`python scripts/ref_gates.py`).  pytest
keeps covering reduced-sample variants (tests/test_bsdf.py,
tests/test_integrators.py); this is the full-strength record.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURES = [
    "/root/reference/scenes/pa5/tests/ttest-microfacet.xml",
    "/root/reference/scenes/pa5/tests/test-direct.xml",
    "/root/reference/scenes/pa5/tests/test-furnace.xml",
    "/root/reference/scenes/pa5/tests/chi2test-microfacet.xml",
    "/root/reference/scenes/pa4/tests/test-mesh.xml",
    "/root/reference/scenes/pa4/tests/test-mesh-furnace.xml",
]


def run_fixture(path: str, scale: int = 1) -> dict:
    from nori_tpu import load_from_xml, registry

    t0 = time.time()
    root = load_from_xml(path)
    if root.class_kind != registry.TEST:
        return {"error": f"not a test fixture: kind={root.class_kind}"}
    if scale > 1 and hasattr(root, "sample_count") \
            and "furnace" not in os.path.basename(path):
        # reduced-strength mode (CI on CPU): fewer samples only reduce
        # statistical POWER for the light-tailed fixtures — the
        # t-test/chi2 acceptance thresholds stay valid at any N (bins
        # below minExpFrequency are pooled).  The FURNACE fixtures are
        # exempt: their a=0.8 estimator is heavy-tailed and its prefix
        # means converge from BELOW (measured 2026-08-21: N=6k mean
        # 4.875, 12k 4.896, 25k 4.906, 50k 4.935 vs ref 5.0 — the
        # sample t-test spuriously REJECTS at any reduced N while the
        # full 100k passes), so they always run at full strength.
        root.sample_count = max(1000, int(root.sample_count) // scale)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ok = root.run(verbose=True)
    out = buf.getvalue()
    m = re.search(r"Passed (\d+)/(\d+)", out)
    passed, total = (int(m.group(1)), int(m.group(2))) if m else (0, 0)
    return {
        "ok": bool(ok),
        "passed": passed,
        "total": total,
        "seconds": round(time.time() - t0, 1),
    }


def main(out_path: str | None = None, scale: int = 1) -> int:
    import jax

    results = {}
    for path in FIXTURES:
        name = os.path.basename(path)
        if not os.path.exists(path):
            results[name] = {"error": "fixture missing from checkout"}
            continue
        try:
            results[name] = run_fixture(path, scale=scale)
        except Exception as e:  # record, keep gating the rest
            results[name] = {"error": str(e)}
        r = results[name]
        print(f"{name}: "
              + (f"{r['passed']}/{r['total']} "
                 f"({'OK' if r['ok'] else 'FAIL'}, {r['seconds']}s)"
                 if "ok" in r else f"ERROR {r['error']}"),
              flush=True)
    all_ok = all(r.get("ok") for r in results.values())
    artifact = {
        "backend": jax.default_backend(),
        "scale": scale,
        "all_ok": all_ok,
        "fixtures": results,
    }
    out_path = out_path or os.path.join(REPO, "REF_GATES.json")
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"{'ALL GATES PASS' if all_ok else 'GATE FAILURES'} "
          f"-> {out_path}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default=None)
    ap.add_argument("--scale", type=int, default=1,
                    help="divide fixture sample counts (CI on CPU)")
    args = ap.parse_args()
    sys.exit(main(args.out, scale=args.scale))
