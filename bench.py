"""Benchmark: path-MIS rendering throughput on the flagship workloads.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
Baseline (BASELINE.md): >= 100 Mrays/s aggregate on a v5e-8 for the
pa5 living-room workload at 1024 spp, i.e. 12.5 Mrays/s per chip; this
bench runs on the ONE attached chip, so `value` is single-chip
throughput on the named living-room-class workload and `vs_baseline`
divides by the full 100 (the 8-chip bar, not the per-chip share).

Measured set:
  living_room — the in-framework reconstruction of the absent pa5
      living-room scene (scenes_builtin.living_room, 51.7k triangles,
      1280x720 like the stored reference EXR).  Headline number.
  cbox_mis / table_mis — the richest reference pa5 scenes present in
      the checkout (800x600 path_mis).
Throughput is spp-independent once the lane pool is warm (the
persistent wavefront regenerates lanes), so the per-scene spp only
bounds bench runtime; the 1024-spp target workload runs at >= the
reported rate.  Warmup passes are excluded (first-touch on the axon
tunnel costs minutes and is not render throughput).
"""

from __future__ import annotations

import json
import os

BASELINE_MRAYS = 100.0       # v5e-8 aggregate target
PER_CHIP_TARGET = BASELINE_MRAYS / 8.0

# Per-scene sweep/sort tuning now lives in the dispatch itself as
# measured per-scale heuristics (traverse.auto_visit_w /
# auto_key_cap, wavefront.auto_key_coarsen — every A/B number is in
# config.py and scripts/tpu_jobs/README.md), so production renders
# get the same configs as the bench.  The tune dicts stay as explicit
# pins if a row ever needs to diverge from the heuristic.
LR_TUNE: dict = {}
CBOX_TUNE: dict = {}
TABLE_TUNE: dict = {}
AJAX_TUNE: dict = {}
REF_CBOX = "/root/reference/scenes/pa5/cbox/cbox_mis.xml"
REF_TABLE = "/root/reference/scenes/pa5/table/table_mis.xml"
REF_AJAX_N = "/root/reference/scenes/pa2/ajax-normals.xml"
REF_AJAX_R = "/root/reference/scenes/pa5/ajax/ajax-rough.xml"


def _bench_scene(scene, spp, n_lanes=131072, tune=None):
    """Render via the persistent wavefront; `tune` is a dict of
    per-scene config overrides (SWEEP_VISIT_W / SWEEP_VISIT_W_ANYHIT /
    SWEEP_KEY_CAP / SORT_KEY_COARSEN), each measured on this scene's
    own steady state — see the call sites for the numbers."""
    import numpy as np
    import jax.numpy as jnp
    from nori_tpu import config
    from nori_tpu.wavefront import render_wavefront

    saved = {}
    for k, v in (tune or {}).items():
        saved[k] = getattr(config, k)
        setattr(config, k, v)
    try:
        sd = scene.compile()
        float(jnp.sum(sd.tri_v0))        # materialize scene upload
        render_wavefront(scene, spp=spp, n_lanes=n_lanes, seed=0)  # warm
        img, stats = render_wavefront(
            scene, spp=spp, n_lanes=n_lanes, seed=1)
    finally:
        for k, v in saved.items():
            setattr(config, k, v)
    n_tris = int(np.sum(np.asarray(sd.tri_v0)[:, 0] < 1e29))
    return {
        "mrays_per_sec": round(stats["mrays_per_sec"], 3),
        # rays counts TRACED rays only: NEE shadow queries whose
        # contribution is provably zero (specular f=0) are culled
        # before the sweep, so samples_per_sec is the wall-clock
        # figure to compare across revisions
        "samples_per_sec": round(stats.get("samples_per_sec", 0.0), 0),
        "seconds": round(stats["seconds"], 2),
        "rays": stats["rays"],
        "spp": spp,
        "triangles": n_tris,
        "mean_radiance": round(float(np.mean(img)), 4),
        "occupancy": round(stats.get("occupancy", 0.0), 3),
        "steps": stats.get("steps", 0),
        "tune": {k: v for k, v in (tune or {}).items()},
    }


def _emit_unavailable(err: str) -> None:
    print(json.dumps({
        "metric": "mrays_per_sec_living_room",
        "value": 0.0,
        "unit": "Mrays/s (single chip)",
        "vs_baseline": 0.0,
        "error": f"TPU backend unavailable: {err}",
    }), flush=True)


def _attach_backend(timeout_s: int):
    """Bounded in-process backend attach.

    The axon tunnel sometimes hangs attach attempts for 15+ minutes
    (observed 2026-08-17: a wedged claim made every attach block and
    then fail UNAVAILABLE).  A watchdog thread turns that failure mode
    into a fast, explicit bench error instead of an indefinite hang
    with no JSON at all.  The attach happens on the MAIN thread so a
    healthy session is reused by the bench itself (a probe subprocess
    would need a second claim on the single-client tunnel).
    """
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            _emit_unavailable(f"backend attach exceeded {timeout_s}s")
            os._exit(2)

    threading.Thread(target=watchdog, daemon=True).start()
    try:
        import jax

        jax.devices()
    except Exception as e:
        done.set()
        _emit_unavailable(str(e).splitlines()[0])
        raise SystemExit(2)
    done.set()


def main():
    _attach_backend(int(os.environ.get("BENCH_ATTACH_TIMEOUT", "1200")))

    from nori_tpu.scenes_builtin import living_room, cornell_box

    breakdown = {}

    # spp=32 saturates lane-pool occupancy (0.700 @ spp=8 -> 0.736):
    # the 1024-spp target workload runs at >= this rate, and spp only
    # bounds bench runtime (~20 s at current throughput).  n_lanes =
    # 512k: measured lane-pool scaling on this workload (2026-08-19/20,
    # one v5e chip, warm): 131k -> 5.4, 262k -> 9.46, 512k -> 11.36,
    # 768k -> 11.06 Mrays/s — per-step fixed costs (sort overheads,
    # pipelined host sync) amortize across a wider pool faster than
    # drain-tail occupancy decays, until ~512k.  Per-scene tuning
    # (LR_TUNE etc.): measured per scene on its own steady state,
    # 2026-08-20 — see config.py for the per-knob numbers.
    lr = living_room(width=1280, height=720, spp=32, detail=5)
    breakdown["living_room"] = _bench_scene(
        lr, spp=32, n_lanes=524288, tune=LR_TUNE)

    # cbox/table/ajax run at spp=32 like the living-room row: the
    # metric is steady-state throughput on the high-spp target
    # workload, and low spp starves the 131k lane pool (table occ
    # 0.515 @ spp=8 -> 0.654 @ 32, cbox 0.716 -> 0.742); spp only
    # bounds bench runtime.
    if os.path.exists(REF_CBOX):
        from nori_tpu import load_from_xml

        cbox = load_from_xml(REF_CBOX)
    else:
        cbox = cornell_box(width=800, height=600, spp=16)
    breakdown["cbox_mis"] = _bench_scene(cbox, spp=32, tune=CBOX_TUNE)

    table = None
    if os.path.exists(REF_TABLE):
        from nori_tpu import load_from_xml

        table = load_from_xml(REF_TABLE)
        breakdown["table_mis"] = _bench_scene(
            table, spp=32, tune=TABLE_TUNE)

    # ajax-scale scenes (541k tris -> HBM-streamed sweep), through the
    # SAME persistent-wavefront production path as every other row so
    # the Mrays/s figures are comparable (traced rays, not camera
    # rays; r3 benched these through the q-batch driver and the rows
    # weren't).  The ajax scan itself is absent from the reference
    # checkout; the parser substitutes the procedural same-scale
    # stand-in (scenes_builtin.ajax_standin_meshdata).
    for name, path, spp in (("ajax_normals", REF_AJAX_N, 32),
                            ("ajax_rough", REF_AJAX_R, 32)):
        if not os.path.exists(path):
            continue
        try:
            from nori_tpu import load_from_xml

            sc = load_from_xml(path)
            breakdown[name] = _bench_scene(
                sc, spp=spp, n_lanes=131072, tune=AJAX_TUNE)
        except Exception as e:  # pragma: no cover - keep bench robust
            breakdown[name] = {"error": str(e)}

    # veach MIS stress (scenes/pa5/veach_mi): the canonical multiple-
    # importance-sampling scene; tests/test_veach_mis.py pins the
    # mats/ems/mis agreement, this row tracks its throughput
    veach = "/root/reference/scenes/pa5/veach_mi/veach_mis.xml"
    if os.path.exists(veach):
        try:
            from nori_tpu import load_from_xml

            sc = load_from_xml(veach)
            breakdown["veach_mis"] = _bench_scene(
                sc, spp=32, n_lanes=131072)
        except Exception as e:  # pragma: no cover - keep bench robust
            breakdown["veach_mis"] = {"error": str(e)}

    # kernel-level accounting per scene (profiling.kernel_report):
    # exact candidate pairs, pair-test rate and implied VPU FLOP/s for
    # the sweep on each scene's own bounce-ray distribution.  Reuses
    # the scenes just benched so their compiled stepper caches are warm.
    kernel = {}
    from nori_tpu.profiling import kernel_report

    scenes_for_kernel = [("living_room", lr), ("cbox_mis", cbox)]
    if table is not None:
        scenes_for_kernel.append(("table_mis", table))
    for name, sc in scenes_for_kernel:
        try:
            kernel[name] = kernel_report(sc)
        except Exception as e:  # pragma: no cover - diagnostics only
            kernel[name] = {"error": str(e)}

    headline = breakdown["living_room"]["mrays_per_sec"]
    print(json.dumps({
        "metric": "mrays_per_sec_living_room",
        "value": headline,
        "unit": "Mrays/s (single chip)",
        "vs_baseline": round(headline / BASELINE_MRAYS, 4),
        "per_chip_target": PER_CHIP_TARGET,
        "vs_per_chip_target": round(headline / PER_CHIP_TARGET, 4),
        "breakdown": breakdown,
        "kernel": kernel,
    }))


if __name__ == "__main__":
    main()
