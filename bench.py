"""Benchmark: path-MIS rendering throughput on the flagship workloads.

Prints JSON lines {"metric", "value", "unit", "vs_baseline", ...}; the
LAST line printed is always a complete, valid record.  Baseline
(BASELINE.md): >= 100 Mrays/s aggregate on a v5e-8 for the pa5
living-room workload at 1024 spp, i.e. 12.5 Mrays/s per chip; this
bench runs on the ONE attached chip, so `value` is single-chip
throughput on the named living-room-class workload and `vs_baseline`
divides by the full 100 (the 8-chip bar, not the per-chip share).

Un-losable by construction (round-4 lesson: BENCH_r04 was rc=124 with
no JSON at all because the single line printed only after 7 scenes x 2
renders + kernel reports):

  * a wall-clock budget (env BENCH_TIME_BUDGET, default 480 s) is
    tracked from process start, INCLUDING backend attach;
  * the headline living-room row runs first and its JSON line is
    flushed the moment it completes — everything after only ever
    *adds* rows;
  * the full record is re-flushed after EVERY completed row, so a kill
    at any point leaves the latest complete record as the last line;
  * each remaining row is cost-guarded against the time left (estimates
    seeded from the rows already measured this run) and skipped rows
    are recorded in "skipped".

Measured set:
  living_room — the in-framework reconstruction of the absent pa5
      living-room scene (scenes_builtin.living_room, 51.7k triangles,
      1280x720 like the stored reference EXR).  Headline number.
  cbox_mis / table_mis / veach_mis — the richest reference pa5 scenes
      present in the checkout (800x600-class path_mis).
  ajax_normals / ajax_rough — 541k-triangle HBM-streamed-sweep scale.
Throughput is spp-independent once the lane pool is warm (the
persistent wavefront regenerates lanes; measured r3/r4: spp only moves
the figure through pool occupancy, which saturates by spp~32 on 512k
lanes and spp~16 on 131k), so the per-scene spp only bounds bench
runtime; the 1024-spp target workload runs at >= the reported rate.
Warmup passes are excluded (first-touch compile through the axon
tunnel costs minutes and is not render throughput).
"""

from __future__ import annotations

import json
import os
import time

T0 = time.time()
BUDGET = float(os.environ.get("BENCH_TIME_BUDGET", "480"))
BASELINE_MRAYS = 100.0       # v5e-8 aggregate target
PER_CHIP_TARGET = BASELINE_MRAYS / 8.0

# Per-scene sweep/sort tuning lives in the dispatch itself as measured
# per-scale heuristics (traverse.auto_visit_w / auto_key_cap,
# wavefront.auto_key_coarsen — every A/B number is in config.py and
# scripts/tpu_jobs/README.md), so production renders get the same
# configs as the bench.  The tune dicts stay as explicit pins if a row
# ever needs to diverge from the heuristic.
LR_TUNE: dict = {}
CBOX_TUNE: dict = {}
TABLE_TUNE: dict = {}
AJAX_TUNE: dict = {}
REF_CBOX = "/root/reference/scenes/pa5/cbox/cbox_mis.xml"
REF_TABLE = "/root/reference/scenes/pa5/table/table_mis.xml"
REF_AJAX_N = "/root/reference/scenes/pa2/ajax-normals.xml"
REF_AJAX_R = "/root/reference/scenes/pa5/ajax/ajax-rough.xml"
REF_VEACH = "/root/reference/scenes/pa5/veach_mi/veach_mis.xml"


def remaining() -> float:
    return BUDGET - (time.time() - T0)


def _bench_scene(scene, spp, n_lanes=131072, tune=None):
    """Render via the persistent wavefront; `tune` is a dict of
    per-scene config overrides (SWEEP_VISIT_W / SWEEP_VISIT_W_ANYHIT /
    SWEEP_KEY_CAP / SORT_KEY_COARSEN), each measured on this scene's
    own steady state.  The warm pass runs at the SAME spp as the
    measurement — spp keys the compiled-stepper cache (chunk sizing),
    so a cheaper warm spp would just compile the wrong stepper."""
    import numpy as np
    import jax.numpy as jnp
    from nori_tpu import config
    from nori_tpu.wavefront import render_wavefront

    row_t0 = time.time()
    saved = {}
    for k, v in (tune or {}).items():
        saved[k] = getattr(config, k)
        setattr(config, k, v)
    # dispatch exactly like production render_to_files: the persistent
    # wavefront for path-family integrators, the batched sample-pass
    # driver otherwise (r4 routed ajax-normals through the wavefront
    # "for comparability" and silently benched a black MIS render of a
    # scene whose integrator is normals)
    wavefront = scene.integrator.plugin_name in (
        "path", "path_mats", "path_ems", "path_mis")
    try:
        sd = scene.compile()
        float(jnp.sum(sd.tri_v0))        # materialize scene upload
        if wavefront:
            render_wavefront(scene, spp=spp, n_lanes=n_lanes, seed=0)
            img, stats = render_wavefront(
                scene, spp=spp, n_lanes=n_lanes, seed=1)
        else:
            from nori_tpu.render import render

            render(scene, spp=spp, seed=0)   # warm
            img, stats = render(scene, spp=spp, seed=1)
    finally:
        for k, v in saved.items():
            setattr(config, k, v)
    n_tris = int(np.sum(np.asarray(sd.tri_v0)[:, 0] < 1e29))
    return {
        "driver": "wavefront" if wavefront else "batch",
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
        "row_seconds": round(time.time() - row_t0, 1),
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


def _attach_backend(timeout_s: float):
    """Bounded in-process backend attach.

    The axon tunnel sometimes hangs attach attempts for 15+ minutes
    (observed 2026-08-17: a wedged claim made every attach block and
    then fail UNAVAILABLE).  A watchdog thread turns that failure mode
    into a fast, explicit bench error instead of an indefinite hang
    with no JSON at all.  The attach happens on the MAIN thread so a
    healthy session is reused by the bench itself (a probe subprocess
    would need a second claim on the single-client tunnel)."""
    import threading

    # persistent compilation cache: the bench's dominant fixed cost is
    # stepper compiles through the axon tunnel (minutes); a pre-warmed
    # /tmp cache (any earlier bench/worker run this boot) turns them
    # into millisecond loads, keeping the whole bench inside the
    # driver's time budget.  Best-effort: unsupported backends just
    # skip it.
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            _emit_unavailable(f"backend attach exceeded {timeout_s:.0f}s")
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


class _Record:
    """The bench record; .flush() prints the CURRENT complete state as
    one JSON line.  Called after every row so the last stdout line is
    always valid whatever happens next."""

    def __init__(self):
        self.breakdown = {}
        self.kernel = {}
        self.skipped = []
        self.partial = True

    def flush(self):
        lr = self.breakdown.get("living_room", {})
        headline = lr.get("mrays_per_sec", 0.0)
        rec = {
            "metric": "mrays_per_sec_living_room",
            "value": headline,
            "unit": "Mrays/s (single chip)",
            "vs_baseline": round(headline / BASELINE_MRAYS, 4),
            "per_chip_target": PER_CHIP_TARGET,
            "vs_per_chip_target": round(headline / PER_CHIP_TARGET, 4),
            "elapsed_s": round(time.time() - T0, 1),
            "budget_s": BUDGET,
            "breakdown": self.breakdown,
            "kernel": self.kernel,
        }
        if self.skipped:
            rec["skipped"] = self.skipped
        if self.partial:
            rec["partial"] = True
        print(json.dumps(rec), flush=True)


def main():
    # the attach shares the overall budget: a slow-but-successful
    # attach eats bench time, a wedged one must fail while there is
    # still time to print the error line
    attach_cap = float(os.environ.get(
        "BENCH_ATTACH_TIMEOUT", str(max(60.0, BUDGET - 120.0))))
    _attach_backend(min(attach_cap, max(30.0, remaining() - 30.0)))

    from nori_tpu.scenes_builtin import living_room, cornell_box

    rec = _Record()

    # ------------------------------------------------------------------
    # headline row FIRST, flushed the moment it exists.
    # spp=32 saturates lane-pool occupancy (0.700 @ spp=8 -> 0.736);
    # n_lanes=512k: measured lane-pool scaling (2026-08-19/20, one v5e
    # chip, warm): 131k -> 5.4, 262k -> 9.46, 512k -> 11.36, 768k ->
    # 11.06 Mrays/s — per-step fixed costs amortize across a wider
    # pool faster than drain-tail occupancy decays, until ~512k.
    # ------------------------------------------------------------------
    lr = living_room(width=1280, height=720, spp=32, detail=5)
    rec.breakdown["living_room"] = _bench_scene(
        lr, spp=32, n_lanes=524288, tune=LR_TUNE)
    rec.flush()

    # remaining rows, cheapest-information-per-second first, each
    # cost-guarded.  Estimates: a small-scene row costs ~1 compile
    # (dominated by tunnel latency) + two short renders.  The estimate
    # is seeded from the living-room row's compile share and then
    # LEARNS from each completed row: the headline row bundles
    # attach-adjacent warmup (and with a cold /tmp/jax_cache, the
    # cache writes), so later rows are far cheaper — measured
    # 2026-08-21: lr row 205 s vs cbox 26.5 / table 32.5 warm, and
    # the static estimate skipped the ajax rows by 9 s.
    lr_row_s = rec.breakdown["living_room"]["row_seconds"]
    lr_render_s = 2 * rec.breakdown["living_room"]["seconds"]
    compile_obs = [max(30.0, lr_row_s - lr_render_s)]

    def compile_est():
        return min(compile_obs)

    def observe(row):
        if row and "row_seconds" in row:
            compile_obs.append(max(
                10.0, row["row_seconds"] - 2 * row.get("seconds", 0.0)))

    def guard(name, est_s):
        if remaining() < est_s + 20.0:
            rec.skipped.append({"row": name, "est_s": round(est_s, 0),
                                "remaining_s": round(remaining(), 0)})
            return False
        return True

    from nori_tpu import load_from_xml

    def xml_row(name, path, spp, n_lanes, tune, est_render_s):
        if not os.path.exists(path):
            return
        if not guard(name, compile_est() + est_render_s):
            return
        try:
            sc = load_from_xml(path)
            rec.breakdown[name] = _bench_scene(
                sc, spp=spp, n_lanes=n_lanes, tune=tune)
            observe(rec.breakdown[name])
        except Exception as e:  # pragma: no cover - keep bench robust
            rec.breakdown[name] = {"error": str(e)}
        rec.flush()
        return rec.breakdown.get(name)

    # cbox/table at spp=32 like the living-room row: the metric is
    # steady-state throughput on the high-spp target workload, and low
    # spp starves the 131k lane pool (table occ 0.515 @ spp=8 -> 0.654
    # @ 32, cbox 0.716 -> 0.742); spp only bounds bench runtime.
    if os.path.exists(REF_CBOX):
        xml_row("cbox_mis", REF_CBOX, 32, 131072, CBOX_TUNE, 10)
    elif guard("cbox_mis", compile_est() + 10):
        cbox = cornell_box(width=800, height=600, spp=16)
        rec.breakdown["cbox_mis"] = _bench_scene(
            cbox, spp=32, tune=CBOX_TUNE)
        rec.flush()

    xml_row("table_mis", REF_TABLE, 32, 131072, TABLE_TUNE, 8)

    # ajax-scale scenes (541k tris -> HBM-streamed sweep) through the
    # batch driver (their integrators are normals/whitted).  r5: the
    # fast one-gather helpers tripled the whitted row (2.53 -> 4.06 at
    # spp=4, 5.73 at spp=16 where the batch pool fills; measured
    # 2026-08-21, rows cost 0.4-2.7 s warm).  The ajax scan itself is
    # absent from the reference checkout; the parser substitutes the
    # procedural same-scale stand-in (scenes_builtin).
    xml_row("ajax_normals", REF_AJAX_N, 4, 131072, AJAX_TUNE, 15)
    xml_row("ajax_rough", REF_AJAX_R, 16, 131072, AJAX_TUNE, 25)

    # veach MIS stress (scenes/pa5/veach_mi): the canonical multiple-
    # importance-sampling scene; tests/test_veach_mis.py pins the
    # mats/ems/mis agreement, this row tracks its throughput
    xml_row("veach_mis", REF_VEACH, 16, 131072, None, 10)

    # kernel-level accounting (profiling.kernel_report): exact
    # candidate pairs, pair-test rate and implied VPU FLOP/s for the
    # sweep on the headline scene's own bounce-ray distribution.
    # Living-room only — the per-scene kernel numbers for cbox/table
    # are stable across rounds and live in scripts/tpu_jobs/README.md.
    if guard("kernel_living_room", 45):
        from nori_tpu.profiling import kernel_report

        try:
            rec.kernel["living_room"] = kernel_report(lr)
        except Exception as e:  # pragma: no cover - diagnostics only
            rec.kernel["living_room"] = {"error": str(e)}
        rec.flush()

    rec.partial = False
    rec.flush()


if __name__ == "__main__":
    main()
