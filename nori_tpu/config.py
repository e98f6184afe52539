"""Global execution configuration.

accel_mode selects the intersection backend:
  * "auto"   — Pallas MT sweep on TPU for scenes up to PALLAS_MAX_TRIS,
               chunked jnp sweep on CPU for small scenes, wide-BVH
               wavefront traversal otherwise.
  * "pallas" / "scan" / "bvh" — force a backend.

On the axon-tunneled TPU platform, loop-carried control flow is
expensive (~27us per fori_loop iteration, ~250us per while_loop
iteration due to host round-trips), which makes the dense Pallas sweep
the fastest option by a wide margin for reference-scale scenes.
"""

from __future__ import annotations

import jax

accel_mode: str = "auto"

#: use the MXU (matmul) form of the resident sweep.  Measured SLOWER
#: on v5e (fp32 matmul is emulated with 6 bf16 passes and each
#: per-visit matmul inside the serialized candidate loop pays ~2 us of
#: staging): 7.3 ms vs 5.2 ms on the cbox bounce distribution.  Kept
#: as an option for TPU generations with native fp32 MXU throughput.
USE_MXU_SWEEP: bool = False

#: use the Baldwin-Weber precomputed triangle transform in the
#: resident sweep (scene._build_tri_bw): ~40 VPU ops per pair test vs
#: Moller-Trumbore's ~56.  Same hit semantics (the |n.d| cutoff equals
#: MT's |det| cutoff exactly; u/v/t differ only at ULP level — the
#: living-room A/B had bit-identical hit sets).  The (12, T) operand
#: needs 33% more VMEM than the (9, T) soup, so eligibility is
#: 12*T*4 <= RESIDENT_VMEM_BUDGET.  Measured on v5e living-room
#: (51.7k tris, 131k sorted bounce rays): closest 6.89 -> 6.71 ms,
#: any-hit 5.96 -> 5.54 ms — modest because per-visit overhead and
#: the 33% larger VMEM loads offset part of the op saving.
USE_BW_SWEEP: bool = True

#: dense-sweep cutoff: above this triangle count use the BVH
PALLAS_MAX_TRIS = 1 << 17

#: resident-sweep visit width override for the CLOSEST-hit sweep
#: (None = the measured per-scale heuristic, traverse.auto_visit_w).
#: W candidate tiles are tested per while_loop iteration: wider
#: visits amortize the scalar loop step, but over-test up to W-1
#: tiles per ray tile at the skyline exit.  Measured on the
#: living-room 512k steady state (2026-08-20): closest sweep W=1
#: 15.7 ms vs W=2 19.1 — the closest skyline converges fast, so the
#: exit over-test dominates; any-hit W=2 15.4 vs W=1 16.0 — shadow
#: walks run longer and the amortized scalar step wins.  On cbox-
#: scale scenes W=1 wins for BOTH (12.66 -> 13.91 Mrays/s e2e).
SWEEP_VISIT_W: int | None = None

#: same override for the ANY-HIT (shadow) sweep; None = the
#: heuristic (NOT SWEEP_VISIT_W — the two sweeps' optima differ)
SWEEP_VISIT_W_ANYHIT: int | None = None

#: candidate-key row cap override (None = the measured per-scale
#: heuristic, traverse.auto_key_cap; 0 = uncapped).  Capping shrinks
#: the prefetched SMEM table so huge lane pools need fewer pallas
#: calls per sweep, at the price of an exact all-tiles fallback for
#: rows with more candidates.  Measured 2026-08-20 (living-room 512k
#: steady state): the 8-call uncapped sweep PIPELINES well enough
#: that capping to 2 calls is a ~20% LOSS (closest 15.7 -> 19.3 ms)
#: — the fallback's unskylined walks on the 0.8% overflow rows
#: dominate; same story 4x worse on ajax's 1058 DMA slabs (2.56 ->
#: 1.93 Mrays/s).  On mid-tile-count scenes (table, 178 tiles) the
#: cap measured a ~4% e2e win.
SWEEP_KEY_CAP: int | None = None

#: coherence-sort key tile-set coarsening factor: lane sort keys are
#: computed against tri_tile_bounds grouped by this factor.  Measured
#: (2026-08-20, living-room 512k): coarsen=4 trims the key kernel
#: 9.43 -> 8.29 ms with slightly BETTER grouping (union 793 -> 743
#: pairs/ray; e2e 11.97 -> 12.34 Mrays/s); coarsen=8 on ajax's 1058
#: slab bounds: 2.56 -> 2.81 Mrays/s.  None (default) = the measured
#: per-scale heuristic (wavefront.auto_key_coarsen: 4 on big resident
#: scenes, 8 on streamed-scale, exact otherwise); an int pins it.
SORT_KEY_COARSEN: int | None = None

#: streamed-sweep sub-slab culling granularity (0 disables — the
#: measured DEFAULT; ints must divide STREAM_T; requires
#: USE_BW_SWEEP=False — the sub-block AABBs come from the [v0|e1|e2]
#: rows, which the BW pack lacks).  NEGATIVE RESULT
#: (2026-08-20, r5): gating the MT compute per 128-triangle sub-block
#: of each DMA'd 512-slab with a scalar AABB test was built on the
#: observation that the slab granularity over-tests ~3x (union 3122
#: pairs/ray vs lane 1050 on the ajax bounce distribution), but
#: measured SLOWER: closest sweep 23.9 -> 29.4 ms (cull_t=128) ->
#: 48.9 ms (cull_t=64) — the per-sub-block lax.cond + 6 SMEM scalar
#: reads + cross-lane any() inside the serialized walk cost more than
#: the skipped compute, because sub-blocks of a candidate slab are
#: usually union-hit anyway (the candidate lists are already per-ray-
#: tile unions).  Machinery kept (exact, tested in interpret mode)
#: for hardware where scalar branches are cheaper.
STREAM_CULL_T: int = 0

#: merged closest+shadow single-launch wavefront step (resident-scale
#: path-family scenes only): the step's NEE shadow sweep and the NEXT
#: bounce's closest sweep ride ONE mixed pallas launch with a
#: per-ray-tile any-hit flag (pallas_mt.mt_sweep_resident_mixed), so
#: each step pays one launch sequence instead of two.  The NEE
#: visibility lands in the SAME step (the merged sweep runs after the
#: coherence sort; the pending NEE contribution is applied to the
#: permuted state/records afterwards), so occupancy and sample values
#: are unchanged (bit-exact, tested).  Measured A/B (2026-08-21, one
#: v5e chip, warm): table_mis 131k 7.42 -> 7.83 Mrays/s (+5.5% — the
#: capped-key band where 2N rays fit ONE pallas call, so the merge
#: genuinely halves launches); cbox 15.00 -> 14.26 (-5%: launches
#: were already cheap, the restructure overhead shows); living-room
#: 512k 12.89 -> 9.61 (-25%: both forms chunk to 16 calls — zero
#: launch saving — and the merged walk runs every tile at the
#: closest visit width; see tpu_jobs/README.md).  None = the
#: measured heuristic: merge exactly when the scene sits in the
#: capped-key band AND the combined 2N-ray sweep fits one call.
MERGED_SWEEP: bool | None = None

#: tests only: run Pallas kernels in interpret mode on CPU where the
#: production code would otherwise take a jnp fallback, so TPU-only
#: kernel branches get CI coverage
FORCE_PALLAS_INTERPRET: bool = False

#: NOTE (negative result, r3->r4): a "prekeyed sweeps" path that
#: carried exact per-lane candidate bitmasks through the coherence
#: sort and rebuilt both sweeps' per-ray-tile candidate tables from
#: them (replacing each sweep's own slab pass) was built, tested and
#: measured: a WASH for the closest sweep (20.29 vs 20.38 ms full MIS
#: step, living-room 131k lanes — the mask-emit matmul + OR-fold +
#: 16 extra carried sort columns cost what the removed entry pass
#: saved) and 23x over-inclusive for the shadow sweep via
#: segment-bundle bounds (148.7 vs 30.7 ms any-hit).  The ~725-line
#: machinery was removed; mt_sweep_resident_keyed (the caller-keyed
#: sweep entry point it validated) stays, tested.


def on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


def resolve_accel(num_tris: int) -> str:
    if accel_mode != "auto":
        return accel_mode
    if on_tpu():
        # resident sweep for reference-scale soups, HBM-streamed sweep
        # beyond the VMEM budget (ajax-class scans) — both "pallas"
        return "pallas"
    if num_tris <= PALLAS_MAX_TRIS:
        return "scan"
    return "bvh"
