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

#: tests only: run Pallas kernels in interpret mode on CPU where the
#: production code would otherwise take a jnp fallback, so TPU-only
#: kernel branches get CI coverage
FORCE_PALLAS_INTERPRET: bool = False

#: wavefront: derive the closest-hit sweep's per-ray-tile candidate
#: table from lane masks carried through the coherence sort + box-gap
#: entry bounds, instead of the sweep's own slab pass (see
#: pallas_mt.rt_cand_from_lane_masks).  Measured on v5e living-room
#: (51.7k tris, 131k lanes, steady state): candidacy is IDENTICAL to
#: the exact slab pass (7.9 tiles/ray-tile), images bit-identical, and
#: the step time is a WASH (20.29 vs 20.38 ms) — the mask-emit matmul,
#: OR-fold, and 16 extra carried sort columns cost what the removed
#: entry-key pass saved.  Default OFF: same speed, fewer kernels to
#: compile (~20 s less cold-start).  The machinery stays for scenes
#: where the trade differs; interpret-mode tests pin its correctness.
PREKEYED_SWEEPS: bool = False

#: with PREKEYED_SWEEPS: also replace the NEE shadow sweep's slab pass
#: with segment-bundle candidate keys (pallas_mt.shadow_segment_keys).
#: Default OFF: measured 23x over-inclusive on living-room (351.8 vs
#: 15.2 candidate tiles/ray-tile; any-hit sweep 148.7 vs 30.7 ms) —
#: per-ray-tile origin/light cluster radii span the scene once bounce
#: receivers spread, so the bundle admits nearly every tile.  The
#: exact per-lane slab pass stays the shadow path.
PREKEYED_SHADOW: bool = False


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
