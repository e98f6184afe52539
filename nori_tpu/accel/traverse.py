"""Wavefront ray–scene intersection on TPU.

Two paths:

* `intersect_brute` — tiled Möller–Trumbore over the whole triangle
  soup (the TPU analogue of the skeleton's brute-force loop,
  src/accel.cpp:24-55).  Used for small scenes and as the correctness
  oracle for the BVH.

* `intersect_bvh` — wavefront traversal of the 8-wide BVH: every ray
  carries a short stack; one `lax.while_loop` step pops one entry per
  ray and either (a) box-tests the node's 8 children and pushes the
  hits, or (b) Möller–Trumbore-tests the leaf's <=8 contiguous
  triangles.  All control flow is mask-based — the VPU runs both paths
  for every lane — because TPUs have no per-lane divergence.

Triangle test semantics match Mesh::rayIntersect (src/mesh.cpp:51-88):
det cutoff 1e-8, u in [0,1], v >= 0, u+v <= 1, t in [mint, maxt].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

STACK_DEPTH = 64
LEAF_ENC = 16  # leaf entries encode -(start*LEAF_ENC + count) - 1


class Hit(NamedTuple):
    valid: jnp.ndarray  # (N,) bool
    t: jnp.ndarray      # (N,)
    tri: jnp.ndarray    # (N,) int32 (undefined where !valid)
    u: jnp.ndarray      # (N,)
    v: jnp.ndarray      # (N,)


def _moller_trumbore(v0, e1, e2, o, d, mint, maxt):
    """Batched triangle test.  v0/e1/e2: (..., 3) broadcast against
    o/d: (..., 3).  Returns (hit, t, u, v)."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    ok = jnp.abs(det) > 1e-8
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t >= mint) & (t <= maxt)
    )
    return hit, t, u, v


def intersect_brute(scene, o, d, mint, maxt, chunk: int = 64) -> Hit:
    """Scan the full triangle soup in chunks; exact closest hit."""
    T = scene.tri_v0.shape[0]
    n_chunks = T // chunk
    v0 = scene.tri_v0.reshape(n_chunks, chunk, 3)
    e1 = scene.tri_e1.reshape(n_chunks, chunk, 3)
    e2 = scene.tri_e2.reshape(n_chunks, chunk, 3)
    idx = jnp.arange(T, dtype=jnp.int32).reshape(n_chunks, chunk)

    N = o.shape[0]
    init = (
        jnp.full((N,), jnp.inf, dtype=jnp.float32),
        jnp.full((N,), -1, dtype=jnp.int32),
        jnp.zeros((N,), dtype=jnp.float32),
        jnp.zeros((N,), dtype=jnp.float32),
    )

    def body(carry, tri_chunk):
        best_t, best_i, best_u, best_v = carry
        cv0, ce1, ce2, cidx = tri_chunk
        hit, t, u, v = _moller_trumbore(
            cv0[None, :, :], ce1[None, :, :], ce2[None, :, :],
            o[:, None, :], d[:, None, :], mint[:, None], maxt[:, None],
        )
        t = jnp.where(hit, t, jnp.inf)
        j = jnp.argmin(t, axis=-1)
        rows = jnp.arange(N)
        tj = t[rows, j]
        better = tj < best_t
        best_i = jnp.where(better, cidx[j], best_i)
        best_u = jnp.where(better, u[rows, j], best_u)
        best_v = jnp.where(better, v[rows, j], best_v)
        best_t = jnp.where(better, tj, best_t)
        return (best_t, best_i, best_u, best_v), None

    (best_t, best_i, best_u, best_v), _ = jax.lax.scan(
        body, init, (v0, e1, e2, idx)
    )
    return Hit(valid=best_i >= 0, t=best_t, tri=best_i, u=best_u, v=best_v)


def _ray_box(bmin, bmax, o, inv_d, mint, maxt):
    """Slab test; bmin/bmax: (N, W, 3); o/inv_d: (N, 1, 3);
    mint/maxt: (N, 1).  Returns (hit (N,W), entry_t (N,W))."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    tmin = jnp.max(tn, axis=-1)
    tmax = jnp.min(tf, axis=-1)
    hit = (tmin <= tmax) & (tmax >= mint) & (tmin <= maxt)
    return hit, tmin


#: static step budget before falling back to the data-dependent tail
#: loop.  On the axon TPU platform a while_loop cond costs ~250us per
#: iteration (host round-trip) while fori_loop costs ~27us, so we run a
#: fixed number of steps branch-free and only enter the while_loop for
#: the rare rays that still have stack entries.
FIXED_STEPS = 40


def intersect_bvh(scene, o, d, mint, maxt, any_hit: bool = False,
                  fixed_steps: int = FIXED_STEPS) -> Hit:
    """Stack-based wavefront BVH traversal (closest hit or any-hit)."""
    N = o.shape[0]
    L = 8  # leaf triangle block size (accel.bvh.LEAF_SIZE)
    W = scene.bvh_child.shape[1]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)

    stack0 = jnp.zeros((N, STACK_DEPTH), dtype=jnp.int32)
    sp0 = jnp.ones((N,), dtype=jnp.int32)  # root pushed
    state0 = (
        stack0, sp0,
        jnp.minimum(maxt, jnp.inf).astype(jnp.float32),  # best_t (= maxt)
        jnp.full((N,), -1, dtype=jnp.int32),
        jnp.zeros((N,), dtype=jnp.float32),
        jnp.zeros((N,), dtype=jnp.float32),
    )
    rows = jnp.arange(N)
    lane_offsets = jnp.arange(L, dtype=jnp.int32)

    def cond(state):
        _, sp, _, best_i, _, _ = state
        alive = sp > 0
        if any_hit:
            alive = alive & (best_i < 0)
        return jnp.any(alive)

    def body(state):
        stack, sp, best_t, best_i, best_u, best_v = state
        active = sp > 0
        if any_hit:
            active = active & (best_i < 0)
        spm1 = jnp.maximum(sp - 1, 0)
        entry = stack[rows, spm1]
        sp = jnp.where(active, spm1, sp)

        is_leaf = active & (entry < 0)
        is_node = active & (entry >= 0)

        # ---- interior: test W children, push hits -------------------------
        node = jnp.where(is_node, entry, 0)
        child = scene.bvh_child[node]          # (N, W)
        count = scene.bvh_count[node]          # (N, W)
        bmin = scene.bvh_bmin[node]            # (N, W, 3)
        bmax = scene.bvh_bmax[node]
        box_hit, _ = _ray_box(
            bmin, bmax, o[:, None, :], inv_d[:, None, :],
            mint[:, None], best_t[:, None],
        )
        box_hit = box_hit & (count >= 0) & is_node[:, None]
        enc = jnp.where(
            count > 0, -(child * LEAF_ENC + count) - 1, child
        ).astype(jnp.int32)
        # push positions: sp + exclusive prefix count of hits
        pos = sp[:, None] + jnp.cumsum(box_hit, axis=-1) - box_hit
        # Entries past STACK_DEPTH are dropped by mode="drop"; sp must
        # count only entries actually written, else later pops read
        # garbage from slot STACK_DEPTH-1 (silently wrong hits).  Build
        # guarantees depth*(W-1)+1 <= STACK_DEPTH (bvh.py), so kept ==
        # box_hit in practice; this is the safety net.
        kept = box_hit & (pos < STACK_DEPTH)
        pos = jnp.where(kept, pos, STACK_DEPTH)
        stack = stack.at[rows[:, None], pos].set(enc, mode="drop")
        sp = sp + jnp.sum(kept, axis=-1)

        # ---- leaf: test L contiguous triangles ----------------------------
        lv = -entry - 1
        start = jnp.where(is_leaf, lv // LEAF_ENC, 0)
        lcount = jnp.where(is_leaf, lv % LEAF_ENC, 0)
        tri_idx = start[:, None] + lane_offsets[None, :]   # (N, L)
        tv0 = scene.tri_v0[tri_idx]
        te1 = scene.tri_e1[tri_idx]
        te2 = scene.tri_e2[tri_idx]
        hit, t, u, v = _moller_trumbore(
            tv0, te1, te2, o[:, None, :], d[:, None, :],
            mint[:, None], best_t[:, None],
        )
        hit = hit & (lane_offsets[None, :] < lcount[:, None]) & is_leaf[:, None]
        t = jnp.where(hit, t, jnp.inf)
        j = jnp.argmin(t, axis=-1)
        tj = t[rows, j]
        better = tj < best_t
        best_i = jnp.where(better, tri_idx[rows, j], best_i)
        best_u = jnp.where(better, u[rows, j], best_u)
        best_v = jnp.where(better, v[rows, j], best_v)
        best_t = jnp.where(better, tj, best_t)
        return stack, sp, best_t, best_i, best_u, best_v

    # static-bound phase (cheap loop) ...
    state = jax.lax.fori_loop(
        0, fixed_steps, lambda i, s: body(s), state0
    )
    # ... then drain stragglers with the data-dependent loop
    state = jax.lax.while_loop(cond, body, state)
    _, _, best_t, best_i, best_u, best_v = state
    return Hit(valid=best_i >= 0, t=best_t, tri=best_i, u=best_u, v=best_v)


def auto_visit_w(n_tt: int, any_hit: bool) -> int:
    """Measured per-scale resident-sweep visit widths (2026-08-20,
    one v5e chip; scripts/tpu_jobs/README.md has the A/Bs):
    small scenes (exact-bitmask-sort scale) walk a few tiles, so the
    W-wide skyline over-test dominates -> W=1 for both query types
    (cbox 12.66 -> 13.91 Mrays/s e2e); big scenes' closest walks also
    converge fast (W=1: 15.7 vs 19.1 ms at 512k) while shadow walks
    run long enough to amortize the scalar step (W=2: 15.4 vs 16.0)."""
    if n_tt <= 28:
        return 1
    if n_tt > 256:
        return 2 if any_hit else 1
    from nori_tpu.accel.pallas_mt import VISIT_W

    return VISIT_W


def auto_key_cap(n_tt: int, streamed: bool) -> int:
    """Measured per-scale candidate-key-row caps (same log): capping
    loses wherever the exact all-tiles overflow fallback engages
    (living-room 404 tiles: 15.7 -> 19.3 ms; ajax 1058 slabs: 2.56 ->
    1.93 Mrays/s) and wins on mid-tile-count scenes where rows
    genuinely fit (table 178 tiles: +4% e2e)."""
    if streamed:
        return 0
    if 28 < n_tt <= 256:
        return 127
    return 0


def _sweep_any(scene, rays, any_hit: bool):
    """(t, idx) sweep dispatch: VMEM-resident kernel for reference-
    scale soups, HBM-streamed kernel for ajax-scale ones (the scene's
    tile-bound granularity was chosen by the same budget test at
    compile, scene.py).  Visit width and key-row cap default to the
    measured per-scale heuristics (auto_visit_w / auto_key_cap);
    config.SWEEP_VISIT_W[_ANYHIT] / SWEEP_KEY_CAP pin them.  The MXU
    form is OFF by default: measured on the v5e chip, the fp32 matmul
    emulation (6 bf16 passes) plus per-visit matmul staging inside
    the serialized while_loop costs ~2 us/visit, losing to the VPU
    block (7.3 ms vs 5.2 ms on the cbox bounce distribution) despite
    doing 3x fewer VPU ops/pair.  Kept selectable for hardware with
    native fp32 MXU throughput."""
    from nori_tpu import config
    from nori_tpu.accel.pallas_mt import (
        RESIDENT_VMEM_BUDGET, RESIDENT_MXU_VMEM_BUDGET,
        mt_sweep_resident, mt_sweep_streamed,
    )

    T = scene.tri_packed.shape[1]
    n_tt = scene.tri_tile_bounds.shape[0]
    streamed = 9 * T * 4 > RESIDENT_VMEM_BUDGET
    key_cap = (auto_key_cap(n_tt, streamed)
               if config.SWEEP_KEY_CAP is None else config.SWEEP_KEY_CAP)
    if streamed:
        # Baldwin-Weber operand when the scene carries the 16-row
        # streamed BW pack (scene.compile builds it for streamed-scale
        # soups): the slab DMA ships 16 rows either way, so BW costs
        # no bandwidth and drops the pair test from ~56 to ~40 VPU ops
        use_bw_s = (config.USE_BW_SWEEP
                    and scene.tri_bw.shape[0] == 16
                    and scene.tri_bw.shape[1] == T)
        return mt_sweep_streamed(
            scene.tri_bw if use_bw_s else scene.tri_packed,
            scene.tri_tile_bounds, rays,
            any_hit=any_hit, key_cap=key_cap,
            # resolved HERE (not inside the jitted callee) so config
            # A/Bs retrace: cull_t / use_bw are static jit args
            cull_t=config.STREAM_CULL_T, use_bw=use_bw_s)
    use_mxu = (config.USE_MXU_SWEEP
               and scene.tri_mxu.size * 4 <= RESIDENT_MXU_VMEM_BUDGET)
    use_bw = (config.USE_BW_SWEEP and not use_mxu
              and scene.tri_bw.shape[1] == T
              and 12 * T * 4 <= RESIDENT_VMEM_BUDGET)
    tris_op = scene.tri_packed
    if use_mxu:
        tris_op = scene.tri_mxu
    elif use_bw:
        tris_op = scene.tri_bw
    vw_cfg = (config.SWEEP_VISIT_W_ANYHIT if any_hit
              else config.SWEEP_VISIT_W)
    visit_w = auto_visit_w(n_tt, any_hit) if vw_cfg is None else vw_cfg
    return mt_sweep_resident(
        tris_op, scene.tri_tile_bounds, scene.scene_bounds,
        rays, any_hit=any_hit, use_mxu=use_mxu, use_bw=use_bw,
        visit_w=visit_w, key_cap=key_cap,
    )


def intersect_mixed(scene, oc, dc, mintc, maxtc, os_, ds_, mints, maxts,
                    raw: bool = False):
    """MERGED dual query: closest-hit on (oc..) and any-hit on (os_..)
    in ONE sweep launch (resident Pallas path; other backends fall
    back to two calls).  Returns (Hit for the closest set, occluded
    bool for the shadow set); with raw=True, (t, idx, occ) with t/idx
    PADDED to the sweep width and no barycentric epilogue — the
    wavefront's merged step carries (t, idx) across the step boundary
    and runs sweep_hit_epilogue at consumption.  The merged step pays
    one launch floor per step instead of two
    (scripts/tpu_jobs/README.md next-step design #2)."""
    from nori_tpu import config
    from nori_tpu.accel.pallas_mt import (
        RESIDENT_VMEM_BUDGET, TILE_N, mt_sweep_resident_mixed, pack_rays,
    )

    mode = config.resolve_accel(scene.tri_v0.shape[0])
    T = scene.tri_packed.shape[1]
    streamed = 9 * T * 4 > RESIDENT_VMEM_BUDGET
    if mode != "pallas" or streamed:
        hit = intersect(scene, oc, dc, mintc, maxtc)
        occ = occluded(scene, os_, ds_, mints, maxts)
        if raw:
            t = jnp.where(hit.valid, hit.t, jnp.inf)
            idx = jnp.where(hit.valid, hit.tri, -1)
            return t, idx, occ
        return hit, occ

    rays_c, n_c = pack_rays(oc, dc, mintc, maxtc)
    rays_s, n_s = pack_rays(os_, ds_, mints, maxts)
    rays = jnp.concatenate([rays_c, rays_s], axis=1)
    n_rt_c = rays_c.shape[1] // TILE_N
    n_rt = rays.shape[1] // TILE_N
    tile_ah = (jnp.arange(n_rt, dtype=jnp.int32) >= n_rt_c
               ).astype(jnp.int32)

    n_tt = scene.tri_tile_bounds.shape[0]
    key_cap = (auto_key_cap(n_tt, False)
               if config.SWEEP_KEY_CAP is None else config.SWEEP_KEY_CAP)
    use_bw = (config.USE_BW_SWEEP
              and scene.tri_bw.shape[1] == T
              and 12 * T * 4 <= RESIDENT_VMEM_BUDGET)
    tris_op = scene.tri_bw if use_bw else scene.tri_packed
    # ONE static visit width for both query types.  Measured on the
    # 512k living-room steady state (job 027b, 2026-08-21): the mixed
    # launch at the closest heuristic W=1 is 48.2 ms vs the separate
    # sweeps' 43.0 — the W=1 penalty on the SHADOW half dominates at
    # scale — while W=2 lands at 43.3 ms (the closest half's W=2
    # over-test does NOT reproduce at this pool size).  Use the
    # ANY-HIT heuristic.
    vw = (auto_visit_w(n_tt, True) if config.SWEEP_VISIT_W_ANYHIT is None
          else config.SWEEP_VISIT_W_ANYHIT)
    t, idx = mt_sweep_resident_mixed(
        tris_op, scene.tri_tile_bounds, scene.scene_bounds, rays,
        tile_ah, use_bw=use_bw, visit_w=vw, key_cap=key_cap)
    Nc = rays_c.shape[1]
    occ = (idx[Nc:] >= 0)[:n_s]
    if raw:
        return t[:Nc], idx[:Nc], occ
    hit = sweep_hit_epilogue(scene, rays_c, t[:Nc], idx[:Nc], n_c)
    return hit, occ


def _occluded_pallas_sorted(scene, o, d, mint, maxt) -> jnp.ndarray:
    """Shadow query with its OWN coherence sort.

    Shadow rays arrive in the wavefront's bounce-ray sort order, which
    is near-random for THEIR candidate sets (measured on living-room:
    4153 union pairs/ray vs 1616 under their own first3 key).  Sorting
    costs two extra lax.sorts (permute + inverse) but more than pays
    for itself once the scene has enough tiles; gate at the caller.
    """
    from nori_tpu.accel.pallas_mt import lane_sort_keys, pack_rays

    rays, n = pack_rays(o, d, mint, maxt)
    k1, k2 = lane_sort_keys(scene.tri_tile_bounds, rays)
    N = rays.shape[1]
    iota = jnp.arange(N, dtype=jnp.int32)
    _, _, perm = jax.lax.sort((k1, k2, iota), num_keys=2)
    _, idx = _sweep_any(scene, rays[:, perm], any_hit=True)
    # undo the permutation by sorting the hit bits back by lane id
    _, hit = jax.lax.sort(
        (perm, (idx >= 0).astype(jnp.int32)), num_keys=1)
    return (hit > 0)[:n]


def sweep_hit_epilogue(scene, rays, t, idx, n) -> Hit:
    """(t, idx) sweep results -> Hit with barycentrics.

    The sweep kernels track only (t, idx); reconstruct the winning
    triangle's barycentrics with one Moller-Trumbore per RAY (a
    gather of the winner + ~30 flops — negligible next to the
    sweep).  Consumers of Hit.u/v (fill_interaction, whitted/ao
    dumps) rely on them.  Shadow queries need none of it."""
    tri = jnp.maximum(idx, 0)
    # ONE fused row gather (XLA TPU pays ~per-row): tri_attr
    # carries v0|e1|e2 in cols 19:28
    aw = scene.tri_attr[tri]
    v0w, e1w, e2w = aw[:, 19:22], aw[:, 22:25], aw[:, 25:28]
    ow = rays[0:3].T
    dw = rays[3:6].T
    pv = jnp.cross(dw, e2w)
    det = jnp.sum(e1w * pv, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    tv = ow - v0w
    u = jnp.clip(jnp.sum(tv * pv, axis=-1) * inv_det, 0.0, 1.0)
    qv = jnp.cross(tv, e1w)
    v = jnp.clip(jnp.sum(dw * qv, axis=-1) * inv_det, 0.0, 1.0)
    miss = idx < 0
    u = jnp.where(miss, 0.0, u)
    v = jnp.where(miss, 0.0, v)
    return Hit(valid=idx[:n] >= 0, t=t[:n], tri=idx[:n], u=u[:n], v=v[:n])


def _intersect_pallas(scene, o, d, mint, maxt, any_hit: bool = False) -> Hit:
    from nori_tpu.accel.pallas_mt import pack_rays

    rays, n = pack_rays(o, d, mint, maxt)
    t, idx = _sweep_any(scene, rays, any_hit=any_hit)
    if any_hit:
        u = v = jnp.zeros_like(t)
        return Hit(valid=idx[:n] >= 0, t=t[:n], tri=idx[:n],
                   u=u[:n], v=v[:n])
    return sweep_hit_epilogue(scene, rays, t, idx, n)


def intersect(scene, o, d, mint, maxt) -> Hit:
    """Closest-hit query (Scene::rayIntersect, scene.h:75-85).

    Dispatches to the Pallas dense sweep / chunked jnp sweep / BVH
    according to nori_tpu.config (decided at trace time).
    """
    from nori_tpu import config

    mode = config.resolve_accel(scene.tri_v0.shape[0])
    if mode == "pallas":
        return _intersect_pallas(scene, o, d, mint, maxt)
    if mode == "scan":
        return intersect_brute(scene, o, d, mint, maxt)
    return intersect_bvh(scene, o, d, mint, maxt, any_hit=False)


#: tile count above which the shadow query's own coherence sort pays
#: for its two extra lax.sorts (HBM-streamed scenes only: for
#: VMEM-resident soups the any-hit early exit already prunes the walk
#: — measured on the 51.7k-tri living-room steady state, 131k lanes:
#: own-first6-sort 9.9 ms vs NO sort 9.3 ms despite 3299-vs-727 union
#: candidate pairs/ray, identical results.  Streamed scenes pay real
#: HBM DMA per visited tile, so grouping still pays there.)
OCCLUDED_SORT_MIN_TILES = 64


def occluded(scene, o, d, mint, maxt, presort: bool | None = None
             ) -> jnp.ndarray:
    """Shadow-ray query (Scene::rayIntersect shadowRay=true,
    scene.h:87-97): any hit in (mint, maxt).

    presort: sort the rays by their own candidate key before the sweep
    (None = auto by scene size; only meaningful on the Pallas path)."""
    from nori_tpu import config

    mode = config.resolve_accel(scene.tri_v0.shape[0])
    if mode == "pallas":
        from nori_tpu.accel.pallas_mt import RESIDENT_VMEM_BUDGET

        if presort is None:
            presort = (
                9 * scene.tri_packed.shape[1] * 4 > RESIDENT_VMEM_BUDGET)
        if presort:
            return _occluded_pallas_sorted(scene, o, d, mint, maxt)
        return _intersect_pallas(scene, o, d, mint, maxt, any_hit=True).valid
    if mode == "scan":
        return intersect_brute(scene, o, d, mint, maxt).valid
    return intersect_bvh(scene, o, d, mint, maxt, any_hit=True).valid
