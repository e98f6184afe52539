"""Pallas TPU kernel: culled brute-force Möller–Trumbore intersection.

The reference's per-ray BVH walk maps badly to TPU (per-lane dynamic
addressing -> serialized XLA gathers/scatters).  For the scene sizes the
reference ships (<= ~26k triangles) the speed-of-light design is a
dense ray x triangle sweep shaped like a matmul:

  grid = (ray_tiles, tri_tiles); triangle tile data lives in VMEM and is
  reused across the ray tile; each kernel instance evaluates a
  (TILE_N x TILE_T) block of Möller–Trumbore tests on the VPU and folds
  a running closest-hit (argmin) epilogue into VMEM scratch.  The TPU
  grid is sequential over the last axis, so the scratch accumulates
  across triangle tiles and is flushed on the final tile.

Tile culling: each (ray-tile, tri-tile) pair first tests the tri tile's
AABB (triangles are BVH-reordered at scene compile, so tiles are
spatially coherent) against the ray tile's conservative reach — an
interval-arithmetic box spanned by the tile's origins and directions up
to t_hi = max over lanes of min(best_t, maxt, dist-to-scene bound).
best_t shrinks as earlier tiles hit, so later tiles are pruned entirely
(@pl.when skips the 45-flop MT block).  Coherent ray tiles (primary,
shadow) prune most of the scene; incoherent bounce tiles degrade to the
dense sweep.

Triangle test semantics match src/mesh.cpp:51-88 exactly (det cutoff
1e-8, u in [0,1], v >= 0, u+v <= 1, t in [mint, maxt]).

Layouts: tris packed (9, T) = [v0|e1|e2] x [x,y,z]; rays packed (8, N) =
[ox,oy,oz,dx,dy,dz,mint,maxt]; tile bounds (T/TILE_T, 8) =
[bmin|bmax|pad]; all padded to tile multiples.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256   # rays per tile (sublane-major)
TILE_T = 512   # triangles per tile, 2-D streamed kernel (lane-major)
#: resident-kernel triangle tile: one lane register wide.  Finer tiles
#: cut tested pairs ~4x on the reference pa5 scenes (measured: table
#: 1.6k -> 0.42k pairs/ray, cbox 2.2k -> 0.59k with mask-sorted rays)
#: because each 256-lane ray tile only sweeps the union of its lanes'
#: slab-test candidates.  Scene tile bounds are built at this
#: granularity; the 2-D kernel derives its coarse 512-tile bounds by
#: reduction.
FINE_T = 128

#: HBM-streamed kernel DMA slab size (triangles per visited tile) for
#: soups too big for VMEM residence; larger than FINE_T so each visit's
#: compute hides the copy latency.  Scene tile bounds are built at this
#: granularity for streamed-scale scenes.
STREAM_T = 512

#: sub-slab culling granularity inside the streamed kernel: the MT
#: compute on each DMA'd STREAM_T slab runs per STREAM_CULL_T block,
#: gated by a scalar AABB test (see _mt_stream_kernel).  0 disables —
#: the default: measured a 23% LOSS at 128 on the v5e (the scalar
#: branch + pred cost exceeds the skipped compute; the negative
#: result is logged at config.STREAM_CULL_T).
STREAM_CULL_T = 0

#: resident kernel: candidate tiles tested per while_loop iteration.
#: The loop-carried scalar step (SMEM key fetch, cross-lane t_hi
#: reduction, while_loop control) costs a large fraction of each
#: ~FINE_T-tile visit; W-wide visits amortize it W-ways while keeping
#: the candidate LIST exact at FINE_T granularity (the only waste is
#: over-testing at the skyline exit boundary, < W-1 tiles per ray
#: tile).  See bench notes in the module docstring.
VISIT_W = 2


def _mt_kernel(order_ref, scene_ref, tb_ref, entry_ref, tri_ref, ray_ref,
               t_ref, idx_ref, u_ref, v_ref,
               bt_ref, bi_ref, bu_ref, bv_ref, *,
               cull: bool, any_hit: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    # actual triangle tile for this step: per-ray-tile near-to-far
    # order (prefetched), so best_t shrinks early and culls the rest
    jj = order_ref[i, j]

    rays = ray_ref[:, :]        # (8, TILE_N)

    def col(i):  # ray scalar component as (TILE_N, 1)
        return rays[i, :].reshape(TILE_N, 1)

    ox, oy, oz = col(0), col(1), col(2)
    dx, dy, dz = col(3), col(4), col(5)
    mint, maxt = col(6), col(7)

    @pl.when(j == 0)
    def _init():
        bt_ref[0, :] = jnp.full((TILE_N,), jnp.inf, jnp.float32)
        bi_ref[0, :] = jnp.full((TILE_N,), -1, jnp.int32)
        bu_ref[0, :] = jnp.zeros((TILE_N,), jnp.float32)
        bv_ref[0, :] = jnp.zeros((TILE_N,), jnp.float32)

    if cull:
        # conservative ray-tile reach vs this tri tile's AABB
        cx = scene_ref[0, 0]
        cy = scene_ref[0, 1]
        cz = scene_ref[0, 2]
        half_diag = scene_ref[0, 3]
        live = (mint <= maxt)
        if any_hit:
            # shadow query: a lane with any hit is done; drop it from
            # the reach so converged tiles skip entirely (early-out)
            live = live & (bi_ref[0, :].reshape(TILE_N, 1) < 0)
        big = jnp.float32(3e37)
        dist_c = jnp.sqrt(
            (ox - cx) ** 2 + (oy - cy) ** 2 + (oz - cz) ** 2
        )
        t_cap = jnp.minimum(
            jnp.minimum(bt_ref[0, :].reshape(TILE_N, 1), maxt),
            dist_c + half_diag,
        )
        t_hi = jnp.max(jnp.where(live, t_cap, 0.0))
        t_hi = jnp.maximum(t_hi, 0.0)

        def axis_reach(o_c, d_c):
            o_lo = jnp.min(jnp.where(live, o_c, big))
            o_hi = jnp.max(jnp.where(live, o_c, -big))
            d_lo = jnp.min(jnp.where(live, d_c, 0.0))
            d_hi = jnp.max(jnp.where(live, d_c, 0.0))
            lo = o_lo + t_hi * jnp.minimum(d_lo, 0.0)
            hi = o_hi + t_hi * jnp.maximum(d_hi, 0.0)
            return lo, hi

        rxl, rxh = axis_reach(ox, dx)
        ryl, ryh = axis_reach(oy, dy)
        rzl, rzh = axis_reach(oz, dz)
        overlap = (
            (rxh >= tb_ref[jj, 0]) & (rxl <= tb_ref[jj, 3])
            & (ryh >= tb_ref[jj, 1]) & (ryl <= tb_ref[jj, 4])
            & (rzh >= tb_ref[jj, 2]) & (rzl <= tb_ref[jj, 5])
        )
        # tight skyline bound: the nearest slab-entry of any live lane
        # into this tile must not exceed the farthest useful t.  With
        # tiles visited in entry order, once best_t converges every
        # remaining tile skips (pays only the grid-step overhead).
        overlap = overlap & (entry_ref[i, jj] <= t_hi)
        if any_hit:
            overlap = overlap & jnp.any(live)
    else:
        overlap = True

    @pl.when(overlap)
    def _compute():
        tris = tri_ref[:, :]        # (9, TILE_T)

        def trow(i):  # tri component as (1, TILE_T)
            return tris[i, :].reshape(1, TILE_T)

        v0x, v0y, v0z = trow(0), trow(1), trow(2)
        e1x, e1y, e1z = trow(3), trow(4), trow(5)
        e2x, e2y, e2z = trow(6), trow(7), trow(8)

        # pvec = d x e2  -> (TILE_N, TILE_T) per component
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) > 1e-8
        inv_det = 1.0 / jnp.where(ok, det, 1.0)

        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        # qvec = tvec x e1
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        hit = (
            ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= mint) & (t <= maxt)
        )

        tm = jnp.where(hit, t, jnp.inf)          # (TILE_N, TILE_T)
        tile_min = jnp.min(tm, axis=1, keepdims=True)
        is_min = (tm == tile_min) & hit
        lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, TILE_T), 1)
        # break ties toward the lowest lane index (cumsum is unsupported
        # in Mosaic, so use a min-reduce over masked lane ids instead)
        min_lane = jnp.min(
            jnp.where(is_min, lane, jnp.int32(TILE_T)), axis=1,
            keepdims=True,
        )
        first = is_min & (lane == min_lane)
        fsel = first.astype(jnp.float32)
        sel_idx = jnp.sum(jnp.where(first, lane, 0), axis=1) + jj * TILE_T
        sel_u = jnp.sum(u * fsel, axis=1)
        sel_v = jnp.sum(v * fsel, axis=1)
        tile_min1 = tile_min[:, 0]

        better = tile_min1 < bt_ref[0, :]
        bt_ref[0, :] = jnp.where(better, tile_min1, bt_ref[0, :])
        bi_ref[0, :] = jnp.where(better, sel_idx, bi_ref[0, :])
        bu_ref[0, :] = jnp.where(better, sel_u, bu_ref[0, :])
        bv_ref[0, :] = jnp.where(better, sel_v, bv_ref[0, :])

    @pl.when(j == n_j - 1)
    def _flush():
        t_ref[0, :] = bt_ref[0, :]
        idx_ref[0, :] = bi_ref[0, :]
        u_ref[0, :] = bu_ref[0, :]
        v_ref[0, :] = bv_ref[0, :]


def _mt_block(tris, ox, oy, oz, dx, dy, dz, mint, maxt):
    """(TILE_N x TILE_T) Moller-Trumbore tests; returns (hit, t, u, v).

    tris: (9, TILE_T) packed [v0|e1|e2] x [x,y,z]; ray components are
    (TILE_N, 1) columns.  Semantics match src/mesh.cpp:51-88.
    """
    tile_t = tris.shape[1]

    def trow(i):
        return tris[i, :].reshape(1, tile_t)

    v0x, v0y, v0z = trow(0), trow(1), trow(2)
    e1x, e1y, e1z = trow(3), trow(4), trow(5)
    e2x, e2y, e2z = trow(6), trow(7), trow(8)

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) > 1e-8
    inv_det = 1.0 / jnp.where(ok, det, 1.0)

    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t >= mint) & (t <= maxt)
    )
    return hit, t, u, v


def _bw_block(tris, ox, oy, oz, dx, dy, dz, mint, maxt):
    """(TILE_N x TILE_T) Baldwin-Weber tests; returns (hit, t, u, v).

    tris: (12, TILE_T) precomputed transform rows
    [n(3) | d_plane | U(3) | u_w | V(3) | v_w] (scene._build_tri_bw):
    t from the plane equation, (u, v) as affine functions of the hit
    point.  ~40 VPU ops/pair vs Moller-Trumbore's ~56 — same hit set
    as src/mesh.cpp:51-88 (identical |den| = |det| cutoff at 1e-8,
    u/v/t rounded differently only at ULP level).
    """
    tile_t = tris.shape[1]

    def trow(i):
        return tris[i, :].reshape(1, tile_t)

    nx, ny, nz, dn = trow(0), trow(1), trow(2), trow(3)
    ux, uy, uz, uw = trow(4), trow(5), trow(6), trow(7)
    vx, vy, vz, vw = trow(8), trow(9), trow(10), trow(11)

    den = nx * dx + ny * dy + nz * dz
    ok = jnp.abs(den) > 1e-8
    inv_den = 1.0 / jnp.where(ok, den, 1.0)
    t = -(nx * ox + ny * oy + nz * oz + dn) * inv_den
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    u = ux * px + uy * py + uz * pz + uw
    v = vx * px + vy * py + vz * pz + vw
    hit = (
        ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t >= mint) & (t <= maxt)
    )
    return hit, t, u, v


def _mt_resident_kernel(oe_ref, *rest,
                        n_tt: int, idx_bits: int, any_hit: bool,
                        use_mxu: bool, use_bw: bool = False,
                        visit_w: int = VISIT_W,
                        n_keys: int | None = None,
                        overflow: bool = False,
                        mixed: bool = False):
    """Resident sweep: 1-D grid over ray tiles; the WHOLE triangle soup
    lives in VMEM and an in-kernel while_loop walks this ray tile's
    candidate triangle tiles in entry order, exiting as soon as the
    nearest untested tile lies beyond every lane's useful t (skyline).

    The candidate list is exact (the preamble slab-tests every lane
    against every FINE_T-tile AABB), so the loop body is just the MT
    block + the closest-hit fold + one t_hi reduction — no per-
    iteration AABB reach test (measured: the old reach/overlap
    recompute cost ~1.5-2 us of the ~5.7 us per visited tile).

    Motivation vs the 2-D grid (measured): the 2-D grid pays ~3.5 us
    per (ray tile, tri tile) grid step even when culled, which floors a
    131k-ray sweep at ~9 ms regardless of occupancy.  Here skipped
    tiles cost nothing and idle ray tiles exit after one bound check.

    oe_ref holds ONE packed int32 per (ray tile, candidate rank): the
    tile's minimum slab-entry distance bit-or'd with the tile index in
    the low mantissa bits (see _pack_entry_keys), rows ascending.
    Decoding gives the visit order AND a conservative entry lower
    bound for the skyline exit from a single SMEM word — replacing the
    old [order | entry] pair, which cost a separate argsort +
    take_along_axis on the host side (measured 2.1 ms/sweep at 131k
    rays x 404 tiles; the packed single-array sort costs ~half) and
    twice the SMEM.  Prefetched SMEM operands are padded to 128 lanes
    each, so operand COUNT (not width) is what blows the 1MB SMEM
    budget (the caller also chunks rays to bound n_rt).

    use_mxu: tri_ref is the (10, 4*T) weight matrix (SceneData.tri_mxu)
    and each visit is a (TILE_N, 10) x (10, 4*FINE_T) fp32 matmul on
    the systolic array producing [det | u_num | v_num | t_num] blocks;
    the VPU keeps only the reciprocal + compare + fold epilogue (~20
    ops/pair instead of the ~60-op Moller-Trumbore block).

    mixed: a second prefetched scalar operand ah_ref (n_rt,) int32
    carries a PER-RAY-TILE any-hit flag, so one launch sweeps closest-
    hit ray tiles and shadow (any-hit) ray tiles together — the merged
    dual-query design (one launch floor per step instead of two).  The
    unified exit rule live_n = live0 & (~ah | bi < 0), alive =
    t_hi(live_n) > 0 reproduces both static exits: closest tiles have
    ah = 0 so live_n = live0; any-hit tiles stop counting lanes the
    moment they record any hit, and t_hi > 0 == any(live_n) because a
    live lane's t_cap = min(inf, maxt) = maxt > 0 (live means
    mint <= maxt with mint > 0 for every produced ray).

    Layout notes (all measured on the v5e chip): rays stay (8, TILE_N)
    — the lane->sublane reshape of the 8 components compiles to a fast
    layout, whereas loading rays ROW-major (TILE_N, 8) makes the
    (TILE_N,1)x(1,FINE_T) MT broadcasts 3x slower.  t and idx leave as
    ONE packed (TILE_N, 2) block: the old four separate (1, TILE_N)
    output writes floored a zero-visit 131k-ray sweep at ~3 ms; packed,
    the floor is ~1.2 ms.
    """
    if n_keys is None:
        n_keys = n_tt
    if mixed:
        ah_ref, tri_ref, ray_ref, t_ref = rest
    else:
        tri_ref, ray_ref, t_ref = rest
    i = pl.program_id(0)
    rays = ray_ref[:, :]
    if mixed:
        ah = ah_ref[i] != 0

    def col(c):
        return rays[c, :].reshape(TILE_N, 1)

    ox, oy, oz = col(0), col(1), col(2)
    dx, dy, dz = col(3), col(4), col(5)
    mint, maxt = col(6), col(7)

    live0 = (mint <= maxt)

    def t_hi_of(bt, live):
        # scalar t_hi as INT bits: every capped value is >= 0, so the
        # float order equals the int-bitcast order and the skyline
        # check against the packed keys' entry bits needs no scalar
        # int->float bitcast (Mosaic only bitcasts vectors)
        t_cap = jnp.where(live, jnp.minimum(bt, maxt), 0.0)
        t_cap = jnp.maximum(t_cap, 0.0)
        return jnp.max(jax.lax.bitcast_convert_type(t_cap, jnp.int32))

    bt0 = jnp.full((TILE_N, 1), jnp.inf, jnp.float32)
    bi0 = jnp.full((TILE_N, 1), -1, jnp.int32)

    idx_mask = jnp.int32((1 << idx_bits) - 1)

    def cond(carry):
        k, t_hi, alive, bt, bi = carry
        kc = jnp.minimum(k, n_keys - 1)  # avoid OOB read at k == n_keys
        lb_bits = oe_ref[i, kc] & ~idx_mask
        # non-candidate ranks decode to inf bits > any finite t_hi
        return (k < n_keys) & alive & (lb_bits <= t_hi)

    if use_mxu:
        cxr = oy * dz - oz * dy
        cyr = oz * dx - ox * dz
        czr = ox * dy - oy * dx
        feats = jnp.concatenate(
            [ox, oy, oz, dx, dy, dz, cxr, cyr, czr,
             jnp.ones((TILE_N, 1), jnp.float32),
             jnp.zeros((TILE_N, 6), jnp.float32)], axis=1)  # (N, 16)

    def visit(jj, bt, bi):
        """Test triangle tile jj against every lane; fold closest."""
        if use_mxu:
            w = tri_ref[:, pl.ds(jj * 4 * FINE_T, 4 * FINE_T)]
            prod = jax.lax.dot_general(
                feats, w, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )                                   # (N, 4*FINE_T)
            det = prod[:, 0 * FINE_T:1 * FINE_T]
            un = prod[:, 1 * FINE_T:2 * FINE_T]
            vn = prod[:, 2 * FINE_T:3 * FINE_T]
            tn = prod[:, 3 * FINE_T:4 * FINE_T]
            ok = jnp.abs(det) > 1e-8
            r = 1.0 / jnp.where(ok, det, 1.0)
            u = un * r
            v = vn * r
            t = tn * r
            hit = (
                ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                & (u + v <= 1.0) & (t >= mint) & (t <= maxt)
            )
        else:
            tris = tri_ref[:, pl.ds(jj * FINE_T, FINE_T)]
            blk = _bw_block if use_bw else _mt_block
            hit, t, u, v = blk(
                tris, ox, oy, oz, dx, dy, dz, mint, maxt)
        tm = jnp.where(hit, t, jnp.inf)
        tile_min = jnp.min(tm, axis=1, keepdims=True)
        # ties break toward the lowest lane index; u/v are NOT
        # selected here — the interaction fill recomputes them from
        # the winning triangle (one row of the attribute gather it
        # already does), which cuts the per-visit epilogue from 5
        # lane reductions to 2
        is_min = (tm == tile_min) & hit
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_N, FINE_T), 1)
        min_lane = jnp.min(
            jnp.where(is_min, lane, jnp.int32(FINE_T)),
            axis=1, keepdims=True)
        better = tile_min < bt
        bt = jnp.where(better, tile_min, bt)
        bi = jnp.where(better, min_lane + jj * FINE_T, bi)
        return bt, bi

    def fold(bt, bi):
        """Exit-rule epilogue shared by both walks: recompute the
        skyline t_hi and whether any lane still needs tiles."""
        if mixed:
            # runtime per-tile flag: see the docstring's equivalence
            # argument.  `ah` is an SMEM scalar; the select broadcasts.
            live_n = live0 & ((bi < 0) | jnp.logical_not(ah))
            t_hi_n = t_hi_of(bt, live_n)
            return t_hi_n, t_hi_n > 0
        if any_hit:
            live_n = live0 & (bi < 0)
            alive = jnp.any(live_n)
        else:
            live_n = live0
        t_hi_n = t_hi_of(bt, live_n)
        if not any_hit:
            alive = t_hi_n > 0   # int bits: 0 == float 0.0
        return t_hi_n, alive

    def body(carry):
        k, t_hi, alive, bt, bi = carry
        # W consecutive candidate ranks per iteration: the SMEM fetch /
        # MT block / closest-hit fold repeat per rank, but the scalar
        # while_loop step and the cross-lane t_hi reduction run ONCE.
        # Ranks past the walk end clamp to the last key; at worst they
        # re-test a tile already folded (idempotent) or a non-candidate
        # tile (pure miss) — correct either way.
        for w_i in range(visit_w):
            kk = jnp.minimum(k + w_i, n_keys - 1) if w_i else k
            jj = oe_ref[i, kk] & idx_mask
            bt, bi = visit(jj, bt, bi)
        t_hi_n, alive = fold(bt, bi)
        return k + visit_w, t_hi_n, alive, bt, bi

    t_hi0 = t_hi_of(bt0[:, :1], live0)
    alive0 = jnp.any(live0)
    k_end, _, _, bt, bi = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), t_hi0, alive0, bt0, bi0),
    )

    if overflow:
        # K-capped key rows: when this ray tile's candidate list was
        # truncated (flag word after the stored keys), the stored walk
        # may not cover every candidate — finish EXACTLY by sweeping
        # ALL tiles in index order.  Re-testing stored tiles is
        # idempotent; aliveness restarts from the fold state (the
        # stored walk's skyline exit can't prove coverage of the
        # STORED keys here, but it DOES prove the truncated ones:
        # keys are lb-sorted and truncation keeps the smallest, so a
        # skyline exit at k_end < n_keys means every truncated
        # candidate has lb >= the stored key that failed > t_hi and
        # provably cannot contribute — only walks that ran off the
        # end (k_end >= n_keys; cond tests k < n_keys before the lb
        # word, so the clamped key read never masks this) need the
        # exact fallback.  This gate removed the dominant cost of the
        # measured 15.7 -> 19.3 ms cap loss (ADVICE r4).
        ov = (oe_ref[i, n_keys] != 0) & (k_end >= n_keys)
        t_hi_f, alive_f = fold(bt, bi)

        def cond2(carry):
            j, t_hi, alive, bt, bi = carry
            return (j < n_tt) & alive

        def body2(carry):
            j, t_hi, alive, bt, bi = carry
            for w_i in range(visit_w):
                jj = jnp.minimum(j + w_i, n_tt - 1) if w_i else j
                bt, bi = visit(jj, bt, bi)
            t_hi_n, alive = fold(bt, bi)
            return j + visit_w, t_hi_n, alive, bt, bi

        start = jnp.where(ov, jnp.int32(0), jnp.int32(n_tt))
        _, _, _, bt, bi = jax.lax.while_loop(
            cond2, body2, (start, t_hi_f, alive_f, bt, bi))

    t_ref[:, 0:1] = bt
    t_ref[:, 1:2] = jax.lax.bitcast_convert_type(bi, jnp.float32)


def _mt_stream_kernel(oe_ref, qb_ref, tri_hbm, ray_ref, t_ref, buf, sem,
                      *, n_tt: int, idx_bits: int, tile_t: int,
                      any_hit: bool, n_keys: int | None = None,
                      overflow: bool = False, n_sub: int = 1,
                      use_bw: bool = False):
    """HBM-streamed sweep for scenes whose triangle soup exceeds VMEM
    (the reference's ajax-class scans, ~544k tris:
    scenes/pa2/ajax-normals.xml, src/accel.cpp:24-29's assignment
    target).  Same candidate machinery as the resident kernel — packed
    entry keys, skyline exit — but each visited tile's (9, tile_t)
    triangle slab is DMA'd from HBM into a double buffer: the copy for
    visit k+1 is issued before computing visit k, so the ~2 us DMA
    latency hides behind the MT block (tile_t is larger than FINE_T to
    keep the compute phase longer than the copy).

    DMA bookkeeping invariant: the prologue starts the k=0 copy, every
    loop body waits copy k and starts copy k+1 (index clamped), so
    exactly one copy is in flight at loop exit — the epilogue waits it.

    n_sub > 1 enables SUB-SLAB culling: the DMA unit stays the full
    tile_t slab (latency amortization) but the MT compute runs per
    tile_t/n_sub sub-block, each gated by a cheap scalar-bounds slab
    test against the tile's live-lane skyline (qb_ref: per-sub-block
    AABBs, 8 floats each, prefetched to SMEM).  At ajax scale the
    512-triangle slab granularity over-tests ~3x vs the lanes' true
    candidate sets (measured r5: union 3122 pairs/ray vs lane 1050),
    so skipping provably-missed 128-triangle quarters converts that
    over-test directly into time.
    """
    if n_keys is None:
        n_keys = n_tt
    i = pl.program_id(0)
    rays = ray_ref[:, :]

    def col(c):
        return rays[c, :].reshape(TILE_N, 1)

    ox, oy, oz = col(0), col(1), col(2)
    dx, dy, dz = col(3), col(4), col(5)
    mint, maxt = col(6), col(7)
    live0 = (mint <= maxt)
    idx_mask = jnp.int32((1 << idx_bits) - 1)
    if n_sub > 1:
        tiny = jnp.float32(1e-20)

        def _inv(c):
            return 1.0 / jnp.where(
                jnp.abs(c) < tiny, jnp.where(c < 0, -tiny, tiny), c)

        inv_dx, inv_dy, inv_dz = _inv(dx), _inv(dy), _inv(dz)

    def t_hi_of(bt, live):
        t_cap = jnp.where(live, jnp.minimum(bt, maxt), 0.0)
        t_cap = jnp.maximum(t_cap, 0.0)
        return jnp.max(jax.lax.bitcast_convert_type(t_cap, jnp.int32))

    def jj_of(k):
        return oe_ref[i, jnp.minimum(k, n_keys - 1)] & idx_mask

    def copy_tile(jj, slot):
        return pltpu.make_async_copy(
            tri_hbm.at[:, pl.ds(jj * tile_t, tile_t)],
            buf.at[slot], sem.at[slot])

    def copy_for(k):
        return copy_tile(jj_of(k), jax.lax.rem(k, 2))

    copy_for(0).start()

    bt0 = jnp.full((TILE_N, 1), jnp.inf, jnp.float32)
    bi0 = jnp.full((TILE_N, 1), -1, jnp.int32)

    sub_t = tile_t // n_sub

    def _fold_block(tris_sub, base, bt, bi):
        """Pair-test one (rows, sub_t) block; base = global tri
        offset.  The 16-row DMA slab carries either [v0|e1|e2|0*7] or
        [bw(12)|0*4]; both block variants read only their rows."""
        blk = _bw_block if use_bw else _mt_block
        hit, t, u, v = blk(
            tris_sub, ox, oy, oz, dx, dy, dz, mint, maxt)
        tm = jnp.where(hit, t, jnp.inf)
        tile_min = jnp.min(tm, axis=1, keepdims=True)
        is_min = (tm == tile_min) & hit
        lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, sub_t), 1)
        min_lane = jnp.min(
            jnp.where(is_min, lane, jnp.int32(sub_t)),
            axis=1, keepdims=True)
        better = tile_min < bt
        bt = jnp.where(better, tile_min, bt)
        bi = jnp.where(better, min_lane + base, bi)
        return bt, bi

    def _sub_pred(qi, bt, bi):
        """Can ANY live lane hit sub-block qi's AABB before its current
        best/maxt?  Scalar bounds from SMEM broadcast into lane ops."""
        lox, loy, loz = (qb_ref[qi * 8 + 0], qb_ref[qi * 8 + 1],
                         qb_ref[qi * 8 + 2])
        hix, hiy, hiz = (qb_ref[qi * 8 + 3], qb_ref[qi * 8 + 4],
                         qb_ref[qi * 8 + 5])
        t0x = (lox - ox) * inv_dx
        t1x = (hix - ox) * inv_dx
        t0y = (loy - oy) * inv_dy
        t1y = (hiy - oy) * inv_dy
        t0z = (loz - oz) * inv_dz
        t1z = (hiz - oz) * inv_dz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        if any_hit:
            live = live0 & (bi < 0)
            t_cap = maxt
        else:
            live = live0
            t_cap = jnp.minimum(bt, maxt)
        ok = live & (tn <= tf) & (tf >= mint) & (tn <= t_cap)
        return jnp.any(ok)

    def fold_tile(jj, slot, bt, bi):
        tris = buf[slot]
        if n_sub == 1:
            return _fold_block(tris, jj * tile_t, bt, bi)
        for s in range(n_sub):
            tris_sub = tris[:, s * sub_t:(s + 1) * sub_t]
            bt, bi = jax.lax.cond(
                _sub_pred(jj * n_sub + s, bt, bi),
                lambda bt_bi, ts=tris_sub, ss=s: _fold_block(
                    ts, jj * tile_t + ss * sub_t, *bt_bi),
                lambda bt_bi: bt_bi,
                (bt, bi))
        return bt, bi

    def fold_alive(bt, bi):
        if any_hit:
            live_n = live0 & (bi < 0)
            alive = jnp.any(live_n)
        else:
            live_n = live0
        t_hi_n = t_hi_of(bt, live_n)
        if not any_hit:
            alive = t_hi_n > 0
        return t_hi_n, alive

    def cond(carry):
        k, t_hi, alive, bt, bi = carry
        lb_bits = oe_ref[i, jnp.minimum(k, n_keys - 1)] & ~idx_mask
        return (k < n_keys) & alive & (lb_bits <= t_hi)

    def body(carry):
        k, t_hi, alive, bt, bi = carry
        copy_for(k + 1).start()
        copy_for(k).wait()
        bt, bi = fold_tile(jj_of(k), jax.lax.rem(k, 2), bt, bi)
        t_hi_n, alive = fold_alive(bt, bi)
        return k + 1, t_hi_n, alive, bt, bi

    t_hi0 = t_hi_of(bt0[:, :1], live0)
    alive0 = jnp.any(live0)
    k_end, _, _, bt, bi = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), t_hi0, alive0, bt0, bi0),
    )
    copy_for(k_end).wait()   # the one copy still in flight

    if overflow:
        # truncated candidate rows: finish EXACTLY by streaming ALL
        # tiles in index order (same fallback as the resident kernel,
        # with the same k_end gate — a skyline exit before the stored
        # keys ran out proves the lb-sorted truncated candidates
        # cannot contribute; see ray_tile_entry_keys).  The prologue
        # copy and epilogue wait are predicated on ov so the ~99% of
        # rows that never overflowed don't pay a wasted slab DMA
        # start+wait (ADVICE r4); inside pl.when the bookkeeping
        # invariant (exactly one copy in flight at every wait) holds
        # because the loop can only run when ov is true.
        ov = (oe_ref[i, n_keys] != 0) & (k_end >= n_keys)
        t_hi_f, alive_f = fold_alive(bt, bi)
        start = jnp.where(ov & alive_f, jnp.int32(0), jnp.int32(n_tt))

        @pl.when(ov)
        def _start_fb():
            copy_tile(jnp.minimum(start, n_tt - 1),
                      jax.lax.rem(start, 2)).start()

        def cond2(carry):
            j, t_hi, alive, bt, bi = carry
            return (j < n_tt) & alive

        def body2(carry):
            j, t_hi, alive, bt, bi = carry
            copy_tile(jnp.minimum(j + 1, n_tt - 1),
                      jax.lax.rem(j + 1, 2)).start()
            copy_tile(j, jax.lax.rem(j, 2)).wait()
            bt, bi = fold_tile(j, jax.lax.rem(j, 2), bt, bi)
            t_hi_n, alive = fold_alive(bt, bi)
            return j + 1, t_hi_n, alive, bt, bi

        j_end, _, _, bt, bi = jax.lax.while_loop(
            cond2, body2, (start, t_hi_f, alive_f, bt, bi))

        @pl.when(ov)
        def _wait_fb():
            copy_tile(jnp.minimum(j_end, n_tt - 1),
                      jax.lax.rem(j_end, 2)).wait()

    t_ref[:, 0:1] = bt
    t_ref[:, 1:2] = jax.lax.bitcast_convert_type(bi, jnp.float32)


def _stream_call(tris_packed, tile_bounds, rays_packed, any_hit: bool,
                 key_cap: int | None = None,
                 cull_t: int | None = None, use_bw: bool = False):
    """One pallas_call of the streamed kernel over all given rays.
    tris_packed rows must be 8-aligned on TPU (scene.compile pads
    streamed soups to 16 rows) for the HBM DMA slices."""
    rows, T = tris_packed.shape
    _, N = rays_packed.shape
    n_rt = N // TILE_N
    n_tt = tile_bounds.shape[0]
    tile_t = T // n_tt

    if key_cap is None:
        key_cap = 1 << 24    # uncapped — the measured streamed-scale default
    order_entry, idx_bits = ray_tile_entry_keys(
        tile_bounds, rays_packed, cap=key_cap)
    n_cols = order_entry.shape[1]
    overflow = n_cols != n_tt
    n_keys = n_cols - 1 if overflow else n_tt

    # sub-slab culling bounds (see _mt_stream_kernel): recomputed from
    # the packed soup per sweep (one 19 MB HBM scan at ajax scale,
    # ~30 us — not worth a SceneData field).  cull_t is resolved by
    # the NON-jitted mt_sweep_streamed wrapper (resolving config here
    # would freeze the first-traced value into the jit cache);
    # None reaching this point means disabled.  Incompatible with the
    # Baldwin-Weber operand (the sub-block AABBs come from the
    # [v0|e1|e2] rows, which the BW pack does not carry).
    n_sub = tile_t // cull_t if (cull_t and tile_t % cull_t == 0
                                 and tile_t > cull_t
                                 and not use_bw) else 1
    if n_sub > 1:
        v0 = tris_packed[0:3]
        p1 = v0 + tris_packed[3:6]
        p2 = v0 + tris_packed[6:9]
        lo = jnp.minimum(v0, jnp.minimum(p1, p2))
        hi = jnp.maximum(v0, jnp.maximum(p1, p2))
        nq = T // cull_t
        lo = lo.reshape(3, nq, cull_t).min(-1)
        hi = hi.reshape(3, nq, cull_t).max(-1)
        qb = jnp.concatenate(
            [lo.T, hi.T, jnp.zeros((nq, 2), jnp.float32)],
            axis=1).reshape(-1)
    else:
        qb = jnp.zeros((8,), jnp.float32)

    kernel = functools.partial(
        _mt_stream_kernel, n_tt=n_tt, idx_bits=idx_bits, tile_t=tile_t,
        any_hit=any_hit, n_keys=n_keys, overflow=overflow, n_sub=n_sub,
        use_bw=use_bw)
    interpret = jax.default_backend() == "cpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_rt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # soup stays in HBM
            pl.BlockSpec((8, TILE_N), lambda i, *pref: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 2), lambda i, *pref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows, tile_t), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=45 * N * tile_t * 8, bytes_accessed=4 * (9 * T + 24 * N),
            transcendentals=0,
        ),
        interpret=interpret,
    )(order_entry, qb, tris_packed, rays_packed)
    return out[:, 0], jax.lax.bitcast_convert_type(out[:, 1], jnp.int32)


def mt_sweep_streamed(tris_packed, tile_bounds, rays_packed,
                      any_hit: bool = False,
                      key_cap: int | None = None,
                      cull_t: int | None = None,
                      use_bw: bool = False):
    """HBM-streamed sweep; returns (t, idx) each (N,), idx == -1 miss.
    Rays are chunked so the prefetched key table fits the SMEM budget.
    key_cap: None/0 = uncapped (the DEFAULT — K-capping is a measured
    LOSS at streamed scale: ajax 2.56 -> 1.93 Mrays/s, because
    overflow rows re-DMA every slab; see config.SWEEP_KEY_CAP's log);
    a positive cap K-caps the key rows with the exact all-tiles
    fallback (see ray_tile_entry_keys) — opt-in for tests and for
    callers whose scenes measured a cap win.
    cull_t: None resolves config.STREAM_CULL_T HERE, outside the jit
    cache, so config A/Bs retrace (the resolved value is a static jit
    arg of the inner impl).  Sub-slab culling requires use_bw=False —
    the sub-block AABBs come from the [v0|e1|e2] rows."""
    if cull_t is None:
        from nori_tpu import config

        cull_t = config.STREAM_CULL_T
    return _mt_sweep_streamed_jit(
        tris_packed, tile_bounds, rays_packed, any_hit=any_hit,
        key_cap=key_cap, cull_t=cull_t, use_bw=use_bw)


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "key_cap", "cull_t",
                                    "use_bw"))
def _mt_sweep_streamed_jit(tris_packed, tile_bounds, rays_packed,
                           any_hit: bool = False,
                           key_cap: int | None = None,
                           cull_t: int | None = None,
                           use_bw: bool = False):
    _, N = rays_packed.shape
    n_tt = tile_bounds.shape[0]
    cap = 0 if key_cap is None else key_cap
    if cap == 0:
        cap = 1 << 24        # uncapped
    kc = cap + 1 if cap + 1 < n_tt else n_tt
    pad_cols = -(-kc // 128) * 128
    max_rt = max(1, RESIDENT_SMEM_BUDGET // (4 * pad_cols))
    chunk_rays = max_rt * TILE_N
    if N <= chunk_rays:
        return _stream_call(tris_packed, tile_bounds, rays_packed,
                            any_hit, key_cap=cap, cull_t=cull_t,
                            use_bw=use_bw)
    outs = [[], []]
    for lo in range(0, N, chunk_rays):
        hi = min(lo + chunk_rays, N)
        res = _stream_call(
            tris_packed, tile_bounds, rays_packed[:, lo:hi], any_hit,
            key_cap=cap, cull_t=cull_t, use_bw=use_bw)
        for acc, r in zip(outs, res):
            acc.append(r)
    return tuple(jnp.concatenate(a) for a in outs)


#: MXU-form resident kernel operand budget: (10, 4*T) f32 weights must
#: leave room for rays/outputs/feats in the 16 MB VMEM
RESIDENT_MXU_VMEM_BUDGET = 6 * 1024 * 1024

#: resident kernel VMEM budget for the triangle soup (bytes)
RESIDENT_VMEM_BUDGET = 8 * 1024 * 1024


#: SMEM budget for the packed order|entry prefetch operand (bytes);
#: the hardware bank is 1MB and the padded operand costs
#: n_rt * roundup(cols, 128) * 4
RESIDENT_SMEM_BUDGET = 512 * 1024

#: keys kept per ray-tile row when the scene has more tiles than this
#: (+1 flag column rounds the row to exactly 128 SMEM words); rows
#: with more candidates take the kernels' exact all-tiles fallback.
#: See ray_tile_entry_keys — this is what keeps huge-N sweeps at 1-2
#: pallas calls instead of ceil(N / 65k).
RESIDENT_KEY_CAP = 127


def _entry_kernel(tb_ref, ray_ref, out_ref, *, n_tt_pad: int):
    """Per-ray-tile minimum slab-entry distance to every FINE_T tile.

    The jnp formulation materializes (N, n_tt, 3) broadcast
    intermediates in HBM (measured 6.1 ms for 131k rays x 404 tiles);
    here everything stays in VMEM/registers and only the (8, n_tt)
    reduction rows leave.  One grid step covers 8 ray tiles (Mosaic
    requires output sublanes divisible by 8).
    tb_ref: (8, n_tt_pad) = [bmin xyz | bmax xyz | pad] columns.
    """
    def row(i):
        return tb_ref[i, :].reshape(1, n_tt_pad)

    for g in range(8):
        rays = ray_ref[:, pl.ds(g * TILE_N, TILE_N)]

        def col(i):
            return rays[i, :].reshape(TILE_N, 1)

        ox, oy, oz = col(0), col(1), col(2)
        dx, dy, dz = col(3), col(4), col(5)
        mint, maxt = col(6), col(7)
        live = mint <= maxt

        def inv(c):
            return 1.0 / jnp.where(
                jnp.abs(c) < 1e-20,
                jnp.where(c < 0, -1e-20, 1e-20), c)

        ix, iy, iz = inv(dx), inv(dy), inv(dz)
        t0x = (row(0) - ox) * ix
        t1x = (row(3) - ox) * ix
        t0y = (row(1) - oy) * iy
        t1y = (row(4) - oy) * iy
        t0z = (row(2) - oz) * iz
        t1z = (row(5) - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        cand = (tn <= tf) & (tf >= mint) & (tn <= maxt) & live
        # clamp to >= 0 so float order == int-bitcast order for the
        # packed-key sort downstream
        entry = jnp.where(cand, jnp.maximum(tn, 0.0), jnp.inf)
        out_ref[g, :] = jnp.min(entry, axis=0)


def _entry_min_pallas(tile_bounds, rays_packed, tile_n: int):
    """(n_rt, n_tt) per-ray-tile minimum entry distances via Pallas."""
    _, N = rays_packed.shape
    n_rt = N // tile_n
    n_tt = tile_bounds.shape[0]
    n_tt_pad = -(-n_tt // 128) * 128
    # pad the ray-tile axis to groups of 8 with dead rays
    pad_rt = (-n_rt) % 8
    if pad_rt:
        filler = jnp.zeros((8, pad_rt * tile_n), rays_packed.dtype)
        filler = filler.at[6, :].set(1.0)
        filler = filler.at[7, :].set(-1.0)
        rays_packed = jnp.concatenate([rays_packed, filler], axis=1)
    # (n_tt, 8) -> (8, n_tt_pad); padded tiles get inverted boxes
    tb = jnp.full((n_tt_pad, 8), jnp.inf, tile_bounds.dtype)
    tb = tb.at[:, 3:6].set(-jnp.inf)
    tb = tb.at[:n_tt].set(tile_bounds)
    tb_t = tb.T
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        functools.partial(_entry_kernel, n_tt_pad=n_tt_pad),
        grid=((n_rt + pad_rt) // 8,),
        in_specs=[
            pl.BlockSpec((8, n_tt_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8 * tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, n_tt_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rt + pad_rt, n_tt_pad),
                                       jnp.float32),
        interpret=interpret,
    )(tb_t, rays_packed)
    return out[:n_rt, :n_tt]


def _lane_key_kernel(tb_ref, ray_ref, out_ref, out2_ref,
                     n_tt: int, n_tt_pad: int):
    """Per-LANE coherence sort keys ("front + coarse"):

      key1 = (first candidate tile index << 20) | exact candidate
             bitmask of the next 20 tiles, read from the mantissa of
             s = sum_j cand_j * 2^-(idx_j - first1) — each candidate
             lands on its own mantissa bit (powers of two built by
             exponent bit-twiddling, no transcendentals);
      key2 = 30-bit coarse OR-mask over the WHOLE tile range
             (ceil(n_tt_pad/30)-tile groups; per-group candidate
             counts from one MXU matmul against a one-hot group
             matrix, bit = count > 0).

    The coarse word is what makes this work in the evolved steady
    state: a front-window-only key conflates rays that share an
    origin cluster but diverge later (measured: 36 union
    tiles/ray-tile vs 8), while first+fine+coarse reaches 8.1 —
    slightly better than the old first6-indices scheme (8.3) at half
    its extraction cost (full MIS step on the 51.7k-tri living room
    at 131k lanes: 20.2 ms vs 23.0 ms).  Same slab math as
    _entry_kernel.  One grid step covers 8 ray tiles (Mosaic needs
    output sublanes divisible by 8).

    (An emit_masks variant that also wrote exact per-lane candidate
    bitmasks — so the NEXT step's sweep could skip its own slab pass —
    was built and measured a WASH at 131k lanes on living-room: the
    mask matmul, OR-fold and 16 extra carried sort columns cost what
    the removed entry pass saved.  Removed; see README perf notes.)"""
    def row(i):
        return tb_ref[i, :].reshape(1, n_tt_pad)

    for g in range(8):
        rays = ray_ref[:, pl.ds(g * TILE_N, TILE_N)]

        def col(i):
            return rays[i, :].reshape(TILE_N, 1)

        ox, oy, oz = col(0), col(1), col(2)
        dx, dy, dz = col(3), col(4), col(5)
        mint, maxt = col(6), col(7)
        live = mint <= maxt

        def inv(c):
            return 1.0 / jnp.where(
                jnp.abs(c) < 1e-20, jnp.where(c < 0, -1e-20, 1e-20), c)

        ix, iy, iz = inv(dx), inv(dy), inv(dz)
        t0x = (row(0) - ox) * ix
        t1x = (row(3) - ox) * ix
        t0y = (row(1) - oy) * iy
        t1y = (row(4) - oy) * iy
        t0z = (row(2) - oz) * iz
        t1z = (row(5) - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        idx = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, n_tt_pad), 1)
        # the PADDED tile rows (bmin=+inf, bmax=-inf) always pass the
        # slab test (tn=-inf <= tf=+inf); mask them out or exhausted
        # lanes pick phantom tiles >= n_tt as key fields
        cand = ((tn <= tf) & (tf >= mint) & (tn <= maxt) & live
                & (idx < n_tt))
        big = jnp.int32(n_tt_pad)
        first1 = jnp.min(jnp.where(cand, idx, big), axis=1,
                         keepdims=True)
        # fine window: weight 2^-(idx-first1) as exact exponent bits;
        # clamped so offsets past the mantissa (or junk from
        # non-candidates) stay finite — they round away against the
        # leading 1.0
        e = jnp.clip(127 - (idx - first1), 1, 254)
        w = jax.lax.bitcast_convert_type(e << 23, jnp.float32)
        s = jnp.sum(jnp.where(cand, w, 0.0), axis=1, keepdims=True)
        fwd = (jax.lax.bitcast_convert_type(s, jnp.int32) >> 3) \
            & 0xFFFFF
        k1 = (jnp.minimum(first1, jnp.int32(1023)) << 20) | fwd
        # coarse OR-mask over all tiles: per-group candidate counts
        # via one MXU matmul (Mosaic has no 3-D reshape), bit = >0
        gsz = -(-n_tt_pad // 30)
        n_grp = -(-n_tt_pad // gsz)
        tile_i = jax.lax.broadcasted_iota(
            jnp.int32, (n_tt_pad, n_grp), 0)
        grp_i = jax.lax.broadcasted_iota(
            jnp.int32, (n_tt_pad, n_grp), 1)
        G = jnp.where(tile_i // gsz == grp_i, 1.0, 0.0)
        counts = jax.lax.dot_general(
            cand.astype(jnp.float32), G, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        gc = (counts > 0.0).astype(jnp.int32)
        gi = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, n_grp), 1)
        k2 = jnp.sum(gc << jnp.maximum(29 - gi, 0), axis=1,
                     keepdims=True)
        out_ref[g, :] = k1[:, 0]
        out2_ref[g, :] = k2[:, 0]


def _lane_keys_impl(tile_bounds, rays_packed):
    _, N = rays_packed.shape
    n_tt = tile_bounds.shape[0]
    n_tt_pad = -(-n_tt // 128) * 128
    from nori_tpu import config

    use_pallas = (N % TILE_N == 0
                  and (jax.default_backend() != "cpu"
                       or config.FORCE_PALLAS_INTERPRET))
    if not use_pallas:
        o = rays_packed[0:3].T.reshape(N, 1, 3)
        dv = rays_packed[3:6].T.reshape(N, 1, 3)
        mint = rays_packed[6].reshape(N, 1)
        maxt = rays_packed[7].reshape(N, 1)
        inv = 1.0 / jnp.where(jnp.abs(dv) < 1e-20,
                              jnp.where(dv < 0, -1e-20, 1e-20), dv)
        t0 = (tile_bounds[None, :, 0:3] - o) * inv
        t1 = (tile_bounds[None, :, 3:6] - o) * inv
        tn = jnp.max(jnp.minimum(t0, t1), -1)
        tf = jnp.min(jnp.maximum(t0, t1), -1)
        cand = ((tn <= tf) & (tf >= mint) & (tn <= maxt)
                & (mint <= maxt))
        idx = jnp.arange(n_tt, dtype=jnp.int32)[None, :]
        big = jnp.int32(n_tt_pad)
        first1 = jnp.min(jnp.where(cand, idx, big), axis=1,
                         keepdims=True)
        e = jnp.clip(127 - (idx - first1), 1, 254)
        w = jax.lax.bitcast_convert_type(e << 23, jnp.float32)
        s = jnp.sum(jnp.where(cand, w, 0.0), axis=1, keepdims=True)
        fwd = (jax.lax.bitcast_convert_type(s, jnp.int32) >> 3) \
            & 0xFFFFF
        key1 = ((jnp.minimum(first1, jnp.int32(1023)) << 20)
                | fwd)[:, 0]
        gsz = -(-n_tt_pad // 30)
        n_grp = -(-n_tt_pad // gsz)
        pad = jnp.zeros((N, n_grp * gsz - n_tt), bool)
        gc = jnp.any(jnp.concatenate([cand, pad], axis=1)
                     .reshape(N, n_grp, gsz), axis=2)
        gi = jnp.arange(n_grp, dtype=jnp.int32)[None, :]
        key2 = jnp.sum(
            gc.astype(jnp.int32) << jnp.maximum(29 - gi, 0), axis=1)
        return key1, key2
    tb = jnp.full((n_tt_pad, 8), jnp.inf, tile_bounds.dtype)
    tb = tb.at[:, 3:6].set(-jnp.inf)
    tb = tb.at[:n_tt].set(tile_bounds)
    n_rt = N // TILE_N
    pad_rt = (-n_rt) % 8
    if pad_rt:
        filler = jnp.zeros((8, pad_rt * TILE_N), rays_packed.dtype)
        filler = filler.at[6, :].set(1.0)
        filler = filler.at[7, :].set(-1.0)
        rays_packed = jnp.concatenate([rays_packed, filler], axis=1)
    out_specs = [
        pl.BlockSpec((8, TILE_N), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, TILE_N), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_rt + pad_rt, TILE_N), jnp.int32),
        jax.ShapeDtypeStruct((n_rt + pad_rt, TILE_N), jnp.int32),
    ]
    res = pl.pallas_call(
        functools.partial(_lane_key_kernel, n_tt=n_tt,
                          n_tt_pad=n_tt_pad),
        grid=((n_rt + pad_rt) // 8,),
        in_specs=[
            pl.BlockSpec((8, n_tt_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8 * TILE_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(tb.T, rays_packed)
    return res[0].reshape(-1)[:N], res[1].reshape(-1)[:N]


def lane_sort_keys(tile_bounds, rays_packed):
    """Per-lane coherence sort keys: (key1, key2), each (N,) int32 for
    a lexicographic two-word sort — key1 = (first candidate tile
    index << 20) | fine 20-tile mask, key2 = 30-bit coarse OR-mask
    over the whole tile range (see _lane_key_kernel).  Both words
    < 2^30, so the wavefront's KEY_IDLE/KEY_DONE sentinels still
    order last.

    Measured in the evolved steady state on the 51.7k-tri living room
    at 131k lanes (256-lane ray tiles): 8.1 union candidate
    tiles/ray-tile — slightly better than the old first6-indices
    scheme (8.3) at roughly half its extraction cost (full MIS step
    20.2 ms vs 23.0 ms).  An exact multi-word sort would need a
    27-operand lax.sort whose XLA compile time explodes (~20 min).
    jnp fallback off-TPU.
    """
    return _lane_keys_impl(tile_bounds, rays_packed)


def ray_tile_entry_keys(tile_bounds, rays_packed, cap: int | None = None):
    """Packed candidate keys for the resident sweep.

    Per (ray tile, triangle tile): the minimum slab-entry distance with
    the TILE INDEX bit-packed into the low mantissa bits, rows sorted
    ascending as plain int32.  One sorted word therefore carries both
    the near-to-far visit order and a conservative (rounded-down) entry
    lower bound for the in-kernel skyline exit — no argsort, no
    take_along_axis, half the SMEM of the old [order | entry] pair.
    Non-candidates pack to inf/NaN bit patterns that sort last and
    decode to bounds that fail the `lb <= t_hi` check.

    cap: keep only the `cap` nearest-entry keys per row, plus ONE
    int32 overflow flag column (row held more than `cap` candidates).
    The kernels finish flagged rows with an exact all-tiles sweep.
    Why: the prefetched SMEM operand costs n_rt x roundup(cols, 128)
    words, and the SMEM budget is what chunks big-N sweeps into
    multiple pallas calls — on the 512k-lane living-room steady state
    the full 404-tile rows force 8 calls/sweep while the candidate
    rows hold 6.2 tiles on average (p99 = 111, max 252; measured
    2026-08-20), so cap=127 collapses that to 2 calls with 0.8% of
    rows taking the fallback.

    Returns (keys (n_rt, n_tt) int32 — or (n_rt, cap+1) when capped —
    and idx_bits).
    """
    n_tt = tile_bounds.shape[0]
    idx_bits = max(1, (n_tt - 1).bit_length())
    idx_mask = jnp.int32((1 << idx_bits) - 1)
    if rays_packed.shape[1] % TILE_N == 0 \
            and jax.default_backend() != "cpu":
        entry_rt = _entry_min_pallas(tile_bounds, rays_packed, TILE_N)
    else:
        entry_rt, _, _ = ray_tile_entries(
            tile_bounds, rays_packed,
            tile_n=TILE_N if rays_packed.shape[1] % TILE_N == 0
            else rays_packed.shape[1], _entries_only=True)
    bits = jax.lax.bitcast_convert_type(entry_rt, jnp.int32)
    idx = jnp.arange(n_tt, dtype=jnp.int32)[None, :]
    keys = jnp.sort((bits & ~idx_mask) | idx, axis=1)
    if cap is not None and cap + 1 < n_tt:
        # the cap-th sorted key still being finite (a candidate) means
        # the row holds more than cap candidates; idx_bits < 23 so the
        # masked entry bits of +inf stay exactly 0x7F800000
        ov = ((keys[:, cap] & ~idx_mask)
              < jnp.int32(0x7F800000)).astype(jnp.int32)
        keys = jnp.concatenate([keys[:, :cap], ov[:, None]], axis=1)
    return keys, idx_bits


def ray_tile_entries(tile_bounds, rays_packed, tile_n: int = TILE_N,
                     _entries_only: bool = False):
    """Per-ray-tile candidate list: slab-test every lane against every
    FINE_T-tile AABB, reduce to the per-(ray tile, tri tile) minimum
    entry distance (inf when no lane enters).

    rays_packed is (8, N).
    Returns (entry_rt, tile_order, entry_sorted), each (n_rt, n_tt).
    """
    if tile_n == TILE_N and rays_packed.shape[1] % TILE_N == 0 \
            and jax.default_backend() != "cpu":
        entry_rt = _entry_min_pallas(tile_bounds, rays_packed, tile_n)
        if _entries_only:
            return entry_rt, None, None
        tile_order = jnp.argsort(entry_rt, axis=1)
        entry_sorted = jnp.take_along_axis(entry_rt, tile_order, axis=1)
        return entry_rt, tile_order, entry_sorted
    _, N = rays_packed.shape
    n_rt = N // tile_n
    o = rays_packed[0:3].T.reshape(n_rt, tile_n, 1, 3)
    dvec = rays_packed[3:6].T.reshape(n_rt, tile_n, 1, 3)
    mint_r = rays_packed[6].reshape(n_rt, tile_n, 1)
    maxt_r = rays_packed[7].reshape(n_rt, tile_n, 1)
    live = mint_r <= maxt_r
    inv_d = 1.0 / jnp.where(
        jnp.abs(dvec) < 1e-20, jnp.where(dvec < 0, -1e-20, 1e-20), dvec)
    bmn = tile_bounds[None, None, :, 0:3]
    bmx = tile_bounds[None, None, :, 3:6]
    t0 = (bmn - o) * inv_d
    t1 = (bmx - o) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tn <= tf) & (tf >= mint_r) & (tn <= maxt_r) & live
    entry = jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf)
    entry_rt = jnp.min(entry, axis=1)                  # (n_rt, n_tt)
    if _entries_only:
        return entry_rt, None, None
    tile_order = jnp.argsort(entry_rt, axis=1)
    entry_sorted = jnp.take_along_axis(entry_rt, tile_order, axis=1)
    return entry_rt, tile_order, entry_sorted


def _resident_call(tris_op, tile_bounds, rays_packed, any_hit: bool,
                   use_mxu: bool, visit_w: int = VISIT_W,
                   precomputed=None, use_bw: bool = False,
                   key_cap: int | None = None, tile_ah=None):
    """One pallas_call of the resident kernel over all given rays.

    tris_op: (9, T) soup, (12, T) Baldwin-Weber transforms when
    use_bw, or (10, 4*T) MXU weights when use_mxu.
    rays_packed: (8, N).  Returns (t, idx) each (N,).
    precomputed: optional (keys, idx_bits) packed candidate table
    (ray_tile_entry_keys format) — skips the in-call entry-key slab
    pass entirely.
    tile_ah: optional (n_rt,) int32 per-ray-tile any-hit flags — the
    MIXED dual-query launch (closest + shadow tiles in one call);
    `any_hit` is ignored when given.
    """
    rows, cols = tris_op.shape
    T = cols // 4 if use_mxu else cols
    _, N = rays_packed.shape
    n_rt = N // TILE_N
    n_tt = T // FINE_T
    mixed = tile_ah is not None

    if key_cap is None:
        key_cap = RESIDENT_KEY_CAP
    if precomputed is not None:
        order_entry, idx_bits = precomputed
    else:
        order_entry, idx_bits = ray_tile_entry_keys(
            tile_bounds, rays_packed, cap=key_cap)
    # capped rows carry a trailing overflow-flag column (cap + 1 < n_tt
    # by construction, so the column count disambiguates the layouts)
    n_cols = order_entry.shape[1]
    overflow = n_cols != n_tt
    n_keys = n_cols - 1 if overflow else n_tt

    kernel = functools.partial(
        _mt_resident_kernel, n_tt=n_tt, idx_bits=idx_bits,
        any_hit=any_hit, use_mxu=use_mxu, use_bw=use_bw,
        visit_w=visit_w, n_keys=n_keys, overflow=overflow, mixed=mixed)
    interpret = jax.default_backend() == "cpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if mixed else 1,
        grid=(n_rt,),
        in_specs=[
            pl.BlockSpec((rows, cols), lambda i, *pref: (0, 0),
                         memory_space=pltpu.VMEM),   # whole soup/weights
            pl.BlockSpec((8, TILE_N), lambda i, *pref: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 2), lambda i, *pref: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    # ops/pair by block variant: MT ~56 VPU ops on a (9, T) operand,
    # Baldwin-Weber ~40 on (12, T), MXU ~20 VPU ops on (10, 4T)
    pair_flops = 20 if use_mxu else (40 if rows == 12 else 56)
    operands = ((order_entry, tile_ah) if mixed else (order_entry,))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=pair_flops * N * T // 2,
            bytes_accessed=4 * (rows * cols + 24 * N),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands, tris_op, rays_packed)
    return out[:, 0], jax.lax.bitcast_convert_type(out[:, 1], jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "use_mxu", "use_bw",
                                    "visit_w", "key_cap"))
def mt_sweep_resident(tris_op, tile_bounds, scene_bounds, rays_packed,
                      any_hit: bool = False, use_mxu: bool = False,
                      use_bw: bool = False, visit_w: int = VISIT_W,
                      key_cap: int | None = None):
    """Resident-soup sweep; returns (t, idx) each (N,), idx == -1 miss.

    tris_op is the (9, T) soup, SceneData.tri_bw (12, T) when use_bw,
    or SceneData.tri_mxu (10, 4*T) when use_mxu (caller gates on the
    VMEM budgets).  (u, v) are NOT computed — the interaction fill
    recomputes them from the winning triangle.  Rays are processed in
    chunks sized so the prefetched candidate-key table fits the SMEM
    budget; rows are K-capped with an exact in-kernel fallback (see
    ray_tile_entry_keys), which is what keeps big lane pools at 1-2
    calls/sweep.  key_cap overrides RESIDENT_KEY_CAP (tests).
    (scene_bounds is accepted for signature compatibility; the exact
    per-tile candidate lists made the geometric reach cap redundant.)
    """
    del scene_bounds
    cap = RESIDENT_KEY_CAP if key_cap is None else key_cap
    if cap == 0:
        cap = 1 << 24        # uncapped (cap + 1 < n_tt never holds)
    rows, cols = tris_op.shape
    T = cols // 4 if use_mxu else cols
    _, N = rays_packed.shape
    n_tt = T // FINE_T
    chunk_rays = resident_chunk_rays(n_tt, cap)
    if N <= chunk_rays:
        return _resident_call(tris_op, tile_bounds, rays_packed, any_hit,
                              use_mxu, visit_w, use_bw=use_bw,
                              key_cap=cap)
    outs = [[], []]
    for lo in range(0, N, chunk_rays):
        hi = min(lo + chunk_rays, N)
        res = _resident_call(
            tris_op, tile_bounds, rays_packed[:, lo:hi], any_hit,
            use_mxu, visit_w, use_bw=use_bw, key_cap=cap)
        for acc, r in zip(outs, res):
            acc.append(r)
    return tuple(jnp.concatenate(a) for a in outs)


def resident_chunk_rays(n_tt: int, key_cap: int | None) -> int:
    """Rays per pallas call for the resident sweep under the SMEM
    budget — the ONE definition shared by mt_sweep_resident,
    mt_sweep_resident_mixed and the wavefront's merged-step heuristic
    (which must predict the real chunking exactly)."""
    cap = RESIDENT_KEY_CAP if key_cap is None else key_cap
    if cap == 0:
        cap = 1 << 24
    kc = cap + 1 if cap + 1 < n_tt else n_tt
    pad_cols = -(-kc // 128) * 128
    return max(1, RESIDENT_SMEM_BUDGET // (4 * pad_cols)) * TILE_N


@functools.partial(jax.jit,
                   static_argnames=("use_mxu", "use_bw", "visit_w",
                                    "key_cap"))
def mt_sweep_resident_mixed(tris_op, tile_bounds, scene_bounds,
                            rays_packed, tile_ah,
                            use_mxu: bool = False, use_bw: bool = False,
                            visit_w: int = VISIT_W,
                            key_cap: int | None = None):
    """MIXED dual-query resident sweep: tile_ah (n_rt,) int32 flags
    each TILE_N-lane ray tile as closest-hit (0) or any-hit (1), so
    one pallas launch serves both query types — the merged
    closest+shadow step design (scripts/tpu_jobs/README.md next-step
    #2: one launch floor per wavefront step instead of two).  Returns
    (t, idx) each (N,); for any-hit tiles only idx >= 0 is meaningful.
    Chunking/capping identical to mt_sweep_resident."""
    del scene_bounds
    cap = RESIDENT_KEY_CAP if key_cap is None else key_cap
    if cap == 0:
        cap = 1 << 24
    rows, cols = tris_op.shape
    T = cols // 4 if use_mxu else cols
    _, N = rays_packed.shape
    n_tt = T // FINE_T
    chunk_rays = resident_chunk_rays(n_tt, cap)
    if N <= chunk_rays:
        return _resident_call(tris_op, tile_bounds, rays_packed, False,
                              use_mxu, visit_w, use_bw=use_bw,
                              key_cap=cap, tile_ah=tile_ah)
    outs = [[], []]
    for lo in range(0, N, chunk_rays):
        hi = min(lo + chunk_rays, N)
        res = _resident_call(
            tris_op, tile_bounds, rays_packed[:, lo:hi], False,
            use_mxu, visit_w, use_bw=use_bw, key_cap=cap,
            tile_ah=tile_ah[lo // TILE_N:hi // TILE_N])
        for acc, r in zip(outs, res):
            acc.append(r)
    return tuple(jnp.concatenate(a) for a in outs)


@functools.partial(jax.jit,
                   static_argnames=("idx_bits", "any_hit", "visit_w"))
def mt_sweep_resident_keyed(tris_packed, keys, idx_bits, rays_packed,
                            any_hit: bool = False,
                            visit_w: int = VISIT_W):
    """Resident sweep with a CALLER-SUPPLIED packed candidate table
    (keys (n_rt, n_tt) int32, sorted ascending, ray_tile_entry_keys
    format).  Lets a caller compute candidate keys ONCE for several
    sweeps (or from cheaper bounds) instead of paying the in-call slab
    pass per sweep.  Returns (t, idx) each (N,), idx == -1 miss."""
    _, T = tris_packed.shape
    _, N = rays_packed.shape
    pad_cols = -(-keys.shape[1] // 128) * 128
    max_rt = max(1, RESIDENT_SMEM_BUDGET // (4 * pad_cols))
    chunk_rays = max_rt * TILE_N
    if N <= chunk_rays:
        return _resident_call(tris_packed, None, rays_packed, any_hit,
                              False, visit_w, precomputed=(keys, idx_bits))
    outs = [[], []]
    for lo in range(0, N, chunk_rays):
        hi = min(lo + chunk_rays, N)
        res = _resident_call(
            tris_packed, None, rays_packed[:, lo:hi], any_hit,
            False, visit_w,
            precomputed=(keys[lo // TILE_N:hi // TILE_N], idx_bits))
        for acc, r in zip(outs, res):
            acc.append(r)
    return tuple(jnp.concatenate(a) for a in outs)


@functools.partial(jax.jit, static_argnames=("any_hit", "cull"))
def mt_sweep(tris_packed, tile_bounds, scene_bounds, rays_packed,
             any_hit: bool = False, cull: bool = True):
    """tris_packed: (9, T); tile_bounds: (T/FINE_T, 8) fine-granularity
    AABBs (coarsened to TILE_T groups internally);
    scene_bounds: (1, 8) = [cx, cy, cz, half_diag, ...];
    rays_packed: (8, N); T, N tile multiples.

    Returns (t, idx, u, v) each (N,); idx == -1 -> miss.
    """
    _, T = tris_packed.shape
    _, N = rays_packed.shape
    n_rt = N // TILE_N
    n_tt = T // TILE_T
    grid = (n_rt, n_tt)

    # coarsen FINE_T-granularity bounds to this kernel's TILE_T tiles
    if tile_bounds.shape[0] != n_tt:
        grp = tile_bounds.shape[0] // n_tt
        tb = tile_bounds.reshape(n_tt, grp, 8)
        tile_bounds = jnp.concatenate(
            [jnp.min(tb[:, :, 0:3], axis=1), jnp.max(tb[:, :, 3:6], axis=1),
             jnp.zeros((n_tt, 2), tile_bounds.dtype)], axis=1)

    # near-to-far triangle-tile order per ray tile: exact per-ray slab
    # entry distances to every tile AABB, reduced to a per-(ray-tile,
    # tri-tile) minimum.  The sorted order drives the kernel's
    # tri-block index_map (scalar prefetch); the entry bound itself
    # feeds the kernel's skyline skip.
    if cull and n_tt > 1:
        o = rays_packed[0:3].T.reshape(n_rt, TILE_N, 1, 3)
        dvec = rays_packed[3:6].T.reshape(n_rt, TILE_N, 1, 3)
        mint_r = rays_packed[6].reshape(n_rt, TILE_N, 1)
        maxt_r = rays_packed[7].reshape(n_rt, TILE_N, 1)
        live = mint_r <= maxt_r
        inv_d = 1.0 / jnp.where(
            jnp.abs(dvec) < 1e-20, jnp.where(dvec < 0, -1e-20, 1e-20), dvec)
        bmn = tile_bounds[None, None, :, 0:3]
        bmx = tile_bounds[None, None, :, 3:6]
        t0 = (bmn - o) * inv_d
        t1 = (bmx - o) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)   # (n_rt, TILE_N, n_tt)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit = (tn <= tf) & (tf >= mint_r) & (tn <= maxt_r) & live
        entry = jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf)
        entry_rt = jnp.min(entry, axis=1)            # (n_rt, n_tt)
        tile_order = jnp.argsort(entry_rt, axis=1).astype(jnp.int32)
    else:
        entry_rt = jnp.zeros((n_rt, n_tt), jnp.float32)
        tile_order = jnp.broadcast_to(
            jnp.arange(n_tt, dtype=jnp.int32)[None, :], (n_rt, n_tt))

    kernel = functools.partial(_mt_kernel, cull=cull, any_hit=any_hit)
    interpret = jax.default_backend() == "cpu"
    out_shapes = [
        jax.ShapeDtypeStruct((1, N), jnp.float32),
        jax.ShapeDtypeStruct((1, N), jnp.int32),
        jax.ShapeDtypeStruct((1, N), jnp.float32),
        jax.ShapeDtypeStruct((1, N), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, TILE_N), lambda i, j, order: (0, i),
                     memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((9, TILE_T), lambda i, j, order: (0, order[i, j]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_N), lambda i, j, order: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((1, TILE_N), jnp.float32),
            pltpu.VMEM((1, TILE_N), jnp.int32),
            pltpu.VMEM((1, TILE_N), jnp.float32),
            pltpu.VMEM((1, TILE_N), jnp.float32),
        ],
    )
    t, idx, u, v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=45 * N * T, bytes_accessed=4 * (9 * T + 8 * N + 16 * N),
            transcendentals=0,
        ),
        interpret=interpret,
    )(tile_order, scene_bounds, tile_bounds, entry_rt,
      tris_packed, rays_packed)
    return t[0], idx[0], u[0], v[0]


def pack_rays(o, d, mint, maxt, pad_to: int = TILE_N):
    """(N,3)x2 + (N,)x2 -> (8, Npad) with never-hitting padded rays."""
    N = o.shape[0]
    npad = (-N) % pad_to
    packed = jnp.concatenate(
        [o.T, d.T, mint[None, :], maxt[None, :]], axis=0
    )
    if npad:
        filler = jnp.zeros((8, npad), packed.dtype)
        # degenerate rays: mint > maxt so nothing hits
        filler = filler.at[6, :].set(1.0)
        filler = filler.at[7, :].set(-1.0)
        packed = jnp.concatenate([packed, filler], axis=1)
    return packed, N
