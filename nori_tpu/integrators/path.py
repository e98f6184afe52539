"""Unified wavefront path tracer: path_mats / path_ems / path_mis / path.

Estimator semantics pinned by the pa5 fixtures (SURVEY.md §4):
  * path_mats — BSDF sampling only; emitter contributions collected on
    hit (scenes/pa5/cbox/cbox_mats.xml, test-furnace.xml).
  * path_ems  — next-event estimation at every solid-angle vertex;
    emitter hits only counted after discrete bounces / primary rays
    (test-direct.xml, test-furnace.xml references 1/(1-a)).
  * path_mis  — both strategies, balance-heuristic weighted
    (cbox_mis.xml, table_mis.xml, veach_mis.xml).
  * path      — alias of path_mis (emitted by the polylum fixture
    generators, scenes/pa5/tests/polylum.py:39).

Russian roulette starts at depth 3 with continuation probability
min(0.95, max(throughput)) — unbiased, matching the expectation-level
contract of the t-tests (any unbiased RR passes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nori_tpu.registry import register_class
from nori_tpu.core.vecmath import EPSILON, dot, make_frame, to_local, to_world
from nori_tpu.bsdf import (
    BSDFParams, eval_bsdf, pdf_bsdf, sample_bsdf, E_DISCRETE)
from nori_tpu.accel.traverse import intersect, occluded
from nori_tpu.interaction import fill_interaction_fast
from nori_tpu.integrators.base import (
    Integrator, sample_emitter_point_fast, shadow_ray_args,
    lane_uniform, lane_uniform2,
)

MAX_DEPTH = 48
RR_START = 3
RR_MAX = 0.95

MATS, EMS, MIS = 0, 1, 2


def make_path_li(mode: int, max_depth: int = MAX_DEPTH):
    use_nee = mode in (EMS, MIS)

    def li(sd, o, d, mint, maxt, seed, lanes):
        n = o.shape[0]
        L = jnp.zeros((n, 3), dtype=jnp.float32)
        beta = jnp.ones((n, 3), dtype=jnp.float32)
        alive = jnp.ones((n,), dtype=bool)
        # was the previous bounce discrete (or is this a primary ray)?
        spec_bounce = jnp.ones((n,), dtype=bool)
        prev_pdf = jnp.zeros((n,), dtype=jnp.float32)
        rays = jnp.zeros((), dtype=jnp.int32)
        state = (
            jnp.int32(0), L, beta, alive, o, d, mint, maxt, spec_bounce,
            prev_pdf, rays,
        )

        def cond(state):
            depth, _, _, alive = state[0], state[1], state[2], state[3]
            return (depth < max_depth) & jnp.any(alive)

        def body(state):
            (depth, L, beta, alive, o, d, mint, maxt, spec_bounce,
             prev_pdf, rays) = state
            rays = rays + jnp.sum(alive, dtype=jnp.int32)
            hit = intersect(sd, o, d, mint, maxt)
            # one-gather fast helpers (identical values to the generic
            # forms; measured on ajax-rough the per-field gathers cost
            # ~67 ms of a 91.5 ms 131k-lane whitted batch)
            its = fill_interaction_fast(sd, hit, o, d)
            live_hit = alive & its.valid
            am = sd.mesh_attr[its.mesh]
            params = BSDFParams(
                type=jax.lax.bitcast_convert_type(am[:, 0], jnp.int32),
                albedo=am[:, 1:4], alpha=am[:, 4],
                int_ior=am[:, 5], ext_ior=am[:, 6], ks=am[:, 7],
            )

            # ---- emitter hit --------------------------------------------
            front = dot(its.sh_n, its.wi_world) > 0.0
            le = jnp.where((its.valid & front)[:, None], am[:, 8:11], 0.0)
            if mode == MATS:
                w_em = jnp.ones((n,), dtype=jnp.float32)
            elif mode == EMS:
                w_em = spec_bounce.astype(jnp.float32)
            else:  # MIS balance heuristic vs the NEE strategy
                cos_y = dot(its.sh_n, its.wi_world)
                p_light_sa = jnp.where(
                    (sd.em_area > 0.0) & (cos_y > 1e-8),
                    (its.t * its.t) / (sd.em_area * jnp.maximum(cos_y, 1e-8)),
                    0.0,
                )
                w_em = jnp.where(
                    spec_bounce,
                    1.0,
                    prev_pdf / jnp.maximum(prev_pdf + p_light_sa, 1e-20),
                )
            L = L + jnp.where(live_hit[:, None], beta * le * w_em[:, None], 0.0)

            alive = live_hit
            frame = make_frame(its.sh_n)
            wi_local = to_local(frame, its.wi_world)

            # ---- next-event estimation ----------------------------------
            if use_nee:
                u_pick = lane_uniform(seed, lanes, 8 * depth + 1)
                u2 = lane_uniform2(seed, lanes, 8 * depth + 2)
                y, n_y, le_y, pdf_area = sample_emitter_point_fast(
                    sd, u_pick, u2)
                wo_w, dist, smint, smaxt = shadow_ray_args(its.p, y)
                cos_l = dot(n_y, -wo_w)
                wo_local = to_local(frame, wo_w)
                f = eval_bsdf(params, wi_local, wo_local)
                p_light_sa = jnp.where(
                    cos_l > 1e-8,
                    pdf_area * dist * dist / jnp.maximum(cos_l, 1e-8),
                    0.0,
                )
                # cull provably-zero shadow queries like the
                # persistent wavefront (specular f == 0, dead lanes)
                ok = (
                    (cos_l > 1e-8) & (p_light_sa > 0.0) & alive
                    & (jnp.max(beta * f, axis=-1) > 0.0)
                )
                smaxt = jnp.where(ok, smaxt, -1.0)
                vis = ~occluded(sd, its.p, wo_w, smint, smaxt)
                rays = rays + jnp.sum(ok, dtype=jnp.int32)
                if mode == MIS:
                    p_b = pdf_bsdf(params, wi_local, wo_local)
                    w_l = p_light_sa / jnp.maximum(p_light_sa + p_b, 1e-20)
                else:
                    w_l = jnp.ones((n,), dtype=jnp.float32)
                contrib = (
                    beta * f * le_y
                    * (
                        wo_local[..., 2]
                        / jnp.maximum(p_light_sa, 1e-20)
                        * w_l
                        * vis
                    )[:, None]
                )
                L = L + jnp.where(
                    (ok & vis)[:, None], contrib, 0.0
                )

            # ---- Russian roulette ---------------------------------------
            u_rr = lane_uniform(seed, lanes, 8 * depth + 5)
            q = jnp.minimum(jnp.max(beta, axis=-1), RR_MAX)
            q = jnp.where(depth >= RR_START, q, 1.0)
            alive = alive & (u_rr < q)
            beta = beta / jnp.maximum(q, 1e-8)[:, None]

            # ---- BSDF sampling ------------------------------------------
            u_lobe = lane_uniform(seed, lanes, 8 * depth + 3)
            u_dir = lane_uniform2(seed, lanes, 8 * depth + 4)
            s = sample_bsdf(params, wi_local, u_lobe, u_dir)
            beta = beta * s.weight
            alive = alive & (jnp.max(s.weight, axis=-1) > 0.0)
            spec_bounce = s.measure == E_DISCRETE
            prev_pdf = s.pdf
            o = its.p
            d = to_world(frame, s.wo)
            mint = jnp.full((n,), EPSILON, jnp.float32)
            maxt = jnp.full((n,), 1e30, jnp.float32)
            return (
                depth + 1, L, beta, alive, o, d, mint, maxt, spec_bounce,
                prev_pdf, rays,
            )

        state = jax.lax.while_loop(cond, body, state)
        return state[1], {"rays": state[10]}

    return li


class _PathBase(Integrator):
    mode = MIS

    def __init__(self, props):
        self.max_depth = props.get_integer("maxDepth", MAX_DEPTH)

    def make_li(self, scene):
        return make_path_li(self.mode, self.max_depth)

    def to_string(self):
        return f"{type(self).__name__}[maxDepth={self.max_depth}]"


@register_class("path_mats")
class PathMats(_PathBase):
    mode = MATS


@register_class("path_ems")
class PathEms(_PathBase):
    mode = EMS


@register_class("path_mis")
class PathMis(_PathBase):
    mode = MIS


@register_class("path")
class Path(_PathBase):
    mode = MIS
