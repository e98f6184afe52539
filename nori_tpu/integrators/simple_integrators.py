"""normals / simple / ao integrators.

Behavior pinned by the pa1-pa3 scenes (SURVEY.md §2.14, L4 table):
  * normals — shade with |shading normal| (scenes/pa1/bunny.xml).
  * simple  — point light with `position`/`energy` params:
              Li = energy/(4 pi^2) * max(0, cos) / r^2 * V
              (scenes/pa3/ajax-simple.xml:8-11).
  * ao      — cosine-weighted ambient occlusion, one visibility sample
              per call (scenes/pa3/ajax-ao.xml).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from nori_tpu.registry import register_class
from nori_tpu.core.vecmath import EPSILON, dot, make_frame, to_world
from nori_tpu import warp
from nori_tpu.accel.traverse import intersect, occluded
from nori_tpu.interaction import fill_interaction_fast
from nori_tpu.integrators.base import (
    Integrator, lane_uniform2,
)


@register_class("normals")
class NormalsIntegrator(Integrator):
    def __init__(self, props):
        pass

    def make_li(self, scene):
        def li(sd, o, d, mint, maxt, seed, lanes):
            hit = intersect(sd, o, d, mint, maxt)
            its = fill_interaction_fast(sd, hit, o, d)
            n = o.shape[0]
            return jnp.where(
                its.valid[:, None], jnp.abs(its.sh_n), 0.0
            ), {"rays": jnp.int32(n)}

        return li

    def to_string(self):
        return "NormalsIntegrator[]"


@register_class("simple")
class SimpleIntegrator(Integrator):
    def __init__(self, props):
        self.position = props.get_point("position", np.zeros(3))
        self.energy = props.get_color("energy", np.ones(3))

    def make_li(self, scene):
        light_p = jnp.asarray(self.position, dtype=jnp.float32)
        energy = jnp.asarray(self.energy, dtype=jnp.float32)

        def li(sd, o, d, mint, maxt, seed, lanes):
            hit = intersect(sd, o, d, mint, maxt)
            its = fill_interaction_fast(sd, hit, o, d)
            dvec = light_p - its.p
            r2 = jnp.maximum(jnp.sum(dvec * dvec, axis=-1), 1e-20)
            r = jnp.sqrt(r2)
            wo = dvec / r[:, None]
            cos = jnp.maximum(0.0, dot(its.sh_n, wo))
            vis = ~occluded(
                sd, its.p, wo,
                jnp.full_like(r, EPSILON), r * (1.0 - 1e-4),
            )
            val = (
                energy[None, :]
                * (cos * vis / (4.0 * jnp.pi * jnp.pi * r2))[:, None]
            )
            return (
                jnp.where(its.valid[:, None], val, 0.0),
                {"rays": jnp.int32(2 * o.shape[0])},
            )

        return li

    def to_string(self):
        return (
            f"SimpleIntegrator[position={self.position.tolist()}, "
            f"energy={self.energy.tolist()}]"
        )


@register_class("ao")
class AmbientOcclusionIntegrator(Integrator):
    def __init__(self, props):
        pass

    def make_li(self, scene):
        def li(sd, o, d, mint, maxt, seed, lanes):
            hit = intersect(sd, o, d, mint, maxt)
            its = fill_interaction_fast(sd, hit, o, d)
            frame = make_frame(its.sh_n)
            u2 = lane_uniform2(seed, lanes, 0)
            wo_local = warp.square_to_cosine_hemisphere(u2)
            wo = to_world(frame, wo_local)
            n = its.p.shape[0]
            far = jnp.full((n,), 1e30, dtype=jnp.float32)
            vis = ~occluded(
                sd, its.p, wo, jnp.full((n,), EPSILON, jnp.float32), far
            )
            # estimator: V * cos/pi / (cos/pi) = V
            val = vis.astype(jnp.float32)[:, None] * jnp.ones((1, 3))
            return (
                jnp.where(its.valid[:, None], val, 0.0),
                {"rays": jnp.int32(2 * o.shape[0])},
            )

        return li

    def to_string(self):
        return "AmbientOcclusionIntegrator[]"
