"""Integrator base class + shared light-transport helpers."""

from __future__ import annotations

import jax.numpy as jnp

from nori_tpu import registry
from nori_tpu.objects import NoriObject
from nori_tpu.core.vecmath import EPSILON, dot, normalize
from nori_tpu.core.dpdf import sample_discrete
from nori_tpu.core import rng


class Integrator(NoriObject):
    class_kind = registry.INTEGRATOR

    def preprocess(self, scene):
        """Hook matching Integrator::preprocess (integrator.h:42)."""

    def make_li(self, scene):
        raise NotImplementedError


def emitted_radiance(scene, its):
    """Le(x, wi): constant-radiance area light, front side only.

    (N, 3); zero for non-emissive meshes or back-facing queries.
    """
    le = scene.em_radiance[its.mesh]
    front = dot(its.sh_n, its.wi_world) > 0.0
    return jnp.where((its.valid & front)[:, None], le, 0.0)


def sample_emitter_point(scene, u_pick, u2):
    """Uniform-area sample over all emissive triangles.

    Returns (y, n_y, Le, pdf_area): position, shading normal, radiance
    and the (constant) area density 1/totalEmissiveArea.
    """
    idx, _ = sample_discrete(scene.em_cdf, u_pick)
    tri = scene.em_tri[idx]
    # uniform barycentric warp
    su = jnp.sqrt(jnp.maximum(u2[..., 0], 0.0))
    b1 = 1.0 - su
    b2 = u2[..., 1] * su
    b0 = 1.0 - b1 - b2
    y = (
        scene.tri_v0[tri]
        + b1[..., None] * scene.tri_e1[tri]
        + b2[..., None] * scene.tri_e2[tri]
    )
    n_y = normalize(
        b0[..., None] * scene.tri_n0[tri]
        + b1[..., None] * scene.tri_n1[tri]
        + b2[..., None] * scene.tri_n2[tri],
        eps=1e-24,
    )
    le = scene.em_radiance[scene.tri_mesh[tri]]
    pdf_area = jnp.where(scene.em_area > 0.0, 1.0 / scene.em_area, 0.0)
    return y, n_y, le, pdf_area


def sample_emitter_point_fast(scene, u_pick, u2):
    """One-gather variant of sample_emitter_point reading the packed
    (E, 24) emissive table (SceneData.em_attr)."""
    idx, _ = sample_discrete(scene.em_cdf, u_pick)
    a = scene.em_attr[idx]                        # (N, 24)
    su = jnp.sqrt(jnp.maximum(u2[..., 0], 0.0))
    b1 = 1.0 - su
    b2 = u2[..., 1] * su
    b0 = 1.0 - b1 - b2
    y = a[:, 0:3] + b1[..., None] * a[:, 3:6] + b2[..., None] * a[:, 6:9]
    n_y = normalize(
        b0[..., None] * a[:, 9:12]
        + b1[..., None] * a[:, 12:15]
        + b2[..., None] * a[:, 15:18],
        eps=1e-24,
    )
    le = a[:, 18:21]
    pdf_area = jnp.where(scene.em_area > 0.0, 1.0 / scene.em_area, 0.0)
    return y, n_y, le, pdf_area


def shadow_ray_args(p, y):
    """Ray setup for a visibility test between surface points p and y."""
    dvec = y - p
    dist = jnp.sqrt(jnp.maximum(jnp.sum(dvec * dvec, axis=-1), 1e-24))
    wo = dvec / dist[..., None]
    mint = jnp.full(dist.shape, EPSILON, dtype=jnp.float32)
    maxt = dist * (1.0 - 1e-4)
    return wo, dist, mint, maxt


def lane_uniform(seed, lanes, stream):
    return rng.uniform(seed, lanes, jnp.uint32(stream))


def lane_uniform2(seed, lanes, stream):
    return rng.uniform2(seed, lanes, jnp.uint32(stream))
