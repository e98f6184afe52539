"""Square-to-distribution warping functions + densities.

Vectorized over (..., 2) sample arrays; replaces the Warp static library
(include/nori/warp.h:27-70; stubs src/warp.cpp:25-79 whose required
behavior is pinned by the warptest chi^2 suites, src/warptest.cpp:121-227).

All functions are pure jnp, jit/vmap-safe, and defined on the FULL
domain (pdfs return 0 outside support) so the chi^2 harness can
integrate them over the whole sphere.
"""

from __future__ import annotations

import jax.numpy as jnp

from nori_tpu.core.vecmath import INV_PI, INV_TWOPI, INV_FOURPI


# -- uniform square ---------------------------------------------------------

def square_to_uniform_square(sample):
    return sample


def square_to_uniform_square_pdf(p):
    inside = jnp.all((p >= 0.0) & (p <= 1.0), axis=-1)
    return jnp.where(inside, 1.0, 0.0)


# -- 2D tent ----------------------------------------------------------------

def _tent_inverse_cdf(u):
    # piecewise inverse CDF of the 1D tent on [-1, 1]
    return jnp.where(
        u < 0.5,
        jnp.sqrt(jnp.maximum(2.0 * u, 0.0)) - 1.0,
        1.0 - jnp.sqrt(jnp.maximum(2.0 * (1.0 - u), 0.0)),
    )


def square_to_tent(sample):
    return _tent_inverse_cdf(sample)


def square_to_tent_pdf(p):
    d = jnp.maximum(0.0, 1.0 - jnp.abs(p))
    inside = jnp.all(jnp.abs(p) <= 1.0, axis=-1)
    return jnp.where(inside, d[..., 0] * d[..., 1], 0.0)


# -- uniform disk -----------------------------------------------------------

def square_to_uniform_disk(sample):
    r = jnp.sqrt(sample[..., 0])
    theta = 2.0 * jnp.pi * sample[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def square_to_uniform_disk_pdf(p):
    inside = jnp.sum(p * p, axis=-1) <= 1.0
    return jnp.where(inside, INV_PI, 0.0)


# -- uniform sphere ---------------------------------------------------------

def square_to_uniform_sphere(sample):
    z = 1.0 - 2.0 * sample[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * sample[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf(v):
    return jnp.full(v.shape[:-1], INV_FOURPI)


# -- uniform hemisphere (z >= 0) -------------------------------------------

def square_to_uniform_hemisphere(sample):
    z = sample[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * sample[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_hemisphere_pdf(v):
    return jnp.where(v[..., 2] >= 0.0, INV_TWOPI, 0.0)


# -- cosine-weighted hemisphere --------------------------------------------

def square_to_cosine_hemisphere(sample):
    d = square_to_uniform_disk(sample)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.sum(d * d, axis=-1)))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def square_to_cosine_hemisphere_pdf(v):
    return jnp.where(v[..., 2] >= 0.0, v[..., 2] * INV_PI, 0.0)


# -- Beckmann distribution * cosine ----------------------------------------

def square_to_beckmann(sample, alpha):
    """Sample a normal from the Beckmann NDF D(m) * cos(theta_m).

    theta = arctan(sqrt(-alpha^2 ln(1 - u1))), phi = 2 pi u2.
    """
    phi = 2.0 * jnp.pi * sample[..., 1]
    tan2 = -alpha * alpha * jnp.log(jnp.maximum(1.0 - sample[..., 0], 1e-38))
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    return jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
    )


def square_to_beckmann_pdf(m, alpha):
    """Density of square_to_beckmann wrt solid angle:
    D(m) cos(theta) = exp(-tan^2/alpha^2) / (pi alpha^2 cos^3 theta)."""
    cos_t = m[..., 2]
    safe_cos = jnp.maximum(cos_t, 1e-9)
    tan2 = (1.0 - cos_t * cos_t) / (safe_cos * safe_cos)
    a2 = alpha * alpha
    d = jnp.exp(-tan2 / a2) / (jnp.pi * a2 * safe_cos ** 3)
    return jnp.where(cos_t > 1e-9, d, 0.0)


#: name -> (warp, pdf, output-dim, takes-alpha) used by warptest CLI/tests
WARPS = {
    "square": (square_to_uniform_square, square_to_uniform_square_pdf, 2, False),
    "tent": (square_to_tent, square_to_tent_pdf, 2, False),
    "disk": (square_to_uniform_disk, square_to_uniform_disk_pdf, 2, False),
    "sphere": (square_to_uniform_sphere, square_to_uniform_sphere_pdf, 3, False),
    "hemisphere": (
        square_to_uniform_hemisphere, square_to_uniform_hemisphere_pdf, 3, False),
    "cosine": (
        square_to_cosine_hemisphere, square_to_cosine_hemisphere_pdf, 3, False),
    "beckmann": (square_to_beckmann, square_to_beckmann_pdf, 3, True),
}
