"""Linear-RGB color utilities over (..., 3) arrays.

Replaces the reference's Color3f/Color4f (include/nori/color.h:28-123,
impls src/common.cpp:173-220).  Color4f's "weight channel" becomes an
explicit (..., 4) film layout handled in nori_tpu.film.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def to_srgb(c):
    """Linear -> sRGB, matching src/common.cpp:178-192."""
    c = jnp.asarray(c)
    return jnp.where(
        c <= 0.0031308,
        12.92 * c,
        1.055 * jnp.power(jnp.maximum(c, 1e-12), 1.0 / 2.4) - 0.055,
    )


def to_linear(c):
    """sRGB -> linear, matching src/common.cpp:194-207."""
    c = jnp.asarray(c)
    return jnp.where(
        c <= 0.04045,
        c / 12.92,
        jnp.power((c + 0.055) / 1.055, 2.4),
    )


def luminance(c):
    """ITU-R Rec. BT.709 luminance (src/common.cpp:218-220)."""
    c = jnp.asarray(c)
    return (
        c[..., 0] * 0.212671 + c[..., 1] * 0.715160 + c[..., 2] * 0.072169
    )


def is_valid(c):
    """Per-color validity: finite and non-negative (color.h isValid)."""
    c = jnp.asarray(c)
    return jnp.all(jnp.isfinite(c) & (c >= 0.0), axis=-1)


def np_to_srgb(c: np.ndarray) -> np.ndarray:
    """Host-side (numpy) variant used by image output."""
    return np.where(
        c <= 0.0031308,
        12.92 * c,
        1.055 * np.power(np.maximum(c, 1e-12), 1.0 / 2.4) - 0.055,
    )
