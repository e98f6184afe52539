"""Image reconstruction filters.

Replaces src/rfilter.cpp:28-126 (gaussian/mitchell/tent/box).  Each
filter exposes a host-side radius plus a jnp `eval(x)` usable inside the
jitted splatting kernel (nori_tpu.film).  Parameter defaults match the
reference exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from nori_tpu import registry
from nori_tpu.objects import NoriObject
from nori_tpu.registry import register_class


class ReconstructionFilter(NoriObject):
    class_kind = registry.RFILTER
    radius: float = 0.0

    def eval(self, x):
        raise NotImplementedError


@register_class("gaussian")
class GaussianFilter(ReconstructionFilter):
    """Windowed Gaussian; defaults radius=2, stddev=0.5."""

    def __init__(self, props):
        self.radius = props.get_float("radius", 2.0)
        self.stddev = props.get_float("stddev", 0.5)

    def eval(self, x):
        alpha = -1.0 / (2.0 * self.stddev * self.stddev)
        return jnp.maximum(
            0.0,
            jnp.exp(alpha * x * x) - jnp.exp(alpha * self.radius * self.radius),
        )

    def to_string(self):
        return f"GaussianFilter[radius={self.radius}, stddev={self.stddev}]"


@register_class("mitchell")
class MitchellNetravaliFilter(ReconstructionFilter):
    def __init__(self, props):
        self.radius = props.get_float("radius", 2.0)
        self.B = props.get_float("B", 1.0 / 3.0)
        self.C = props.get_float("C", 1.0 / 3.0)

    def eval(self, x):
        B, C = self.B, self.C
        x = jnp.abs(2.0 * x / self.radius)
        x2, x3 = x * x, x * x * x
        inner = (1.0 / 6.0) * (
            (12 - 9 * B - 6 * C) * x3 + (-18 + 12 * B + 6 * C) * x2 + (6 - 2 * B)
        )
        outer = (1.0 / 6.0) * (
            (-B - 6 * C) * x3 + (6 * B + 30 * C) * x2
            + (-12 * B - 48 * C) * x + (8 * B + 24 * C)
        )
        return jnp.where(x < 1.0, inner, jnp.where(x < 2.0, outer, 0.0))

    def to_string(self):
        return f"MitchellNetravaliFilter[radius={self.radius}, B={self.B}, C={self.C}]"


@register_class("tent")
class TentFilter(ReconstructionFilter):
    def __init__(self, props):
        self.radius = 1.0

    def eval(self, x):
        return jnp.maximum(0.0, 1.0 - jnp.abs(x))

    def to_string(self):
        return "TentFilter[]"


@register_class("box")
class BoxFilter(ReconstructionFilter):
    def __init__(self, props):
        self.radius = 0.5

    def eval(self, x):
        return jnp.ones_like(x)

    def to_string(self):
        return "BoxFilter[]"
