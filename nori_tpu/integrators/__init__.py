"""Integrators (reference: include/nori/integrator.h:34-61).

Each integrator plugin exposes `make_li(scene_host)` returning a pure
jittable function

    li(scene_data, o, d, mint, maxt, seed, lanes) -> (N, 3) radiance

over a wavefront of N rays.  `lanes` are global sample indices feeding
the counter-based RNG; `seed` is a scalar.  The reference's recursive
per-ray `Li(scene, sampler, ray)` becomes an iterative depth loop over
the whole wavefront (SURVEY.md §7 phase 4).

Required plugins (SURVEY.md §2.14): normals, simple, ao, whitted,
path_mats, path_ems, path_mis, path.
"""

from nori_tpu.integrators import simple_integrators, whitted, path  # noqa: F401
from nori_tpu.integrators.base import Integrator  # noqa: F401
