"""Student's t-test plugin: `<test type="ttest">`.

Behavioral port of src/ttest.cpp:58-219.  Two modes:

  1. BSDF mode — child BSDFs + `angles`/`references` strings: the mean
     luminance of sample() weights at each incidence angle must match
     the hard-coded reference (scenes/pa5/tests/ttest-microfacet.xml).
  2. Scene mode — child scenes + `references`: the mean luminance of
     Li over `sampleCount` camera rays must match the analytic value
     (scenes/pa4+pa5 test-mesh/test-direct/test-furnace fixtures).

Sampling is batched on device; mean/variance reduce in float64 on host
(the Knuth online update of the reference is a scalar-loop artifact —
a two-pass reduction is numerically equivalent here).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from nori_tpu import registry
from nori_tpu.objects import NoriObject
from nori_tpu.registry import register_class, NoriError
from nori_tpu.core.color import luminance
from nori_tpu.core.vecmath import spherical_direction
from nori_tpu.core import rng as nrng
from nori_tpu.bsdf import sample_bsdf
from nori_tpu.testing.chi2 import bsdf_params_for
from nori_tpu.testing.hypothesis import students_t_test


def _tokenize_floats(s):
    return [float(x) for x in s.replace(",", " ").split()]


@register_class("ttest")
class StudentsTTest(NoriObject):
    class_kind = registry.TEST

    def __init__(self, props):
        self.significance = props.get_float("significanceLevel", 0.01)
        self.angles = _tokenize_floats(props.get_string("angles", ""))
        self.references = _tokenize_floats(props.get_string("references", ""))
        self.sample_count = props.get_integer("sampleCount", 100000)
        # Only the *defaulted* sample count is eligible for the
        # scene-mode batch enlargement below; a fixture that pins
        # sampleCount explicitly gets exactly what it asked for.
        self.sample_count_explicit = props.has("sampleCount")
        self.bsdfs = []
        self.scenes = []

    def add_child(self, child):
        if child.class_kind == registry.BSDF:
            self.bsdfs.append(child)
        elif child.class_kind == registry.SCENE:
            self.scenes.append(child)
        else:
            raise NoriError(
                f"StudentsTTest::add_child(<{child.class_kind}>) not supported"
            )

    # -- mode 1: BSDF sampling means ---------------------------------------
    def _run_bsdf(self, verbose) -> tuple[int, int]:
        if len(self.references) * len(self.bsdfs) != len(self.angles) * len(self.bsdfs) \
                and len(self.references) != len(self.angles) * len(self.bsdfs):
            raise NoriError("Mismatched angles/references")
        passed = total = 0
        n = self.sample_count
        ctr = 0
        for bsdf in self.bsdfs:
            params = bsdf_params_for(bsdf, n)
            for i, angle in enumerate(self.angles):
                reference = self.references[ctr]
                ctr += 1
                total += 1
                wi = np.asarray(
                    spherical_direction(
                        jnp.float32(np.deg2rad(angle)), jnp.float32(0.0)
                    )
                )
                wi_b = jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (n, 3))
                lanes = jnp.arange(n, dtype=jnp.uint32)
                seed = jnp.uint32(1234 + ctr)
                u_lobe = nrng.uniform(seed, lanes, jnp.uint32(0))
                u2 = nrng.uniform2(seed, lanes, jnp.uint32(1))
                s = sample_bsdf(params, wi_b, u_lobe, u2)
                lum = np.asarray(luminance(s.weight), dtype=np.float64)
                mean = lum.mean()
                var = lum.var(ddof=1)
                ok, msg = students_t_test(
                    mean, var, reference, n, self.significance,
                    len(self.references),
                )
                if verbose:
                    print(f"[ttest] angle={angle}: {msg}")
                passed += int(ok)
        return passed, total

    # -- mode 2: scene radiance means --------------------------------------
    def _run_scene(self, verbose) -> tuple[int, int]:
        if len(self.references) != len(self.scenes):
            raise NoriError("Mismatched scenes/references")
        passed = total = 0
        for idx, (scene, reference) in enumerate(
                zip(self.scenes, self.references)):
            total += 1
            sd = scene.compile()
            scene.integrator.preprocess(scene)
            cam = scene.camera
            li = scene.integrator.make_li(scene)
            # Scene-mode luminance distributions are heavy-tailed
            # (furnace paths can carry luminance in the thousands), so
            # the online-variance t statistic understates tail risk at
            # the reference's 100k default.  Quadruple the batch — but
            # only when sampleCount was NOT explicitly set by the
            # fixture (an explicit pin is honored exactly).
            n = self.sample_count
            batches = 1
            if not self.sample_count_explicit:
                n, batches = 4 * n, 4
            cam_params = cam.ray_params()
            seed = jnp.uint32(4321 + idx)
            import jax
            jl = jax.jit(li)
            per = n // batches
            lums = []
            for b in range(batches):
                lanes = jnp.arange(b * per, (b + 1) * per, dtype=jnp.uint32)
                u_px = nrng.uniform2(seed, lanes, jnp.uint32(7))
                pos = u_px * jnp.asarray(
                    [cam.width, cam.height], dtype=jnp.float32
                )
                o, d, mint, maxt = type(cam).sample_rays(cam_params, pos)
                L, aux = jl(sd, o, d, mint, maxt, seed, lanes)
                lums.append(np.asarray(luminance(L), dtype=np.float64))
            lum = np.concatenate(lums)
            mean = lum.mean()
            var = lum.var(ddof=1)
            ok, msg = students_t_test(
                mean, var, reference, n, self.significance,
                len(self.references),
            )
            if verbose:
                print(f"[ttest] scene {idx} "
                      f"({scene.integrator.plugin_name}): {msg}")
            passed += int(ok)
        return passed, total

    def run(self, verbose: bool = True) -> bool:
        if self.bsdfs and self.scenes:
            raise NoriError("Cannot test BSDFs and scenes at the same time")
        if self.bsdfs:
            passed, total = self._run_bsdf(verbose)
        else:
            passed, total = self._run_scene(verbose)
        if verbose:
            print(f"Passed {passed}/{total} t-tests.")
        return passed == total

    def to_string(self):
        return (
            f"StudentsTTest[significance={self.significance}, "
            f"samples={self.sample_count}]"
        )
