"""chi^2 test plugin: `<test type="chi2test">`.

Behavioral port of src/chi2test.cpp:42-226: for each child BSDF, run
`testCount` independent tests; each draws a random incident direction,
histograms `sampleCount` BSDF samples into a (cosThetaResolution x
2*cosThetaResolution) table over (cos theta, phi), integrates the
claimed pdf over each cell for the expected counts, and applies a
Dunn-Sidak-corrected Pearson chi^2 test.  Samples are drawn in one
batched device call instead of a scalar loop.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from nori_tpu import registry
from nori_tpu.objects import NoriObject
from nori_tpu.registry import register_class, NoriError
from nori_tpu.bsdf import BSDFTable, sample_bsdf, pdf_bsdf
from nori_tpu.testing.hypothesis import chi2_test, integrate_cells_2d


def bsdf_params_for(bsdf, n):
    """Broadcast a single host BSDF's parameter row to n lanes."""
    table = BSDFTable.build([bsdf])
    return table.gather(jnp.zeros((n,), dtype=jnp.int32))


def run_chi2_bsdf(bsdf, wi, sample_count, cos_res, phi_res,
                  min_exp_frequency, significance, num_tests, seed=0,
                  dump_file=None):
    """One chi^2 run for one BSDF and one incident direction.

    dump_file: write the observed/expected tables as a MATLAB debug
    script (chi2test_%i.m, src/chi2test.cpp:179-180)."""
    n = sample_count
    params = bsdf_params_for(bsdf, n)
    wi_b = jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (n, 3))
    rng = np.random.RandomState(seed)
    u_lobe = jnp.asarray(rng.rand(n), jnp.float32)
    u2 = jnp.asarray(rng.rand(n, 2), jnp.float32)
    s = sample_bsdf(params, wi_b, u_lobe, u2)
    wo = np.asarray(s.wo)
    weight = np.asarray(s.weight)
    valid = (weight != 0).any(axis=-1)

    cos_bin = np.clip(
        np.floor((wo[:, 2] * 0.5 + 0.5) * cos_res).astype(np.int64),
        0, cos_res - 1,
    )
    phi = np.arctan2(wo[:, 1], wo[:, 0]) / (2 * np.pi)
    phi = np.where(phi < 0, phi + 1.0, phi)
    phi_bin = np.clip(
        np.floor(phi * phi_res).astype(np.int64), 0, phi_res - 1
    )
    flat = cos_bin * phi_res + phi_bin
    obs = np.bincount(
        flat[valid], minlength=cos_res * phi_res
    ).astype(np.float64).reshape(cos_res, phi_res)

    # expected frequencies: integrate the claimed pdf over each cell
    params1 = bsdf_params_for(bsdf, 1)

    def pdf_fn(ct, ph):
        shape = ct.shape
        st = np.sqrt(np.maximum(0.0, 1.0 - ct * ct))
        wo_grid = np.stack(
            [st * np.cos(ph), st * np.sin(ph), ct], axis=-1
        ).reshape(-1, 3)
        m = wo_grid.shape[0]
        from nori_tpu.bsdf import BSDFParams
        p_m = BSDFParams(*[
            jnp.broadcast_to(getattr(params1, f)[0], (m,) + getattr(params1, f).shape[1:])
            for f in params1._fields
        ])
        wi_m = jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (m, 3))
        vals = pdf_bsdf(p_m, wi_m, jnp.asarray(wo_grid, jnp.float32))
        return np.asarray(vals, dtype=np.float64).reshape(shape)

    cos_edges = np.linspace(-1.0, 1.0, cos_res + 1)
    phi_edges = np.linspace(0.0, 2 * np.pi, phi_res + 1)
    exp = integrate_cells_2d(pdf_fn, cos_edges, phi_edges) * sample_count

    if dump_file:
        from nori_tpu.testing.hypothesis import chi2_dump

        chi2_dump(obs, exp, dump_file)
    return chi2_test(
        obs.ravel(), exp.ravel(), sample_count, min_exp_frequency,
        significance, num_tests,
    )


@register_class("chi2test")
class ChiSquareTest(NoriObject):
    class_kind = registry.TEST

    def __init__(self, props):
        self.significance = props.get_float("significanceLevel", 0.01)
        self.cos_res = props.get_integer("resolution", 10)
        self.min_exp_frequency = props.get_integer("minExpFrequency", 5)
        self.sample_count = props.get_integer("sampleCount", -1)
        self.test_count = props.get_integer("testCount", 5)
        # the reference writes chi2test_%i.m on every run
        # (src/chi2test.cpp:179-180); dump_dir redirects the artifacts
        self.dump_files = props.get_boolean("dumpFiles", True)
        self.dump_dir = "."
        self.phi_res = 2 * self.cos_res
        if self.sample_count < 0:
            self.sample_count = self.cos_res * self.phi_res * 5000
        self.bsdfs = []

    def add_child(self, child):
        if child.class_kind == registry.BSDF:
            self.bsdfs.append(child)
        else:
            raise NoriError(
                f"ChiSquareTest::add_child(<{child.class_kind}>) not supported"
            )

    def run(self, verbose: bool = True) -> bool:
        passed = total = 0
        rng = np.random.RandomState(0)
        num_tests = self.test_count * len(self.bsdfs)
        for bsdf in self.bsdfs:
            for l in range(self.test_count):
                total += 1
                cos_theta = rng.rand()
                sin_theta = np.sqrt(max(0.0, 1 - cos_theta ** 2))
                phi = 2 * np.pi * rng.rand()
                wi = np.array([
                    np.cos(phi) * sin_theta, np.sin(phi) * sin_theta, cos_theta,
                ])
                import os

                dump = os.path.join(
                    self.dump_dir, f"chi2test_{total}.m"
                ) if self.dump_files else None
                ok, msg = run_chi2_bsdf(
                    bsdf, wi, self.sample_count, self.cos_res, self.phi_res,
                    self.min_exp_frequency, self.significance, num_tests,
                    seed=total, dump_file=dump,
                )
                if verbose:
                    print(f"[chi2] {bsdf!r} wi_z={cos_theta:.3f}: {msg}")
                passed += int(ok)
        if verbose:
            print(f"Passed {passed}/{total} chi^2 tests.")
        return passed == total

    def to_string(self):
        return (
            f"ChiSquareTest[res={self.cos_res}x{self.phi_res}, "
            f"samples={self.sample_count}, tests={self.test_count}]"
        )
