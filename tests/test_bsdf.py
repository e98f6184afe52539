"""BSDF consistency tests.

The sample/eval/pdf contract (bsdf.h:71-99): for solid-angle models the
sample weight must equal eval * cos / pdf; discrete models eval/pdf to
zero; dielectric must conserve flux through Fresnel; microfacet must
reproduce the assignment's reference reflectance values (reduced-sample
version of scenes/pa5/tests/ttest-microfacet.xml).
"""

import numpy as np
import jax.numpy as jnp

from nori_tpu.props import PropertyList
from nori_tpu import bsdf as B
from nori_tpu.core import rng
from nori_tpu.core.color import luminance
from nori_tpu.core.vecmath import spherical_direction
from nori_tpu.testing.chi2 import bsdf_params_for
from nori_tpu.testing.hypothesis import students_t_test


def _mk(name, **props):
    pl = PropertyList()
    for k, v in props.items():
        if isinstance(v, (int,)):
            pl.set_integer(k, v)
        elif isinstance(v, float):
            pl.set_float(k, v)
        else:
            pl.set_color(k, v)
    from nori_tpu.registry import create_instance
    return create_instance(name, pl)


def _sample(bsdf_obj, wi, n=50_000, seed=0):
    params = bsdf_params_for(bsdf_obj, n)
    wi_b = jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (n, 3))
    lanes = jnp.arange(n, dtype=jnp.uint32)
    u_lobe = rng.uniform(jnp.uint32(seed), lanes, jnp.uint32(0))
    u2 = rng.uniform2(jnp.uint32(seed), lanes, jnp.uint32(1))
    return params, wi_b, B.sample_bsdf(params, wi_b, u_lobe, u2)


def test_diffuse_weight_equals_albedo():
    d = _mk("diffuse", albedo=[0.2, 0.5, 0.8])
    _, _, s = _sample(d, [0.3, 0.1, 0.95])
    w = np.asarray(s.weight)
    assert np.allclose(w, [0.2, 0.5, 0.8], atol=1e-6)


def test_solid_angle_weight_consistency_microfacet():
    m = _mk("microfacet", alpha=0.3, kd=[0.3, 0.3, 0.3])
    params, wi_b, s = _sample(m, [0.4, 0.2, 0.89])
    f = B.eval_bsdf(params, wi_b, s.wo)
    p = B.pdf_bsdf(params, wi_b, s.wo)
    w_pred = np.asarray(f) * np.asarray(
        s.wo[..., 2] / jnp.maximum(p, 1e-12)
    )[:, None]
    w = np.asarray(s.weight)
    ok = w.sum(-1) > 0
    assert np.allclose(w[ok], w_pred[ok], rtol=2e-3, atol=1e-4)


def test_mirror_reflects():
    m = _mk("mirror")
    _, _, s = _sample(m, [0.6, 0.0, 0.8])
    wo = np.asarray(s.wo)
    assert np.allclose(wo, [-0.6, 0.0, 0.8], atol=1e-6)
    assert np.all(np.asarray(s.measure) == B.E_DISCRETE)


def test_dielectric_energy_and_snell():
    d = _mk("dielectric")
    _, _, s = _sample(d, [0.6, 0.0, 0.8])
    wo = np.asarray(s.wo)
    refl = wo[:, 2] > 0
    # reflected fraction approximates Fresnel
    from nori_tpu.core.vecmath import fresnel_dielectric
    f = float(fresnel_dielectric(jnp.float32(0.8), 1.000277, 1.5046))
    assert abs(refl.mean() - f) < 0.01
    # transmitted rays obey Snell's law
    sin_t = np.abs(wo[~refl, 0])
    assert np.allclose(sin_t, 0.6 * 1.000277 / 1.5046, atol=1e-4)
    # unit vectors
    assert np.allclose(np.linalg.norm(wo, axis=-1), 1.0, atol=1e-4)


def test_eval_zero_for_discrete_and_backside():
    m = _mk("mirror")
    params = bsdf_params_for(m, 4)
    wi = jnp.asarray([[0, 0, 1]] * 4, jnp.float32)
    wo = jnp.asarray([[0, 0, 1]] * 4, jnp.float32)
    assert np.all(np.asarray(B.eval_bsdf(params, wi, wo)) == 0)
    d = _mk("diffuse")
    params = bsdf_params_for(d, 1)
    below = jnp.asarray([[0, 0, -1.0]], jnp.float32)
    up = jnp.asarray([[0, 0, 1.0]], jnp.float32)
    assert np.all(np.asarray(B.eval_bsdf(params, up, below)) == 0)
    assert np.all(np.asarray(B.eval_bsdf(params, below, up)) == 0)


def test_microfacet_reference_values_quick():
    """Reduced-sample version of ttest-microfacet.xml (5 angles)."""
    m = _mk("microfacet", alpha=0.1, intIOR=1.5, extIOR=1.000277,
            kd=[0.1, 0.2, 0.15])
    refs = [0.207067, 0.215733, 0.247884, 0.430936, 0.519016]
    angles = [0, 45, 60, 80, 85]
    n = 100_000
    for i, (a, ref) in enumerate(zip(angles, refs)):
        wi = np.asarray(spherical_direction(
            jnp.float32(np.deg2rad(a)), jnp.float32(0.0)))
        _, _, s = _sample(m, wi, n=n, seed=100 + i)
        lum = np.asarray(luminance(s.weight), np.float64)
        ok, msg = students_t_test(
            lum.mean(), lum.var(ddof=1), ref, n, 0.01, 5)
        assert ok, f"angle {a}: {msg}"
