"""Unit tests for the L0 math core."""

import numpy as np
import jax.numpy as jnp

from nori_tpu.core import vecmath as vm
from nori_tpu.core import color
from nori_tpu.core.transform import Transform
from nori_tpu.core.dpdf import DiscretePDF, sample_discrete
from nori_tpu.core import rng


def test_coordinate_system_orthonormal():
    r = np.random.RandomState(0)
    a = r.randn(100, 3)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    a = jnp.asarray(a, jnp.float32)
    b, c = vm.coordinate_system(a)
    assert np.allclose(vm.dot(a, b), 0, atol=1e-5)
    assert np.allclose(vm.dot(a, c), 0, atol=1e-5)
    assert np.allclose(vm.dot(b, c), 0, atol=1e-5)
    assert np.allclose(vm.norm(b), 1, atol=1e-5)


def test_frame_roundtrip():
    r = np.random.RandomState(1)
    n = r.randn(50, 3)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    v = r.randn(50, 3).astype(np.float32)
    frame = vm.make_frame(jnp.asarray(n, jnp.float32))
    back = vm.to_world(frame, vm.to_local(frame, jnp.asarray(v)))
    assert np.allclose(back, v, atol=1e-4)


def test_fresnel_reference_values():
    # normal incidence air->glass: ((n1-n2)/(n1+n2))^2
    f0 = float(vm.fresnel_dielectric(jnp.float32(1.0), 1.0, 1.5))
    assert abs(f0 - 0.04) < 1e-3
    # total internal reflection from inside
    f_tir = float(vm.fresnel_dielectric(jnp.float32(-0.1), 1.0, 1.5))
    assert f_tir == 1.0
    # matched IORs
    assert float(vm.fresnel_dielectric(jnp.float32(0.5), 1.5, 1.5)) == 0.0


def test_refract_snell():
    wi = jnp.asarray([[0.5, 0.0, np.sqrt(0.75)]], jnp.float32)
    wo, eta, tir = vm.refract_local(wi, 1.0, 1.5)
    # Snell: sin_t = sin_i * n1/n2
    assert abs(float(wo[0, 0]) + 0.5 / 1.5) < 1e-5
    assert float(wo[0, 2]) < 0  # transmitted to the other side
    assert not bool(tir[0])


def test_srgb_roundtrip():
    c = jnp.asarray(np.random.RandomState(2).rand(100, 3), jnp.float32)
    back = color.to_linear(color.to_srgb(c))
    assert np.allclose(back, c, atol=1e-4)


def test_luminance():
    assert abs(float(color.luminance(jnp.ones(3))) - 1.0) < 1e-5


def test_transform_lookat_matches_reference_convention():
    t = Transform.lookat([0, 0, 5], [0, 0, 0], [0, 1, 0])
    d = t.apply_vector([0, 0, 1])  # camera dir column
    assert np.allclose(d, [0, 0, -1], atol=1e-6)
    assert np.allclose(t.apply_point([0, 0, 0]), [0, 0, 5], atol=1e-6)


def test_transform_inverse_and_compose():
    a = Transform.rotate(33, [1, 2, 3]) * Transform.translate([1, -2, 0.5])
    p = np.array([0.3, 0.7, -1.2])
    q = a.inverse().apply_point(a.apply_point(p))
    assert np.allclose(q, p, atol=1e-9)


def test_dpdf_sampling():
    w = np.array([1.0, 2.0, 3.0, 4.0])
    d = DiscretePDF(w)
    cdf, pdf = d.as_device_arrays()
    u = jnp.asarray(np.random.RandomState(3).rand(200000), jnp.float32)
    idx, reuse = sample_discrete(cdf, u)
    counts = np.bincount(np.asarray(idx), minlength=4) / 200000
    assert np.allclose(counts, w / w.sum(), atol=0.01)
    assert float(jnp.min(reuse)) >= 0 and float(jnp.max(reuse)) <= 1


def test_rng_uniform_stats():
    lanes = jnp.arange(1 << 20, dtype=jnp.uint32)
    u = np.asarray(rng.uniform(jnp.uint32(0), lanes, jnp.uint32(0)))
    assert abs(u.mean() - 0.5) < 0.002
    assert u.min() >= 0.0 and u.max() < 1.0
    # distinct streams decorrelated
    v = np.asarray(rng.uniform(jnp.uint32(0), lanes, jnp.uint32(1)))
    assert abs(np.corrcoef(u, v)[0, 1]) < 0.005


def test_rng_deterministic_under_sharding_order():
    # value depends only on (seed, lane, stream), not batch shape
    lanes = jnp.arange(1024, dtype=jnp.uint32)
    a = np.asarray(rng.uniform(jnp.uint32(7), lanes, jnp.uint32(3)))
    b = np.asarray(rng.uniform(jnp.uint32(7), lanes[512:], jnp.uint32(3)))
    assert np.array_equal(a[512:], b)
