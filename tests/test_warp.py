"""chi^2 verification of every warp (warptest parity, SURVEY.md §2.18).

Mirrors the warptest CLI contract (src/warptest.cpp:121-227): histogram
samples pushed through each warp, compare against the numerically
integrated claimed pdf with a chi^2 test.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nori_tpu import warp
from nori_tpu.core import rng
from nori_tpu.testing.hypothesis import chi2_test, integrate_cells_2d

SAMPLES = 200_000
RES = 10
# Dunn-Sidak correction across the suite, like warptest's testCount
# correction (src/warptest.cpp / chi2test.cpp contract)
NUM_TESTS = 9


def _samples(n, seed=0):
    lanes = jnp.arange(n, dtype=jnp.uint32)
    return rng.uniform2(jnp.uint32(seed), lanes, jnp.uint32(0))


def _chi2_2d(warp_fn, pdf_fn, lo, hi):
    pts = np.asarray(warp_fn(_samples(SAMPLES)))
    edges = np.linspace(lo, hi, RES + 1)
    obs, _, _ = np.histogram2d(pts[:, 0], pts[:, 1], bins=[edges, edges])
    exp = integrate_cells_2d(
        lambda X, Y: np.asarray(
            pdf_fn(jnp.asarray(np.stack([X, Y], -1), jnp.float32))
        ),
        edges, edges, order=33,
    ) * SAMPLES
    ok, msg = chi2_test(obs.ravel(), exp.ravel(), SAMPLES, num_tests=NUM_TESTS)
    assert ok, msg


def _chi2_sphere(warp_fn, pdf_fn):
    pts = np.asarray(warp_fn(_samples(SAMPLES)))
    assert np.allclose(np.linalg.norm(pts, axis=-1), 1.0, atol=1e-4)
    cos_edges = np.linspace(-1, 1, RES + 1)
    phi_edges = np.linspace(0, 2 * np.pi, 2 * RES + 1)
    phi = np.arctan2(pts[:, 1], pts[:, 0])
    phi = np.where(phi < 0, phi + 2 * np.pi, phi)
    obs, _, _ = np.histogram2d(
        pts[:, 2], phi, bins=[cos_edges, phi_edges]
    )

    def pdf_grid(CT, PH):
        ST = np.sqrt(np.maximum(0.0, 1 - CT ** 2))
        v = np.stack([ST * np.cos(PH), ST * np.sin(PH), CT], -1)
        return np.asarray(pdf_fn(jnp.asarray(v, jnp.float32)))

    exp = integrate_cells_2d(pdf_grid, cos_edges, phi_edges, order=33) * SAMPLES
    ok, msg = chi2_test(obs.ravel(), exp.ravel(), SAMPLES, num_tests=NUM_TESTS)
    assert ok, msg


def test_uniform_square():
    pts = np.asarray(warp.square_to_uniform_square(_samples(10000)))
    assert pts.min() >= 0 and pts.max() <= 1
    assert float(warp.square_to_uniform_square_pdf(jnp.asarray([0.5, 0.5]))) == 1.0
    assert float(warp.square_to_uniform_square_pdf(jnp.asarray([1.5, 0.5]))) == 0.0


def test_tent():
    _chi2_2d(warp.square_to_tent, warp.square_to_tent_pdf, -1, 1)


def test_disk():
    _chi2_2d(
        warp.square_to_uniform_disk, warp.square_to_uniform_disk_pdf, -1, 1
    )


def test_sphere():
    _chi2_sphere(
        warp.square_to_uniform_sphere, warp.square_to_uniform_sphere_pdf
    )


def test_hemisphere():
    _chi2_sphere(
        warp.square_to_uniform_hemisphere,
        warp.square_to_uniform_hemisphere_pdf,
    )


def test_cosine_hemisphere():
    _chi2_sphere(
        warp.square_to_cosine_hemisphere,
        warp.square_to_cosine_hemisphere_pdf,
    )


@pytest.mark.parametrize("alpha", [0.1, 0.5, 1.0])
def test_beckmann(alpha):
    _chi2_sphere(
        lambda u: warp.square_to_beckmann(u, alpha),
        lambda v: warp.square_to_beckmann_pdf(v, alpha),
    )


def test_warptest_modes_and_gridlines(tmp_path):
    """GUI-parity extras: grid/stratified point modes + warped
    gridline overlay (src/warptest.cpp:73-77, 283-293)."""
    from nori_tpu import warptest as wt
    import numpy as np

    u = np.asarray(wt._mode_samples(64 * 64, "grid"))
    assert u.shape == (4096, 2)
    # grid points are lattice midpoints
    assert np.allclose(sorted(set(np.round(u[:, 0], 6)))[:2],
                       [0.5 / 64, 1.5 / 64], atol=1e-6)
    us = np.asarray(wt._mode_samples(64 * 64, "stratified", seed=1))
    assert ((us >= 0) & (us < 1)).all()
    # each stratified point stays in its own cell
    cell = np.floor(us * 64).astype(int)
    gx, gy = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    assert (cell[:, 0] == gx.ravel()).all()
    assert (cell[:, 1] == gy.ravel()).all()

    lines = wt.grid_lines("disk", res=4)
    assert len(lines) == 2 * 5
    for line in lines:
        assert np.linalg.norm(line, axis=1).max() <= 1.0 + 1e-5

    out = str(tmp_path / "disk.png")
    rc = wt.main(["disk", "--plot", out, "--mode", "grid",
                  "--grid-lines"])
    assert rc == 0
    import os
    assert os.path.getsize(out) > 0


def test_chi2_plugin_writes_matlab_dumps(tmp_path):
    """The chi2 plugin writes chi2test_%i.m debug tables like the
    reference (src/chi2test.cpp:179-180)."""
    import os
    from nori_tpu.props import PropertyList
    from nori_tpu.registry import create_instance
    from nori_tpu.testing.chi2 import ChiSquareTest

    pl = PropertyList()
    pl.set_integer("testCount", 1)
    pl.set_integer("sampleCount", 20000)
    test = ChiSquareTest(pl)
    bp = PropertyList()
    bp.set_color("albedo", np.array([0.5, 0.5, 0.5]))
    test.add_child(create_instance("diffuse", bp))
    test.dump_dir = str(tmp_path)
    ok = test.run(verbose=False)
    assert ok
    dump = tmp_path / "chi2test_1.m"
    assert dump.exists()
    text = dump.read_text()
    assert "obsFrequencies = [" in text
    assert "expFrequencies = [" in text
    assert "imagesc(obsFrequencies);" in text
