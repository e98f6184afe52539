"""Terminal viewer (nori_tpu.tui): the NoriScreen-equivalent live
display (src/gui.cpp:19-132) rendered as ANSI truecolor half blocks."""

import io

import numpy as np

from nori_tpu import tui


def _gradient(h=8, w=12):
    y = np.linspace(0.0, 1.0, h)[:, None, None]
    x = np.linspace(0.0, 1.0, w)[None, :, None]
    return np.concatenate(
        [x * np.ones((h, 1, 1)), y * np.ones((1, w, 1)),
         0.25 * np.ones((h, w, 1))], axis=-1).astype(np.float32)


def test_frame_pixels_fits_and_preserves_shape():
    img = _gradient(8, 12)
    px = tui.frame_pixels(img, cols=100, rows=40)
    # no upscale: scale is capped at 1, height snapped to even
    assert px.shape == (8, 12, 3)
    assert px.dtype == np.uint8
    # downscale keeps aspect inside the cell grid
    px2 = tui.frame_pixels(_gradient(64, 96), cols=24, rows=40)
    assert px2.shape[1] <= 24 and px2.shape[0] % 2 == 0


def test_ansi_frame_structure():
    s = tui.ansi_frame(_gradient(8, 12), cols=80, rows=24)
    lines = s.split("\n")
    assert len(lines) == 4                      # 8 px rows -> 4 cells
    assert all(line.endswith("\x1b[0m") for line in lines)
    assert s.count("▀") == 4 * 12
    assert "\x1b[38;2;" in s and "\x1b[48;2;" in s


def test_ansi_frame_exposure_brightens():
    img = _gradient(4, 4) * 0.1
    dim = tui.frame_pixels(img, 80, 24, exposure=0.0)
    bright = tui.frame_pixels(img, 80, 24, exposure=2.0)
    assert bright.astype(int).sum() > dim.astype(int).sum()


def test_live_view_homes_cursor():
    buf = io.StringIO()
    tui.live_view(_gradient(), status="chunk 1/4", out=buf)
    s = buf.getvalue()
    assert s.startswith("\x1b[H")
    assert "chunk 1/4" in s


def test_interactive_non_tty_prints_one_frame():
    buf = io.StringIO()
    exposure = tui.interactive(_gradient(), out=buf)
    assert exposure == 0.0
    assert "▀" in buf.getvalue()


def test_point_cloud_image_projects_and_rotates():
    rs = np.random.RandomState(3)
    pts = rs.normal(size=(2000, 3))
    a = tui.point_cloud_image(pts, 64, 64)
    b = tui.point_cloud_image(pts, 64, 64, yaw=1.0, pitch=0.5)
    assert a.shape == (64, 64, 3) and a.max() > 0
    assert not np.allclose(a, b)          # rotation changes the view
    # 2D points accepted (disk/square warps)
    c = tui.point_cloud_image(rs.rand(500, 2), 48, 48)
    assert c.max() > 0


def test_point_cloud_lines_drawn_red():
    pts = np.zeros((4, 3))
    line = np.array([[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    img = tui.point_cloud_image(pts, 32, 32, lines=[line])
    red = (img[:, :, 0] > 0.9) & (img[:, :, 1] < 0.3)
    assert red.any()


def test_arcball_non_tty_prints_one_frame():
    buf = io.StringIO()
    tui.arcball(np.random.RandomState(0).normal(size=(100, 3)),
                title="t", out=buf)
    assert "▀" in buf.getvalue()


def test_render_to_files_view_hook(tmp_path):
    # the --view plumbing: on_chunk fires with a finalized image
    from nori_tpu.render import render_to_files
    from nori_tpu.scenes_builtin import cornell_box

    import nori_tpu.tui as tui_mod

    calls = []
    orig = tui_mod.live_view
    tui_mod.live_view = lambda img, status="", **kw: calls.append(
        (np.asarray(img).shape, status))
    try:
        sc = cornell_box(width=32, height=32, spp=1,
                         integrator="path_mis", sphere_subdiv=1)
        render_to_files(sc, str(tmp_path / "v"), spp=1, view=True)
    finally:
        tui_mod.live_view = orig
    assert calls and calls[-1][0] == (32, 32, 3)
    assert "100%" in calls[-1][1]
