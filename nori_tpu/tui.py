"""Terminal image viewer: ANSI truecolor half-block rendering.

The reference's NoriScreen (src/gui.cpp:19-132) is a nanogui window
that shows the film live while rendering, with an exposure slider
feeding a sRGB tonemap shader (src/gui.cpp:36-42, scale = 2^exposure).
A TPU pod host has no display server, but every session has a
terminal: this module renders the film into 24-bit ANSI color using
U+2580 half blocks (each character cell carries two vertically stacked
pixels: foreground color = top, background = bottom), which modern
terminals display over plain SSH.

Three surfaces:
  ansi_frame(img, cols, rows, exposure)  pure string renderer
  live_view(img, status)                 in-place redraw per chunk
                                         (the live render screen)
  interactive(img, save_base)            key loop: -/+ exposure slider
                                         equivalent, s saves PNG,
                                         q quits (the EXR viewer)
"""

from __future__ import annotations

import shutil
import sys

import numpy as np

_CSI = "\x1b["
_RESET = _CSI + "0m"
_HALF = "▀"           # upper half block


def _resize_area(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Downscale (H, W, 3) float RGB with PIL's box/bilinear filter
    (good enough for a preview; avoids hand-rolled reduceat bins)."""
    from PIL import Image

    h, w = img.shape[:2]
    if (w, h) == (out_w, out_h):
        return img
    chans = []
    filt = Image.BOX if (out_w < w or out_h < h) else Image.BILINEAR
    for c in range(3):
        im = Image.fromarray(np.ascontiguousarray(
            img[:, :, c], dtype=np.float32), mode="F")
        chans.append(np.asarray(im.resize((out_w, out_h), filt)))
    return np.stack(chans, axis=-1)


def frame_pixels(img: np.ndarray, cols: int, rows: int,
                 exposure: float = 0.0) -> np.ndarray:
    """Tonemapped uint8 pixel grid fitted to a cols x rows cell
    terminal: returns (2*r, c, 3) with c <= cols, 2*r <= 2*rows.

    A cell is one column wide and two half-block pixels tall, and
    terminal cells are ~1:2 wide:tall, so half-pixels are close to
    square: uniform scale fitting preserves aspect like the GUI
    window's glViewport fit.
    """
    from nori_tpu.core.color import np_to_srgb

    img = np.asarray(img, dtype=np.float32)
    h, w = img.shape[:2]
    scale = min(cols / w, (2 * rows) / h, 1.0)
    out_w = max(1, int(w * scale))
    out_h = max(2, int(h * scale) & ~1)      # even: full half-block cells
    img = _resize_area(img, out_w, out_h)
    srgb = np_to_srgb(np.clip(img * (2.0 ** exposure), 0.0, None))
    return np.clip(srgb * 255.0 + 0.5, 0, 255).astype(np.uint8)


def ansi_frame(img: np.ndarray, cols: int, rows: int,
               exposure: float = 0.0) -> str:
    """Render linear RGB to an ANSI truecolor half-block string of at
    most `rows` lines x `cols` columns (newline-separated, colors
    reset at each line end)."""
    px = frame_pixels(img, cols, rows, exposure)
    top, bot = px[0::2], px[1::2]
    lines = []
    for r in range(top.shape[0]):
        parts = []
        for c in range(top.shape[1]):
            tr, tg, tb = top[r, c]
            br, bg, bb = bot[r, c]
            parts.append(f"{_CSI}38;2;{tr};{tg};{tb}m"
                         f"{_CSI}48;2;{br};{bg};{bb}m{_HALF}")
        lines.append("".join(parts) + _RESET)
    return "\n".join(lines)


def _term_size(reserve_rows: int = 2):
    size = shutil.get_terminal_size(fallback=(100, 40))
    return size.columns, max(4, size.lines - reserve_rows)


def live_view(img: np.ndarray, status: str = "",
              exposure: float = 0.0, out=None) -> None:
    """Redraw the image in place (cursor-home, no scrollback spam) —
    the per-chunk live render display (src/gui.cpp:19-132)."""
    out = out or sys.stdout
    cols, rows = _term_size()
    frame = ansi_frame(img, cols, rows, exposure)
    out.write(_CSI + "H" + _CSI + "2J" + frame + "\n"
              + status[:cols] + _CSI + "0K\n")
    out.flush()


def interactive(img: np.ndarray, save_base: str = "nori_view",
                out=None) -> float:
    """Interactive viewer: -/+ (or =/_) step exposure by half a stop
    like the GUI slider, 0 resets, s writes <save_base>.png at the
    current exposure, q/ESC quits.  Returns the final exposure.

    Falls back to a single printed frame when stdin isn't a TTY.
    """
    out = out or sys.stdout
    exposure = 0.0
    if not (hasattr(sys.stdin, "fileno") and sys.stdin.isatty()):
        cols, rows = _term_size()
        out.write(ansi_frame(img, cols, rows, exposure) + "\n")
        out.flush()
        return exposure

    import termios
    import tty

    fd = sys.stdin.fileno()
    saved = termios.tcgetattr(fd)
    out.write(_CSI + "?1049h" + _CSI + "?25l")     # alt screen, no cursor
    try:
        tty.setcbreak(fd)
        msg = ""
        while True:
            live_view(img, status=(
                f"exposure {exposure:+.1f}  [-/+ adjust, 0 reset, "
                f"s save, q quit] {msg}"), exposure=exposure, out=out)
            ch = sys.stdin.read(1)
            msg = ""
            if ch in ("q", "Q", "\x1b"):
                break
            elif ch in ("+", "="):
                exposure += 0.5
            elif ch in ("-", "_"):
                exposure -= 0.5
            elif ch == "0":
                exposure = 0.0
            elif ch in ("s", "S"):
                from nori_tpu.bitmap import write_png

                path = f"{save_base}.png"
                write_png(path, np.asarray(img) * (2.0 ** exposure))
                msg = f"saved {path}"
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, saved)
        out.write(_CSI + "?25h" + _CSI + "?1049l")
        out.flush()
    return exposure
