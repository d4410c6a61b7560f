"""Live terminal viewer: ANSI framebuffer painting + synthesized input."""

import io

import numpy as np

from zig_vulkan_tpu.app.live import HOLD_S, LiveViewer, frame_to_ansi
from zig_vulkan_tpu.app.input import Key


def test_frame_to_ansi_shapes_and_escapes():
    img = np.zeros((32, 48, 3), dtype=np.float32)
    img[:16] = [1.0, 0.0, 0.0]   # top half red
    s = frame_to_ansi(img, max_cols=24, max_rows=8)
    lines = s.split("\n")
    assert len(lines) == 8
    assert "\x1b[38;2;255;0;0m" in lines[0]      # red top half
    assert "\x1b[38;2;0;0;0m" in lines[-1]       # black bottom half
    assert "\x1b[48;2;0;0;0m" in lines[-1]
    assert lines[0].endswith("\x1b[0m")
    assert lines[0].count("▀") == 24


def test_frame_to_ansi_small_image():
    img = np.ones((4, 4, 3), dtype=np.float32) * 0.5
    s = frame_to_ansi(img, max_cols=80, max_rows=40)
    assert s.count("\n") == 1  # 4 rows -> 2 half-block lines


def _viewer():
    from tests.test_engine import small_engine

    rt = small_engine()
    return LiveViewer(rt, out=io.StringIO(), max_cols=16, max_rows=8)


def test_viewer_key_hold_and_release():
    v = _viewer()
    assert v.feed([("char", "w")], now=0.0)
    assert Key.W in v._held
    assert v.inp.held(Key.W) if hasattr(v.inp, "held") else True
    v.expire_holds(now=HOLD_S + 0.01)
    assert Key.W not in v._held
    # sprint: uppercase holds shift too
    v.feed([("char", "W")], now=1.0)
    assert Key.LEFT_SHIFT in v._held and Key.W in v._held
    # q quits
    assert not v.feed([("char", "q")], now=1.1)


def test_viewer_arrows_move_cursor_and_tuners():
    v = _viewer()
    cam = v.rt.camera
    yaw0 = np.array(cam.yaw, copy=True)
    # the reference swallows the first cursor moves (5-frame mouse-ignore,
    # main.zig:294-310) — send enough arrow events to get past it
    for i in range(7):
        v.feed([("arrow", "C")], now=0.0)
        v.inp.apply_to_camera(cam, 0.016)
    assert np.any(np.asarray(cam.yaw) != yaw0)
    spp0 = int(cam.d_camera.samples_per_pixel)
    v.feed([("char", "2")], now=0.1)
    assert int(cam.d_camera.samples_per_pixel) == spp0 + 1


def test_viewer_renders_frames_headless():
    v = _viewer()
    n = v.run(max_frames=2)
    assert n == 2
    painted = v.out.getvalue()
    assert "▀" in painted and "Mray/s" in painted
