"""Golden-image regression tests (SURVEY.md §4 test plan item (c)).

Goldens were produced by the numpy oracle (deterministic across
environments); both the oracle and the TPU tracer must keep reproducing
them. Regenerate with the snippet in the git history if semantics
intentionally change.
"""

import os

import numpy as np

from zig_vulkan_tpu.config import CameraConfig, SunConfig
from zig_vulkan_tpu.core.camera import Camera
from zig_vulkan_tpu.core.sun import Sun
from zig_vulkan_tpu.models.scenes import flat_test_scene
from zig_vulkan_tpu.oracle import cpu_tracer as oracle
from zig_vulkan_tpu.ops import trace

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "flat_scene_renders.npz")


def scene():
    sc = flat_test_scene(dim=8)
    xs, zs = np.meshgrid(np.arange(6, 16), np.arange(6, 16), indexing="ij")
    sc.grid.insert_batch(xs.ravel(), np.full(xs.size, 4), zs.ravel(),
                         np.zeros(xs.size, dtype=np.uint8))
    ys = np.arange(4, 12)
    sc.grid.insert_batch(np.full(ys.size, 20), ys, np.full(ys.size, 20),
                         np.full(ys.size, 7, dtype=np.uint8))
    return sc


def test_goldens_reproduced():
    g = np.load(GOLDEN)
    sc = scene()
    osc = oracle.OracleScene(sc.grid.static, sc.grid.arrays, sc.materials)
    arrays = sc.grid.device_arrays()
    mats = trace.materials_to_device(sc.materials)

    cam = Camera(75.0, 48, 48, CameraConfig(origin=(4.0, 6.5, 15.0),
                                            samples_per_pixel=1, max_bounce=0))
    sun = Sun(SunConfig(enabled=False))
    # oracle must be bit-stable
    np.testing.assert_array_equal(
        oracle.render(osc, cam.d_camera, sun.device_data), g["primary"])
    # tracer pixel-exact on primary rays
    img = np.asarray(trace.render_image(
        sc.grid.static, arrays, mats, cam.d_camera,
        sun.device_data.position, sun.device_data.color,
        sun.device_data.radius, False))
    np.testing.assert_allclose(img, g["primary"], atol=1e-5)

    cam2 = Camera(75.0, 48, 48, CameraConfig(origin=(4.0, 6.5, 15.0),
                                             samples_per_pixel=2, max_bounce=2))
    sun2 = Sun(SunConfig(enabled=True))
    np.testing.assert_array_equal(
        oracle.render(osc, cam2.d_camera, sun2.device_data), g["path_sun"])
    img2 = np.asarray(trace.render_image(
        sc.grid.static, arrays, mats, cam2.d_camera,
        sun2.device_data.position, sun2.device_data.color,
        sun2.device_data.radius, True))
    diff = np.abs(img2 - g["path_sun"]).max(axis=-1)
    assert (diff > 1e-3).mean() < 0.01
