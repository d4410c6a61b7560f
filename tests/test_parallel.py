"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from zig_vulkan_tpu.config import CameraConfig, DenoiserConfig, SunConfig
from zig_vulkan_tpu.core.camera import Camera
from zig_vulkan_tpu.core.sun import Sun
from zig_vulkan_tpu.models.scenes import flat_test_scene
from zig_vulkan_tpu.ops import trace
from zig_vulkan_tpu.parallel import mesh as pmesh


def test_sharded_render_matches_single_device():
    sc = flat_test_scene(dim=8)
    cam = Camera(75.0, 32, 32, CameraConfig(origin=(4.0, 6.5, 15.0),
                                            samples_per_pixel=1, max_bounce=0))
    sun = Sun(SunConfig(enabled=False))
    arrays = sc.grid.device_arrays()
    mats = trace.materials_to_device(sc.materials)

    single = np.asarray(trace.render_image(
        sc.grid.static, arrays, mats, cam.d_camera,
        sun.device_data.position, sun.device_data.color,
        sun.device_data.radius, False))

    m = pmesh.make_mesh()
    assert m.devices.size == 8
    sharded = np.asarray(pmesh.render_image_sharded(
        m, sc.grid.static, arrays, mats, cam.d_camera, sun.device_data))

    np.testing.assert_allclose(sharded, single, atol=1e-6)


def test_sharded_render_with_denoise_and_upscale():
    sc = flat_test_scene(dim=8)
    cam = Camera(75.0, 32, 32, CameraConfig(origin=(4.0, 6.5, 15.0),
                                            samples_per_pixel=1, max_bounce=1))
    sun = Sun(SunConfig(enabled=True))
    arrays = sc.grid.device_arrays()
    mats = trace.materials_to_device(sc.materials)
    m = pmesh.make_mesh()
    img = pmesh.render_image_sharded(
        m, sc.grid.static, arrays, mats, cam.d_camera, sun.device_data,
        denoiser=DenoiserConfig(enabled=True, samples=8))
    out = np.asarray(img)
    assert out.shape == (32, 32, 3)
    assert np.isfinite(out).all()
    assert out.max() > 0.1


def test_mesh_requires_divisible_height():
    sc = flat_test_scene(dim=8)
    m = pmesh.make_mesh()
    import pytest

    with pytest.raises(ValueError):
        pmesh.build_sharded_step(
            m, sc.grid.static, width=16, height=30, spp=1, max_bounce=1,
            sun_enabled=False)
