"""Full Pallas tile tracer (interpret mode) vs the XLA tracer."""

import numpy as np

import jax.numpy as jnp

from zig_vulkan_tpu.config import CameraConfig
from zig_vulkan_tpu.core.camera import Camera
from zig_vulkan_tpu.models.scenes import flat_test_scene
from zig_vulkan_tpu.ops import trace
from zig_vulkan_tpu.ops.trace_pallas import (
    TILE,
    build_pallas_tables,
    grid_hit_pallas,
)


def _rays(cam_origin, w=32, h=32):
    cam = Camera(75.0, w, h, CameraConfig(origin=cam_origin))
    d = cam.d_camera
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    u = (xs / np.float32(w - 1)).ravel()
    v = (ys / np.float32(h - 1)).ravel()
    rd = (d.horizontal * u[:, None] + d.lower_left_corner
          + d.vertical * v[:, None] - d.origin).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = np.broadcast_to(d.origin, rd.shape).astype(np.float32).copy()
    return ro, rd


def test_pallas_tracer_matches_xla():
    sc = flat_test_scene(dim=8)
    # extra geometry for interesting traversal
    ys = np.arange(4, 12)
    sc.grid.insert_batch(np.full(ys.size, 20), ys, np.full(ys.size, 20),
                         np.full(ys.size, 7, dtype=np.uint8))
    st = sc.grid.static
    arrays = sc.grid.device_arrays()
    mats = trace.materials_to_device(sc.materials)
    tables = build_pallas_tables(st, arrays)

    for origin in [(4.0, 6.5, 15.0), (4.0, 4.5, 20.0), (-3.0, 2.0, 9.0)]:
        ro, rd = _rays(origin)
        n = ro.shape[0]
        assert n % TILE == 0

        ref = trace.grid_hit(st, arrays, mats, jnp.asarray(ro),
                             jnp.asarray(rd), jnp.float32(np.inf),
                             jnp.full(n, 3, jnp.int32),
                             jnp.ones(n, jnp.float32), jnp.ones(n, bool),
                             use_skip=True)
        got = grid_hit_pallas(st, arrays, tables, jnp.asarray(ro),
                              jnp.asarray(rd), jnp.ones(n, bool),
                              interpret=True)

        f_r = np.asarray(ref["found"])
        f_g = np.asarray(got["found"])
        assert (f_r == f_g).mean() > 0.999, origin
        both = f_r & f_g
        np.testing.assert_allclose(np.asarray(got["t"])[both],
                                   np.asarray(ref["t"])[both], atol=1e-3)
        assert (np.asarray(got["index"])[both]
                == np.asarray(ref["index"])[both]).all()
        np.testing.assert_allclose(np.asarray(got["normal"])[both],
                                   np.asarray(ref["normal"])[both], atol=1e-5)


def test_pallas_inactive_lanes_ignored():
    sc = flat_test_scene(dim=8)
    st = sc.grid.static
    arrays = sc.grid.device_arrays()
    tables = build_pallas_tables(st, arrays)
    ro, rd = _rays((4.0, 6.5, 15.0))
    n = ro.shape[0]
    active = np.zeros(n, dtype=bool)
    active[: n // 2] = True
    got = grid_hit_pallas(st, arrays, tables, jnp.asarray(ro),
                          jnp.asarray(rd), jnp.asarray(active),
                          interpret=True)
    found = np.asarray(got["found"])
    assert not found[n // 2:].any()
