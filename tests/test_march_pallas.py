"""Pallas march kernel (interpret mode) vs the XLA tracer's grid phase."""

import numpy as np

import jax.numpy as jnp

from zig_vulkan_tpu.config import CameraConfig
from zig_vulkan_tpu.core.camera import Camera
from zig_vulkan_tpu.models.scenes import flat_test_scene
from zig_vulkan_tpu.ops import trace
from zig_vulkan_tpu.ops.march_pallas import TILE, march_to_loaded


def test_march_finds_first_loaded_cell_interpret():
    sc = flat_test_scene(dim=8)
    st = sc.grid.static
    arrays = sc.grid.device_arrays()
    tables = trace.build_trace_tables(st, arrays)
    dist = tables[:, 3]

    cam = Camera(75.0, 32, 32, CameraConfig(origin=(4.0, 6.5, 15.0)))
    d = cam.d_camera
    w, h = 32, 32
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    u = (xs / np.float32(w - 1)).ravel()
    v = (ys / np.float32(h - 1)).ravel()
    rd = (d.horizontal * u[:, None] + d.lower_left_corner
          + d.vertical * v[:, None] - d.origin).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    n = rd.shape[0]
    assert n % TILE == 0

    # slab entry t (reproduces the tracer's setup)
    gmin = np.asarray(st.min_point, np.float32)
    gmax = np.asarray(st.max_point, np.float32)
    origin = np.broadcast_to(d.origin, rd.shape).astype(np.float32)
    with np.errstate(divide="ignore"):
        inv = np.where(rd == 0, 1e12, 1.0 / rd).astype(np.float32)
    tl = (gmin - origin) * inv
    tu = (gmax - origin) * inv
    tmin = np.minimum(tl, tu).max(axis=-1)
    tmax = np.maximum(tl, tu).min(axis=-1)
    ok = np.maximum(tmin, 1e-5) <= tmax
    t_base = np.maximum(tmin, 1e-5).astype(np.float32)

    cell, t_rel, ncode, found = march_to_loaded(
        st, arrays.statuses, dist,
        jnp.asarray(origin[:, 0]), jnp.asarray(origin[:, 1]),
        jnp.asarray(origin[:, 2]),
        jnp.asarray(rd[:, 0]), jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
        jnp.asarray(t_base), jnp.asarray(ok), max_iters=96, interpret=True)
    found = np.asarray(found)
    cell = np.asarray(cell)

    # ground truth from the XLA tracer: a primary grid_hit tells us which
    # rays reach ANY loaded brick (every loaded cell here has a solid voxel
    # on its boundary so hit ~ reached-loaded-cell for this scene)
    mats = trace.materials_to_device(sc.materials)
    gh = trace.grid_hit(st, arrays, mats, jnp.asarray(origin), jnp.asarray(rd),
                        jnp.float32(np.inf), jnp.full(n, 3, jnp.int32),
                        jnp.ones(n, jnp.float32), jnp.ones(n, bool))
    hit = np.asarray(gh["found"])

    # every traced hit must have marched into a loaded cell
    assert (found | ~hit).all()
    # and the marched cells must actually be loaded
    loaded_cells = cell[found]
    stat = np.asarray(arrays.statuses)
    bits = (stat[loaded_cells // 32] >> (loaded_cells % 32).astype(np.uint32)) & 1
    assert (bits == 1).all()
    # rays that the march says miss must not hit in the tracer
    assert (~hit[~found & np.asarray(ok)]).all()
