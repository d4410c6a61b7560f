"""Adversarial-scene stall/livelock sweep (round-5 verdict item 8).

The tile tracer's stall guard (ops/tile_tracer.py phase_wrap) hands a lane
making 8 consecutive sub-cell advances to the XLA retrace (code -3). It is
hardware-validated on the default scene (identical checksum, 7 known stuck
lanes); this module quantifies its behavior on PATHOLOGICAL geometries the
default scene never produces, through the compiled-semantics (interpret)
kernel:

- boundary-plane grazing bundles: near-zero direction components traveling
  exactly along cell/region boundary planes (the round-3 stuck-lane
  trigger, docs/DESIGN_NOTES.md round 3);
- single-voxel region corners: the march must park/DMA a region for ONE
  occupied cell whose brick holds ONE voxel at the corner shared with
  three sibling regions;
- all-dielectric bricks with the per-ray self-intersection skip key
  (brick_raytracer.comp:427 semantics) marching THROUGH the solid volume.

Assertions: the give-up + starvation rate is BOUNDED (the engine's compact
retrace absorbs up to _RETRACE_CAP lanes for ~1 ms, so "bounded" = well
under that), and every RETIRED lane agrees with the XLA oracle semantics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from zig_vulkan_tpu.config import GridConfig
from zig_vulkan_tpu.core.grid import BrickGrid
from zig_vulkan_tpu.core.materials import terrain_materials
from zig_vulkan_tpu.ops import trace
from zig_vulkan_tpu.ops.tile_tracer import (
    TILE,
    build_region_tables,
    grid_hit_tiles,
)

pytestmark = pytest.mark.slow


def _trace_both(grid, ro, rd, ray_key=None, max_phases=192):
    """Run the interpret-mode tile tracer and the XLA oracle on the same
    wavefront; return (tile out, xla ref, stuck_rate)."""
    st = grid.static
    arrays = grid.device_arrays()
    mats = trace.materials_to_device(terrain_materials())
    tables = trace.build_trace_tables(st, arrays)
    blocks = build_region_tables(st, arrays, tables)
    n = ro.shape[0]
    assert n % TILE == 0

    got = grid_hit_tiles(
        st, arrays, blocks,
        jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]), jnp.asarray(ro[:, 2]),
        jnp.asarray(rd[:, 0]), jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
        jnp.ones(n, bool),
        ray_key=None if ray_key is None else jnp.asarray(ray_key),
        needs_ignore=ray_key is not None,
        max_phases=max_phases, interpret=True)

    ref = trace.grid_hit(
        st, arrays, mats, jnp.asarray(ro), jnp.asarray(rd),
        jnp.float32(np.inf),
        jnp.full(n, 3, jnp.int32) if ray_key is None
        else jnp.full(n, trace.MAT_DIELECTRIC, jnp.int32),
        jnp.ones(n, np.float32) if ray_key is None
        else jnp.asarray(ray_key),
        jnp.ones(n, bool), use_skip=True,
        needs_ignore=ray_key is not None, tables=tables)

    stuck = np.asarray(got["unfinished"]) | np.asarray(got["stalled"])
    return got, ref, stuck


def _assert_bounded_and_parity(got, ref, stuck, max_rate=0.02):
    n = stuck.shape[0]
    rate = stuck.mean()
    assert rate <= max_rate, (
        f"{int(stuck.sum())}/{n} lanes stuck/starved ({rate:.3f} > {max_rate})")
    done = ~stuck
    f_r = np.asarray(ref["found"])[done]
    f_g = np.asarray(got["found"])[done]
    agree = (f_r == f_g).mean()
    assert agree > 0.99, f"retired-lane found parity {agree:.4f}"
    both = f_r & f_g
    np.testing.assert_allclose(np.asarray(got["t"])[done][both],
                               np.asarray(ref["t"])[done][both], atol=5e-2)


def _floor_scene(dims=(16, 16, 16), scale=1.0):
    grid = BrickGrid(*dims, GridConfig(min_point=(0.0, 0.0, 0.0),
                                       scale=scale))
    grid.attach_materials(terrain_materials())
    vx, vy, vz = grid.static.voxel_dims
    xs, zs = np.meshgrid(np.arange(vx), np.arange(vz), indexing="ij")
    for y in range(3):
        grid.insert_batch(xs.ravel(), np.full(xs.size, y), zs.ravel(),
                          np.full(xs.size, 1, dtype=np.uint8))
    return grid


def test_boundary_plane_grazing_bundle():
    """Rays riding exactly on cell-boundary planes with near-zero normal
    components — the round-3 stuck-lane trigger. The carried DDA cursor
    (round 5) removes the original park-oscillation by design; the guard
    must keep the give-up rate bounded regardless."""
    grid = _floor_scene()
    st = grid.static
    # origins ON the y = 4.0 cell/brick boundary plane (cell size = scale
    # = 1.0), directions almost parallel to it, fanning in x/z
    n = TILE
    rng = np.random.default_rng(7)
    ro = np.stack([rng.uniform(1.0, 14.0, n),
                   np.full(n, 4.0, np.float32),  # exactly on the plane
                   rng.uniform(1.0, 14.0, n)], axis=-1).astype(np.float32)
    theta = rng.uniform(0, 2 * np.pi, n)
    eps = np.where(np.arange(n) % 2 == 0, 1e-7, -1e-7).astype(np.float32)
    rd = np.stack([np.cos(theta), eps, np.sin(theta)],
                  axis=-1).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    got, ref, stuck = _trace_both(grid, ro, rd)
    _assert_bounded_and_parity(got, ref, stuck)


def test_single_voxel_region_corners():
    """Single voxels at the 8 corners of the region lattice: every hit
    costs a full region park+DMA for one voxel, and corner rays cross
    region boundaries exactly at the shared corner point."""
    grid = BrickGrid(16, 16, 16, GridConfig(min_point=(0.0, 0.0, 0.0),
                                            scale=1.0))
    grid.attach_materials(terrain_materials())
    vx, vy, vz = grid.static.voxel_dims
    corners = [(x, y, z) for x in (0, vx - 1) for y in (0, vy - 1)
               for z in (0, vz - 1)]
    for cx, cy, cz in corners:
        grid.insert_batch(np.array([cx]), np.array([cy]), np.array([cz]),
                          np.array([5], dtype=np.uint8))
    n = TILE
    rng = np.random.default_rng(11)
    # bundles aimed diagonally at each corner from outside, with jitter
    ro = np.zeros((n, 3), np.float32)
    rd = np.zeros((n, 3), np.float32)
    centers = np.asarray(corners, np.float32) * grid.static.scale / 4.0
    for i in range(n):
        c = centers[i % len(corners)]
        o = np.where(c > 2.0, -2.0, 6.0).astype(np.float32)
        o += rng.uniform(-0.3, 0.3, 3).astype(np.float32)
        d = c + 0.5 - o + rng.uniform(-0.02, 0.02, 3).astype(np.float32)
        ro[i], rd[i] = o, d / np.linalg.norm(d)
    got, ref, stuck = _trace_both(grid, ro, rd)
    _assert_bounded_and_parity(got, ref, stuck)


def test_all_dielectric_volume_with_skip_key():
    """A solid all-dielectric block marched with the per-ray refraction
    key: the same-dielectric skip rule (brick_raytracer.comp:427) makes
    every voxel transparent to the ray, so the march must cross the WHOLE
    solid volume — the maximum-work path for the in-brick resolver."""
    grid = BrickGrid(8, 8, 8, GridConfig(min_point=(0.0, 0.0, 0.0),
                                         scale=1.0))
    mats = terrain_materials()
    grid.attach_materials(mats)
    vx, vy, vz = grid.static.voxel_dims
    xs, ys, zs = np.meshgrid(np.arange(vx), np.arange(vy), np.arange(vz),
                             indexing="ij")
    # material 0 = water (dielectric, ior 1.333) in terrain_materials
    grid.insert_batch(xs.ravel(), ys.ravel(), zs.ravel(),
                      np.full(xs.size, 0, dtype=np.uint8))
    n = TILE
    rng = np.random.default_rng(13)
    ro = np.stack([np.full(n, -1.0), rng.uniform(0.5, 7.5, n),
                   rng.uniform(0.5, 7.5, n)], axis=-1).astype(np.float32)
    rd = np.stack([np.ones(n), rng.uniform(-0.2, 0.2, n),
                   rng.uniform(-0.2, 0.2, n)], axis=-1).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ior = np.asarray(mats.type_data)[0]
    key = np.full(n, ior, np.float32)  # refracted-inside-water lanes
    got, ref, stuck = _trace_both(grid, ro, rd, ray_key=key,
                                  max_phases=256)
    _assert_bounded_and_parity(got, ref, stuck)
