"""Region-marching tile tracer (interpret mode) vs the XLA tracer."""

import numpy as np
import pytest

import jax.numpy as jnp

from zig_vulkan_tpu.config import CameraConfig, GridConfig
from zig_vulkan_tpu.core.grid import BrickGrid
from zig_vulkan_tpu.core.camera import Camera
from zig_vulkan_tpu.core.materials import terrain_materials
from zig_vulkan_tpu.ops import trace
from zig_vulkan_tpu.ops.tile_tracer import (
    TILE,
    build_region_tables,
    trace_tiles_regions,
)


def multi_region_scene():
    """32^3-cell grid -> 2x2x2 regions of 16^3 cells."""
    grid = BrickGrid(32, 32, 32, GridConfig(min_point=(0.0, 0.0, 0.0), scale=1.0))
    mats = terrain_materials()
    grid.attach_materials(mats)
    vx, vy, vz = grid.static.voxel_dims
    xs, zs = np.meshgrid(np.arange(vx), np.arange(vz), indexing="ij")
    for y in range(4):
        grid.insert_batch(xs.ravel(), np.full(xs.size, y), zs.ravel(),
                          np.full(xs.size, 1, dtype=np.uint8))
    # scattered pillars across several regions
    rng = np.random.default_rng(0)
    for _ in range(12):
        px, pz = rng.integers(8, vx - 8, 2)
        ys = np.arange(4, rng.integers(16, 60))
        grid.insert_batch(np.full(ys.size, px), ys, np.full(ys.size, pz),
                          np.full(ys.size, 5, dtype=np.uint8))
    return grid, mats


def _rays(static, origin, w=32, h=32):
    cam = Camera(75.0, w, h, CameraConfig(origin=origin))
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


@pytest.mark.parametrize("origin", [(16.0, 25.0, 70.0), (16.0, 8.0, 40.0),
                                    (-10.0, 20.0, -10.0)])
def test_region_march_matches_xla(origin):
    grid, mats_t = multi_region_scene()
    st = grid.static
    arrays = grid.device_arrays()
    mats = trace.materials_to_device(mats_t)
    tables = trace.build_trace_tables(st, arrays)
    blocks = build_region_tables(st, arrays, tables)

    ro, rd = _rays(st, origin)
    n = ro.shape[0]
    assert n % TILE == 0

    ref = trace.grid_hit(st, arrays, mats, jnp.asarray(ro), jnp.asarray(rd),
                         jnp.float32(np.inf), jnp.full(n, 3, jnp.int32),
                         jnp.ones(n, jnp.float32), jnp.ones(n, bool),
                         use_skip=True, needs_ignore=False, tables=tables)

    # slab-clamped entry t (as grid_hit computes internally)
    gmin = np.asarray(st.min_point, np.float32)
    gmax = np.asarray(st.max_point, np.float32)
    with np.errstate(divide="ignore"):
        inv = np.where(rd == 0, 1e12, 1.0 / rd).astype(np.float32)
    tl = (gmin - ro) * inv
    tu = (gmax - ro) * inv
    tmin = np.minimum(tl, tu).max(axis=-1)
    tmax = np.maximum(tl, tu).min(axis=-1)
    t_base = np.maximum(tmin, 1e-5).astype(np.float32)
    ok = t_base <= tmax

    got = trace_tiles_regions(
        st, blocks,
        jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]), jnp.asarray(ro[:, 2]),
        jnp.asarray(rd[:, 0]), jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
        jnp.asarray(t_base), jnp.asarray(ok), interpret=True)

    f_r = np.asarray(ref["found"])
    f_g = np.asarray(got["found"])
    agree = (f_r == f_g).mean()
    assert agree > 0.99, (origin, agree)
    both = f_r & f_g
    np.testing.assert_allclose(np.asarray(got["t"])[both],
                               np.asarray(ref["t"])[both], atol=5e-2)


def test_engine_with_pallas_tile_tracer():
    """Engine renders via the region tracer (interpret mode on CPU) and
    matches the XLA path closely."""
    from zig_vulkan_tpu.config import (
        CameraConfig, DenoiserConfig, EngineConfig, SunConfig, TraceConfig)
    from zig_vulkan_tpu.engine.engine import VoxelRT
    from zig_vulkan_tpu.core.materials import terrain_materials

    grid, mats = multi_region_scene()
    # tiny render (1 tile per band) for interpret-mode speed
    cfg = EngineConfig(
        internal_resolution_width=32, internal_resolution_height=32,
        camera=CameraConfig(origin=(16.0, 25.0, 70.0), samples_per_pixel=1,
                            max_bounce=0),
        sun=SunConfig(enabled=False), denoiser=DenoiserConfig(enabled=False),
        trace=TraceConfig(row_bands=1, use_pallas=True))
    rt = VoxelRT(grid, mats, cfg)
    assert rt._tile_tracer_compatible()
    img_pallas = np.asarray(rt.render())

    grid2, mats2 = multi_region_scene()
    cfg2 = EngineConfig(
        internal_resolution_width=32, internal_resolution_height=32,
        camera=CameraConfig(origin=(16.0, 25.0, 70.0), samples_per_pixel=1,
                            max_bounce=0),
        sun=SunConfig(enabled=False), denoiser=DenoiserConfig(enabled=False),
        trace=TraceConfig(row_bands=1, use_pallas=False))
    rt2 = VoxelRT(grid2, mats2, cfg2)
    img_xla = np.asarray(rt2.render())

    diff = np.abs(img_pallas - img_xla).max(axis=-1)
    assert (diff > 1e-3).mean() < 0.01


def test_engine_merged_spp_matches_xla():
    """The merged-spp Pallas branch (render_rows: spp>1 + region_blocks
    concatenates all samples into ONE bounce state machine) is the
    production default path (the default workload is spp=2 on Pallas) —
    round-4 advisor finding: both Pallas-path tests pinned spp=1, so the
    shipped branch had zero coverage. Full default-shaped step: spp=2,
    max_bounce=2(+1), sun shadows."""
    from zig_vulkan_tpu.config import (
        CameraConfig, DenoiserConfig, EngineConfig, SunConfig, TraceConfig)
    from zig_vulkan_tpu.engine.engine import VoxelRT

    def build(use_pallas):
        grid, mats = multi_region_scene()
        cfg = EngineConfig(
            internal_resolution_width=32, internal_resolution_height=32,
            camera=CameraConfig(origin=(16.0, 25.0, 70.0),
                                samples_per_pixel=2, max_bounce=2),
            sun=SunConfig(enabled=True, animate=False),
            denoiser=DenoiserConfig(enabled=False),
            trace=TraceConfig(row_bands=1, use_pallas=use_pallas))
        return VoxelRT(grid, mats, cfg)

    img_pallas = np.asarray(build(True).render())
    img_xla = np.asarray(build(False).render())
    diff = np.abs(img_pallas - img_xla).max(axis=-1)
    assert (diff > 1e-3).mean() < 0.01, float((diff > 1e-3).mean())


def dielectric_scene():
    """Floor + a water slab so refracted rays exercise the in-kernel
    same-dielectric skip rule (brick_raytracer.comp:427)."""
    grid = BrickGrid(32, 32, 32, GridConfig(min_point=(0.0, 0.0, 0.0), scale=1.0))
    mats = terrain_materials()
    grid.attach_materials(mats)
    vx, vy, vz = grid.static.voxel_dims
    xs, zs = np.meshgrid(np.arange(vx), np.arange(vz), indexing="ij")
    for y in range(3):
        grid.insert_batch(xs.ravel(), np.full(xs.size, y), zs.ravel(),
                          np.full(xs.size, 3, dtype=np.uint8))
    # water volume (material 0: dielectric ir=1.333)
    wx, wz = np.meshgrid(np.arange(20, 60), np.arange(20, 60), indexing="ij")
    for y in range(3, 14):
        grid.insert_batch(wx.ravel(), np.full(wx.size, y), wz.ravel(),
                          np.full(wx.size, 0, dtype=np.uint8))
    return grid, mats


def test_dielectric_bounces_match_xla():
    """Full path trace (bounce rays incl. refracted dielectric-skip rays)
    through the region tracer matches the XLA wavefront."""
    from zig_vulkan_tpu.ops.tile_tracer import build_region_tables as brt

    grid, mats_t = dielectric_scene()
    st = grid.static
    arrays = grid.device_arrays()
    mats = trace.materials_to_device(mats_t)
    tables = trace.build_trace_tables(st, arrays)
    blocks = brt(st, arrays, tables)

    ro, rd = _rays(st, (16.0, 25.0, 70.0))
    args = (st, arrays, mats,
            jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]), jnp.asarray(ro[:, 2]),
            jnp.asarray(rd[:, 0]), jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
            3,                                     # max_bounce
            jnp.asarray([0.0, 900.0, 0.0], jnp.float32), False,
            jnp.asarray([1.0, 1.1, 1.0], jnp.float32), jnp.float32(5.0))

    ref = trace._ray_color_soa(*args, 768, tables, True)
    got = trace._ray_color_soa(*args, 768, tables, True,
                               region_blocks=blocks, tile_interpret=True)
    diff = np.abs(np.asarray(got) - np.asarray(ref)).max(axis=-1)
    assert (diff > 1e-3).mean() < 0.01, float((diff > 1e-3).mean())


@pytest.mark.parametrize("n_serve", [2, 4])
def test_concurrent_serve_matches_xla(n_serve):
    """The concurrent multi-region serve (round 3, incoherent-ray path)
    must agree with the XLA tracer exactly like the sequential serve."""
    grid, mats_t = multi_region_scene()
    st = grid.static
    arrays = grid.device_arrays()
    mats = trace.materials_to_device(mats_t)
    tables = trace.build_trace_tables(st, arrays)
    blocks = build_region_tables(st, arrays, tables)
    from zig_vulkan_tpu.ops.tile_tracer import grid_hit_tiles

    # a low pose so rays graze the terrain and cross many regions
    ro, rd = _rays(st, (16.0, 8.0, 40.0))
    n = ro.shape[0]
    ref = trace.grid_hit(st, arrays, mats, jnp.asarray(ro), jnp.asarray(rd),
                         jnp.float32(np.inf), jnp.full(n, 3, jnp.int32),
                         jnp.ones(n, jnp.float32), jnp.ones(n, bool),
                         use_skip=True, needs_ignore=False, tables=tables)
    got = grid_hit_tiles(
        st, arrays, blocks,
        jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]), jnp.asarray(ro[:, 2]),
        jnp.asarray(rd[:, 0]), jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
        jnp.ones(n, bool), max_phases=256, interpret=True,
        concurrent=True, n_serve=n_serve)
    assert not np.asarray(got["unfinished"]).any()
    f_r, f_g = np.asarray(ref["found"]), np.asarray(got["found"])
    agree = (f_r == f_g).mean()
    assert agree > 0.99, (n_serve, agree)
    both = f_r & f_g
    np.testing.assert_allclose(np.asarray(got["t"])[both],
                               np.asarray(ref["t"])[both], atol=5e-2)


def sprayed_scene(per_region=2):
    """The BASELINE config-3 regime in miniature: single voxels sprayed
    so (almost) every region is non-empty but holds <= `per_region`
    loaded cells — the shortlist/sparse-roam target."""
    grid = BrickGrid(32, 32, 32,
                     GridConfig(min_point=(0.0, 0.0, 0.0), scale=1.0))
    mats = terrain_materials()
    grid.attach_materials(mats)
    from zig_vulkan_tpu.ops.tile_tracer import REGION_CELLS, region_grid

    ry, rz, rx = REGION_CELLS
    ny, nz, nx = region_grid(grid.static)
    rng = np.random.default_rng(7)
    xs, ys, zs = [], [], []
    for iy in range(ny):
        for iz in range(nz):
            for ix in range(nx):
                for _ in range(per_region):
                    cx = min(ix * rx + rng.integers(rx), grid.static.dim_x - 1)
                    cy = min(iy * ry + rng.integers(ry), grid.static.dim_y - 1)
                    cz = min(iz * rz + rng.integers(rz), grid.static.dim_z - 1)
                    # one voxel inside that cell
                    xs.append(cx * 4 + rng.integers(4))
                    ys.append(cy * 4 + rng.integers(4))
                    zs.append(cz * 4 + rng.integers(4))
    grid.insert_batch(np.asarray(xs), np.asarray(ys), np.asarray(zs),
                      np.full(len(xs), 1, dtype=np.uint8))
    return grid, mats


@pytest.mark.parametrize("concurrent", [False, True])
def test_sparse_roam_matches_xla_on_sprayed_scene(concurrent):
    """`sparse_roam` (round 4, the config-3 lever): regions holding <= 2
    loaded cells carry a cell-id SHORTLIST in the coarse word, and
    crossing lanes slab-test the listed cell boxes to roam THROUGH the
    region unless a listed cell could be hit. On a sprayed scene this
    must change only the phase schedule, never the answer."""
    grid, mats_t = sprayed_scene()
    st = grid.static
    arrays = grid.device_arrays()
    mats = trace.materials_to_device(mats_t)
    tables = trace.build_trace_tables(st, arrays)
    blocks = build_region_tables(st, arrays, tables)
    from zig_vulkan_tpu.ops.tile_tracer import grid_hit_tiles

    # inside the grid, rays spraying in all directions across regions
    ro, rd = _rays(st, (16.0, 16.0, 16.0))
    n = ro.shape[0]
    ref = trace.grid_hit(st, arrays, mats, jnp.asarray(ro), jnp.asarray(rd),
                         jnp.float32(np.inf), jnp.full(n, 3, jnp.int32),
                         jnp.ones(n, jnp.float32), jnp.ones(n, bool),
                         use_skip=True, needs_ignore=False, tables=tables)
    got = grid_hit_tiles(
        st, arrays, blocks,
        jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]), jnp.asarray(ro[:, 2]),
        jnp.asarray(rd[:, 0]), jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
        jnp.ones(n, bool), max_phases=256, interpret=True,
        concurrent=concurrent, sparse_roam=True)
    assert not np.asarray(got["unfinished"]).any()
    f_r, f_g = np.asarray(ref["found"]), np.asarray(got["found"])
    agree = (f_r == f_g).mean()
    assert agree > 0.99, (concurrent, agree)
    both = f_r & f_g
    np.testing.assert_allclose(np.asarray(got["t"])[both],
                               np.asarray(ref["t"])[both], atol=5e-2)


def test_sparse_roam_reduces_parked_phases():
    """On the sprayed scene the shortlist must actually cut the phase
    count (the whole point: fewer park-for-DMA stalls), measured via the
    kernel's stats mode."""
    grid, _ = sprayed_scene()
    st = grid.static
    arrays = grid.device_arrays()
    tables = trace.build_trace_tables(st, arrays)
    blocks = build_region_tables(st, arrays, tables)
    from zig_vulkan_tpu.ops.tile_tracer import grid_hit_tiles

    ro, rd = _rays(st, (16.0, 16.0, 16.0))
    n = ro.shape[0]

    def phases(sparse):
        out = grid_hit_tiles(
            st, arrays, blocks,
            jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]),
            jnp.asarray(ro[:, 2]),
            jnp.asarray(rd[:, 0]), jnp.asarray(rd[:, 1]),
            jnp.asarray(rd[:, 2]),
            jnp.ones(n, bool), max_phases=256, interpret=True,
            stats=True, sparse_roam=sparse)
        return int(np.asarray(out["n_phase"]).sum())

    p_off, p_on = phases(False), phases(True)
    assert p_on < p_off * 0.7, (p_on, p_off)


def test_bounce_binning_matches_unbinned():
    """Bounce-ray region binning (ZVT_BIN_BOUNCE / TraceConfig
    .bin_incoherent) re-sorts the wavefront by (origin region, direction
    octant) per bounce and unpermutes once at the end. Shading is
    order-independent (the RNG keys off hit positions), so the binned
    output must match both the unbinned Pallas path and the XLA
    wavefront."""
    grid, mats_t = dielectric_scene()
    st = grid.static
    arrays = grid.device_arrays()
    mats = trace.materials_to_device(mats_t)
    tables = trace.build_trace_tables(st, arrays)
    blocks = build_region_tables(st, arrays, tables)

    ro, rd = _rays(st, (16.0, 25.0, 70.0))
    args = (st, arrays, mats,
            jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]), jnp.asarray(ro[:, 2]),
            jnp.asarray(rd[:, 0]), jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
            3,
            jnp.asarray([0.0, 900.0, 0.0], jnp.float32), True,
            jnp.asarray([1.0, 1.1, 1.0], jnp.float32), jnp.float32(5.0))
    ref = trace._ray_color_soa(*args, 768, tables, True)
    unbinned = trace._ray_color_soa(*args, 768, tables, True,
                                    region_blocks=blocks, tile_interpret=True,
                                    bin_incoherent=False)
    binned = trace._ray_color_soa(*args, 768, tables, True,
                                  region_blocks=blocks, tile_interpret=True,
                                  bin_incoherent=True)
    # binned vs unbinned: identical per-lane math, different tile grouping
    # (phase-budget/park interleavings can flip isolated grazing lanes)
    d_bu = np.abs(np.asarray(binned) - np.asarray(unbinned)).max(axis=-1)
    assert (d_bu > 1e-3).mean() < 0.005, float((d_bu > 1e-3).mean())
    # and the binned path still matches the XLA oracle end to end
    d_bx = np.abs(np.asarray(binned) - np.asarray(ref)).max(axis=-1)
    assert (d_bx > 1e-3).mean() < 0.01, float((d_bx > 1e-3).mean())


def test_bin_perm_groups_and_sinks_dead_lanes():
    """The binning sort key groups lanes by origin region and pushes dead
    lanes to the wavefront tail (they compact into all-dead tiles that
    retire in zero phases)."""
    grid, _ = multi_region_scene()
    st = grid.static
    n = 512
    rng = np.random.default_rng(1)
    o = rng.uniform(1.0, 31.0, size=(3, n)).astype(np.float32)
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    live = rng.random(n) < 0.5
    key = np.asarray(trace._bin_perm(
        st, jnp.asarray(o[0]), jnp.asarray(o[1]), jnp.asarray(o[2]),
        jnp.asarray(d[0]), jnp.asarray(d[1]), jnp.asarray(d[2]),
        jnp.asarray(live)))
    # _bin_perm returns the sort KEY; the state is moved by a stable
    # variadic sort on it (_sort_rows), so the effective permutation is
    perm = np.argsort(key, kind="stable")
    live_sorted = live[perm]
    n_live = int(live.sum())
    assert live_sorted[:n_live].all() and not live_sorted[n_live:].any()
    # live lanes are grouped by region id (non-decreasing keys)
    from zig_vulkan_tpu.ops.tile_tracer import REGION_CELLS, region_grid
    ry, rz, rx = REGION_CELLS
    ny, nz, nx = region_grid(st)
    c = np.clip((o / st.scale).astype(np.int32), 0,
                np.array([st.dim_x - 1, st.dim_y - 1, st.dim_z - 1])[:, None])
    rid = (c[0] // rx) + nx * ((c[2] // rz) + nz * (c[1] // ry))
    rid_sorted = rid[perm][:n_live]
    assert (np.diff(rid_sorted) >= 0).all()


def test_sort_rows_moves_all_fields_exactly():
    """_sort_rows moves the whole SoA state with ONE stable variadic sort:
    every field must land exactly where a stable argsort + gather would
    put it, bit-exactly — including f32 payloads that are NaN (payload
    operands are moved, never compared) and arbitrary int32s (they ride
    as native int operands, no bitcast)."""
    n = 64
    rng = np.random.default_rng(2)
    key = jnp.asarray(rng.integers(0, 8, n, dtype=np.int32))  # duplicates
    f = rng.normal(size=n).astype(np.float32)
    f[::7] = np.nan
    i1 = rng.integers(-2**31, 2**31 - 1, n, dtype=np.int32)
    i2 = np.arange(n, dtype=np.int32)
    (f_out,), (i1_out, i2_out) = trace._sort_rows(
        key, (jnp.asarray(f),), (jnp.asarray(i1), jnp.asarray(i2)))
    perm = np.argsort(np.asarray(key), kind="stable")
    np.testing.assert_array_equal(np.asarray(f_out), f[perm])
    np.testing.assert_array_equal(np.asarray(i1_out), i1[perm])
    np.testing.assert_array_equal(np.asarray(i2_out), i2[perm])


def test_concurrent_bounce_path_matches_sequential():
    """Full path trace with the engine-side routing (bounce classes ->
    concurrent serve) vs the all-sequential round-2 behavior."""
    grid, mats_t = dielectric_scene()
    st = grid.static
    arrays = grid.device_arrays()
    mats = trace.materials_to_device(mats_t)
    tables = trace.build_trace_tables(st, arrays)
    blocks = build_region_tables(st, arrays, tables)

    ro, rd = _rays(st, (16.0, 25.0, 70.0))
    args = (st, arrays, mats,
            jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]), jnp.asarray(ro[:, 2]),
            jnp.asarray(rd[:, 0]), jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
            3,
            jnp.asarray([0.0, 900.0, 0.0], jnp.float32), True,
            jnp.asarray([1.0, 1.1, 1.0], jnp.float32), jnp.float32(5.0))
    ref = trace._ray_color_soa(*args, 768, tables, True)
    # region_blocks enabled: bounce classes route through concurrent serve
    got = trace._ray_color_soa(*args, 768, tables, True,
                               region_blocks=blocks, tile_interpret=True)
    diff = np.abs(np.asarray(got) - np.asarray(ref)).max(axis=-1)
    assert (diff > 1e-3).mean() < 0.01, float((diff > 1e-3).mean())


def test_refresh_region_tables_matches_full_rebuild():
    """Incremental patching of the region-major tables after insert AND
    remove batches must equal a from-scratch rebuild (config-3 path:
    the engine no longer drops the blocks per edit batch)."""
    from zig_vulkan_tpu.core.grid import apply_edits, remove_edits
    from zig_vulkan_tpu.ops.tile_tracer import (
        build_region_tables, refresh_region_tables)

    grid, mats_t = multi_region_scene()
    st = grid.static
    arrays = grid.device_arrays()
    tables = trace.build_trace_tables(st, arrays)
    blocks = build_region_tables(st, arrays, tables)

    rng = np.random.default_rng(7)
    n = 64
    vx, vy, vz = st.voxel_dims
    xyz = np.stack([rng.integers(0, vx, n), rng.integers(0, vy, n),
                    rng.integers(0, vz, n)], axis=-1).astype(np.int32)
    mats_e = rng.integers(1, 8, n).astype(np.uint8)
    valid = np.ones(n, dtype=bool)

    arrays2 = apply_edits(st, arrays, jnp.asarray(xyz), jnp.asarray(mats_e),
                          jnp.asarray(valid),
                          jnp.asarray(mats_t.mtype == 2),
                          jnp.asarray(mats_t.type_data))
    # cell ids with the engine's Y-flip (engine._cells_of)
    fy = (vy - 1) - xyz[:, 1]
    cells = (xyz[:, 0] // 4 + st.dim_x * ((xyz[:, 2] // 4)
                                          + st.dim_z * (fy // 4))).astype(np.int32)
    tables2, dist2 = trace.refresh_tables_after_insert(
        st, arrays2, tables, jnp.asarray(cells), jnp.asarray(valid))
    got = refresh_region_tables(st, blocks, tables2, jnp.asarray(cells),
                                jnp.asarray(valid), repack=True)
    ref = build_region_tables(st, arrays2, tables2)
    np.testing.assert_array_equal(np.asarray(got.blocks),
                                  np.asarray(ref.blocks))
    np.testing.assert_array_equal(np.asarray(got.coarse),
                                  np.asarray(ref.coarse))

    # removal path: repack=False must still match a full rebuild, and must
    # touch only O(edits) block entries (the verdict's dirty-range bar)
    rm = xyz[: n // 2]
    rm_valid = np.ones(rm.shape[0], dtype=bool)
    arrays3 = remove_edits(st, arrays2, jnp.asarray(rm), jnp.asarray(rm_valid))
    rm_cells = cells[: n // 2]
    tables3 = trace.refresh_tables_after_remove(
        st, arrays3, tables2, dist2, jnp.asarray(rm_cells),
        jnp.asarray(rm_valid))
    got3 = refresh_region_tables(st, got, tables3, jnp.asarray(rm_cells),
                                 jnp.asarray(rm_valid), repack=False)
    ref3 = build_region_tables(st, arrays3, tables3)
    np.testing.assert_array_equal(np.asarray(got3.blocks),
                                  np.asarray(ref3.blocks))
    changed = (np.asarray(got3.blocks) != np.asarray(got.blocks)).sum()
    # <= 5 patched fields per edited cell — O(edits), not O(scene)
    assert changed <= 5 * rm.shape[0], int(changed)


_SHIPPED_TILE_SCRIPT = r"""
import os
import numpy as np
import jax

# the session sitecustomize pins the axon (TPU) platform; plain
# JAX_PLATFORMS=cpu in the env is not enough (see tests/conftest.py) —
# without this the "CPU" subprocess silently ran on the TPU tunnel
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from zig_vulkan_tpu.ops import trace
from zig_vulkan_tpu.ops import tile_tracer as tl
from tests.test_tile_tracer import multi_region_scene, _rays

assert tl.TILE_SUBLANES == 24, tl.TILE_SUBLANES

grid, mats_t = multi_region_scene()
st = grid.static
arrays = grid.device_arrays()
mats = trace.materials_to_device(mats_t)
tables = trace.build_trace_tables(st, arrays)
blocks = tl.build_region_tables(st, arrays, tables)

for (w, h) in [(64, 48), (64, 20)]:
    # 48 rows: divides 24 -> the shipped pixel-BLOCK permutation engages.
    # 20 rows: does NOT divide 24 -> strip-tiling fallback (+ lane padding:
    # 1280 rays padded up to the 3072-lane tile). Width 64 keeps each
    # shape to ONE tile: the (4,16,16) region default quadrupled phases
    # per tile in interpret mode and the 128-wide variant timed out CI.
    ro, rd = _rays(st, (16.0, 25.0, 70.0), w=w, h=h)
    n = ro.shape[0]
    ref = trace.grid_hit(st, arrays, mats, jnp.asarray(ro), jnp.asarray(rd),
                         jnp.float32(np.inf), jnp.full(n, 3, jnp.int32),
                         jnp.ones(n, jnp.float32), jnp.ones(n, bool),
                         use_skip=True, needs_ignore=False, tables=tables)
    got = tl.grid_hit_tiles(
        st, arrays, blocks,
        jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]), jnp.asarray(ro[:, 2]),
        jnp.asarray(rd[:, 0]), jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
        jnp.ones(n, bool), max_phases=256, interpret=True,
        image_shape=(h, w))
    assert not np.asarray(got["unfinished"]).any(), (w, h)
    f_r, f_g = np.asarray(ref["found"]), np.asarray(got["found"])
    agree = (f_r == f_g).mean()
    assert agree > 0.99, ((w, h), agree)
    both = f_r & f_g
    np.testing.assert_allclose(np.asarray(got["t"])[both],
                               np.asarray(ref["t"])[both], atol=5e-2)
    print(f"OK {w}x{h} agree={agree:.4f}")
print("SHIPPED_TILE_OK")
"""


def test_shipped_tile_sublanes_24_and_strip_fallback():
    """The production default TILE_SUBLANES=24 (and the strip-tiling
    fallback for heights that don't divide it) had zero CI coverage — the
    conftest pins 8 for interpret-mode speed (round-2 verdict item 5).
    Runs the check in a subprocess so tile_tracer imports with the
    SHIPPED configuration."""
    import subprocess
    import sys

    env = dict(__import__("os").environ)
    env["ZVT_TILE_SUBLANES"] = "24"
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, "-c", _SHIPPED_TILE_SCRIPT],
        cwd=__import__("os").path.dirname(__import__("os").path.dirname(
            __import__("os").path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=2400)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "SHIPPED_TILE_OK" in res.stdout, res.stdout


def test_unfinished_lanes_reported_and_retraced():
    """A starved phase budget must flag lanes as unfinished (not shade them
    as background), and the render path must re-trace them on the XLA
    wavefront to the same image (round-1 advisor finding)."""
    from zig_vulkan_tpu.ops.tile_tracer import build_region_tables as brt
    from zig_vulkan_tpu.ops.tile_tracer import grid_hit_tiles

    grid, mats_t = multi_region_scene()
    st = grid.static
    arrays = grid.device_arrays()
    mats = trace.materials_to_device(mats_t)
    tables = trace.build_trace_tables(st, arrays)
    blocks = brt(st, arrays, tables)

    ro, rd = _rays(st, (16.0, 25.0, 70.0))
    n = ro.shape[0]
    out = grid_hit_tiles(
        st, arrays, blocks,
        jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]), jnp.asarray(ro[:, 2]),
        jnp.asarray(rd[:, 0]), jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
        jnp.ones(n, bool), max_phases=1, interpret=True)
    unf = np.asarray(out["unfinished"])
    assert unf.any(), "1-phase budget must leave lanes unfinished"
    assert not (unf & np.asarray(out["found"])).any()

    args = (st, arrays, mats,
            jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]), jnp.asarray(ro[:, 2]),
            jnp.asarray(rd[:, 0]), jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
            0,
            jnp.asarray([0.0, 900.0, 0.0], jnp.float32), False,
            jnp.asarray([1.0, 1.1, 1.0], jnp.float32), jnp.float32(5.0))
    ref = trace._ray_color_soa(*args, 768, tables, True)
    # starved budget: every pixel must still be correct via the fallback
    got = trace._ray_color_soa(*args, 768, tables, True,
                               region_blocks=blocks, tile_interpret=True,
                               tile_max_phases=1)
    diff = np.abs(np.asarray(got) - np.asarray(ref)).max(axis=-1)
    assert (diff > 1e-3).mean() < 0.005, float((diff > 1e-3).mean())


_STALL_GUARD_SCRIPT = r"""
import os
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from zig_vulkan_tpu.config import GridConfig
from zig_vulkan_tpu.core.grid import BrickGrid
from zig_vulkan_tpu.core.materials import terrain_materials
from zig_vulkan_tpu.ops import trace
from zig_vulkan_tpu.ops import tile_tracer as tl

assert tl._STALL_GUARD, "subprocess must import with ZVT_STALL_GUARD=1"
ry = tl.REGION_CELLS[0]

# Deterministic reproduction of the round-3 stuck-lane pathology (7 of
# 590K lanes in the default workload's bounce-shadow class): a ray whose
# origin sits EXACTLY on a y region-boundary plane with a near-zero dy.
# Under the round-3/4 kernels, each park's float re-derivation of the
# cursor (oy + dy*t underflows back to the boundary in f32) oscillated
# the lane between the two regions forever; round 5 carries the integer
# DDA cursor across phases, so the same geometry now marches straight
# through and retires like the XLA path.
grid = BrickGrid(32, 32, 32, GridConfig(min_point=(0.0, 0.0, 0.0), scale=1.0))
mats_t = terrain_materials()
grid.attach_materials(mats_t)
vx, vy, vz = grid.static.voxel_dims
xs, zs = np.meshgrid(np.arange(vx), np.arange(vz), indexing="ij")
# full xz sheets placing loaded cells in BOTH y-regions adjacent to the
# world plane y = ry*scale, so neither side roams (both park): world cell
# y = (127 - y_in)//4; sheets at y_in 127-4*(ry-2)+... pick cells ry-2 and
# ry+1 -> world voxel rows 4*(ry-2) and 4*(ry+1).
for cell_y in (ry - 2, ry + 1):
    y_in = (vy - 1) - 4 * cell_y  # undo the insert Y-flip
    grid.insert_batch(xs.ravel(), np.full(xs.size, y_in), zs.ravel(),
                      np.full(xs.size, 1, dtype=np.uint8))
st = grid.static
arrays = grid.device_arrays()
mats = trace.materials_to_device(mats_t)
tables = trace.build_trace_tables(st, arrays)
blocks = tl.build_region_tables(st, arrays, tables)

n = tl.TILE
ox = np.full(n, 8.0, np.float32)
oy = np.full(n, float(ry) * 1.0, np.float32)   # exactly on the boundary
oz = np.full(n, 8.0, np.float32)
d = np.stack([np.ones(n), np.full(n, -1e-9), np.zeros(n)],
             axis=-1).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
active = np.zeros(n, bool)
active[0] = True   # a single live lane: served every phase by the vote

out = tl.grid_hit_tiles(
    st, arrays, blocks,
    jnp.asarray(ox), jnp.asarray(oy), jnp.asarray(oz),
    jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]),
    jnp.asarray(active), max_phases=200, interpret=True)
# ROUND 5: the park-time cursor re-derivation that oscillated this lane
# forever is GONE (the DDA cursor is carried across phases) — the lane
# must now march along the boundary and retire exactly like the XLA
# path: a clean miss, fully served, no stall give-up, no retrace
assert not bool(out["unfinished"][0]), (
    "boundary-grazing lane must retire with the carried cursor")
assert not bool(out["stalled"][0]), "stall guard must not fire"
assert not bool(out["found"][0])

# and it must retire CHEAPLY (a handful of region parks along the ray),
# not by burning the 200-phase budget: stats counts phases
stats = tl.grid_hit_tiles(
    st, arrays, blocks,
    jnp.asarray(ox), jnp.asarray(oy), jnp.asarray(oz),
    jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]),
    jnp.asarray(active), max_phases=200, interpret=True, stats=True)
n_phase = int(np.asarray(stats["n_phase"])[0])
assert n_phase <= 24, f"boundary lane should retire cheaply: {n_phase} phases"

# no false positives: a normal coherent bundle must retire fully served
from tests.test_tile_tracer import multi_region_scene, _rays
grid2, mats2_t = multi_region_scene()
st2 = grid2.static
arrays2 = grid2.device_arrays()
tables2 = trace.build_trace_tables(st2, arrays2)
blocks2 = tl.build_region_tables(st2, arrays2, tables2)
ro, rd = _rays(st2, (16.0, 8.0, 40.0))
m = ro.shape[0]
got = tl.grid_hit_tiles(
    st2, arrays2, blocks2,
    jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]), jnp.asarray(ro[:, 2]),
    jnp.asarray(rd[:, 0]), jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
    jnp.ones(m, bool), max_phases=256, interpret=True)
assert not np.asarray(got["unfinished"]).any(), "false stall give-up"
mats2 = trace.materials_to_device(mats2_t)
ref = trace.grid_hit(st2, arrays2, mats2, jnp.asarray(ro), jnp.asarray(rd),
                     jnp.float32(np.inf), jnp.full(m, 3, jnp.int32),
                     jnp.ones(m, jnp.float32), jnp.ones(m, bool),
                     use_skip=True, needs_ignore=False, tables=tables2)
agree = (np.asarray(ref["found"]) == np.asarray(got["found"])).mean()
assert agree > 0.99, agree
print("STALL_GUARD_OK", n_phase)
"""


def test_stall_guard_hands_stuck_lane_to_retrace():
    """The round-3 boundary-plane stuck-lane pathology: a lane whose
    park-time float re-derivation oscillated between two regions forever.
    Round 5 carries the DDA cursor across phases, removing the pathology
    by design — the deterministic reproduction must now retire exactly
    (no stall give-up, no unfinished lanes), and the guard (kept as
    insurance) must never fire on healthy bundles. Subprocess:
    _STALL_GUARD is read at import."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["ZVT_STALL_GUARD"] = "1"
    env["ZVT_TILE_SUBLANES"] = "8"
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, "-c", _STALL_GUARD_SCRIPT],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=2400)
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-3000:])
    assert "STALL_GUARD_OK" in res.stdout, res.stdout


@pytest.mark.parametrize("concurrent", [False, True])
def test_shadow_probe_matches_separate_launch(concurrent):
    """The in-kernel sun-shadow probe (round 5): a hit lane re-launches
    as a shadow ray toward its per-lane target inside the same kernel.
    Hit results AND the occlusion verdict must match a separate XLA hit
    + XLA shadow trace, on both serve paths."""
    grid, mats_t = multi_region_scene()
    st = grid.static
    arrays = grid.device_arrays()
    mats = trace.materials_to_device(mats_t)
    tables = trace.build_trace_tables(st, arrays)
    blocks = build_region_tables(st, arrays, tables)
    from zig_vulkan_tpu.ops.tile_tracer import grid_hit_tiles

    ro, rd = _rays(st, (16.0, 25.0, 70.0))
    n = ro.shape[0]
    sun = np.array([900.0, 40.0, 900.0], np.float32)  # slanted: mixed rate
    tg = tuple(jnp.full(n, sun[i], jnp.float32) for i in range(3))

    got = grid_hit_tiles(
        st, arrays, blocks,
        jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]), jnp.asarray(ro[:, 2]),
        jnp.asarray(rd[:, 0]), jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
        jnp.ones(n, bool), max_phases=256, interpret=True,
        concurrent=concurrent, shadow_targets=tg)
    assert not np.asarray(got["unfinished"]).any()

    ref = trace.grid_hit(st, arrays, mats, jnp.asarray(ro), jnp.asarray(rd),
                         jnp.float32(np.inf), jnp.full(n, 3, jnp.int32),
                         jnp.ones(n, jnp.float32), jnp.ones(n, bool),
                         use_skip=True, needs_ignore=False, tables=tables)
    f_r, f_g = np.asarray(ref["found"]), np.asarray(got["found"])
    assert (f_r == f_g).mean() > 0.99

    p = np.asarray(ref["point"])
    sd = sun[None, :] - p
    sd /= np.maximum(np.linalg.norm(sd, axis=-1, keepdims=True), 1e-20)
    sh = trace.grid_hit(st, arrays, mats, jnp.asarray(p), jnp.asarray(sd),
                        jnp.float32(np.inf), jnp.full(n, 3, jnp.int32),
                        jnp.ones(n, jnp.float32), jnp.asarray(f_r),
                        use_skip=True, needs_ignore=False, tables=tables)
    occ_ref = np.asarray(sh["found"]) & f_r
    occ_got = np.asarray(got["occluded"]) & f_g
    both = f_r & f_g
    # a mixed occlusion rate, or the assertion proves nothing
    assert 0.0 < occ_ref[both].mean() < 1.0
    assert (occ_ref[both] == occ_got[both]).mean() > 0.99


def test_shadow_probe_full_path_and_starved_retrace():
    """End-to-end: _ray_color_soa with shadow_probe=True (the round-5
    opt-in in-kernel sun-shadow variant; measured slower than separate
    launches on hardware, so not the default) must match both the
    separate-launch Pallas path and the XLA wavefront — including when
    the phase budget is starved and the probe's compact retrace must
    redo BOTH the hit and its shadow on the XLA path."""
    grid, mats_t = dielectric_scene()
    st = grid.static
    arrays = grid.device_arrays()
    mats = trace.materials_to_device(mats_t)
    tables = trace.build_trace_tables(st, arrays)
    blocks = build_region_tables(st, arrays, tables)

    ro, rd = _rays(st, (16.0, 25.0, 70.0))
    args = (st, arrays, mats,
            jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]), jnp.asarray(ro[:, 2]),
            jnp.asarray(rd[:, 0]), jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
            3,
            jnp.asarray([300.0, 900.0, 200.0], jnp.float32), True,
            jnp.asarray([1.0, 1.1, 1.0], jnp.float32), jnp.float32(5.0))
    ref = trace._ray_color_soa(*args, 768, tables, True)
    probe = trace._ray_color_soa(*args, 768, tables, True,
                                 region_blocks=blocks, tile_interpret=True,
                                 shadow_probe=True)
    d = np.abs(np.asarray(probe) - np.asarray(ref)).max(axis=-1)
    assert (d > 1e-3).mean() < 0.01, float((d > 1e-3).mean())

    # starve the kernel: every lane goes through the probe-aware retrace
    starved = trace._ray_color_soa(*args, 768, tables, True,
                                   region_blocks=blocks, tile_interpret=True,
                                   shadow_probe=True, tile_max_phases=1)
    d2 = np.abs(np.asarray(starved) - np.asarray(ref)).max(axis=-1)
    assert (d2 > 1e-3).mean() < 0.005, float((d2 > 1e-3).mean())


def test_concurrent_serve_corner_region_no_livelock():
    """Regression (round-3 review): an EMPTY vote slot's rid is clipped
    to nr-1, and an unguarded slot_of match overwrote the corner
    region's REAL slot mapping with -1 — lanes pending region nr-1
    repeated an identical no-op vote until the phase budget burned out
    whenever a concurrent tile had fewer distinct pending regions than
    n_serve. Geometry and rays confined to the corner region with
    n_serve=4 reproduces it deterministically."""
    from zig_vulkan_tpu.ops.tile_tracer import (TILE, grid_hit_tiles,
                                                region_grid)

    grid = BrickGrid(32, 32, 32, GridConfig(min_point=(0.0, 0.0, 0.0),
                                            scale=1.0))
    mats_t = terrain_materials()
    grid.attach_materials(mats_t)
    # a slab only in the corner (max y,z,x) region
    xs, zs = np.meshgrid(np.arange(100, 124), np.arange(100, 124),
                         indexing="ij")
    # insert Y-flips (Grid.zig:135): inserted y=4 sits at WORLD y=123 —
    # cell y=30, i.e. the LAST y-region — so with high x/z the slab
    # occupies region id nr-1 exactly (the clipped-rid collision the
    # regression needs)
    grid.insert_batch(xs.ravel(), np.full(xs.size, 4), zs.ravel(),
                      np.full(xs.size, 1, dtype=np.uint8))
    st = grid.static
    arrays = grid.device_arrays()
    tables = trace.build_trace_tables(st, arrays)
    blocks = build_region_tables(st, arrays, tables)

    n = TILE
    rng = np.random.default_rng(7)
    # world units: scale=1.0 is the CELL size -> voxel 0.25, extent 32.
    # The slab (voxels 100-123 in x/z, world 25-31; inserted y=4 → world
    # y≈30.9 after the flip) sits in the max-(y,z,x) region = id nr-1.
    ox = rng.uniform(25.3, 30.7, n).astype(np.float32)
    oz = rng.uniform(25.3, 30.7, n).astype(np.float32)
    oy = np.full(n, 31.6, np.float32)
    d = np.stack([np.full(n, 0.01, np.float32),
                  np.full(n, -1.0, np.float32),
                  np.full(n, 0.02, np.float32)], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    got = grid_hit_tiles(
        st, arrays, blocks,
        jnp.asarray(ox), jnp.asarray(oy), jnp.asarray(oz),
        jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]),
        jnp.ones(n, bool), max_phases=64, interpret=True,
        concurrent=True, n_serve=4)
    assert not np.asarray(got["unfinished"]).any(), (
        "corner-region lanes livelocked in the concurrent serve")
    # every ray points at the slab from directly above: all must hit
    assert np.asarray(got["found"]).all()


def test_padded_block_tiling_matches_strips():
    """Image dims that don't divide the block shape are PADDED up to the
    next (TILE_SUBLANES, TILE_LANES) multiple with dead lanes (round 5;
    replaces the strip-tiling demotion when the overhead is <= 50%). The
    padded-block trace must agree lane-for-lane with the unblocked
    (strip) trace of the same wavefront."""
    from zig_vulkan_tpu.ops.tile_tracer import grid_hit_tiles

    grid, mats_t = multi_region_scene()
    st = grid.static
    arrays = grid.device_arrays()
    tables = trace.build_trace_tables(st, arrays)
    blocks = build_region_tables(st, arrays, tables)

    # 12 rows x 128 wide: rows % TILE_SUBLANES(8) != 0 -> pads to 16 rows
    # (+33% dead lanes, under the 50% strip-fallback threshold)
    ro, rd = _rays(st, (16.0, 25.0, 70.0), w=128, h=12)
    n = ro.shape[0]
    args = (st, arrays, blocks,
            jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]),
            jnp.asarray(ro[:, 2]), jnp.asarray(rd[:, 0]),
            jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
            jnp.ones(n, bool))
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # padding must NOT warn at +33%
        padded = grid_hit_tiles(*args, max_phases=96, interpret=True,
                                image_shape=(12, 128))
    strips = grid_hit_tiles(*args, max_phases=96, interpret=True)
    for k in ("found", "t", "index", "unfinished"):
        np.testing.assert_array_equal(np.asarray(padded[k]),
                                      np.asarray(strips[k]), err_msg=k)
