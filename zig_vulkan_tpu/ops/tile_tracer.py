"""Coherent-tile region-marching tracer (the production TPU kernel).

The XLA wavefront tracer (ops.trace) pays one XLA gather row per DDA step
over ALL lanes (~0.1 G lookups/s, scalar-unit bound — see
docs/DESIGN_NOTES.md). This kernel removes XLA gathers from the hot loop
entirely by exploiting primary-ray coherence:

- rays are tiled 8x128; a tile marches REGION by region (a region is an
  RCY x RCZ x RCX block of grid cells, default 16^3 = 4096 cells);
- each phase, the tile picks the pending region of its least-advanced live
  lane (march-order vote), DMAs that region's record block from HBM into
  VMEM scratch (`pltpu.make_async_copy` with a dynamic region index), and
  runs the two-level DDA for every lane currently in that region — all
  lookups are per-sublane 128-lane shuffles over the VMEM-resident block
  (hardware-validated at ~1.2 G lookups/s);
- lanes that exit the region record their next region id and stall until
  the tile loads it; hits/misses retire lanes.

Round-2 redesign (the performance story — see docs/DESIGN_NOTES.md):

1. **Packed march field.** Material-window starts are 64-aligned
   (brick/MaterialAllocator.zig:34-43 hands out 64-entry windows), so the
   window id and the Chebyshev skip distance pack into ONE int32:
   `((window + 1) << 6) | dist`, empty cell = high bits zero. A grid march
   step now costs ONE shuffle tree instead of the round-1 four (start,
   occ_lo, occ_hi, dist).
2. **Tile-predicated brick lookups.** Occupancy (and dielectric) words are
   only needed on brick ENTRY, which is tile-coherent and rare relative to
   march steps: they run under `lax.cond(jnp.any(enter), ...)` so pure
   march phases skip them entirely.
3. **All ray classes.** A `needs_ignore` build variant carries the
   brick-local dielectric registers (mask words + brick ir) and the
   per-ray refraction key, evaluating the same-dielectric skip rule
   (brick_raytracer.comp:427) in-kernel — refracted bounce rays no longer
   fall back to the gather-bound XLA path.
4. **Arbitrary grids.** The region volume is padded up to REGION_CELLS
   multiples with empty records; padded cells are out of grid bounds and
   never visited, so any grid shape is served.
5. **Exhaustion honesty.** Lanes still pending when the phase budget runs
   out are returned with `unfinished=True` so the caller re-traces them on
   the XLA wavefront instead of silently shading background (round-1
   advisor finding).

Traversal semantics match ops.trace's skip path (cursor re-derivation from
t at region entry, Chebyshev skip, brick registers, deferred materials,
brick-local dielectric rule). Exactness mode is not offered here.

Hardware-compiler constraints baked in (bisected in round 1, see
docs/DESIGN_NOTES.md): loop carries must be int32 0/1 masks, never bool —
bool carries alongside shuffle lookups crash the remote Mosaic compiler.

Reference parity: implements GridHit + BrickHit traversal
(assets/shaders/brick_raytracer.comp:271-471) for a wavefront of rays.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BRICK_DIMENSION
from ..core.grid import GridArrays, GridStatic
from .trace import build_trace_tables

F = jnp.float32
_BD = BRICK_DIMENSION

TILE_LANES = 128
# sublanes per ray tile: wider tiles amortize per-phase overhead (DMA,
# vote, cursor re-init) over more rays at the cost of more divergence in
# the region vote. 24 won the hardware sweep once dual-region phases and
# roaming cut the divergence penalty (57.9 vs 65 ms/frame at 8); tests
# pin 8 via ZVT_TILE_SUBLANES (conftest) to keep interpret mode cheap.
# Image heights must divide TILE_SUBLANES for the pixel-block permutation
# (1080, 576, 720, 480 all divide 24); other heights fall back to strips.
TILE_SUBLANES = int(__import__("os").environ.get("ZVT_TILE_SUBLANES", "24"))
TILE = TILE_SUBLANES * TILE_LANES

# region edge lengths in grid cells (y, z, x); the record block for one
# region must fit VMEM comfortably (8 fields x _SUBROWS x 128 int32).
# Larger regions = fewer phases (DMA/vote/re-init overhead) but taller
# shuffle trees per lookup. The round-3 hardware sweep moved the default
# from 16^3 (4096 cells = 32 subrows) to (4,16,16) (1024 cells = 8
# subrows): flat regions match the terrain's height-field geometry and
# the 4x-shallower shuffle tree beats the extra phases — 120 -> 148
# Mray/s primary, 95 -> 69 ms bounce class at 1024x576 (volumes below
# 1024 cells regress both: more phases, no tree left to shrink).
# ZVT_REGION_CELLS=y,z,x overrides for tuning runs.
import os as _os

_rc_env = _os.environ.get("ZVT_REGION_CELLS")
REGION_CELLS = (tuple(int(v) for v in _rc_env.split(","))
                if _rc_env else (4, 16, 16))
_RC = REGION_CELLS[0] * REGION_CELLS[1] * REGION_CELLS[2]
_SUBROWS = max(1, _RC // 128)

# the env knobs change BOTH the table layout and the compiled kernel;
# validate once here so a bad value fails loudly at import, and
# trace_tiles_regions additionally asserts that the RegionTables it is
# handed were built under the layout this module was imported with (tables
# pickled/shared across processes with different env settings would
# otherwise be silently misinterpreted).
if TILE_SUBLANES < 1:
    raise ValueError(f"ZVT_TILE_SUBLANES must be >= 1, got {TILE_SUBLANES}")
if len(REGION_CELLS) != 3 or any(v < 1 for v in REGION_CELLS):
    raise ValueError(f"ZVT_REGION_CELLS must be 3 positive ints (y,z,x), "
                     f"got {REGION_CELLS}")
if _RC % 128 != 0:
    raise ValueError(f"ZVT_REGION_CELLS volume must be a multiple of 128 "
                     f"(the shuffle-lookup lane width), got {REGION_CELLS} "
                     f"= {_RC} cells")

# region-block field indices
_F_PACKED = 0   # ((material window + 1) << 6) | chebyshev skip dist
_F_OCC_LO = 1
_F_OCC_HI = 2
_F_DML = 3      # dielectric mask word 0
_F_DMH = 4      # dielectric mask word 1
_F_IR = 5       # bitcast f32 brick ir (NaN = none/conflict)
_N_FIELDS = 8   # padded to 8 for DMA-friendly power-of-two blocks

# regions served per phase in the split kernel (voted in march order, all
# DMA'd up front, served sequentially). ZVT_N_SERVE overrides for tuning.
_N_SERVE = int(__import__("os").environ.get("ZVT_N_SERVE", "2"))

# Phase-level stall guard (see phase_wrap): hands permanently-stuck
# boundary-plane lanes to the compact XLA retrace after 8 no-progress
# serves instead of burning the tile's whole phase budget. DEFAULT ON
# since round 4: hardware-validated on the driver bench (Mosaic compiles
# it cleanly; 160.7 Mray/s with identical checksum and 1.0000 oracle
# parity vs the guard-off run) — ZVT_STALL_GUARD=0 opts out.
_STALL_GUARD = __import__("os").environ.get("ZVT_STALL_GUARD", "1") == "1"
if _N_SERVE < 1:
    raise ValueError(f"ZVT_N_SERVE must be >= 1, got {_N_SERVE}")


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def region_grid(static: GridStatic):
    """Number of regions per axis (y, z, x); dims are padded up."""
    ry, rz, rx = REGION_CELLS
    return _cdiv(static.dim_y, ry), _cdiv(static.dim_z, rz), _cdiv(static.dim_x, rx)


class RegionTables(NamedTuple):
    """The Pallas tracer's scene data: per-region record blocks (DMA'd on
    demand) + the coarse per-region table (VMEM-resident for roaming)."""

    blocks: Any    # int32[NR, 8, _SUBROWS, 128]
    coarse: Any    # int32[coarse_rows, 128]: 64|dist packed per region


def coarse_rows(static: GridStatic) -> int:
    ny, nz, nx = region_grid(static)
    return _cdiv(ny * nz * nx, 128)


def _build_coarse(static: GridStatic, loaded_cells):
    """Per-region packed coarse word: the in-VMEM table that lets lanes
    ROAM across empty regions without parking for a region-block DMA (the
    coarse level of the two-level acceleration; the reference's TODO
    'higher level grid optimization', brick_raytracer.comp:145).

    Layout (int32):
      bits 0-5  empty regions: Chebyshev distance to the nearest non-empty
                region (cap 63); non-empty regions: bit 6 set (value >= 64)
      bits 7-8  SHORTLIST size s in {0, 1, 2} (non-empty only): when the
                region holds <= 2 loaded cells, they are listed below and a
                `sparse_roam` kernel slab-tests the ray against their cell
                boxes to roam THROUGH near-empty regions without parking —
                the edit-degraded regime (BASELINE config 3), where random
                single-voxel sprays mark most regions non-empty and
                every crossing otherwise costs a park + block DMA. s = 0
                means "no shortlist" (> 2 cells, or region volume > 1024):
                always park, the pre-round-4 behavior.
      bits 9-18 / 19-28  local cell ids of the listed cells (10 bits each;
                shortlists require region volume <= 1024 cells; s == 1
                duplicates the cell into both slots).
    """
    ny, nz, nx = region_grid(static)
    ry, rz, rx = REGION_CELLS
    vol = loaded_cells.reshape(static.dim_y, static.dim_z, static.dim_x)
    py, pz, px = (ny * ry - static.dim_y, nz * rz - static.dim_z,
                  nx * rx - static.dim_x)
    if py or pz or px:
        vol = jnp.pad(vol, ((0, py), (0, pz), (0, px)))
    by_region = (vol.reshape(ny, ry, nz, rz, nx, rx)
                 .transpose(0, 2, 4, 1, 3, 5)
                 .reshape(ny * nz * nx, _RC))  # local id = lx+rx*(lz+rz*ly)
    nonempty = by_region.any(axis=1).reshape(ny, nz, nx)
    # exact separable L-inf distance over the (tiny) region grid, cap 63
    cap = 63
    dist = jnp.where(nonempty, jnp.int32(0), jnp.int32(cap))

    def axis_pass(d, axis):
        out = d
        n = d.shape[axis]
        pad_w = [(0, 0)] * 3
        pad_w[axis] = (n, n)
        pd = jnp.pad(d, pad_w, constant_values=cap)
        for k in range(1, min(n, cap)):
            sl = [slice(None)] * 3
            sl[axis] = slice(n - k, 2 * n - k)
            left = pd[tuple(sl)]
            sl[axis] = slice(n + k, 2 * n + k)
            right = pd[tuple(sl)]
            out = jnp.minimum(out, jnp.maximum(
                jnp.minimum(left, right), k))
        return out

    for axis in (2, 1, 0):
        dist = axis_pass(dist, axis)
    base = jnp.where(nonempty, jnp.int32(64),
                     jnp.minimum(dist, cap)).reshape(-1)
    if _RC <= 1024:
        count = by_region.sum(axis=1)
        id1 = jnp.argmax(by_region, axis=1).astype(jnp.int32)
        masked = by_region.at[jnp.arange(by_region.shape[0]), id1].set(False)
        id2 = jnp.argmax(masked, axis=1).astype(jnp.int32)
        s = jnp.where(count > 2, jnp.int32(0), count.astype(jnp.int32))
        id2 = jnp.where(count == 1, id1, id2)  # s==1 duplicates the cell
        shortlist = jnp.where(
            s > 0, (s << 7) | (id1 << 9) | (id2 << 19), jnp.int32(0))
        packed = base | jnp.where(base >= 64, shortlist, jnp.int32(0))
    else:
        packed = base
    rows = coarse_rows(static)
    packed = jnp.pad(packed, (0, rows * 128 - packed.shape[0]),
                     constant_values=64)
    return packed.reshape(rows, 128)


def build_region_tables(static: GridStatic, arrays: GridArrays, tables=None):
    """Reorder the per-cell records (cells, 8) into region-major blocks
    int32[NR, 8, _SUBROWS, 128]: one DMA-able block per region, each field
    laid out for 128-lane shuffle lookups, plus the coarse roaming table —
    returned together as RegionTables. Field 0 packs the material window
    id with the skip distance (see module docstring); grids whose dims
    don't divide REGION_CELLS are padded with empty max-skip records
    (padded cells are outside the DDA's bounds check and never consulted).
    """
    if tables is None:
        tables = build_trace_tables(static, arrays)
    ny, nz, nx = region_grid(static)
    ry, rz, rx = REGION_CELLS

    start_raw = tables[:, 0]
    dist = jnp.minimum(tables[:, 3], 63)
    window_p1 = jnp.where(start_raw == -1, jnp.int32(0),
                          ((start_raw & jnp.int32(0x7FFFFFFF)) >> 6) + 1)
    packed = (window_p1 << 6) | dist
    fields = jnp.stack(
        [packed, tables[:, 1], tables[:, 2],
         tables[:, 4], tables[:, 5], tables[:, 6],
         jnp.zeros_like(packed), jnp.zeros_like(packed)], axis=-1)

    # cell index = x + dim_x*(z + dim_z*y)  -> volume (y, z, x, 8)
    vol = fields.reshape(static.dim_y, static.dim_z, static.dim_x, _N_FIELDS)
    py, pz, px = (ny * ry - static.dim_y, nz * rz - static.dim_z,
                  nx * rx - static.dim_x)
    if py or pz or px:
        vol = jnp.pad(vol, ((0, py), (0, pz), (0, px), (0, 0)),
                      constant_values=63)  # empty + max skip; never read
    vol = vol.reshape(ny, ry, nz, rz, nx, rx, _N_FIELDS)
    # -> (regions..., local y, z, x, fields)
    vol = vol.transpose(0, 2, 4, 1, 3, 5, 6)
    # local cell id = lx + rx*(lz + rz*ly); fields major for shuffle lookups
    blocks = vol.reshape(ny * nz * nx, _RC, _N_FIELDS).transpose(0, 2, 1)
    blocks = blocks.reshape(ny * nz * nx, _N_FIELDS, _SUBROWS, 128)
    return RegionTables(blocks=blocks,
                        coarse=_build_coarse(static, start_raw != -1))


def _cells_to_region_local(static: GridStatic, cells):
    """Map flat cell ids (x + dim_x*(z + dim_z*y), core.grid layout) to
    (region id, local cell id) in the region-major block layout."""
    ny, nz, nx = region_grid(static)
    ry, rz, rx = REGION_CELLS
    x = cells % static.dim_x
    zc = (cells // static.dim_x) % static.dim_z
    y = cells // (static.dim_x * static.dim_z)
    nr = x // rx + nx * ((zc // rz) + nz * (y // ry))
    lc = (x % rx) + rx * ((zc % rz) + rz * (y % ry))
    return nr, lc


def _packed_region_major(static: GridStatic, packed_flat):
    """Reorder a per-cell int32 field into the region-major layout
    int32[NR, _SUBROWS, 128] (the layout of one block field)."""
    ny, nz, nx = region_grid(static)
    ry, rz, rx = REGION_CELLS
    vol = packed_flat.reshape(static.dim_y, static.dim_z, static.dim_x)
    py, pz, px = (ny * ry - static.dim_y, nz * rz - static.dim_z,
                  nx * rx - static.dim_x)
    if py or pz or px:
        vol = jnp.pad(vol, ((0, py), (0, pz), (0, px)),
                      constant_values=63)  # empty + max skip; never read
    vol = vol.reshape(ny, ry, nz, rz, nx, rx).transpose(0, 2, 4, 1, 3, 5)
    return vol.reshape(ny * nz * nx, _SUBROWS, 128)


def refresh_region_tables(static: GridStatic, region_tables: "RegionTables",
                          tables, cells, valid,
                          repack: bool = True) -> "RegionTables":
    """Incrementally patch RegionTables after an edit batch (the region-
    major analog of trace.refresh_tables_after_insert — round-2 verdict:
    the engine used to drop and fully rebuild the blocks on every edit).

    `tables` must already be refreshed (its dist lane + edited rows are the
    source of truth). Costs, insert path (repack=True): one elementwise
    repack + layout reorder of the 4-byte packed field (the skip distances
    an insert changes move scene-wide within DIST_CAP, so field 0 cannot
    be patched per-cell), one K-row scatter for the brick-local fields
    (occupancy/dielectric/ir change ONLY at the K edited cells), and the
    tiny coarse-table rebuild — vs the full rebuild's 8-field 32 MB
    reorder. Removal path (repack=False): statuses, material windows and
    the skip field are all invariant (bricks are never freed,
    trace.refresh_tables_after_remove), so ONLY the K-row scatter runs.
    """
    blocks, coarse = region_tables.blocks, region_tables.coarse
    if repack:
        # field 0: window|dist repack from the refreshed tables (global)
        start_raw = tables[:, 0]
        dist = jnp.minimum(tables[:, 3], 63)
        window_p1 = jnp.where(start_raw == -1, jnp.int32(0),
                              ((start_raw & jnp.int32(0x7FFFFFFF)) >> 6) + 1)
        packed = _packed_region_major(static, (window_p1 << 6) | dist)
        blocks = blocks.at[:, _F_PACKED].set(packed)
        coarse = _build_coarse(static, start_raw != -1)

    # fields 1..5: scatter the K edited cells' rows
    safe = jnp.clip(cells, 0, static.cells - 1)
    nr, lc = _cells_to_region_local(static, safe)
    ny, nz, nx = region_grid(static)
    nr = jnp.where(valid, nr, ny * nz * nx)  # out of range -> dropped
    sub, lane = lc // 128, lc % 128
    rows = tables[safe]
    for f_blk, f_tab in ((_F_OCC_LO, 1), (_F_OCC_HI, 2), (_F_DML, 4),
                         (_F_DMH, 5), (_F_IR, 6)):
        blocks = blocks.at[nr, f_blk, sub, lane].set(rows[:, f_tab],
                                                     mode="drop")
    return RegionTables(blocks=blocks, coarse=coarse)


def _lookup(block_field, local_idx):
    """Shuffle-tree lookup: block_field int32[_SUBROWS,128], local_idx
    (8,128) in [0, _RC). ~_SUBROWS shuffles + selects (hardware ~1.2 G
    lookups/s at 32 subrows)."""
    r = local_idx // 128
    c = local_idx % 128
    val = jnp.zeros(local_idx.shape, jnp.int32)
    for row in range(_SUBROWS):
        cand = jnp.take_along_axis(
            jnp.broadcast_to(block_field[row], local_idx.shape), c, axis=1)
        val = jnp.where(r == row, cand, val)
    return val


def _tile_kernel(static: GridStatic, max_phases: int, steps_per_phase: int,
                 needs_ignore: bool,
                 stats: bool = False, step_unroll: int = 1,
                 concurrent: bool = False,
                 n_serve: int = _N_SERVE, sparse_roam: bool = False,
                 shadow: bool = False):
    # step_unroll: run the DDA step body K times per while iteration — the
    # loop condition's any() is a vector->scalar reduction with real
    # latency; checking it every K cheap steps trades <=K-1 wasted
    # (masked-off) body executions per phase for K fewer sync points.
    # stats=True builds a diagnostic variant that counts phases (sublane 0)
    # and live DDA steps (sublane 1) per lane into the pending output's
    # value space — used by tuning runs to locate where frame time goes.
    #
    # shadow=True builds the SUN-SHADOW-PROBE variant (round 5): each lane
    # carries a per-lane jittered sun TARGET point; when a stage-0 lane
    # retires with a hit, it records the hit and IMMEDIATELY becomes a
    # shadow ray (origin = hit point + normal epsilon, direction = toward
    # its target) marching on inside the same phase loop — the region
    # holding the hit is already VMEM-resident, so the shadow traversal
    # starts without a park/DMA. This is the reference's structure (the
    # sun ray is traced inside the same kernel invocation,
    # brick_raytracer.comp:240-249) and removes one whole region-marching
    # launch per bounce level. An extra `occluded` output reports the
    # shadow verdict. Only the split serve paths support it.
    dim_x, dim_y, dim_z = static.dims
    ny, nz, nx = region_grid(static)
    ry, rz, rx = REGION_CELLS
    gx0, gy0, gz0 = (np.float32(v) for v in static.min_point)
    gx1, gy1, gz1 = (np.float32(v) for v in static.max_point)
    scale = np.float32(static.scale)
    voxel_scale = np.float32(static.scale / _BD)
    n_regions = ny * nz * nx
    c_rows = _cdiv(n_regions, 128)

    def kernel(*refs):
        if shadow:
            (blocks_hbm, coarse_ref, ox_ref, oy_ref, oz_ref, dx_ref,
             dy_ref, dz_ref, tb_ref, act_ref, key_ref, tgx_ref, tgy_ref,
             tgz_ref, found_ref, t_ref, ncode_ref, addr_ref, pend_ref,
             occl_ref, scratch, sem) = refs
            tgx, tgy, tgz = tgx_ref[:], tgy_ref[:], tgz_ref[:]
        else:
            (blocks_hbm, coarse_ref, ox_ref, oy_ref, oz_ref, dx_ref,
             dy_ref, dz_ref, tb_ref, act_ref, key_ref, found_ref, t_ref,
             ncode_ref, addr_ref, pend_ref, scratch, sem) = refs
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        act = act_ref[:] != 0
        t0_in = tb_ref[:]
        ray_key = key_ref[:]

        ix = jnp.where(dx == 0.0, F(1e12), F(1.0) / dx)
        iy = jnp.where(dy == 0.0, F(1e12), F(1.0) / dy)
        iz = jnp.where(dz == 0.0, F(1e12), F(1.0) / dz)
        adx, ady, adz = jnp.abs(ix), jnp.abs(iy), jnp.abs(iz)
        stx = jnp.sign(dx).astype(jnp.int32)
        sty = jnp.sign(dy).astype(jnp.int32)
        stz = jnp.sign(dz).astype(jnp.int32)
        stxf, styf, stzf = stx.astype(F), sty.astype(F), stz.astype(F)
        inv_max_abs = F(1.0) / jnp.maximum(
            jnp.abs(dx), jnp.maximum(jnp.abs(dy), jnp.abs(dz)))
        code_x = jnp.where(stx < 0, 0, 4)
        code_y = jnp.where(sty < 0, 1, 5)
        code_z = jnp.where(stz < 0, 2, 6)

        # slab entry code + grid_t_max (as in ops.trace)
        tux = (gx1 - ox) * ix
        tuy = (gy1 - oy) * iy
        tuz = (gz1 - oz) * iz
        tlx = (gx0 - ox) * ix
        tly = (gy0 - oy) * iy
        tlz = (gz0 - oz) * iz
        tminx = jnp.minimum(tlx, tux)
        tminy = jnp.minimum(tly, tuy)
        tminz = jnp.minimum(tlz, tuz)
        tmax_all = jnp.minimum(jnp.maximum(tlx, tux),
                               jnp.minimum(jnp.maximum(tly, tuy),
                                           jnp.maximum(tlz, tuz)))
        is_y = (tminy > tminx) & (tminy > tminz)
        is_z = (tminz > tminx) & (tminz > tminy)
        is_x = ~(is_y | is_z)
        slab_code = jnp.where(
            is_x, jnp.where(ix >= 0, 0, 4),
            jnp.where(is_y, jnp.where(iy >= 0, 1, 5),
                      jnp.where(iz >= 0, 2, 6))).astype(jnp.int32)

        def ginit_p(tb, pox, poy, poz, pdx, pdy, pdz, padx, pady, padz,
                    psxf, psyf, pszf):
            """grid_init for arbitrary (per-lane mutable) ray state — the
            shadow probe swaps a lane's ray mid-march."""
            t0 = tb + F(1e-4) * scale
            fx = (pox + pdx * t0 - gx0) / scale
            fy = (poy + pdy * t0 - gy0) / scale
            fz = (poz + pdz * t0 - gz0) / scale
            sx = (psxf * (jnp.floor(fx) - fx) + (psxf * F(0.5) + F(0.5))) * padx
            sy = (psyf * (jnp.floor(fy) - fy) + (psyf * F(0.5) + F(0.5))) * pady
            sz = (pszf * (jnp.floor(fz) - fz) + (pszf * F(0.5) + F(0.5))) * padz
            return (sx, sy, sz, jnp.floor(fx).astype(jnp.int32),
                    jnp.floor(fy).astype(jnp.int32),
                    jnp.floor(fz).astype(jnp.int32))

        def grid_init(tb):
            return ginit_p(tb, ox, oy, oz, dx, dy, dz, adx, ady, adz,
                           stxf, styf, stzf)

        # kernel-scope aliases of the INITIAL ray state + derived
        # constants: the shadow probe carries per-lane mutable versions
        # through the march loops; the non-shadow build keeps reading
        # these (identical values, identical compiled code)
        oxC, oyC, ozC, dxC, dyC, dzC = ox, oy, oz, dx, dy, dz
        ixC, iyC, izC = ix, iy, iz
        adxC, adyC, adzC = adx, ady, adz
        stxC, styC, stzC = stx, sty, stz
        stxfC, styfC, stzfC = stxf, styf, stzf
        code_xC, code_yC, code_zC = code_x, code_y, code_z
        inv_max_absC, tmax_allC = inv_max_abs, tmax_all

        def _shadow_transition(trans, ncode, out_t, tgx, tgy, tgz, args):
            """Ray swap at the scatter->shadow transition (shadow probe):
            for lanes that just recorded a stage-0 hit, replace the ray
            with the sun-shadow ray — origin = hit point + normal epsilon
            (identical formula to the wrapper's px/py/pz decode),
            direction = toward the lane's jittered sun target — re-derive
            all direction constants + slab bounds + DDA cursor, and retire
            lanes whose shadow ray exits the grid immediately (lit).
            Predicated on any(trans): transitions are brick-entry-rate
            events, not march-rate."""

            def do_trans(a):
                (ox, oy, oz, dx, dy, dz, ix, iy, iz,
                 stxf, styf, stzf, inv_max_abs, tmax_all,
                 t_base, tv, sx, sy, sz, lx, ly, lz,
                 stage, run_i2, pending) = a
                sign = jnp.where(ncode < 4, F(1.0), F(-1.0))
                axis = ncode & 3
                t_off = voxel_scale * F(0.05)
                nx_ = jnp.where(axis == 0, sign, F(0.0))
                ny_ = jnp.where(axis == 1, sign, F(0.0))
                nz_ = jnp.where(axis == 2, sign, F(0.0))
                px = ox + dx * out_t + nx_ * t_off
                py = oy + dy * out_t + ny_ * t_off
                pz = oz + dz * out_t + nz_ * t_off
                ndx = tgx - px
                ndy = tgy - py
                ndz = tgz - pz
                ninv = jax.lax.rsqrt(ndx * ndx + ndy * ndy + ndz * ndz)
                ndx, ndy, ndz = ndx * ninv, ndy * ninv, ndz * ninv
                nix = jnp.where(ndx == 0.0, F(1e12), F(1.0) / ndx)
                niy = jnp.where(ndy == 0.0, F(1e12), F(1.0) / ndy)
                niz = jnp.where(ndz == 0.0, F(1e12), F(1.0) / ndz)
                nsxf = jnp.sign(ndx)
                nsyf = jnp.sign(ndy)
                nszf = jnp.sign(ndz)
                nimax = F(1.0) / jnp.maximum(
                    jnp.abs(ndx), jnp.maximum(jnp.abs(ndy), jnp.abs(ndz)))
                # slab entry/exit of the shadow ray — the same math the
                # grid_hit_tiles wrapper does before a separate launch
                t0x, t1x = (gx0 - px) * nix, (gx1 - px) * nix
                t0y, t1y = (gy0 - py) * niy, (gy1 - py) * niy
                t0z, t1z = (gz0 - pz) * niz, (gz1 - pz) * niz
                ntmin = jnp.maximum(
                    jnp.minimum(t0x, t1x),
                    jnp.maximum(jnp.minimum(t0y, t1y),
                                jnp.minimum(t0z, t1z)))
                ntmax = jnp.minimum(
                    jnp.maximum(t0x, t1x),
                    jnp.minimum(jnp.maximum(t0y, t1y),
                                jnp.maximum(t0z, t1z)))
                ntb = jnp.maximum(F(1e-5), ntmin)
                dead = ntb > ntmax  # exits the grid without re-entry: lit
                nsx, nsy, nsz, nlx, nly, nlz = ginit_p(
                    ntb, px, py, pz, ndx, ndy, ndz,
                    jnp.abs(nix), jnp.abs(niy), jnp.abs(niz),
                    nsxf, nsyf, nszf)

                def sel(new, old):
                    return jnp.where(trans, new, old)

                ox, oy, oz = sel(px, ox), sel(py, oy), sel(pz, oz)
                dx, dy, dz = sel(ndx, dx), sel(ndy, dy), sel(ndz, dz)
                ix, iy, iz = sel(nix, ix), sel(niy, iy), sel(niz, iz)
                stxf, styf, stzf = (sel(nsxf, stxf), sel(nsyf, styf),
                                    sel(nszf, stzf))
                inv_max_abs = sel(nimax, inv_max_abs)
                tmax_all = sel(ntmax, tmax_all)
                t_base = sel(ntb, t_base)
                tv = jnp.where(trans, F(0.0), tv)
                sx, sy, sz = sel(nsx, sx), sel(nsy, sy), sel(nsz, sz)
                lx, ly, lz = sel(nlx, lx), sel(nly, ly), sel(nlz, lz)
                stage = jnp.where(trans, jnp.int32(1), stage)
                tdead = trans & dead
                run_i2 = jnp.where(tdead, jnp.int32(0), run_i2)
                pending = jnp.where(tdead, jnp.int32(-1), pending)
                return (ox, oy, oz, dx, dy, dz, ix, iy, iz,
                        stxf, styf, stzf, inv_max_abs, tmax_all,
                        t_base, tv, sx, sy, sz, lx, ly, lz,
                        stage, run_i2, pending)

            (ox, oy, oz, dx, dy, dz, ix, iy, iz,
             stxf, styf, stzf, inv_max_abs, tmax_all,
             t_base, tv, sx, sy, sz, lx, ly, lz,
             stage, running, pending) = args
            out = jax.lax.cond(
                jnp.any(trans), do_trans, lambda a: a,
                (ox, oy, oz, dx, dy, dz, ix, iy, iz,
                 stxf, styf, stzf, inv_max_abs, tmax_all,
                 t_base, tv, sx, sy, sz, lx, ly, lz,
                 stage, running.astype(jnp.int32), pending))
            return out[:23] + (out[23] != 0, out[24])

        def region_of(lx, ly, lz):
            return (lx // rx) + nx * ((lz // rz) + nz * (ly // ry))

        def coarse_lookup(rid_lane):
            """Per-lane lookup into the VMEM coarse region table."""
            r = rid_lane // 128
            c = rid_lane % 128
            val = jnp.zeros(rid_lane.shape, jnp.int32)
            for row in range(c_rows):
                cand = jnp.take_along_axis(
                    jnp.broadcast_to(coarse_ref[row], rid_lane.shape), c,
                    axis=1)
                val = jnp.where(r == row, cand, val)
            return val

        min_edge = np.int32(min(ry, rz, rx))

        def roam_decision(rid_lane, cval, exit_t):
            """Which off-region lanes keep marching instead of parking.

            Empty regions (cval < 64) always roam. With `sparse_roam`
            (the edit-degraded mode, BASELINE config 3), regions carrying
            a <=2-cell SHORTLIST in the coarse word roam too unless the
            ray's line can pass a listed cell's world box (conservative
            slab test; one-cell t margin) — random single-voxel sprays
            mark most regions non-empty, and without this every crossing
            parks for a block DMA. Returns (roam_mask, roam_empty);
            roam_empty gates the Chebyshev multi-region jump (shortlist
            roams cross exactly one region)."""
            roam_empty = cval < 64
            if not sparse_roam:
                return roam_empty, roam_empty
            s_sz = (cval >> 7) & 3
            r_y = rid_lane // (nz * nx)
            r_z = (rid_lane // nx) % nz
            r_x = rid_lane % nx
            hit_any = jnp.zeros(cval.shape, jnp.bool_)
            for slot_shift in (9, 19):
                lid = (cval >> slot_shift) & 1023
                clx = (r_x * rx + lid % rx).astype(F)
                clz = (r_z * rz + (lid // rx) % rz).astype(F)
                cly = (r_y * ry + lid // (rx * rz)).astype(F)
                bx = gx0 + clx * scale
                by = gy0 + cly * scale
                bz = gz0 + clz * scale
                t0x = (bx - ox) * ix
                t1x = (bx + scale - ox) * ix
                t0y = (by - oy) * iy
                t1y = (by + scale - oy) * iy
                t0z = (bz - oz) * iz
                t1z = (bz + scale - oz) * iz
                tn = jnp.maximum(jnp.minimum(t0x, t1x),
                                 jnp.maximum(jnp.minimum(t0y, t1y),
                                             jnp.minimum(t0z, t1z)))
                tf = jnp.minimum(jnp.maximum(t0x, t1x),
                                 jnp.minimum(jnp.maximum(t0y, t1y),
                                             jnp.maximum(t0z, t1z)))
                hit_any = hit_any | ((tf >= tn) & (tf >= exit_t - scale))
            roam_sparse = ~roam_empty & (s_sz > 0) & ~hit_any
            return roam_empty | roam_sparse, roam_empty

        # per-lane persistent state across phases. The DDA cursor
        # (sx..sz accumulated axis distances, lx..lz integer cell, t_base,
        # tv) is CARRIED across phases since round 5 instead of being
        # re-derived from t at each serve: float re-derivation at a park
        # could disagree with the integer cell the lane had stepped into
        # (a ray grazing a cell-boundary plane with a near-zero direction
        # component oscillated between two regions forever — the round-3
        # stuck-lane pathology that made every launch pay an ~11 ms
        # starved-lane retrace cond). Carrying the cursor makes the march
        # exactly the XLA wavefront's incremental DDA: no oscillation, no
        # per-park float drift, and healthy scenes retire every lane.
        sx0, sy0, sz0, lx0, ly0, lz0 = grid_init(t0_in)
        in_grid0 = ((lx0 >= 0) & (lx0 < dim_x) & (ly0 >= 0) & (ly0 < dim_y)
                    & (lz0 >= 0) & (lz0 < dim_z))
        pend0 = jnp.where(act & in_grid0, region_of(lx0, ly0, lz0), -1)

        def phase_body_split(_, st):
            """Split-march phase: the hot loop is a pure MARCH step (one
            packed lookup + grid DDA, no brick logic); entered bricks are
            resolved by a fully UNROLLED 10-substep voxel walk under a
            tile-level lax.cond that fires only on the (coherent, rare)
            iterations where some lane actually enters a brick. Removes
            ~40% of the per-iteration op count and all brick iterations
            from the loop (measured: see docs/DESIGN_NOTES.md)."""
            if shadow:
                (pending, t_cur, ncode, found_ph, out_t, out_addr,
                 ph_sx, ph_sy, ph_sz, ph_lx, ph_ly, ph_lz, ph_tb, ph_tv,
                 ph_ox, ph_oy, ph_oz, ph_dx, ph_dy, ph_dz,
                 ph_stage, ph_occl, n_phase, n_step) = st
            else:
                (pending, t_cur, ncode, found_ph, out_t, out_addr,
                 ph_sx, ph_sy, ph_sz, ph_lx, ph_ly, ph_lz, ph_tb, ph_tv,
                 n_phase, n_step) = st
            t_off = voxel_scale * F(0.05)

            def serve(rid, scr, st6):
                if shadow:
                    (pending, t_cur, ncode, found_i6, out_t, out_addr,
                     c_sx, c_sy, c_sz, c_lx, c_ly, c_lz, c_tb, c_tv,
                     s_ox, s_oy, s_oz, s_dx, s_dy, s_dz,
                     stage, occl) = st6
                    # derived constants for the CURRENT per-lane rays
                    # (post any earlier-phase transitions)
                    s_ix = jnp.where(s_dx == 0.0, F(1e12), F(1.0) / s_dx)
                    s_iy = jnp.where(s_dy == 0.0, F(1e12), F(1.0) / s_dy)
                    s_iz = jnp.where(s_dz == 0.0, F(1e12), F(1.0) / s_dz)
                    s_sxf = jnp.sign(s_dx)
                    s_syf = jnp.sign(s_dy)
                    s_szf = jnp.sign(s_dz)
                    s_imax = F(1.0) / jnp.maximum(
                        jnp.abs(s_dx), jnp.maximum(jnp.abs(s_dy),
                                                   jnp.abs(s_dz)))
                    s_tmax = jnp.minimum(
                        jnp.maximum((gx0 - s_ox) * s_ix, (gx1 - s_ox) * s_ix),
                        jnp.minimum(
                            jnp.maximum((gy0 - s_oy) * s_iy,
                                        (gy1 - s_oy) * s_iy),
                            jnp.maximum((gz0 - s_oz) * s_iz,
                                        (gz1 - s_oz) * s_iz)))
                else:
                    (pending, t_cur, ncode, found_i6, out_t, out_addr,
                     c_sx, c_sy, c_sz, c_lx, c_ly, c_lz, c_tb, c_tv) = st6
                mine = (pending >= 0) & (pending == rid)
                r_y = rid // (nz * nx)
                r_z = (rid // nx) % nz
                r_x = rid % nx
                bx0 = r_x * rx
                by0 = r_y * ry
                bz0 = r_z * rz
                # the carried DDA cursor continues exactly where the lane
                # parked (no float re-derivation; see the kernel preamble)
                sx, sy, sz, lx, ly, lz = c_sx, c_sy, c_sz, c_lx, c_ly, c_lz
                t_base, tv = c_tb, c_tv

                def m_step(ms):
                    if shadow:
                        (run_i, t_base, tv, sx, sy, sz, lx, ly, lz, ncode,
                         found_i, out_t, out_addr, pending, t_cur,
                         ox, oy, oz, dx, dy, dz, ix, iy, iz,
                         stxf, styf, stzf, inv_max_abs, tmax_all,
                         stage, occl, k) = ms
                        adx, ady, adz = jnp.abs(ix), jnp.abs(iy), jnp.abs(iz)
                        stx = stxf.astype(jnp.int32)
                        sty = styf.astype(jnp.int32)
                        stz = stzf.astype(jnp.int32)
                        code_x = jnp.where(stx < 0, 0, 4)
                        code_y = jnp.where(sty < 0, 1, 5)
                        code_z = jnp.where(stz < 0, 2, 6)
                        stage0 = stage == 0
                    else:
                        (run_i, t_base, tv, sx, sy, sz, lx, ly, lz, ncode,
                         found_i, out_t, out_addr, pending, t_cur, k) = ms
                        ox, oy, oz, dx, dy, dz = oxC, oyC, ozC, dxC, dyC, dzC
                        ix, iy, iz = ixC, iyC, izC
                        adx, ady, adz = adxC, adyC, adzC
                        stx, sty, stz = stxC, styC, stzC
                        stxf, styf, stzf = stxfC, styfC, stzfC
                        code_x, code_y, code_z = code_xC, code_yC, code_zC
                        inv_max_abs, tmax_all = inv_max_absC, tmax_allC
                    running = run_i != 0
                    found = found_i != 0

                    in_region = ((lx >= bx0) & (lx < bx0 + rx)
                                 & (ly >= by0) & (ly < by0 + ry)
                                 & (lz >= bz0) & (lz < bz0 + rz))
                    in_grid = ((lx >= 0) & (lx < dim_x) & (ly >= 0)
                               & (ly < dim_y) & (lz >= 0) & (lz < dim_z))
                    exit_t = t_base + F(1e-4) * scale + tv
                    g_off = running & ~in_region & in_grid
                    g_miss = running & ~in_grid
                    # ROAM vs PARK: a lane leaving the tile's region consults
                    # the VMEM coarse table — if its new region holds no loaded
                    # cells it keeps marching region-by-region (plus a
                    # Chebyshev multi-region jump) instead of stalling for a
                    # region-block DMA; only non-empty regions park. This is
                    # what lets incoherent (bounce) rays that escape to the
                    # sky retire in ONE phase.
                    rid_lane = region_of(jnp.clip(lx, 0, dim_x - 1),
                                         jnp.clip(ly, 0, dim_y - 1),
                                         jnp.clip(lz, 0, dim_z - 1))
                    rid_c = jnp.clip(rid_lane, 0, n_regions - 1)
                    cval = coarse_lookup(rid_c)
                    roam_ok, roam_empty = roam_decision(rid_c, cval, exit_t)
                    roam = g_off & roam_ok
                    g_park = g_off & ~roam
                    pending = jnp.where(g_park, rid_lane, pending)
                    pending = jnp.where(g_miss, -1, pending)
                    t_cur = jnp.where(g_park, exit_t, t_cur)
                    running = running & ~g_park & ~g_miss
                    g_act = running & in_region

                    local = ((lx - bx0) + rx * ((lz - bz0) + rz * (ly - by0)))
                    local = jnp.clip(jnp.where(g_act, local, 0), 0, _RC - 1)
                    packed = _lookup(scr[_F_PACKED], local)
                    enter = g_act & (packed >= 64)
                    dist = packed & 63
                    do_skip = g_act & ~enter & (dist >= 2)
                    cur_t = t_base + F(1e-4) * scale + tv
                    new_tb = (cur_t + (dist.astype(F) - F(1.0)) * scale
                              * inv_max_abs)
                    t_base = jnp.where(do_skip, new_tb, t_base)
                    # roaming lanes jump to their (empty) region's exit along
                    # the ray, plus (d-2) regions of guaranteed-empty space
                    # when the coarse Chebyshev distance allows
                    wbx = (gx0 + ((lx // rx) * rx
                                  + jnp.where(stx > 0, rx, 0)).astype(F) * scale)
                    wby = (gy0 + ((ly // ry) * ry
                                  + jnp.where(sty > 0, ry, 0)).astype(F) * scale)
                    wbz = (gz0 + ((lz // rz) * rz
                                  + jnp.where(stz > 0, rz, 0)).astype(F) * scale)
                    trx = jnp.where(stx == 0, F(3e38), (wbx - ox) * ix)
                    try_ = jnp.where(sty == 0, F(3e38), (wby - oy) * iy)
                    trz = jnp.where(stz == 0, F(3e38), (wbz - oz) * iz)
                    roam_exit = jnp.minimum(trx, jnp.minimum(try_, trz))
                    # Chebyshev multi-region jump only for EMPTY regions;
                    # shortlist roams (sparse_roam) cross exactly one region
                    extra = jnp.where(roam_empty,
                                      jnp.maximum(cval - 2, 0),
                                      0).astype(F) * F(min_edge)
                    roam_t = roam_exit + extra * scale * inv_max_abs
                    t_base = jnp.where(roam, roam_t, t_base)
                    do_skip = do_skip | roam
                    rsx, rsy, rsz, rlx, rly, rlz = ginit_p(
                        t_base, ox, oy, oz, dx, dy, dz, adx, ady, adz,
                        stxf, styf, stzf)

                    def resolve(args):
                        # masks travel as int32 through the cond boundary: bool
                        # (i1) vectors in scf.if results crash the remote
                        # Mosaic compiler (same class as the round-1 bool
                        # loop-carry crash; see module docstring)
                        if shadow:
                            (found_i2, out_t, out_addr, ncode, running_i2,
                             pending, occl, trans_prev) = args
                        else:
                            (found_i2, out_t, out_addr, ncode, running_i2,
                             pending) = args
                        found = found_i2 != 0
                        running = running_i2 != 0
                        occ_lo = _lookup(scr[_F_OCC_LO], local).astype(jnp.uint32)
                        occ_hi = _lookup(scr[_F_OCC_HI], local).astype(jnp.uint32)
                        if needs_ignore:
                            dml = _lookup(scr[_F_DML], local).astype(jnp.uint32)
                            dmh = _lookup(scr[_F_DMH], local).astype(jnp.uint32)
                            bkey = jax.lax.bitcast_convert_type(
                                _lookup(scr[_F_IR], local), F)
                        mat_start = ((packed >> 6) - 1) << 6
                        entry_t = tv + t_base + F(0.01) * scale
                        bminx = lx.astype(F) * scale + gx0
                        bminy = ly.astype(F) * scale + gy0
                        bminz = lz.astype(F) * scale + gz0
                        bfx = (ox + dx * entry_t - bminx) / voxel_scale
                        bfy = (oy + dy * entry_t - bminy) / voxel_scale
                        bfz = (oz + dz * entry_t - bminz) / voxel_scale
                        bsx = (stxf * (jnp.floor(bfx) - bfx)
                               + (stxf * F(0.5) + F(0.5))) * adx
                        bsy = (styf * (jnp.floor(bfy) - bfy)
                               + (styf * F(0.5) + F(0.5))) * ady
                        bsz = (stzf * (jnp.floor(bfz) - bfz)
                               + (stzf * F(0.5) + F(0.5))) * adz
                        blx = jnp.floor(bfx).astype(jnp.int32)
                        bly = jnp.floor(bfy).astype(jnp.int32)
                        blz = jnp.floor(bfz).astype(jnp.int32)
                        b_t = jnp.zeros_like(entry_t)
                        ltm = tmax_all - entry_t
                        hcode = ncode
                        alive = enter
                        bhit = enter & False
                        bt_hit = jnp.zeros_like(entry_t)
                        baddr = jnp.zeros(entry_t.shape, jnp.int32)
                        hit_code = ncode
                        # a ray visits at most 4+3+3 = 10 voxels of a 4^3 brick
                        for _sub in range(10):
                            in_b = ((blx >= 0) & (blx < _BD) & (bly >= 0)
                                    & (bly < _BD) & (blz >= 0) & (blz < _BD)
                                    & (b_t <= ltm))
                            a = alive & in_b
                            alive = a
                            vi = blx + _BD * (blz + _BD * bly)
                            viu = jnp.clip(vi, 0, _BD ** 3 - 1).astype(jnp.uint32)
                            occ_word = jnp.where(viu < 32, occ_lo, occ_hi)
                            occ_bit = (occ_word >> (viu % 32)) & jnp.uint32(1)
                            vhit = a & (occ_bit == 1)
                            if needs_ignore:
                                d_word = jnp.where(viu < 32, dml, dmh)
                                d_bit = (d_word >> (viu % 32)) & jnp.uint32(1)
                                ig = ((d_bit == jnp.uint32(1))
                                      & (bkey == ray_key))
                                if shadow:
                                    # shadow rays (stage 1) are plain
                                    # any-hit traces: no dielectric skip
                                    # (the XLA path's hit_ignore_free)
                                    ig = ig & stage0
                                vhit = vhit & ~ig
                            bhit = bhit | vhit
                            bt_hit = jnp.where(vhit, entry_t + b_t - t_off,
                                               bt_hit)
                            baddr = jnp.where(vhit, mat_start + vi, baddr)
                            hit_code = jnp.where(vhit, hcode, hit_code)
                            alive = a & ~vhit
                            bax = (bsx < bsy) & (bsx < bsz)
                            bay = ~(bsx < bsy) & (bsy < bsz)
                            baz = ~(bax | bay)
                            bt_new = jnp.where(bax, bsx,
                                               jnp.where(bay, bsy, bsz)) * voxel_scale
                            bsx = jnp.where(alive & bax, bsx + adx, bsx)
                            bsy = jnp.where(alive & bay, bsy + ady, bsy)
                            bsz = jnp.where(alive & baz, bsz + adz, bsz)
                            blx = jnp.where(alive & bax, blx + stx, blx)
                            bly = jnp.where(alive & bay, bly + sty, bly)
                            blz = jnp.where(alive & baz, blz + stz, blz)
                            b_t = jnp.where(alive, bt_new, b_t)
                            hcode = jnp.where(
                                alive,
                                jnp.where(bax, code_x,
                                          jnp.where(bay, code_y, code_z)),
                                hcode)
                        if shadow:
                            # stage-0 hits RECORD and transition to the
                            # shadow stage (the caller's ray swap below);
                            # stage-1 hits are the shadow verdict: retire
                            rec = bhit & stage0
                            sh_hit = bhit & ~stage0
                            found = found | rec
                            out_t = jnp.where(rec, bt_hit, out_t)
                            out_addr = jnp.where(rec, baddr, out_addr)
                            ncode = jnp.where(rec, hit_code, ncode)
                            occl = occl | sh_hit.astype(jnp.int32)
                            running = running & ~sh_hit
                            pending = jnp.where(sh_hit, -1, pending)
                            return (found.astype(jnp.int32), out_t, out_addr,
                                    ncode, running.astype(jnp.int32), pending,
                                    occl, rec.astype(jnp.int32))
                        found = found | bhit
                        out_t = jnp.where(bhit, bt_hit, out_t)
                        out_addr = jnp.where(bhit, baddr, out_addr)
                        ncode = jnp.where(bhit, hit_code, ncode)
                        running = running & ~bhit
                        pending = jnp.where(bhit, -1, pending)
                        return (found.astype(jnp.int32), out_t, out_addr, ncode,
                                running.astype(jnp.int32), pending)

                    if shadow:
                        (found_i, out_t, out_addr, ncode, running_i, pending,
                         occl, trans_i) = jax.lax.cond(
                            jnp.any(enter), resolve, lambda a: a,
                            (found.astype(jnp.int32), out_t, out_addr,
                             ncode, running.astype(jnp.int32), pending,
                             occl, jnp.zeros_like(pending)))
                        trans = trans_i != 0
                    else:
                        (found_i, out_t, out_addr, ncode, running_i, pending) = \
                            jax.lax.cond(jnp.any(enter), resolve, lambda a: a,
                                         (found.astype(jnp.int32), out_t, out_addr,
                                          ncode, running.astype(jnp.int32), pending))
                    found = found_i != 0
                    running = running_i != 0

                    # one grid advance: plain march lanes, and entered lanes
                    # that passed through their brick without a hit (still
                    # running) step out of the cell exactly like the unified
                    # kernel's b_exit path
                    grid_steps = g_act & running & ~do_skip
                    if shadow:
                        # freshly transitioned lanes get a new cursor below;
                        # stage-1 lanes must not clobber the recorded hit
                        # normal with their march codes
                        grid_steps = grid_steps & ~trans
                    gax = (sx < sy) & (sx < sz)
                    gay = ~(sx < sy) & (sy < sz)
                    gaz = ~(gax | gay)
                    gt_new = jnp.where(gax, sx, jnp.where(gay, sy, sz)) * scale
                    sx = jnp.where(grid_steps & gax, sx + adx, sx)
                    sy = jnp.where(grid_steps & gay, sy + ady, sy)
                    sz = jnp.where(grid_steps & gaz, sz + adz, sz)
                    lx = jnp.where(grid_steps & gax, lx + stx, lx)
                    ly = jnp.where(grid_steps & gay, ly + sty, ly)
                    lz = jnp.where(grid_steps & gaz, lz + stz, lz)
                    tv = jnp.where(grid_steps, gt_new, tv)
                    ncode_steps = (grid_steps & stage0 if shadow
                                   else grid_steps)
                    ncode = jnp.where(
                        ncode_steps,
                        jnp.where(gax, code_x, jnp.where(gay, code_y, code_z)),
                        ncode)
                    sx = jnp.where(do_skip, rsx, sx)
                    sy = jnp.where(do_skip, rsy, sy)
                    sz = jnp.where(do_skip, rsz, sz)
                    lx = jnp.where(do_skip, rlx, lx)
                    ly = jnp.where(do_skip, rly, ly)
                    lz = jnp.where(do_skip, rlz, lz)
                    tv = jnp.where(do_skip, F(0.0), tv)

                    if shadow:
                        (ox, oy, oz, dx, dy, dz, ix, iy, iz,
                         stxf, styf, stzf, inv_max_abs, tmax_all,
                         t_base, tv, sx, sy, sz, lx, ly, lz,
                         stage, running, pending) = _shadow_transition(
                            trans, ncode, out_t, tgx, tgy, tgz,
                            (ox, oy, oz, dx, dy, dz, ix, iy, iz,
                             stxf, styf, stzf, inv_max_abs, tmax_all,
                             t_base, tv, sx, sy, sz, lx, ly, lz,
                             stage, running, pending))
                        return (running.astype(jnp.int32), t_base, tv,
                                sx, sy, sz, lx, ly, lz, ncode,
                                found.astype(jnp.int32), out_t, out_addr,
                                pending, t_cur,
                                ox, oy, oz, dx, dy, dz, ix, iy, iz,
                                stxf, styf, stzf, inv_max_abs, tmax_all,
                                stage, occl, k + 1)
                    return (running.astype(jnp.int32), t_base, tv,
                            sx, sy, sz, lx, ly, lz, ncode,
                            found.astype(jnp.int32), out_t, out_addr,
                            pending, t_cur, k + 1)

                if shadow:
                    ms = (mine.astype(jnp.int32), t_base, tv,
                          sx, sy, sz, lx, ly, lz,
                          ncode, found_i6, out_t, out_addr, pending, t_cur,
                          s_ox, s_oy, s_oz, s_dx, s_dy, s_dz,
                          s_ix, s_iy, s_iz, s_sxf, s_syf, s_szf,
                          s_imax, s_tmax, stage, occl, jnp.int32(0))
                else:
                    ms = (mine.astype(jnp.int32), t_base, tv,
                          sx, sy, sz, lx, ly, lz,
                          ncode, found_i6, out_t, out_addr, pending, t_cur,
                          jnp.int32(0))

                def m_cond(ms):
                    return (ms[-1] < steps_per_phase) & jnp.any(ms[0] != 0)

                def m_wrap(ms):
                    for _ in range(step_unroll):
                        ms = m_step(ms)
                    return ms

                ms = jax.lax.while_loop(m_cond, m_wrap, ms)
                if shadow:
                    (run_i, t_base, tv, sx, sy, sz, lx, ly, lz, ncode,
                     found_i, out_t, out_addr, pending, t_cur,
                     s_ox, s_oy, s_oz, s_dx, s_dy, s_dz,
                     _, _, _, _, _, _, _, _, stage, occl, k_steps) = ms
                else:
                    (run_i, t_base, tv, sx, sy, sz, lx, ly, lz, ncode,
                     found_i, out_t, out_addr, pending, t_cur, k_steps) = ms
                running = run_i != 0
                exit_t = t_base + F(1e-4) * scale + tv
                pending = jnp.where(running, region_of(
                    jnp.clip(lx, 0, dim_x - 1), jnp.clip(ly, 0, dim_y - 1),
                    jnp.clip(lz, 0, dim_z - 1)), pending)
                t_cur = jnp.where(running, exit_t - F(1e-4) * scale, t_cur)
                if shadow:
                    return ((pending, t_cur, ncode, found_i, out_t, out_addr,
                             sx, sy, sz, lx, ly, lz, t_base, tv,
                             s_ox, s_oy, s_oz, s_dx, s_dy, s_dz,
                             stage, occl), k_steps)
                return ((pending, t_cur, ncode, found_i, out_t, out_addr,
                         sx, sy, sz, lx, ly, lz, t_base, tv),
                        k_steps)

            def lookup_slots(field, local_idx, slot):
                """Per-lane shuffle-tree lookup across the n_serve resident
                region blocks: each lane reads from the slot its current
                region was DMA'd into (n_serve trees + selects; trees are
                ~5% of step cost — see docs/DESIGN_NOTES.md round-2 item 6
                — so concurrency is nearly free)."""
                r = local_idx // 128
                c = local_idx % 128
                val = jnp.zeros(local_idx.shape, jnp.int32)
                for i in range(n_serve):
                    vi = jnp.zeros(local_idx.shape, jnp.int32)
                    for row in range(_SUBROWS):
                        cand = jnp.take_along_axis(
                            jnp.broadcast_to(scratch[i, field, row],
                                             local_idx.shape), c, axis=1)
                        vi = jnp.where(r == row, cand, vi)
                    val = jnp.where(slot == i, vi, val)
                return val

            def serve_concurrent(rids, hases, st6):
                """March ALL resident regions in one loop. Semantics match
                sequential serve(): a lane crossing into another resident
                region switches slots in-flight (the same float path as a
                park + next-phase re-init: t_base = exit boundary,
                grid_init re-derivation), empty regions roam, non-resident
                non-empty regions park."""
                if shadow:
                    (pending, t_cur, ncode, found_i6, out_t, out_addr,
                     c_sx, c_sy, c_sz, c_lx, c_ly, c_lz, c_tb, c_tv,
                     s_ox, s_oy, s_oz, s_dx, s_dy, s_dz,
                     stage, occl) = st6
                    s_ix = jnp.where(s_dx == 0.0, F(1e12), F(1.0) / s_dx)
                    s_iy = jnp.where(s_dy == 0.0, F(1e12), F(1.0) / s_dy)
                    s_iz = jnp.where(s_dz == 0.0, F(1e12), F(1.0) / s_dz)
                    s_sxf = jnp.sign(s_dx)
                    s_syf = jnp.sign(s_dy)
                    s_szf = jnp.sign(s_dz)
                    s_imax = F(1.0) / jnp.maximum(
                        jnp.abs(s_dx), jnp.maximum(jnp.abs(s_dy),
                                                   jnp.abs(s_dz)))
                    s_tmax = jnp.minimum(
                        jnp.maximum((gx0 - s_ox) * s_ix, (gx1 - s_ox) * s_ix),
                        jnp.minimum(
                            jnp.maximum((gy0 - s_oy) * s_iy,
                                        (gy1 - s_oy) * s_iy),
                            jnp.maximum((gz0 - s_oz) * s_iz,
                                        (gz1 - s_oz) * s_iz)))
                else:
                    (pending, t_cur, ncode, found_i6, out_t, out_addr,
                     c_sx, c_sy, c_sz, c_lx, c_ly, c_lz, c_tb, c_tv) = st6
                nr_i4 = jnp.int32(n_regions)
                t_off = voxel_scale * F(0.05)

                def slot_of(region_ids):
                    s = jnp.full(region_ids.shape, -1, jnp.int32)
                    for i in range(n_serve):
                        # guard the match with hases[i]: an EMPTY vote
                        # slot's rid is the clipped nr-1, and an
                        # unconditional match would overwrite a real
                        # earlier mapping of the corner region with -1 —
                        # lanes pending it would repeat the identical
                        # no-op vote until the phase budget burned out
                        s = jnp.where((region_ids == rids[i]) & hases[i],
                                      jnp.int32(i), s)
                    return s

                slot0 = jnp.where(pending >= 0, slot_of(pending),
                                  jnp.int32(-1))
                mine = slot0 >= 0
                # carried DDA cursor (see the kernel preamble)
                sx, sy, sz, lx, ly, lz = c_sx, c_sy, c_sz, c_lx, c_ly, c_lz

                def m_step(ms):
                    if shadow:
                        (run_i, slot, t_base, tv, sx, sy, sz, lx, ly, lz,
                         ncode, found_i, out_t, out_addr, pending, t_cur,
                         ox, oy, oz, dx, dy, dz, ix, iy, iz,
                         stxf, styf, stzf, inv_max_abs, tmax_all,
                         stage, occl, k) = ms
                        adx, ady, adz = jnp.abs(ix), jnp.abs(iy), jnp.abs(iz)
                        stx = stxf.astype(jnp.int32)
                        sty = styf.astype(jnp.int32)
                        stz = stzf.astype(jnp.int32)
                        code_x = jnp.where(stx < 0, 0, 4)
                        code_y = jnp.where(sty < 0, 1, 5)
                        code_z = jnp.where(stz < 0, 2, 6)
                        stage0 = stage == 0
                    else:
                        (run_i, slot, t_base, tv, sx, sy, sz, lx, ly, lz,
                         ncode, found_i, out_t, out_addr, pending, t_cur,
                         k) = ms
                        ox, oy, oz, dx, dy, dz = oxC, oyC, ozC, dxC, dyC, dzC
                        ix, iy, iz = ixC, iyC, izC
                        adx, ady, adz = adxC, adyC, adzC
                        stx, sty, stz = stxC, styC, stzC
                        stxf, styf, stzf = stxfC, styfC, stzfC
                        code_x, code_y, code_z = code_xC, code_yC, code_zC
                        inv_max_abs, tmax_all = inv_max_absC, tmax_allC
                    running = run_i != 0
                    found = found_i != 0

                    # per-lane region box (pending == the lane's serving
                    # region while it runs)
                    prid = jnp.clip(pending, 0, nr_i4 - 1)
                    bx0 = (prid % nx) * rx
                    by0 = (prid // (nz * nx)) * ry
                    bz0 = ((prid // nx) % nz) * rz
                    in_region = ((lx >= bx0) & (lx < bx0 + rx)
                                 & (ly >= by0) & (ly < by0 + ry)
                                 & (lz >= bz0) & (lz < bz0 + rz))
                    in_grid = ((lx >= 0) & (lx < dim_x) & (ly >= 0)
                               & (ly < dim_y) & (lz >= 0) & (lz < dim_z))
                    exit_t = t_base + F(1e-4) * scale + tv
                    g_off = running & ~in_region & in_grid
                    g_miss = running & ~in_grid
                    rid_lane = region_of(jnp.clip(lx, 0, dim_x - 1),
                                         jnp.clip(ly, 0, dim_y - 1),
                                         jnp.clip(lz, 0, dim_z - 1))
                    rid_c = jnp.clip(rid_lane, 0, n_regions - 1)
                    cval = coarse_lookup(rid_c)
                    roam_ok, roam_empty = roam_decision(rid_c, cval, exit_t)
                    roam = g_off & roam_ok
                    # in-flight switch to another RESIDENT (non-empty)
                    # region: keep marching instead of parking for a phase
                    new_slot = slot_of(rid_lane)
                    switch = g_off & ~roam & (new_slot >= 0)
                    g_park = g_off & ~roam & ~switch
                    pending = jnp.where(g_park | switch, rid_lane, pending)
                    pending = jnp.where(g_miss, -1, pending)
                    t_cur = jnp.where(g_park, exit_t, t_cur)
                    slot = jnp.where(switch, new_slot, slot)
                    running = running & ~g_park & ~g_miss
                    g_act = running & in_region

                    local = ((lx - bx0) + rx * ((lz - bz0) + rz * (ly - by0)))
                    local = jnp.clip(jnp.where(g_act, local, 0), 0, _RC - 1)
                    packed = lookup_slots(_F_PACKED, local, slot)
                    enter = g_act & (packed >= 64)
                    dist = packed & 63
                    do_skip = g_act & ~enter & (dist >= 2)
                    cur_t = t_base + F(1e-4) * scale + tv
                    new_tb = (cur_t + (dist.astype(F) - F(1.0)) * scale
                              * inv_max_abs)
                    t_base = jnp.where(do_skip, new_tb, t_base)
                    wbx = (gx0 + ((lx // rx) * rx
                                  + jnp.where(stx > 0, rx, 0)).astype(F) * scale)
                    wby = (gy0 + ((ly // ry) * ry
                                  + jnp.where(sty > 0, ry, 0)).astype(F) * scale)
                    wbz = (gz0 + ((lz // rz) * rz
                                  + jnp.where(stz > 0, rz, 0)).astype(F) * scale)
                    trx = jnp.where(stx == 0, F(3e38), (wbx - ox) * ix)
                    try_ = jnp.where(sty == 0, F(3e38), (wby - oy) * iy)
                    trz = jnp.where(stz == 0, F(3e38), (wbz - oz) * iz)
                    roam_exit = jnp.minimum(trx, jnp.minimum(try_, trz))
                    # Chebyshev jump only for EMPTY regions (see split path)
                    extra = jnp.where(roam_empty,
                                      jnp.maximum(cval - 2, 0),
                                      0).astype(F) * F(min_edge)
                    roam_t = roam_exit + extra * scale * inv_max_abs
                    t_base = jnp.where(roam, roam_t, t_base)
                    # switching lanes re-init at the region boundary — the
                    # exact float path a park + next-phase re-init takes
                    t_base = jnp.where(switch, exit_t, t_base)
                    do_skip = do_skip | roam | switch
                    rsx, rsy, rsz, rlx, rly, rlz = ginit_p(
                        t_base, ox, oy, oz, dx, dy, dz, adx, ady, adz,
                        stxf, styf, stzf)

                    def resolve(args):
                        if shadow:
                            (found_i2, out_t, out_addr, ncode, running_i2,
                             pending, occl, trans_prev) = args
                        else:
                            (found_i2, out_t, out_addr, ncode, running_i2,
                             pending) = args
                        found = found_i2 != 0
                        running = running_i2 != 0
                        occ_lo = lookup_slots(_F_OCC_LO, local,
                                              slot).astype(jnp.uint32)
                        occ_hi = lookup_slots(_F_OCC_HI, local,
                                              slot).astype(jnp.uint32)
                        if needs_ignore:
                            dml = lookup_slots(_F_DML, local,
                                               slot).astype(jnp.uint32)
                            dmh = lookup_slots(_F_DMH, local,
                                               slot).astype(jnp.uint32)
                            bkey = jax.lax.bitcast_convert_type(
                                lookup_slots(_F_IR, local, slot), F)
                        mat_start = ((packed >> 6) - 1) << 6
                        entry_t = tv + t_base + F(0.01) * scale
                        bminx = lx.astype(F) * scale + gx0
                        bminy = ly.astype(F) * scale + gy0
                        bminz = lz.astype(F) * scale + gz0
                        bfx = (ox + dx * entry_t - bminx) / voxel_scale
                        bfy = (oy + dy * entry_t - bminy) / voxel_scale
                        bfz = (oz + dz * entry_t - bminz) / voxel_scale
                        bsx = (stxf * (jnp.floor(bfx) - bfx)
                               + (stxf * F(0.5) + F(0.5))) * adx
                        bsy = (styf * (jnp.floor(bfy) - bfy)
                               + (styf * F(0.5) + F(0.5))) * ady
                        bsz = (stzf * (jnp.floor(bfz) - bfz)
                               + (stzf * F(0.5) + F(0.5))) * adz
                        blx = jnp.floor(bfx).astype(jnp.int32)
                        bly = jnp.floor(bfy).astype(jnp.int32)
                        blz = jnp.floor(bfz).astype(jnp.int32)
                        b_t = jnp.zeros_like(entry_t)
                        ltm = tmax_all - entry_t
                        hcode = ncode
                        alive = enter
                        bhit = enter & False
                        bt_hit = jnp.zeros_like(entry_t)
                        baddr = jnp.zeros(entry_t.shape, jnp.int32)
                        hit_code = ncode
                        for _sub in range(10):
                            in_b = ((blx >= 0) & (blx < _BD) & (bly >= 0)
                                    & (bly < _BD) & (blz >= 0) & (blz < _BD)
                                    & (b_t <= ltm))
                            a = alive & in_b
                            alive = a
                            vi = blx + _BD * (blz + _BD * bly)
                            viu = jnp.clip(vi, 0, _BD ** 3 - 1).astype(jnp.uint32)
                            occ_word = jnp.where(viu < 32, occ_lo, occ_hi)
                            occ_bit = (occ_word >> (viu % 32)) & jnp.uint32(1)
                            vhit = a & (occ_bit == 1)
                            if needs_ignore:
                                d_word = jnp.where(viu < 32, dml, dmh)
                                d_bit = (d_word >> (viu % 32)) & jnp.uint32(1)
                                ig = ((d_bit == jnp.uint32(1))
                                      & (bkey == ray_key))
                                if shadow:
                                    # shadow rays (stage 1) are plain
                                    # any-hit traces: no dielectric skip
                                    # (the XLA path's hit_ignore_free)
                                    ig = ig & stage0
                                vhit = vhit & ~ig
                            bhit = bhit | vhit
                            bt_hit = jnp.where(vhit, entry_t + b_t - t_off,
                                               bt_hit)
                            baddr = jnp.where(vhit, mat_start + vi, baddr)
                            hit_code = jnp.where(vhit, hcode, hit_code)
                            alive = a & ~vhit
                            bax = (bsx < bsy) & (bsx < bsz)
                            bay = ~(bsx < bsy) & (bsy < bsz)
                            baz = ~(bax | bay)
                            bt_new = jnp.where(
                                bax, bsx,
                                jnp.where(bay, bsy, bsz)) * voxel_scale
                            bsx = jnp.where(alive & bax, bsx + adx, bsx)
                            bsy = jnp.where(alive & bay, bsy + ady, bsy)
                            bsz = jnp.where(alive & baz, bsz + adz, bsz)
                            blx = jnp.where(alive & bax, blx + stx, blx)
                            bly = jnp.where(alive & bay, bly + sty, bly)
                            blz = jnp.where(alive & baz, blz + stz, blz)
                            b_t = jnp.where(alive, bt_new, b_t)
                            hcode = jnp.where(
                                alive,
                                jnp.where(bax, code_x,
                                          jnp.where(bay, code_y, code_z)),
                                hcode)
                        if shadow:
                            rec = bhit & stage0
                            sh_hit = bhit & ~stage0
                            found = found | rec
                            out_t = jnp.where(rec, bt_hit, out_t)
                            out_addr = jnp.where(rec, baddr, out_addr)
                            ncode = jnp.where(rec, hit_code, ncode)
                            occl = occl | sh_hit.astype(jnp.int32)
                            running = running & ~sh_hit
                            pending = jnp.where(sh_hit, -1, pending)
                            return (found.astype(jnp.int32), out_t, out_addr,
                                    ncode, running.astype(jnp.int32), pending,
                                    occl, rec.astype(jnp.int32))
                        found = found | bhit
                        out_t = jnp.where(bhit, bt_hit, out_t)
                        out_addr = jnp.where(bhit, baddr, out_addr)
                        ncode = jnp.where(bhit, hit_code, ncode)
                        running = running & ~bhit
                        pending = jnp.where(bhit, -1, pending)
                        return (found.astype(jnp.int32), out_t, out_addr,
                                ncode, running.astype(jnp.int32), pending)

                    if shadow:
                        (found_i, out_t, out_addr, ncode, running_i, pending,
                         occl, trans_i) = jax.lax.cond(
                            jnp.any(enter), resolve, lambda a: a,
                            (found.astype(jnp.int32), out_t, out_addr,
                             ncode, running.astype(jnp.int32), pending,
                             occl, jnp.zeros_like(pending)))
                        trans = trans_i != 0
                    else:
                        (found_i, out_t, out_addr, ncode, running_i, pending) = \
                            jax.lax.cond(jnp.any(enter), resolve, lambda a: a,
                                         (found.astype(jnp.int32), out_t,
                                          out_addr, ncode,
                                          running.astype(jnp.int32), pending))
                    found = found_i != 0
                    running = running_i != 0

                    grid_steps = g_act & running & ~do_skip
                    if shadow:
                        grid_steps = grid_steps & ~trans
                    gax = (sx < sy) & (sx < sz)
                    gay = ~(sx < sy) & (sy < sz)
                    gaz = ~(gax | gay)
                    gt_new = jnp.where(gax, sx,
                                       jnp.where(gay, sy, sz)) * scale
                    sx = jnp.where(grid_steps & gax, sx + adx, sx)
                    sy = jnp.where(grid_steps & gay, sy + ady, sy)
                    sz = jnp.where(grid_steps & gaz, sz + adz, sz)
                    lx = jnp.where(grid_steps & gax, lx + stx, lx)
                    ly = jnp.where(grid_steps & gay, ly + sty, ly)
                    lz = jnp.where(grid_steps & gaz, lz + stz, lz)
                    tv = jnp.where(grid_steps, gt_new, tv)
                    ncode_steps = (grid_steps & stage0 if shadow
                                   else grid_steps)
                    ncode = jnp.where(
                        ncode_steps,
                        jnp.where(gax, code_x,
                                  jnp.where(gay, code_y, code_z)),
                        ncode)
                    sx = jnp.where(do_skip, rsx, sx)
                    sy = jnp.where(do_skip, rsy, sy)
                    sz = jnp.where(do_skip, rsz, sz)
                    lx = jnp.where(do_skip, rlx, lx)
                    ly = jnp.where(do_skip, rly, ly)
                    lz = jnp.where(do_skip, rlz, lz)
                    tv = jnp.where(do_skip, F(0.0), tv)

                    if shadow:
                        (ox, oy, oz, dx, dy, dz, ix, iy, iz,
                         stxf, styf, stzf, inv_max_abs, tmax_all,
                         t_base, tv, sx, sy, sz, lx, ly, lz,
                         stage, running, pending) = _shadow_transition(
                            trans, ncode, out_t, tgx, tgy, tgz,
                            (ox, oy, oz, dx, dy, dz, ix, iy, iz,
                             stxf, styf, stzf, inv_max_abs, tmax_all,
                             t_base, tv, sx, sy, sz, lx, ly, lz,
                             stage, running, pending))
                        return (running.astype(jnp.int32), slot, t_base, tv,
                                sx, sy, sz, lx, ly, lz, ncode,
                                found.astype(jnp.int32), out_t, out_addr,
                                pending, t_cur,
                                ox, oy, oz, dx, dy, dz, ix, iy, iz,
                                stxf, styf, stzf, inv_max_abs, tmax_all,
                                stage, occl, k + 1)
                    return (running.astype(jnp.int32), slot, t_base, tv,
                            sx, sy, sz, lx, ly, lz, ncode,
                            found.astype(jnp.int32), out_t, out_addr,
                            pending, t_cur, k + 1)

                if shadow:
                    ms = (mine.astype(jnp.int32), slot0, c_tb,
                          c_tv, sx, sy, sz, lx, ly, lz,
                          ncode, found_i6, out_t, out_addr, pending, t_cur,
                          s_ox, s_oy, s_oz, s_dx, s_dy, s_dz,
                          s_ix, s_iy, s_iz, s_sxf, s_syf, s_szf,
                          s_imax, s_tmax, stage, occl, jnp.int32(0))
                else:
                    ms = (mine.astype(jnp.int32), slot0, c_tb,
                          c_tv, sx, sy, sz, lx, ly, lz,
                          ncode, found_i6, out_t, out_addr, pending, t_cur,
                          jnp.int32(0))

                def m_cond(ms):
                    return (ms[-1] < steps_per_phase) & jnp.any(ms[0] != 0)

                def m_wrap(ms):
                    for _ in range(step_unroll):
                        ms = m_step(ms)
                    return ms

                ms = jax.lax.while_loop(m_cond, m_wrap, ms)
                if shadow:
                    (run_i, _, t_base, tv, sx, sy, sz, lx, ly, lz, ncode,
                     found_i, out_t, out_addr, pending, t_cur,
                     s_ox, s_oy, s_oz, s_dx, s_dy, s_dz,
                     _, _, _, _, _, _, _, _, stage, occl, k_steps) = ms
                else:
                    (run_i, _, t_base, tv, sx, sy, sz, lx, ly, lz, ncode,
                     found_i, out_t, out_addr, pending, t_cur, k_steps) = ms
                running = run_i != 0
                exit_t = t_base + F(1e-4) * scale + tv
                pending = jnp.where(running, region_of(
                    jnp.clip(lx, 0, dim_x - 1), jnp.clip(ly, 0, dim_y - 1),
                    jnp.clip(lz, 0, dim_z - 1)), pending)
                t_cur = jnp.where(running, exit_t - F(1e-4) * scale, t_cur)
                if shadow:
                    return ((pending, t_cur, ncode, found_i, out_t, out_addr,
                             sx, sy, sz, lx, ly, lz, t_base, tv,
                             s_ox, s_oy, s_oz, s_dx, s_dy, s_dz,
                             stage, occl), k_steps)
                return ((pending, t_cur, ncode, found_i, out_t, out_addr,
                         sx, sy, sz, lx, ly, lz, t_base, tv),
                        k_steps)

            # Multi-region phase: vote the N_SERVE most-urgent pending
            # regions (march order within each), DMA them ALL up front —
            # later transfers overlap serving earlier regions — then serve
            # sequentially. Coherent tiles usually have a single pending
            # region (duplicate DMAs are overlapped and the extra serves
            # are skipped by their conds); divergent bounce tiles cut
            # their phase count by up to N_SERVE.
            live = pending >= 0
            inf_t = jnp.float32(3e38)
            nr_i = jnp.int32(ny * nz * nx)
            if shadow:
                # two incomparable t scales coexist once lanes transition
                # (a shadow ray restarts at t ~ 1e-5 while scatter lanes
                # sit at t ~ the scene scale): an unbiased min-t vote gets
                # hijacked by every transition batch and thrashes between
                # fresh shadow regions and mid-flight scatter regions
                # (measured: the probed [bounce2+shadow2] launch blew up
                # +113 ms). Order the scatter era first; shadow lanes
                # accumulate and are then served together from their
                # (origin-coherent) regions — the separate-launch schedule
                # without the launch.
                t_vote = t_cur + ph_stage.astype(F) * F(1e7)
            else:
                t_vote = t_cur
            rids = []
            hases = []
            excluded = jnp.zeros_like(live)
            for _v in range(n_serve):
                cand = live & ~excluded
                tv_ = jnp.where(cand, t_vote, inf_t)
                tmin_ = jnp.min(tv_)
                raw = jnp.min(jnp.where(cand & (tv_ <= tmin_), pending,
                                        nr_i))
                hases.append(raw < nr_i)
                rid_v = jnp.clip(raw, 0, nr_i - 1)
                rids.append(rid_v)
                excluded = excluded | (pending == rid_v)
            dmas = [pltpu.make_async_copy(blocks_hbm.at[rids[i]],
                                          scratch.at[i], sem.at[i])
                    for i in range(n_serve)]
            for d in dmas:
                d.start()
            if shadow:
                st6 = (pending, t_cur, ncode, found_ph, out_t, out_addr,
                       ph_sx, ph_sy, ph_sz, ph_lx, ph_ly, ph_lz,
                       ph_tb, ph_tv,
                       ph_ox, ph_oy, ph_oz, ph_dx, ph_dy, ph_dz,
                       ph_stage, ph_occl)
            else:
                st6 = (pending, t_cur, ncode, found_ph, out_t, out_addr,
                       ph_sx, ph_sy, ph_sz, ph_lx, ph_ly, ph_lz,
                       ph_tb, ph_tv)
            k_total = jnp.int32(0)
            n_served = jnp.int32(0)
            if concurrent:
                # CONCURRENT serve (round 3, the incoherent-ray lever): all
                # resident regions are marched in ONE loop — each lane
                # looks up from its own slot — so a divergent tile's lane
                # utilization multiplies by up to n_serve instead of
                # serving the regions one mostly-idle loop at a time.
                for d in dmas:
                    d.wait()
                st6, k_total = serve_concurrent(rids, hases, st6)
                for i in range(n_serve):
                    n_served = n_served + hases[i].astype(jnp.int32)
            else:
                for i in range(n_serve):
                    # ALWAYS wait (semaphore bookkeeping must pair with
                    # start); blocks for later serves arrived during
                    # earlier ones
                    dmas[i].wait()
                    if i == 0:
                        st6, k_i = serve(rids[0], scratch.at[0], st6)
                    else:
                        st6, k_i = jax.lax.cond(
                            hases[i],
                            lambda s, _i=i: serve(rids[_i], scratch.at[_i], s),
                            lambda s: (s, jnp.int32(0)), st6)
                    k_total = k_total + k_i
                    n_served = n_served + hases[i].astype(jnp.int32)
            if shadow:
                (pending, t_cur, ncode, found_i, out_t, out_addr,
                 ph_sx, ph_sy, ph_sz, ph_lx, ph_ly, ph_lz, ph_tb, ph_tv,
                 ph_ox, ph_oy, ph_oz, ph_dx, ph_dy, ph_dz,
                 ph_stage, ph_occl) = st6
            else:
                (pending, t_cur, ncode, found_i, out_t, out_addr,
                 ph_sx, ph_sy, ph_sz, ph_lx, ph_ly, ph_lz, ph_tb, ph_tv) = st6
            if stats:
                n_phase = n_phase + n_served
                n_step = n_step + k_total
            if shadow:
                return (pending, t_cur, ncode, found_i, out_t, out_addr,
                        ph_sx, ph_sy, ph_sz, ph_lx, ph_ly, ph_lz,
                        ph_tb, ph_tv,
                        ph_ox, ph_oy, ph_oz, ph_dx, ph_dy, ph_dz,
                        ph_stage, ph_occl, n_phase, n_step)
            return (pending, t_cur, ncode, found_i, out_t, out_addr,
                    ph_sx, ph_sy, ph_sz, ph_lx, ph_ly, ph_lz, ph_tb, ph_tv,
                    n_phase, n_step)

        cursor0 = (sx0, sy0, sz0, lx0, ly0, lz0, t0_in, jnp.zeros_like(ox))
        if shadow:
            st = (pend0, t0_in, slab_code,
                  jnp.zeros(ox.shape, jnp.int32), jnp.zeros_like(ox),
                  jnp.zeros(ox.shape, jnp.int32)) + cursor0 + (
                  ox, oy, oz, dx, dy, dz,
                  jnp.zeros(ox.shape, jnp.int32),   # stage
                  jnp.zeros(ox.shape, jnp.int32),   # occluded
                  jnp.zeros(ox.shape, jnp.int32), jnp.zeros(ox.shape, jnp.int32))
        else:
            st = (pend0, t0_in, slab_code,
                  jnp.zeros(ox.shape, jnp.int32), jnp.zeros_like(ox),
                  jnp.zeros(ox.shape, jnp.int32)) + cursor0 + (
                  jnp.zeros(ox.shape, jnp.int32), jnp.zeros(ox.shape, jnp.int32))

        chosen_phase = phase_body_split

        def phase_cond_plain(st_k):
            st, k = st_k
            return (k < max_phases) & jnp.any(st[0] >= 0)

        def phase_wrap_plain(st_k):
            st, k = st_k
            return (chosen_phase(k, st), k + 1)

        def phase_cond(st_k):
            (st, _stall), k = st_k
            return (k < max_phases) & jnp.any(st[0] >= 0)

        def phase_wrap(st_k):
            (st, stall), k = st_k
            pend_b, t_b = st[0], st[1]
            st = chosen_phase(k, st)
            pend_a, t_a = st[0], st[1]
            # STALL GUARD (round 3): a lane making no real progress for 8
            # consecutive served phases is handed to the compact XLA
            # retrace (code -3, reported as unfinished) so the tile can
            # retire. The original trigger — park-time float
            # re-derivation oscillating a boundary-grazing lane between
            # two regions — is REMOVED by design since round 5 (the DDA
            # cursor is carried across phases, kernel preamble); the
            # guard stays as cheap insurance for any residual
            # no-progress loop (e.g. the skip/roam jumps still re-derive
            # the cursor from t).
            # Detection: a lane whose region was NOT served this phase
            # keeps t exactly (no write); a SERVED lane either crosses
            # cells (t advances by >= scale/|d|max >= 0.5*scale) or is
            # stuck and collects only the 1e-4*scale park epsilon. So
            # "strictly positive but far sub-cell advance" identifies a
            # served-and-stuck phase without knowing the vote.
            dt = t_a - t_b
            advanced = dt > F(0.01) * scale
            tiny = (dt > F(0.0)) & ~advanced & (pend_a >= 0)
            # reset on ANY non-tiny phase — including dt == 0 (lane not
            # served): a genuinely stuck lane is the tile's min-t live
            # lane and is served every phase CONSECUTIVELY, so requiring
            # 8 consecutive tiny advances keeps detection intact while
            # preventing unrelated sub-cell advances spread across
            # parked phases from accumulating to a false give-up
            stall = jnp.where(tiny, stall + 1, jnp.int32(0))
            give_up = (stall >= 8) & (pend_a >= 0)
            pend_a = jnp.where(give_up, jnp.int32(-3), pend_a)
            st = (pend_a,) + tuple(st[1:])
            return ((st, stall), k + 1)

        if _STALL_GUARD:
            (st, _stall), _ = jax.lax.while_loop(
                phase_cond, phase_wrap,
                ((st, jnp.zeros_like(st[0])), jnp.int32(0)))
        else:
            st, _ = jax.lax.while_loop(phase_cond_plain, phase_wrap_plain,
                                       (st, jnp.int32(0)))
        if shadow:
            (pending, t_cur, ncode, found_i, out_t, out_addr,
             _, _, _, _, _, _, _, _,
             _, _, _, _, _, _, _fstage, occl_i, n_phase, n_step) = st
            occl_ref[:] = occl_i
        else:
            (pending, t_cur, ncode, found_i, out_t, out_addr,
             _, _, _, _, _, _, _, _, n_phase, n_step) = st
        found_ref[:] = found_i
        t_ref[:] = out_t
        ncode_ref[:] = ncode
        addr_ref[:] = out_addr
        if stats:
            # diagnostic build: phases in the t output's integer space is
            # useless, so repurpose addr (sublane pattern): lane value =
            # n_phase * 100000 + n_step (both < 100000 in practice)
            pend_ref[:] = n_phase * 100000 + n_step
        else:
            pend_ref[:] = pending

    return kernel


@partial(jax.jit, static_argnames=("static", "max_phases", "steps_per_phase",
                                   "needs_ignore", "stats",
                                   "step_unroll", "interpret",
                                   "concurrent", "n_serve", "sparse_roam"))
def trace_tiles_regions(static: GridStatic, region_blocks,
                        ox, oy, oz, dx, dy, dz, t_base, active, ray_key=None,
                        max_phases: int = 128, steps_per_phase: int = 48,
                        needs_ignore: bool = False,
                        stats: bool = False, step_unroll: int = 2,
                        interpret: bool = False,
                        concurrent: bool = False, n_serve: int = _N_SERVE,
                        sparse_roam: bool = False, shadow_targets=None):
    """Region-marching tile trace.

    Returns dict(found, t, ncode, mat_addr, unfinished) — `unfinished`
    marks lanes parked when the phase budget ran out (re-trace them on the
    XLA wavefront; see grid_hit_tiles).

    `shadow_targets=(tgx, tgy, tgz)` builds the sun-shadow-probe kernel:
    a lane that retires with a hit immediately re-launches as a shadow
    ray toward its per-lane target inside the same kernel (see
    _tile_kernel shadow=True); the output gains `occluded` (int mask)."""
    n = ox.shape[0]
    assert n % TILE == 0
    tiles = n // TILE
    shadow = shadow_targets is not None
    if ray_key is None:
        ray_key = jnp.full((n,), jnp.nan, dtype=F)

    def reshape(a):
        return a.reshape(tiles * TILE_SUBLANES, TILE_LANES)

    blocks, coarse = region_blocks.blocks, region_blocks.coarse
    # layout guard (see the env validation at module top): tables built
    # under a different ZVT_REGION_CELLS would be silently misread by the
    # compiled kernel — shapes encode the layout, so check them.
    ny, nz, nx = region_grid(static)
    exp_blocks = (ny * nz * nx, _N_FIELDS, _SUBROWS, 128)
    exp_coarse = (coarse_rows(static), 128)
    if tuple(blocks.shape) != exp_blocks or tuple(coarse.shape) != exp_coarse:
        raise ValueError(
            f"RegionTables layout mismatch: blocks {tuple(blocks.shape)} / "
            f"coarse {tuple(coarse.shape)} vs kernel expectation "
            f"{exp_blocks} / {exp_coarse} (REGION_CELLS={REGION_CELLS}). "
            f"Rebuild the tables with build_region_tables in this process.")
    ray_spec = pl.BlockSpec((TILE_SUBLANES, TILE_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    coarse_spec = pl.BlockSpec(coarse.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    out_shape = (tiles * TILE_SUBLANES, TILE_LANES)
    n_in = 12 if shadow else 9
    n_out = 6 if shadow else 5
    inputs = [blocks, coarse,
              reshape(ox), reshape(oy), reshape(oz),
              reshape(dx), reshape(dy), reshape(dz),
              reshape(t_base), reshape(active.astype(jnp.int32)),
              reshape(ray_key)]
    if shadow:
        tgx, tgy, tgz = shadow_targets
        inputs += [reshape(tgx), reshape(tgy), reshape(tgz)]
    outs = pl.pallas_call(
        _tile_kernel(static, max_phases, steps_per_phase, needs_ignore,
                     stats, step_unroll, concurrent,
                     n_serve, sparse_roam, shadow),
        grid=(tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), coarse_spec]
        + [ray_spec] * n_in,
        out_specs=[ray_spec] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct(out_shape, jnp.int32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.int32),
            jax.ShapeDtypeStruct(out_shape, jnp.int32),
            jax.ShapeDtypeStruct(out_shape, jnp.int32),
        ] + ([jax.ShapeDtypeStruct(out_shape, jnp.int32)] if shadow else []),
        scratch_shapes=[
            pltpu.VMEM((n_serve, _N_FIELDS, _SUBROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((n_serve,)),
        ],
        interpret=interpret,
    )(*inputs)
    if shadow:
        found, t, ncode, addr, pending, occl = outs
    else:
        found, t, ncode, addr, pending = outs
    pend_flat = pending.reshape(n)
    out = dict(found=found.reshape(n) != 0, t=t.reshape(n),
               ncode=ncode.reshape(n), mat_addr=addr.reshape(n),
               # >= 0: phase budget ran out; -3: the stall guard handed
               # the lane to the compact retrace (see phase_wrap)
               unfinished=(pend_flat >= 0) | (pend_flat == -3),
               # stall-guard give-ups alone (round-5 verdict: surface the
               # guard's firing rate so drift on new scenes is visible)
               stalled=pend_flat == -3)
    if shadow:
        out["occluded"] = occl.reshape(n) != 0
    if stats:
        packed = pending.reshape(n)
        out["n_phase"] = packed // 100000
        out["n_step"] = packed % 100000
        out["unfinished"] = jnp.zeros(n, bool)
    return out


def compatible(static: GridStatic) -> bool:
    """Whether the region tracer can serve this grid: material addresses
    must fit the packed field ((window+1) << 6 in a signed int32)."""
    return static.brick_alloc * 64 < (1 << 30)


def block_permutation(rows: int, width: int):
    """Whether rays laid out row-major over a (rows, width) image can be
    re-tiled into TILE_SUBLANES x TILE_LANES pixel BLOCKS.

    Row-major flattening makes a ray tile a 1-pixel-tall, TILE-wide strip —
    at 75 deg fov that spans ~40 deg of ray directions, so the tile's lanes
    march wildly different region sequences and the per-phase step count is
    set by the most divergent lane (measured ~3x inflation). An 8x128 pixel
    block covers a ~0.3 x 5 deg bundle instead; lanes march nearly identical
    region sequences. The permutation is a reshape/transpose (layout copy,
    no gathers)."""
    return rows % TILE_SUBLANES == 0 and width % TILE_LANES == 0


def _to_blocks(a, rows: int, width: int):
    v = a.reshape(rows // TILE_SUBLANES, TILE_SUBLANES,
                  width // TILE_LANES, TILE_LANES)
    return v.transpose(0, 2, 1, 3).reshape(-1)


def _from_blocks(a, rows: int, width: int):
    v = a.reshape(rows // TILE_SUBLANES, width // TILE_LANES,
                  TILE_SUBLANES, TILE_LANES)
    return v.transpose(0, 2, 1, 3).reshape(-1)


def grid_hit_tiles(static: GridStatic, arrays: GridArrays, region_blocks,
                   ox, oy, oz, dx, dy, dz, active, ray_key=None,
                   max_phases: int = 64, steps_per_phase: int = 48,
                   needs_ignore: bool = False,
                   stats: bool = False, step_unroll: int = 2,
                   interpret: bool = False,
                   image_shape=None, concurrent: bool = False,
                   n_serve: int = _N_SERVE, sparse_roam: bool = False,
                   shadow_targets=None):
    """grid_hit-compatible wrapper over the region tracer (SoA outputs).

    Serves every ray class: pass `ray_key` (the per-ray refraction key —
    internal_reflection where ignore_type == MAT_DIELECTRIC, NaN otherwise)
    with needs_ignore=True for refracted bounce rays. Pads the wavefront to
    a TILE multiple internally. Output includes `unfinished` for lanes the
    phase budget could not retire (callers re-trace those on ops.trace).

    `image_shape=(rows, width)`: when the rays are row-major over an image
    whose dims divide the tile shape, lanes are re-tiled into coherent
    pixel BLOCKS for the trace and un-permuted on output (see
    block_permutation)."""
    n = ox.shape[0]
    blocked = (image_shape is not None
               and image_shape[0] * image_shape[1] == n
               and block_permutation(image_shape[0], image_shape[1]))
    img_pad = None
    if (image_shape is not None and not blocked
            and image_shape[0] * image_shape[1] == n):
        # Image dims don't divide the block shape: PAD the image up to the
        # next (TILE_SUBLANES, TILE_LANES) multiple with dead lanes (round
        # 5; replaces the strip-tiling demotion, a measured ~3-4x
        # slowdown). Dead lanes never vote/march; a fully-dead tile
        # retires in ~0 phases, so the overhead is bounded by the pad
        # fraction, e.g. 256x256 -> 264x256 = +3%.
        rows_i, width_i = int(image_shape[0]), int(image_shape[1])
        rows_p = _cdiv(rows_i, TILE_SUBLANES) * TILE_SUBLANES
        width_p = _cdiv(width_i, TILE_LANES) * TILE_LANES
        overhead = rows_p * width_p / n - 1.0
        if overhead > 0.5:
            # tiny/odd images (e.g. a 32x32 test render) would multiply
            # their lane count; a single divergent strip tile is cheaper
            # there — keep the old fallback and say so
            import warnings

            warnings.warn(
                f"tile tracer: image_shape={tuple(image_shape)} would pad "
                f"to ({rows_p}, {width_p}) pixel blocks (+{overhead:.0%} "
                f"dead lanes > 50%); falling back to 1-pixel-tall strip "
                f"tiles (~3-4x slower). Cheap sizes are height multiples "
                f"of {TILE_SUBLANES}, width multiples of {TILE_LANES}.",
                stacklevel=2)
            img_pad = None
        else:
            img_pad = (rows_i, width_i, rows_p, width_p)
    if img_pad is not None:
        rows_i, width_i, rows_p, width_p = img_pad

        def ipad(a, v=0.0):
            im = a.reshape(rows_i, width_i)
            im = jnp.pad(im, ((0, rows_p - rows_i), (0, width_p - width_i)),
                         constant_values=v)
            return im.reshape(-1)

        ox, oy, oz = ipad(ox), ipad(oy), ipad(oz)
        dx, dy, dz = ipad(dx, 1.0), ipad(dy), ipad(dz)
        active = ipad(active, False)
        if ray_key is not None:
            ray_key = ipad(ray_key, np.nan)
        if shadow_targets is not None:
            shadow_targets = tuple(ipad(a) for a in shadow_targets)
        n = rows_p * width_p
        image_shape = (rows_p, width_p)
        blocked = True
    elif (image_shape is not None and not blocked
          and image_shape[0] * image_shape[1] != n):
        # rows*width != lane count (row bands that split a pixel block,
        # ad-hoc wavefronts): genuine strip fallback — say so, it is a
        # measured ~3-4x slowdown (a 1-pixel-tall TILE-wide strip spans
        # ~40 deg of ray directions at 75 deg fov; the tile's phase count
        # is set by its most divergent lane).
        import warnings

        warnings.warn(
            f"tile tracer: image_shape={tuple(image_shape)} does not match "
            f"the lane count ({n}); falling back to 1-pixel-tall strip "
            f"tiles (~3-4x slower).", stacklevel=2)
    if blocked:
        rows_i, width_i = int(image_shape[0]), int(image_shape[1])

        def blk(a):
            return _to_blocks(a, rows_i, width_i)

        ox, oy, oz = blk(ox), blk(oy), blk(oz)
        dx, dy, dz = blk(dx), blk(dy), blk(dz)
        active = blk(active)
        if ray_key is not None:
            ray_key = blk(ray_key)
        if shadow_targets is not None:
            shadow_targets = tuple(blk(a) for a in shadow_targets)
    pad = (-n) % TILE

    def p(a, v=0.0):
        if pad == 0:
            return a
        return jnp.concatenate([a, jnp.full((pad,), v, a.dtype)])

    gx0, gy0, gz0 = (F(v) for v in static.min_point)
    gx1, gy1, gz1 = (F(v) for v in static.max_point)
    ix = jnp.where(dx == 0.0, F(1e12), F(1.0) / dx)
    iy = jnp.where(dy == 0.0, F(1e12), F(1.0) / dy)
    iz = jnp.where(dz == 0.0, F(1e12), F(1.0) / dz)
    tmin = jnp.maximum(jnp.minimum((gx0 - ox) * ix, (gx1 - ox) * ix),
                       jnp.maximum(jnp.minimum((gy0 - oy) * iy, (gy1 - oy) * iy),
                                   jnp.minimum((gz0 - oz) * iz, (gz1 - oz) * iz)))
    tmax = jnp.minimum(jnp.maximum((gx0 - ox) * ix, (gx1 - ox) * ix),
                       jnp.minimum(jnp.maximum((gy0 - oy) * iy, (gy1 - oy) * iy),
                                   jnp.maximum((gz0 - oz) * iz, (gz1 - oz) * iz)))
    t_base = jnp.maximum(F(1e-5), tmin)
    ok = active & (t_base <= tmax)

    out = trace_tiles_regions(
        static, region_blocks,
        p(ox), p(oy), p(oz), p(dx, 1.0), p(dy), p(dz),
        p(t_base), p(ok.astype(jnp.float32)).astype(jnp.bool_)
        if pad else ok,
        ray_key=None if ray_key is None else p(ray_key, np.nan),
        max_phases=max_phases, steps_per_phase=steps_per_phase,
        needs_ignore=needs_ignore, stats=stats,
        step_unroll=step_unroll, interpret=interpret,
        concurrent=concurrent, n_serve=n_serve, sparse_roam=sparse_roam,
        shadow_targets=None if shadow_targets is None
        else tuple(p(a) for a in shadow_targets))

    found = out["found"][:n]
    t = out["t"][:n]
    code = out["ncode"][:n]
    sign = jnp.where(code < 4, F(1.0), F(-1.0))
    axis = code & 3
    nx_ = jnp.where(axis == 0, sign, F(0.0))
    ny_ = jnp.where(axis == 1, sign, F(0.0))
    nz_ = jnp.where(axis == 2, sign, F(0.0))
    t_off = F(static.scale / _BD) * F(0.05)
    px = ox + dx * t + nx_ * t_off
    py = oy + dy * t + ny_ * t_off
    pz = oz + dz * t + nz_ * t_off
    addr = jnp.clip(out["mat_addr"][:n], 0,
                    arrays.material_indices.shape[0] - 1)
    index = arrays.material_indices[
        jnp.where(found, addr, 0)].astype(jnp.int32)
    res = dict(found=found, t=t, px=px, py=py, pz=pz,
               nx=nx_, ny=ny_, nz=nz_, index=index,
               unfinished=out["unfinished"][:n],
               stalled=out["stalled"][:n])
    if shadow_targets is not None:
        res["occluded"] = out["occluded"][:n]
    if stats:
        res["n_phase"] = out["n_phase"]
        res["n_step"] = out["n_step"]
    if blocked:
        res = {k: _from_blocks(v, rows_i, width_i) for k, v in res.items()}
        if img_pad is not None:
            r0, w0, rp, wp = img_pad
            res = {k: v.reshape(rp, wp)[:r0, :w0].reshape(-1)
                   for k, v in res.items()}
    return res
