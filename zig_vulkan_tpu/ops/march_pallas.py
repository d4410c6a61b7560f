"""Pallas tile-march kernel (experimental fast path).

The wavefront tracer in ops.trace carries its DDA state through HBM on
every `lax.while_loop` iteration (~100 bytes/ray/iteration), which bounds
frame time by HBM bandwidth. This kernel moves the hottest phase — marching
rays across *empty* grid cells until they reach a loaded cell — into a
Pallas kernel where:

- rays are tiled (TILE_S x 128 lanes per program) and ALL marching state
  lives in vector registers / VMEM for the whole loop (zero HBM churn);
- the scene's occupancy is a 1-bit-per-cell bitmap (statuses,
  State.zig:86-107) resident in VMEM (128KB for the default 1M-cell
  scene), looked up with a per-lane dynamic gather;
- the Chebyshev skip field (ops.trace._distance_field) rides in a second
  VMEM table so empty space is leapt, not stepped.

The kernel returns, per ray, the first loaded cell (or miss): the
surrounding wavefront then gathers that cell's record and runs the
gather-free brick phase. Used when `TraceConfig.use_pallas` is set and the
scene's bitmap fits VMEM; `interpret=True` keeps it testable on CPU.

Status: superseded by ops.trace_pallas (the full two-level kernel); both
are blocked on real TPUs of this generation because Mosaic only lowers
per-sublane 128-lane shuffles, not large-table dynamic gathers (measured —
see docs/DESIGN_NOTES.md). Kept as the minimal interpret-mode reference for
the round-2 shuffle-tree/binning kernels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.grid import GridStatic

F = jnp.float32

TILE_LANES = 128
TILE_SUBLANES = 8
TILE = TILE_SUBLANES * TILE_LANES


def _march_kernel(static: GridStatic, max_iters: int):
    dim_x, dim_y, dim_z = static.dims
    gx0, gy0, gz0 = (np.float32(v) for v in static.min_point)
    scale = np.float32(static.scale)

    def kernel(bitmap_ref, dist_ref, ox_ref, oy_ref, oz_ref,
               dx_ref, dy_ref, dz_ref, tmin_ref, act_ref,
               cell_ref, t_ref, nrm_ref, found_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        t_base = tmin_ref[:]
        act = act_ref[:] != 0

        ix = jnp.where(dx == 0.0, F(1e12), F(1.0) / dx)
        iy = jnp.where(dy == 0.0, F(1e12), F(1.0) / dy)
        iz = jnp.where(dz == 0.0, F(1e12), F(1.0) / dz)
        adx, ady, adz = jnp.abs(ix), jnp.abs(iy), jnp.abs(iz)
        stx = jnp.sign(dx).astype(jnp.int32)
        sty = jnp.sign(dy).astype(jnp.int32)
        stz = jnp.sign(dz).astype(jnp.int32)
        stxf, styf, stzf = stx.astype(F), sty.astype(F), stz.astype(F)
        inv_max_abs = F(1.0) / jnp.maximum(jnp.abs(dx),
                                           jnp.maximum(jnp.abs(dy), jnp.abs(dz)))

        def reinit(tb):
            t0 = tb + F(1e-4) * scale
            fx = (ox + dx * t0 - gx0) / scale
            fy = (oy + dy * t0 - gy0) / scale
            fz = (oz + dz * t0 - gz0) / scale
            sx = (stxf * (jnp.floor(fx) - fx) + (stxf * F(0.5) + F(0.5))) * adx
            sy = (styf * (jnp.floor(fy) - fy) + (styf * F(0.5) + F(0.5))) * ady
            sz = (stzf * (jnp.floor(fz) - fz) + (stzf * F(0.5) + F(0.5))) * adz
            return (sx, sy, sz, jnp.floor(fx).astype(jnp.int32),
                    jnp.floor(fy).astype(jnp.int32),
                    jnp.floor(fz).astype(jnp.int32))

        sx, sy, sz, lx, ly, lz = reinit(t_base)
        nax = jnp.where(stx < 0, F(1.0), F(-1.0))
        nay = jnp.where(sty < 0, F(1.0), F(-1.0))
        naz = jnp.where(stz < 0, F(1.0), F(-1.0))

        bitmap = bitmap_ref[:]
        dist_t = dist_ref[:]

        def body(_, st):
            running, tb, tv, sx, sy, sz, lx, ly, lz, ncode, fcell, ft, ffound = st
            in_b = ((lx >= 0) & (lx < dim_x) & (ly >= 0) & (ly < dim_y)
                    & (lz >= 0) & (lz < dim_z))
            alive = running & in_b
            cell = lx + dim_x * (lz + dim_z * ly)
            cc = jnp.clip(cell, 0, static.cells - 1)
            word = bitmap[cc // 32]                   # per-lane VMEM gather
            loaded = alive & (((word >> (cc % 32).astype(jnp.uint32))
                               & jnp.uint32(1)) == 1)
            dist = dist_t[cc]                          # per-lane VMEM gather

            fcell = jnp.where(loaded, cell, fcell)
            ft = jnp.where(loaded, tv + tb, ft)
            ffound = ffound | loaded
            running = alive & ~loaded

            do_skip = running & (dist >= 2)
            cur_t = tb + F(1e-4) * scale + tv
            new_tb = cur_t + (dist.astype(F) - F(1.0)) * scale * inv_max_abs
            tb = jnp.where(do_skip, new_tb, tb)
            rsx, rsy, rsz, rlx, rly, rlz = reinit(tb)

            stepping = running & ~do_skip
            ax = (sx < sy) & (sx < sz)
            ay = ~(sx < sy) & (sy < sz)
            az = ~(ax | ay)
            t_new = jnp.where(ax, sx, jnp.where(ay, sy, sz)) * scale
            sx = jnp.where(stepping & ax, sx + adx, sx)
            sy = jnp.where(stepping & ay, sy + ady, sy)
            sz = jnp.where(stepping & az, sz + adz, sz)
            lx = jnp.where(stepping & ax, lx + stx, lx)
            ly = jnp.where(stepping & ay, ly + sty, ly)
            lz = jnp.where(stepping & az, lz + stz, lz)
            tv = jnp.where(stepping, t_new, tv)
            ncode = jnp.where(
                stepping,
                jnp.where(ax, jnp.where(stx < 0, 1, 2),
                          jnp.where(ay, jnp.where(sty < 0, 3, 4),
                                    jnp.where(stz < 0, 5, 6))),
                ncode)

            sx = jnp.where(do_skip, rsx, sx)
            sy = jnp.where(do_skip, rsy, sy)
            sz = jnp.where(do_skip, rsz, sz)
            lx = jnp.where(do_skip, rlx, lx)
            ly = jnp.where(do_skip, rly, ly)
            lz = jnp.where(do_skip, rlz, lz)
            tv = jnp.where(do_skip, F(0.0), tv)

            return (running, tb, tv, sx, sy, sz, lx, ly, lz, ncode,
                    fcell, ft, ffound)

        zero = jnp.zeros_like(ox)
        izero = jnp.zeros(ox.shape, jnp.int32)
        st = (act, t_base, zero, sx, sy, sz, lx, ly, lz, izero,
              jnp.full(ox.shape, -1, jnp.int32), zero,
              jnp.zeros(ox.shape, jnp.bool_))
        st = jax.lax.fori_loop(0, max_iters, body, st)
        (_, tb, tv, _, _, _, _, _, _, ncode, fcell, ft, ffound) = st
        cell_ref[:] = fcell
        t_ref[:] = ft
        nrm_ref[:] = ncode
        found_ref[:] = ffound.astype(jnp.int32)

    return kernel


@partial(jax.jit, static_argnames=("static", "max_iters", "interpret"))
def march_to_loaded(static: GridStatic, statuses, dist_field,
                    ox, oy, oz, dx, dy, dz, t_base, active,
                    max_iters: int = 64, interpret: bool = False):
    """March each ray to its next loaded grid cell.

    Args:
      statuses: uint32[ceil(cells/32)] status bitmap (VMEM-resident).
      dist_field: int32[cells] Chebyshev skip distances.
      ox..dz: f32[N] ray SoA (directions normalized); N % 1024 == 0.
      t_base: f32[N] marching start offset (grid_t_min at first call).
      active: bool[N].

    Returns (cell int32[N] (-1 = none), t_rel f32[N] cursor t relative to
    returned t_base', normal code int32[N] (0=slab, 1..6 = +-x/y/z),
    found bool[N]).
    """
    n = ox.shape[0]
    assert n % TILE == 0, f"ray count {n} must be a multiple of {TILE}"
    tiles = n // TILE

    shape2 = (TILE_SUBLANES, TILE_LANES)

    def reshape(a):
        return a.reshape(tiles * TILE_SUBLANES, TILE_LANES)

    grid = (tiles,)
    ray_spec = pl.BlockSpec((TILE_SUBLANES, TILE_LANES),
                            lambda i: (i, 0), memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _march_kernel(static, max_iters),
        grid=grid,
        in_specs=[tbl_spec, tbl_spec] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((tiles * TILE_SUBLANES, TILE_LANES), jnp.int32),
            jax.ShapeDtypeStruct((tiles * TILE_SUBLANES, TILE_LANES), jnp.float32),
            jax.ShapeDtypeStruct((tiles * TILE_SUBLANES, TILE_LANES), jnp.int32),
            jax.ShapeDtypeStruct((tiles * TILE_SUBLANES, TILE_LANES), jnp.int32),
        ],
        interpret=interpret,
    )(statuses, dist_field,
      reshape(ox), reshape(oy), reshape(oz),
      reshape(dx), reshape(dy), reshape(dz),
      reshape(t_base), reshape(active.astype(jnp.int32)))
    cell, t_rel, ncode, found = (o.reshape(n) for o in out)
    return cell, t_rel, ncode, found != 0
