"""Pallas full tile tracer (the VMEM fast path).

The XLA wavefront tracer (ops.trace) re-reads its whole DDA carry from HBM
on every while_loop iteration; at 2M rays that is ~100 bytes/ray/iteration
of pure state churn. This kernel runs the complete two-level DDA per
1024-ray tile with every piece of marching state held in vector
registers/VMEM and the scene in VMEM lookup tables:

- `c2b`      uint32[cells]      cell -> brick slot, EMPTY sentinel
- `occ_lo/hi` uint32[brick_cap] 64 occupancy bits per brick
- `start`    int32[brick_cap]   material window starts
- `dist`     int32[cells]       Chebyshev empty-space skip field

Scope: rays with no dielectric-skip state (`ignore == MAT_NONE`) — primary
rays, sun shadow rays, and lambertian/metal bounces, i.e. the vast majority
of traversal work. Refracted rays (the reference's same-material skip rule,
brick_raytracer.comp:427, needs per-voxel material data mid-traversal) stay
on the XLA path.

The kernel returns (found, absolute hit t, normal code, material byte
address); the caller gathers the material byte and shades in XLA.

VMEM budget for the default 1M-cell scene: 4MB (c2b) + 4MB (dist, int32)
+ 3x active-brick tables. Scenes beyond the VMEM budget use the XLA path.
Per-lane dynamic gathers from VMEM are NOT lowered by Mosaic on the
measured TPU generation (only per-sublane 128-lane shuffles are; see
docs/DESIGN_NOTES.md), so this kernel runs in interpret mode only. It pins
the in-kernel traversal semantics for the round-2 plan: the same loop with
lookups rewritten as shuffle trees over region tables block-DMA'd via
PrefetchScalarGridSpec (both primitives hardware-validated at 1.2 G
lookups/s).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BRICK_DIMENSION, BRICK_WORDS
from ..core.grid import GridArrays, GridStatic

F = jnp.float32
_BD = BRICK_DIMENSION

TILE_LANES = 128
TILE_SUBLANES = 8
TILE = TILE_SUBLANES * TILE_LANES



def build_pallas_tables(static: GridStatic, arrays: GridArrays,
                        brick_cap: int | None = None):
    """Build the five VMEM tables (XLA precompute, cacheable per scene).

    brick_cap: static capacity for the per-brick tables (defaults to
    brick_alloc; pass a rounded-up active count to shrink VMEM).
    """
    from .trace import _distance_field

    cap = int(brick_cap or static.brick_alloc)
    cells = jnp.arange(static.cells, dtype=jnp.uint32)
    bits = arrays.statuses[(cells // 32).astype(jnp.int32)]
    loaded = ((bits >> (cells % 32)) & jnp.uint32(1)) == 1
    c2b = jnp.where(loaded, arrays.indices,
                    jnp.uint32(0xFFFFFFFF)).astype(jnp.int32)
    occ2 = arrays.occupancy.reshape(static.brick_alloc, BRICK_WORDS)
    occ_lo = occ2[:cap, 0].astype(jnp.int32)
    occ_hi = occ2[:cap, 1].astype(jnp.int32)
    start = (arrays.start_indices[:cap] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    dist = _distance_field(static, loaded)
    return dict(c2b=c2b, occ_lo=occ_lo, occ_hi=occ_hi, start=start,
                dist=dist.astype(jnp.int32))


def _trace_kernel(static: GridStatic, max_iters: int, use_skip: bool):
    dim_x, dim_y, dim_z = static.dims
    gx0, gy0, gz0 = (np.float32(v) for v in static.min_point)
    scale = np.float32(static.scale)
    voxel_scale = np.float32(static.scale / _BD)

    def kernel(c2b_ref, occ_lo_ref, occ_hi_ref, start_ref, dist_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tbase_ref, act_ref,
               found_ref, t_ref, ncode_ref, addr_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        act = act_ref[:] != 0
        t_base0 = tbase_ref[:]

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

        def grid_init(tb):
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

        # slab entry normal code (AdvNormIntersect semantics come from the
        # caller via tbase; the entry-face code is recomputed here)
        tlx, tux = (gx0 - ox) * ix, (np.float32(static.max_point[0]) - ox) * ix
        tly, tuy = (gy0 - oy) * iy, (np.float32(static.max_point[1]) - oy) * iy
        tlz, tuz = (gz0 - oz) * iz, (np.float32(static.max_point[2]) - oz) * iz
        tminx = jnp.minimum(tlx, tux)
        tminy = jnp.minimum(tly, tuy)
        tminz = jnp.minimum(tlz, tuz)
        is_y = (tminy > tminx) & (tminy > tminz)
        is_z = (tminz > tminx) & (tminz > tminy)
        is_x = ~(is_y | is_z)
        slab_code = jnp.where(
            is_x, jnp.where(ix >= 0, 0, 4),
            jnp.where(is_y, jnp.where(iy >= 0, 1, 5),
                      jnp.where(iz >= 0, 2, 6))).astype(jnp.int32)

        sx0, sy0, sz0, lx0, ly0, lz0 = grid_init(t_base0)

        c2b = c2b_ref[:]
        occ_lo_t = occ_lo_ref[:]
        occ_hi_t = occ_hi_ref[:]
        start_t = start_ref[:]
        dist_t = dist_ref[:]

        zf = jnp.zeros_like(ox)
        zi = jnp.zeros(ox.shape, jnp.int32)

        def body(_, st):
            (running, in_brick, tb, tv, sx, sy, sz, lx, ly, lz,
             bsx, bsy, bsz, blx, bly, blz, b_t, entry_t,
             occ_lo, occ_hi, mat_start, ltm, ncode,
             found, out_t, out_addr) = st

            # ---- grid phase ----
            g = running & ~in_brick
            in_b_g = ((lx >= 0) & (lx < dim_x) & (ly >= 0) & (ly < dim_y)
                      & (lz >= 0) & (lz < dim_z))
            g_miss = g & ~in_b_g
            g_act = g & in_b_g
            cell = lx + dim_x * (lz + dim_z * ly)
            cc = jnp.clip(cell, 0, static.cells - 1)
            brick = c2b[cc]                       # per-lane VMEM gather
            enter = g_act & (brick != -1)
            bc = jnp.clip(brick, 0, occ_lo_t.shape[0] - 1)
            occ_lo = jnp.where(enter, occ_lo_t[bc], occ_lo)
            occ_hi = jnp.where(enter, occ_hi_t[bc], occ_hi)
            mat_start = jnp.where(enter, start_t[bc], mat_start)

            if use_skip:
                dist = dist_t[cc]
                do_skip = g_act & ~enter & (dist >= 2)
                cur_t = tb + F(1e-4) * scale + tv
                new_tb = cur_t + (dist.astype(F) - F(1.0)) * scale * inv_max_abs
                tb = jnp.where(do_skip, new_tb, tb)
                rsx, rsy, rsz, rlx, rly, rlz = grid_init(tb)
            else:
                do_skip = jnp.zeros_like(g_act)

            bminx = lx.astype(F) * scale + gx0
            bminy = ly.astype(F) * scale + gy0
            bminz = lz.astype(F) * scale + gz0
            new_gt = tv + tb + F(0.01) * scale
            entry_t = jnp.where(enter, new_gt, entry_t)
            # grid_t_max bound for the brick loop: rays exit bricks via
            # bounds; keep the reference's t budget using the slab max
            tmax_all = jnp.minimum(jnp.maximum(tlx, tux),
                                   jnp.minimum(jnp.maximum(tly, tuy),
                                               jnp.maximum(tlz, tuz)))
            ltm = jnp.where(enter, tmax_all - entry_t, ltm)

            et = jnp.where(enter, entry_t, F(0.0))
            bfx = (ox + dx * et - bminx) / voxel_scale
            bfy = (oy + dy * et - bminy) / voxel_scale
            bfz = (oz + dz * et - bminz) / voxel_scale
            bsx = jnp.where(enter, (stxf * (jnp.floor(bfx) - bfx)
                                    + (stxf * F(0.5) + F(0.5))) * adx, bsx)
            bsy = jnp.where(enter, (styf * (jnp.floor(bfy) - bfy)
                                    + (styf * F(0.5) + F(0.5))) * ady, bsy)
            bsz = jnp.where(enter, (stzf * (jnp.floor(bfz) - bfz)
                                    + (stzf * F(0.5) + F(0.5))) * adz, bsz)
            blx = jnp.where(enter, jnp.floor(bfx).astype(jnp.int32), blx)
            bly = jnp.where(enter, jnp.floor(bfy).astype(jnp.int32), bly)
            blz = jnp.where(enter, jnp.floor(bfz).astype(jnp.int32), blz)
            b_t = jnp.where(enter, F(0.0), b_t)
            in_brick = in_brick | enter

            # ---- brick phase ----
            b = running & in_brick
            in_b_b = ((blx >= 0) & (blx < _BD) & (bly >= 0) & (bly < _BD)
                      & (blz >= 0) & (blz < _BD) & (b_t <= ltm))
            b_exit = b & ~in_b_b
            b_act = b & in_b_b
            vi = blx + _BD * (blz + _BD * bly)
            viu = jnp.clip(vi, 0, _BD ** 3 - 1).astype(jnp.uint32)
            occ_word = jnp.where(viu < 32, occ_lo, occ_hi).astype(jnp.uint32)
            occ_bit = (occ_word >> (viu % 32)) & jnp.uint32(1)
            real_hit = b_act & (occ_bit == 1)

            t_off = voxel_scale * F(0.05)
            hit_t = entry_t + b_t - t_off
            found = found | real_hit
            out_t = jnp.where(real_hit, hit_t, out_t)
            out_addr = jnp.where(real_hit, mat_start + vi, out_addr)

            # ---- advance ----
            brick_steps = b_act & ~real_hit
            grid_steps = ((g_act & ~enter) | b_exit) & ~do_skip
            running = running & ~g_miss & ~real_hit
            in_brick = in_brick & ~b_exit

            csx = jnp.where(brick_steps, bsx, sx)
            csy = jnp.where(brick_steps, bsy, sy)
            csz = jnp.where(brick_steps, bsz, sz)
            ax = (csx < csy) & (csx < csz)
            ay = ~(csx < csy) & (csy < csz)
            az = ~(ax | ay)
            stepping = brick_steps | grid_steps
            step_scale = jnp.where(brick_steps, voxel_scale, scale)
            t_new = jnp.where(ax, csx, jnp.where(ay, csy, csz)) * step_scale

            bsx = jnp.where(brick_steps & ax, bsx + adx, bsx)
            bsy = jnp.where(brick_steps & ay, bsy + ady, bsy)
            bsz = jnp.where(brick_steps & az, bsz + adz, bsz)
            blx = jnp.where(brick_steps & ax, blx + stx, blx)
            bly = jnp.where(brick_steps & ay, bly + sty, bly)
            blz = jnp.where(brick_steps & az, blz + stz, blz)
            b_t = jnp.where(brick_steps, t_new, b_t)

            sx = jnp.where(grid_steps & ax, sx + adx, sx)
            sy = jnp.where(grid_steps & ay, sy + ady, sy)
            sz = jnp.where(grid_steps & az, sz + adz, sz)
            lx = jnp.where(grid_steps & ax, lx + stx, lx)
            ly = jnp.where(grid_steps & ay, ly + sty, ly)
            lz = jnp.where(grid_steps & az, lz + stz, lz)
            tv = jnp.where(grid_steps, t_new, tv)

            if use_skip:
                sx = jnp.where(do_skip, rsx, sx)
                sy = jnp.where(do_skip, rsy, sy)
                sz = jnp.where(do_skip, rsz, sz)
                lx = jnp.where(do_skip, rlx, lx)
                ly = jnp.where(do_skip, rly, ly)
                lz = jnp.where(do_skip, rlz, lz)
                tv = jnp.where(do_skip, F(0.0), tv)

            ncode = jnp.where(
                stepping, jnp.where(ax, code_x, jnp.where(ay, code_y, code_z)),
                ncode)

            return (running, in_brick, tb, tv, sx, sy, sz, lx, ly, lz,
                    bsx, bsy, bsz, blx, bly, blz, b_t, entry_t,
                    occ_lo, occ_hi, mat_start, ltm, ncode,
                    found, out_t, out_addr)

        st = (act, jnp.zeros(ox.shape, jnp.bool_), t_base0, zf,
              sx0, sy0, sz0, lx0, ly0, lz0,
              zf, zf, zf, zi, zi, zi, zf, zf,
              zi, zi, zi, zf, slab_code,
              jnp.zeros(ox.shape, jnp.bool_), zf, zi)
        st = jax.lax.fori_loop(0, max_iters, body, st)
        found = st[23]
        found_ref[:] = found.astype(jnp.int32)
        t_ref[:] = st[24]
        ncode_ref[:] = st[22]
        addr_ref[:] = st[25]

    return kernel


@partial(jax.jit, static_argnames=("static", "max_iters", "use_skip",
                                   "interpret"))
def trace_tiles(static: GridStatic, tables: dict,
                ox, oy, oz, dx, dy, dz, t_base, active,
                max_iters: int = 256, use_skip: bool = True,
                interpret: bool = False):
    """Full two-level DDA in Pallas for ignore-free rays.

    ox..dz f32[N] (normalized), t_base f32[N] = slab-clamped grid_t_min,
    active bool[N]; N % 1024 == 0.

    Returns dict(found bool[N], t f32[N] absolute hit t, ncode int32[N],
    mat_addr int32[N]).
    """
    n = ox.shape[0]
    assert n % TILE == 0, f"ray count {n} must be a multiple of {TILE}"
    tiles = n // TILE

    def reshape(a):
        return a.reshape(tiles * TILE_SUBLANES, TILE_LANES)

    ray_spec = pl.BlockSpec((TILE_SUBLANES, TILE_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = (tiles * TILE_SUBLANES, TILE_LANES)

    found, t, ncode, addr = pl.pallas_call(
        _trace_kernel(static, max_iters, use_skip),
        grid=(tiles,),
        in_specs=[tbl_spec] * 5 + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct(out_shape, jnp.int32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.int32),
            jax.ShapeDtypeStruct(out_shape, jnp.int32),
        ],
        interpret=interpret,
    )(tables["c2b"], tables["occ_lo"], tables["occ_hi"], tables["start"],
      tables["dist"],
      reshape(ox), reshape(oy), reshape(oz),
      reshape(dx), reshape(dy), reshape(dz),
      reshape(t_base), reshape(active.astype(jnp.int32)))
    return dict(found=found.reshape(n) != 0, t=t.reshape(n),
                ncode=ncode.reshape(n), mat_addr=addr.reshape(n))


def grid_hit_pallas(static: GridStatic, arrays: GridArrays, tables: dict,
                    origin, direction, active, max_iters: int = 256,
                    use_skip: bool = True, interpret: bool = False):
    """Drop-in grid_hit for ignore-free rays: slab setup + Pallas DDA +
    material resolution. Returns the same record dict as ops.trace.grid_hit.
    """
    ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]
    dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]

    ix = jnp.where(dx == 0.0, F(1e12), F(1.0) / dx)
    iy = jnp.where(dy == 0.0, F(1e12), F(1.0) / dy)
    iz = jnp.where(dz == 0.0, F(1e12), F(1.0) / dz)
    gx0, gy0, gz0 = (F(v) for v in static.min_point)
    gx1, gy1, gz1 = (F(v) for v in static.max_point)
    tlx, tux = (gx0 - ox) * ix, (gx1 - ox) * ix
    tly, tuy = (gy0 - oy) * iy, (gy1 - oy) * iy
    tlz, tuz = (gz0 - oz) * iz, (gz1 - oz) * iz
    tmin = jnp.maximum(jnp.minimum(tlx, tux),
                       jnp.maximum(jnp.minimum(tly, tuy),
                                   jnp.minimum(tlz, tuz)))
    tmax = jnp.minimum(jnp.maximum(tlx, tux),
                       jnp.minimum(jnp.maximum(tly, tuy),
                                   jnp.maximum(tlz, tuz)))
    grid_t_min = jnp.maximum(F(1e-5), tmin)
    slab_ok = grid_t_min <= tmax

    out = trace_tiles(static, tables, ox, oy, oz, dx, dy, dz,
                      grid_t_min, active & slab_ok,
                      max_iters=max_iters, use_skip=use_skip,
                      interpret=interpret)

    code = out["ncode"]
    sign = jnp.where(code < 4, F(1.0), F(-1.0))
    axis = code & 3
    nx = jnp.where(axis == 0, sign, F(0.0))
    ny = jnp.where(axis == 1, sign, F(0.0))
    nz = jnp.where(axis == 2, sign, F(0.0))
    t_off = F(static.scale / _BD) * F(0.05)
    px = ox + dx * out["t"] + nx * t_off
    py = oy + dy * out["t"] + ny * t_off
    pz = oz + dz * out["t"] + nz * t_off
    addr = jnp.clip(out["mat_addr"], 0, arrays.material_indices.shape[0] - 1)
    index = arrays.material_indices[addr].astype(jnp.int32)
    return dict(found=out["found"], t=out["t"],
                point=jnp.stack([px, py, pz], axis=-1),
                normal=jnp.stack([nx, ny, nz], axis=-1),
                index=index)
