"""TPU wavefront ray tracer (the core compute path).

A ground-up JAX re-design of the reference's per-pixel megakernel
(reference: assets/shaders/brick_raytracer.comp). The GPU kernel runs one
scalar thread per pixel with divergent nested while-loops; on TPU the whole
frame is traced as a *wavefront*: every ray is one lane of large arrays, and
the two nested DDA loops (grid level, brick_raytracer.comp:313-373; brick
level, :407-468) are flattened into a single `lax.while_loop` state machine
with a per-ray `level` flag — each iteration advances every active ray by
exactly one DDA step at its current level. This keeps all work in wide
vector ops (VPU-friendly) with scene-table gathers as the only irregular
access, and it is the standard stackless formulation of multi-level
traversal re-expressed functionally.

Semantics follow the GLSL bit-for-bit where float evaluation allows (the
epsilon offsets :287/:332/:431-433, the DDA tie-breaking order :345-372, the
same-dielectric skip :427, `color/(color+1)` tone map :264, sqrt gamma
:176); see zig_vulkan_tpu.oracle.cpu_tracer for the independent CPU oracle
these semantics are tested against.

Sharding: every per-ray array is embarrassingly parallel along the ray axis
and the scene tables are replicated, so the same function runs single-chip
or sharded over a device mesh (see zig_vulkan_tpu.parallel.mesh).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BRICK_DIMENSION, BRICK_WORDS, TraceConfig
from ..core.grid import GridArrays, GridStatic
from ..core.materials import (
    MAT_DIELECTRIC,
    MAT_LAMBERTIAN,
    MAT_METAL,
    MAT_NONE,
    MaterialTable,
)
from . import rng

F = jnp.float32
_BD = BRICK_DIMENSION


@dataclasses.dataclass
class MaterialsDevice:
    """SoA material table on device (see core.materials)."""

    mtype: Any       # int32[256]
    albedo: Any      # f32[256, 3]
    type_data: Any   # f32[256]


jax.tree_util.register_dataclass(
    MaterialsDevice, data_fields=["mtype", "albedo", "type_data"], meta_fields=[]
)


def materials_to_device(table: MaterialTable) -> MaterialsDevice:
    return MaterialsDevice(
        mtype=jnp.asarray(table.mtype, dtype=jnp.int32),
        albedo=jnp.asarray(table.albedo, dtype=F),
        type_data=jnp.asarray(table.type_data, dtype=F),
    )


def _normalize(v):
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))


def _reflect(d, n):
    return d - F(2.0) * jnp.sum(d * n, axis=-1, keepdims=True) * n


def safe_inverse(v):
    """GLSL safeInverse (brick_raytracer.comp:267-268)."""
    return jnp.where(v == 0.0, F(1e12), F(1.0) / v)


def _index_of_max_component(v):
    """GLSL indexOfMaxComponent (brick_raytracer.comp:501-503)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return (((y > x) & (y > z)).astype(jnp.int32)
            + 2 * ((z > x) & (z > y)).astype(jnp.int32))


def _dda_step(side, local, normal_axis, delta, step_i, scale):
    """One 3D-DDA advance for every lane (brick_raytracer.comp:344-372).

    Returns (t_value, side', local', normal')."""
    sx, sy, sz = side[:, 0], side[:, 1], side[:, 2]
    axis = jnp.where(sx < sy, jnp.where(sx < sz, 0, 2), jnp.where(sy < sz, 1, 2))
    onehot = axis[:, None] == jnp.arange(3)[None, :]
    t_value = jnp.sum(jnp.where(onehot, side, 0.0), axis=-1) * scale
    side = side + jnp.where(onehot, delta, 0.0)
    local = local + jnp.where(onehot, step_i, 0)
    normal = jnp.where(onehot, normal_axis, 0.0)
    return t_value, side, local, normal


@partial(jax.jit, static_argnames=("static", "max_steps"))
def grid_hit(static: GridStatic, arrays: GridArrays, mats: MaterialsDevice,
             origin, direction, t_max, ignore_type, internal_reflection,
             active, max_steps: int = 768):
    """Two-level DDA traversal for a wavefront of rays.

    Equivalent to GLSL GridHit + BrickHit (brick_raytracer.comp:271-471),
    flattened into one while_loop with a per-ray level flag.

    Args:
      origin, direction: f32[N, 3] (direction normalized).
      t_max: f32[] scalar upper bound (the GLSL `t_max` argument).
      ignore_type, internal_reflection: per-ray dielectric skip state.
      active: bool[N] lanes to trace.
      max_steps: static bound on total DDA steps (grid + brick) per ray.

    Returns dict(found, t, point, normal, index).
    """
    n = origin.shape[0]
    g_min = jnp.asarray(static.min_point, dtype=F)
    scale = F(static.scale)
    voxel_scale = F(static.scale / _BD)
    dims = jnp.asarray(static.dims, dtype=jnp.int32)
    t_min = F(1e-5)

    inv_dir = safe_inverse(direction)

    # slab entry (AdvNormIntersect, brick_raytracer.comp:522-536)
    t_lower = (g_min - origin) * inv_dir
    t_upper = (jnp.asarray(static.max_point, dtype=F) - origin) * inv_dir
    t_mins = jnp.minimum(t_lower, t_upper)
    t_maxes = jnp.maximum(t_lower, t_upper)
    midx = _index_of_max_component(t_mins)
    onehot0 = midx[:, None] == jnp.arange(3)[None, :]
    normal0 = jnp.where(
        onehot0, jnp.sign(jnp.sum(jnp.where(onehot0, inv_dir, 0.0), -1))[:, None], 0.0
    )
    grid_t_min = jnp.maximum(t_min, jnp.sum(jnp.where(onehot0, t_mins, 0.0), -1))
    grid_t_max = jnp.minimum(t_max, jnp.min(t_maxes, axis=-1))
    slab_ok = grid_t_min <= grid_t_max

    ray_delta = jnp.abs(inv_dir)
    ray_step = jnp.sign(direction).astype(jnp.int32)
    normal_axis = jnp.where(ray_step < 0, F(1.0), F(-1.0))

    # grid-level DDA init (brick_raytracer.comp:287-311)
    global_t0 = grid_t_min + F(1e-4) * scale
    fpos = (origin + direction * global_t0[:, None] - g_min) / scale
    side0 = ((ray_step * (jnp.floor(fpos) - fpos)
              + (ray_step * F(0.5) + F(0.5))) * ray_delta)
    local0 = jnp.floor(fpos).astype(jnp.int32)

    zeros3 = jnp.zeros((n, 3), dtype=F)
    state = dict(
        running=active & slab_ok,
        level=jnp.zeros(n, dtype=jnp.int32),
        local=local0,
        side=side0,
        t_value=jnp.zeros(n, dtype=F),
        normal=normal0,
        global_t=global_t0,
        b_local=jnp.zeros((n, 3), dtype=jnp.int32),
        b_side=zeros3,
        b_t=jnp.zeros(n, dtype=F),
        entry_t=jnp.zeros(n, dtype=F),
        brick_index=jnp.zeros(n, dtype=jnp.int32),
        brick_min=zeros3,
        local_t_max=jnp.zeros(n, dtype=F),
        found=jnp.zeros(n, dtype=jnp.bool_),
        out_t=jnp.zeros(n, dtype=F),
        out_point=zeros3,
        out_index=jnp.zeros(n, dtype=jnp.int32),
        step=jnp.int32(0),
    )

    def cond(s):
        return jnp.any(s["running"]) & (s["step"] < max_steps)

    def body(s):
        running = s["running"]
        level = s["level"]

        # ---------------- grid level: cell check ----------------
        g = running & (level == 0)
        in_b_g = (jnp.all(s["local"] >= 0, axis=-1)
                  & jnp.all(s["local"] < dims, axis=-1)
                  & (s["global_t"] <= t_max))
        g_miss = g & ~in_b_g
        g_act = g & in_b_g

        cell = (s["local"][:, 0]
                + static.dim_x * (s["local"][:, 2] + static.dim_z * s["local"][:, 1]))
        cell_c = jnp.clip(cell, 0, static.cells - 1)
        status = (arrays.statuses[cell_c // 32]
                  >> (cell_c % 32).astype(jnp.uint32)) & jnp.uint32(1)
        enter = g_act & (status == 1)

        brick_min = jnp.where(enter[:, None],
                              s["local"].astype(F) * scale + g_min, s["brick_min"])
        new_global_t = s["t_value"] + grid_t_min + F(0.01) * scale
        entry_t = jnp.where(enter, new_global_t, s["entry_t"])
        global_t = jnp.where(enter, new_global_t, s["global_t"])
        brick_index = jnp.where(
            enter, arrays.indices[cell_c].astype(jnp.int32), s["brick_index"])

        # brick-level DDA init on entry (brick_raytracer.comp:389-405)
        fpos_b = (origin + direction * entry_t[:, None] - brick_min) / voxel_scale
        b_side_new = ((ray_step * (jnp.floor(fpos_b) - fpos_b)
                       + (ray_step * F(0.5) + F(0.5))) * ray_delta)
        b_side = jnp.where(enter[:, None], b_side_new, s["b_side"])
        b_local = jnp.where(enter[:, None],
                            jnp.floor(fpos_b).astype(jnp.int32), s["b_local"])
        b_t = jnp.where(enter, F(0.0), s["b_t"])
        local_t_max = jnp.where(enter, grid_t_max - entry_t, s["local_t_max"])
        level = jnp.where(enter, 1, level)

        # ---------------- brick level: voxel check ----------------
        b = (running & (level == 1))  # includes lanes that just entered
        in_b_b = (jnp.all(b_local >= 0, axis=-1)
                  & jnp.all(b_local < _BD, axis=-1)
                  & (b_t <= local_t_max))
        b_exit = b & ~in_b_b       # brick exhausted -> grid step this iter
        b_act = b & in_b_b

        voxel_index = (b_local[:, 0] + _BD * (b_local[:, 2] + _BD * b_local[:, 1]))
        vi = jnp.clip(voxel_index, 0, _BD ** 3 - 1)
        brick_c = jnp.clip(brick_index, 0, static.brick_alloc - 1)
        occ_word = arrays.occupancy[brick_c * BRICK_WORDS + vi // 32]
        occ = (occ_word >> (vi % 32).astype(jnp.uint32)) & jnp.uint32(1)
        vhit = b_act & (occ == 1)

        start = (arrays.start_indices[brick_c] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        mat_addr = jnp.clip(start + vi, 0, arrays.material_indices.shape[0] - 1)
        mat_idx = arrays.material_indices[mat_addr].astype(jnp.int32)
        # same-material skip (brick_raytracer.comp:427)
        ignore = ((mats.mtype[mat_idx] == ignore_type)
                  & (internal_reflection == mats.type_data[mat_idx]))
        real_hit = vhit & ~ignore

        t_off = voxel_scale * F(0.05)
        hit_t = entry_t + b_t - t_off
        hit_point = origin + direction * hit_t[:, None] + s["normal"] * t_off

        found = s["found"] | real_hit
        out_t = jnp.where(real_hit, hit_t, s["out_t"])
        out_point = jnp.where(real_hit[:, None], hit_point, s["out_point"])
        out_index = jnp.where(real_hit, mat_idx, s["out_index"])

        # ---------------- advance ----------------
        brick_steps = b_act & ~real_hit       # empty voxel or ignored material
        grid_steps = (g_act & ~enter) | b_exit
        running = running & ~g_miss & ~real_hit
        level = jnp.where(b_exit, 0, level)

        bt_new, b_side2, b_local2, b_normal = _dda_step(
            b_side, b_local, normal_axis, ray_delta, ray_step, voxel_scale)
        b_t = jnp.where(brick_steps, bt_new, b_t)
        b_side = jnp.where(brick_steps[:, None], b_side2, b_side)
        b_local = jnp.where(brick_steps[:, None], b_local2, b_local)

        gt_new, g_side2, g_local2, g_normal = _dda_step(
            s["side"], s["local"], normal_axis, ray_delta, ray_step, scale)
        t_value = jnp.where(grid_steps, gt_new, s["t_value"])
        side = jnp.where(grid_steps[:, None], g_side2, s["side"])
        local = jnp.where(grid_steps[:, None], g_local2, s["local"])

        normal = jnp.where(brick_steps[:, None], b_normal,
                           jnp.where(grid_steps[:, None], g_normal, s["normal"]))

        return dict(
            running=running, level=level, local=local, side=side,
            t_value=t_value, normal=normal, global_t=global_t,
            b_local=b_local, b_side=b_side, b_t=b_t, entry_t=entry_t,
            brick_index=brick_index, brick_min=brick_min,
            local_t_max=local_t_max, found=found, out_t=out_t,
            out_point=out_point, out_index=out_index, step=s["step"] + 1,
        )

    s = jax.lax.while_loop(cond, body, state)
    return dict(found=s["found"], t=s["out_t"], point=s["out_point"],
                normal=s["normal"], index=s["out_index"])


def transmission_direction(n1, n2, ray_dir, normal):
    """Bec's-method refraction (brick_raytracer.comp:564-574)."""
    eta = n1 / n2
    c1 = -jnp.sum(ray_dir * normal, axis=-1)
    w = eta * c1
    c2m = (w - eta) * (w + eta)
    should = c2m >= F(-1.0)
    refrac = (eta[:, None] * ray_dir
              + (w - jnp.sqrt(jnp.maximum(F(1.0) + c2m, 0.0)))[:, None] * normal)
    return should, refrac


def background_color(direction):
    """GLSL BackgroundColor (brick_raytracer.comp:197-201)."""
    t = F(0.5) * (direction[:, 1] + F(1.0))
    white = jnp.ones(3, dtype=F)
    blue = jnp.asarray([0.5, 0.7, 1.0], dtype=F)
    return (F(1.0) - t)[:, None] * white + t[:, None] * blue


def ray_color(static: GridStatic, arrays: GridArrays, mats: MaterialsDevice,
              origin, direction, max_bounce: int,
              sun_position, sun_enabled: bool, sun_color, sun_radius,
              max_steps: int = 768):
    """Path-traced radiance for a wavefront (RayColor,
    brick_raytracer.comp:203-265). `max_bounce` and `sun_enabled` are static.
    """
    n = origin.shape[0]
    color = jnp.zeros((n, 3), dtype=F)
    cur_origin = origin
    cur_dir = _normalize(direction)
    internal_refl = jnp.ones(n, dtype=F)
    ignore_type = jnp.full(n, MAT_NONE, dtype=jnp.int32)
    loop_count = jnp.zeros(n, dtype=jnp.int32)
    bouncing = jnp.ones(n, dtype=jnp.bool_)
    inf = F(jnp.inf)

    for _ in range(max_bounce):
        hits = grid_hit(static, arrays, mats, cur_origin, cur_dir, inf,
                        ignore_type, internal_refl, bouncing, max_steps)
        active = bouncing & hits["found"]

        mat_idx = hits["index"]
        mtype = mats.mtype[mat_idx]
        attenuation = mats.albedo[mat_idx]
        type_data = mats.type_data[mat_idx]
        known = mtype <= MAT_DIELECTRIC
        loop_count = loop_count + (active & known).astype(jnp.int32)

        point = hits["point"]
        normal = hits["normal"]
        co = jnp.stack([point[:, 0] + point[:, 2],
                        point[:, 1] + point[:, 2]], axis=-1)

        # lambertian (brick_raytracer.comp:539-544)
        lam_dir = _normalize(normal + rng.rand_vec3_range(co, -0.4, 0.4, xp=jnp))

        # metal (brick_raytracer.comp:546-551)
        fuzz = type_data
        reflected = _reflect(cur_dir, normal)
        met_dir = _normalize(reflected + rng.rand_vec3_range(co, -fuzz, fuzz, xp=jnp))
        met_ok = jnp.sum(met_dir * normal, axis=-1) > 0

        # dielectric (brick_raytracer.comp:576-596)
        d_normal = _normalize(normal + rng.rand_vec3_range(co, -0.05, 0.05, xp=jnp))
        ir = type_data
        should_refract, refrac_dir = transmission_direction(
            ir, internal_refl, cur_dir, d_normal)
        do_refract = should_refract & (rng.rand3(point, xp=jnp) > F(0.5))
        die_dir = _normalize(jnp.where(do_refract[:, None], refrac_dir,
                                       _reflect(cur_dir, d_normal)))

        is_lam = mtype == MAT_LAMBERTIAN
        is_met = mtype == MAT_METAL
        is_die = mtype == MAT_DIELECTRIC
        scattered_dir = jnp.where(is_lam[:, None], lam_dir,
                                  jnp.where(is_met[:, None], met_dir, die_dir))
        result = jnp.where(is_lam, True,
                           jnp.where(is_met, met_ok, is_die))
        new_ignore = jnp.where(is_die & do_refract, MAT_DIELECTRIC, MAT_NONE
                               ).astype(jnp.int32)
        new_internal = jnp.where(is_die & do_refract, ir, F(1.0))

        if sun_enabled:
            sco = jnp.stack([cur_dir[:, 0] + cur_dir[:, 2],
                             cur_dir[:, 1] + cur_dir[:, 2]], axis=-1)
            sun_sample = sun_position + rng.rand_vec3_range(
                sco, -sun_radius, sun_radius, xp=jnp)
            shadow_dir = _normalize(sun_sample - point)
            sh = grid_hit(static, arrays, mats, point, shadow_dir, inf,
                          jnp.full(n, MAT_NONE, dtype=jnp.int32),
                          jnp.ones(n, dtype=F), active, max_steps)
            lit = active & ~sh["found"]
            color = color + jnp.where(lit[:, None], attenuation * sun_color, 0.0)
        else:
            color = color + jnp.where(active[:, None], attenuation, 0.0)

        bouncing = active & result
        cur_origin = jnp.where(active[:, None], point, cur_origin)
        cur_dir = jnp.where(bouncing[:, None], scattered_dir, cur_dir)
        internal_refl = jnp.where(active, new_internal, internal_refl)
        ignore_type = jnp.where(active, new_ignore, ignore_type)

    never_hit = loop_count == 0
    bg_scale = sun_color if sun_enabled else jnp.ones(3, dtype=F)
    color = color + jnp.where(never_hit[:, None],
                              background_color(cur_dir) * bg_scale, 0.0)
    return color / (color + F(1.0))


def camera_vectors(camera_device) -> dict:
    """Extract the traced camera basis (the push-constant payload,
    Camera.zig:183-193) as a pytree of f32 vectors. Image size / spp /
    max_bounce stay host-side statics (they change shapes/loop counts)."""
    d = camera_device
    return dict(
        horizontal=jnp.asarray(d.horizontal, dtype=F),
        vertical=jnp.asarray(d.vertical, dtype=F),
        lower_left_corner=jnp.asarray(d.lower_left_corner, dtype=F),
        origin=jnp.asarray(d.origin, dtype=F),
    )


def camera_rays(cam: dict, width: int, height: int, sample_index: int,
                row0=0, rows: int | None = None):
    """Per-pixel jittered camera rays (kernel main,
    brick_raytracer.comp:162-171 + CameraGetRay :474-477).

    `row0`/`rows` select a horizontal band of the image — the unit of
    multi-chip framebuffer-tile sharding (row0 may be a traced scalar).

    Returns (origin f32[rows*W, 3], direction f32[rows*W, 3] unnormalized)."""
    w, h = int(width), int(height)
    rows = h if rows is None else int(rows)
    ys, xs = jnp.meshgrid(jnp.arange(rows, dtype=F), jnp.arange(w, dtype=F),
                          indexing="ij")
    xs = xs.ravel()
    ys = ys.ravel() + jnp.asarray(row0, dtype=F)
    s = sample_index
    sf = F(0.2) * F(1.0 if s > 0 else 0.0)
    noise_x = rng.hash12(jnp.stack([(xs + F(s)) * sf, ys * sf], axis=-1), xp=jnp)
    noise_y = rng.hash12(jnp.stack([xs * sf, (ys + F(s)) * sf], axis=-1), xp=jnp)
    u = (xs + noise_x) / F(w - 1)
    v = (ys + noise_y) / F(h - 1)
    ray_dir = (cam["horizontal"] * u[:, None] + cam["lower_left_corner"]
               + cam["vertical"] * v[:, None] - cam["origin"])
    origins = jnp.broadcast_to(cam["origin"], ray_dir.shape)
    return origins, ray_dir


def render_rows(static: GridStatic, arrays: GridArrays, mats: MaterialsDevice,
                cam: dict, width: int, height: int, spp: int, max_bounce: int,
                sun_position, sun_color, sun_radius, sun_enabled: bool,
                row0=0, rows: int | None = None, max_steps: int = 768):
    """Render a band of image rows (the sharding unit). Returns
    f32[rows, W, 3] tone-mapped + gamma'd (brick_raytracer.comp:153-178)."""
    w, h = int(width), int(height)
    rows = h if rows is None else int(rows)
    color = jnp.zeros((rows * w, 3), dtype=F)
    for s in range(spp):
        origins, dirs = camera_rays(cam, w, h, s, row0=row0, rows=rows)
        color = color + ray_color(
            static, arrays, mats, origins, dirs, max_bounce,
            jnp.asarray(sun_position, dtype=F), sun_enabled,
            jnp.asarray(sun_color, dtype=F), jnp.asarray(sun_radius, dtype=F),
            max_steps)
    color = jnp.sqrt(color / F(spp))
    return color.reshape(rows, w, 3)


def render_image(static: GridStatic, arrays: GridArrays, mats: MaterialsDevice,
                 camera_device, sun_position, sun_color, sun_radius,
                 sun_enabled: bool, trace_config: TraceConfig = TraceConfig()):
    """Render a full frame from a host CameraDevice (single-chip
    convenience; the engine jits render_rows directly)."""
    d = camera_device
    return render_rows(
        static, arrays, mats, camera_vectors(d),
        int(d.image_width), int(d.image_height),
        int(d.samples_per_pixel), int(d.max_bounce),
        sun_position, sun_color, sun_radius, sun_enabled,
        max_steps=trace_config.max_steps)
