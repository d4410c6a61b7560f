"""Incoherent-ray (diffuse bounce) kernel knob sweep on TPU.

The round-2 profile (docs/PROFILE.md) shows diffuse-bounce traversals are
~85% of the default engine frame: random scatter directions defeat the
tile's region vote (one non-empty region served per phase). This harness
measures EXACTLY that traversal — the first diffuse bounce of the default
workload at 1024x576 — under the kernel's routing knobs:

    python benchmarks/bounce_sweep.py <n_serve> <mode 0/1/x/b/bc> [reps] [max_phases]

mode: "0" = sequential serve, "1" = concurrent serve, "x" = the XLA
wavefront (no Pallas) on the same class, "b" = binned (region,octant)-
sorted wavefront + sequential serve (the production default since round
5), "bc" = binned + concurrent serve.

It synthesizes the real bounce wavefront (trace primaries on the cached
default scene, scatter at the hits with the engine's RNG), then times
`grid_hit_tiles` on it with honest chained-checksum timing (one host read
at the end; docs/DESIGN_NOTES.md §6 hygiene rules). Prints one JSON line.

Run each knob combo in its own process (the knobs are also readable via
kwargs here, so no env round-trip is needed — but a fresh process avoids
cross-combo compile-cache interference in the timing).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zvt_jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import json
import sys
import time

import numpy as np


def main() -> None:
    n_serve = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    # mode: "0" sequential serve, "1" concurrent serve, "x" = the XLA
    # wavefront (no Pallas) on the same class, "b" = BINNED wavefront
    # (production default since round 5) + sequential serve, "bc" =
    # binned + concurrent serve (round-5 hypothesis test: do binned
    # tiles still diverge enough after their first region to pay for
    # multi-slot serving?)
    mode = sys.argv[2] if len(sys.argv) > 2 else "0"
    concurrent = mode in ("1", "bc")
    binned = mode in ("b", "bc")
    xla_wavefront = mode == "x"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    max_phases = int(sys.argv[4]) if len(sys.argv) > 4 else 256

    import jax
    import jax.numpy as jnp

    from zig_vulkan_tpu.config import CameraConfig
    from zig_vulkan_tpu.core.camera import Camera
    from zig_vulkan_tpu.models.scenes import cached_default_scene
    from zig_vulkan_tpu.ops import tile_tracer as tl
    from zig_vulkan_tpu.ops import trace as tt

    width, height = 1024, 576
    cache = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), ".bench_scene_cache.npz")
    sc = cached_default_scene(cache)
    static = sc.grid.static
    arrays = sc.grid.device_arrays()
    tables = jax.jit(tt.build_trace_tables, static_argnums=0)(static, arrays)
    blocks = jax.jit(tl.build_region_tables, static_argnums=0)(
        static, arrays, tables)

    cam = Camera(75.0, width, height, CameraConfig(origin=(0.0, 0.0, 0.0)))
    cv = {k: jnp.asarray(v) for k, v in
          tt.camera_vectors(cam.d_camera).items()}

    @jax.jit
    def make_bounce_rays(cv):
        """The default workload's FIRST DIFFUSE BOUNCE wavefront: trace
        primaries, scatter at the hits exactly like _ray_color_soa
        (lambertian target = p + n + rand_in_hemisphere)."""
        ox, oy, oz, dx, dy, dz = tt._camera_rays_soa(cv, width, height, 0)
        inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        dx, dy, dz = dx * inv, dy * inv, dz * inv
        h = tl.grid_hit_tiles(static, arrays, blocks, ox, oy, oz, dx, dy, dz,
                              jnp.ones(ox.shape[0], jnp.bool_),
                              max_phases=256, image_shape=(height, width))
        # lambertian scatter exactly as _ray_color_soa (trace.py:910-915)
        cox = h["px"] + h["pz"]
        coy = h["py"] + h["pz"]
        rx, ry, rz = tt._rand_vec3_range_soa(cox, coy, jnp.float32(-0.4),
                                             jnp.float32(0.4))
        sx, sy, sz = tt._norm3(h["nx"] + rx, h["ny"] + ry, h["nz"] + rz)
        return h["px"], h["py"], h["pz"], sx, sy, sz, h["found"]

    bx, by, bz, bdx, bdy, bdz, act = jax.block_until_ready(
        make_bounce_rays(cv))
    n_act = int(np.asarray(act).sum())

    if binned:
        # production order (round 5): sort by (origin region, octant),
        # dead lanes to the end. The sort+permute cost is measured
        # separately in the engine profile (~11 ms); this harness
        # isolates the KERNEL cost under the sorted order.
        perm = jax.block_until_ready(tt._bin_perm(
            static, bx, by, bz, bdx, bdy, bdz, act))
        bx, by, bz = bx[perm], by[perm], bz[perm]
        bdx, bdy, bdz = bdx[perm], bdy[perm], bdz[perm]
        act = act[perm]

    mats = tt.materials_to_device(sc.materials)
    m = bx.shape[0]

    @jax.jit
    def bounce_trace(acc, bx):
        bx = bx + acc * jnp.float32(0.0)  # chain the dispatch
        if xla_wavefront:
            # the round-1 XLA wavefront on the SAME class: per-step
            # gathers charge every lane, but there is no region-serve
            # phase structure to defeat — the A/B that decides which
            # engine routes incoherent classes
            h = tt._grid_hit_soa(
                static, arrays, mats, bx, by, bz, bdx, bdy, bdz,
                jnp.float32(jnp.inf),
                jnp.full(m, tt.MAT_NONE, dtype=jnp.int32),
                jnp.ones(m, jnp.float32), act, 768, tables, True,
                bounded_t=False, needs_ignore=False)
            unf = jnp.int32(0)
        else:
            h = tl.grid_hit_tiles(static, arrays, blocks, bx, by, bz,
                                  bdx, bdy, bdz, act,
                                  max_phases=max_phases,
                                  concurrent=concurrent, n_serve=n_serve,
                                  image_shape=None if binned
                                  else (height, width))
            unf = jnp.sum((h["unfinished"] & act).astype(jnp.int32))
        acc = (acc + jnp.sum(h["t"] * h["found"]) * jnp.float32(1e-9)
               + jnp.float32(1.0))
        return acc, unf

    t0 = time.time()
    acc, unf = bounce_trace(jnp.float32(0.0), bx)
    _ = float(acc)
    print(f"# warmup (compile + 1 trace): {time.time() - t0:.1f}s",
          file=sys.stderr)

    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(reps):
        acc, unf = bounce_trace(acc, bx)
    checksum = float(acc)
    elapsed = time.time() - t0
    unfinished = int(unf)
    ms = elapsed / reps * 1e3
    print(json.dumps({
        "class": "diffuse_bounce_1024x576",
        "n_serve": n_serve, "mode": mode,
        "active_lanes": n_act, "reps": reps,
        "ms": round(ms, 2), "unfinished": unfinished,
        "checksum": round(checksum, 4)}))


if __name__ == "__main__":
    from zig_vulkan_tpu.utils import jitcache

    jitcache.enable()  # env-var route silently ignored by this jax build
    main()
