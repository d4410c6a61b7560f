"""Default-workload full-frame A/B of the incoherent-class serve policy.

Times one jitted engine step (the reference default workload:
1024x576 internal, 2 spp, 2 user bounces, sun shadows, denoiser —
/root/reference/src/main.zig:122-135) on the DEFAULT (roamable) scene under
a serve-policy knob combo:

    python benchmarks/default_frame_ab.py <concurrent 0|1|a> <bin 0|1> [frames] [sun_in_kernel 0|1|a] [n_serve]

Honest chained timing (one host sync at the end). Prints one JSON line.
Run each combo in its own process to keep compile caches honest.
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
import time

import numpy as np


def main() -> None:
    # concurrent: "a" = auto (TraceConfig None), "1" force on, "0" force off
    carg = _sys.argv[1] if len(_sys.argv) > 1 else "a"
    concurrent = None if carg == "a" else carg == "1"
    bin_inc = (_sys.argv[2] == "1") if len(_sys.argv) > 2 else False
    # 12+ chained frames: the 6-frame measure overstates by ~70 ms/frame
    # (dispatch ramp + tunnel sync amortization; round-5 diag — 12 chained
    # frames land within ~3 ms of the XProf device step time)
    frames = int(_sys.argv[3]) if len(_sys.argv) > 3 else 12
    sarg = _sys.argv[4] if len(_sys.argv) > 4 else "a"
    sun_in_kernel = None if sarg == "a" else sarg == "1"
    # serve slots for the concurrent incoherent serve; "a"/absent = auto
    # (4 roamable / 8 degraded). The round-4 slot sweep that picked 4 ran
    # at 1 spp; the merged-spp production wavefront is 2x the lanes.
    narg = _sys.argv[5] if len(_sys.argv) > 5 else "a"
    n_serve = None if narg == "a" else int(narg)

    from zig_vulkan_tpu.config import (CameraConfig, DenoiserConfig,
                                       EngineConfig, SunConfig, TraceConfig)
    from zig_vulkan_tpu.engine.engine import VoxelRT
    from zig_vulkan_tpu.models.scenes import cached_default_scene

    sc = cached_default_scene(_os.path.join(_REPO, ".bench_scene_cache.npz"))
    rt = VoxelRT(sc.grid, sc.materials, EngineConfig(
        internal_resolution_width=1024, internal_resolution_height=576,
        camera=CameraConfig(origin=(0.0, 0.0, 0.0), samples_per_pixel=2,
                            max_bounce=2),
        sun=SunConfig(enabled=True, animate=False),
        denoiser=DenoiserConfig(enabled=True),
        trace=TraceConfig(bounce_concurrent=concurrent,
                          bin_incoherent=bin_inc,
                          sun_in_kernel=sun_in_kernel,
                          n_serve=n_serve)))
    img = rt.render()  # compile + tables
    np.asarray(img)
    t0 = time.time()
    for _ in range(frames):
        img = rt.render()
    np.asarray(img)
    dt = (time.time() - t0) / frames
    print(json.dumps({
        "workload": "default 1024x576 2spp 2+1bounce sun denoiser",
        "bounce_concurrent": concurrent, "bin_incoherent": bin_inc,
        "sun_in_kernel": sun_in_kernel, "n_serve": n_serve,
        "ms_per_frame": round(dt * 1e3, 1), "fps": round(1.0 / dt, 2),
    }), flush=True)


if __name__ == "__main__":
    from zig_vulkan_tpu.utils import jitcache

    jitcache.enable()  # env-var route silently ignored by this jax build
    main()
