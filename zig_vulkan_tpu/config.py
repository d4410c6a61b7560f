"""Nested configuration dataclasses.

Mirrors the reference's nested `Config` struct tree with identical fields and
defaults (SURVEY.md §5.6): VoxelRT.Config (reference VoxelRT.zig:22-28),
Camera.Config (Camera.zig:5-14), Sun.Config (Sun.zig:4-11),
GraphicsPipeline.Config / denoiser push constants (GraphicsPipeline.zig:27-39),
BrickGrid.Config (brick/Grid.zig:13-20), Benchmark configuration
(Benchmark.zig:141-173).

The reference splits values into comptime constants, Vulkan specialization
constants, and push constants. On TPU these all become Python-level values
baked at `jax.jit` trace time (static) or small device scalars (dynamic).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Reference Camera.Config (Camera.zig:5-14)."""

    viewport_height: float = 2.0
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    samples_per_pixel: int = 2
    max_bounce: int = 2
    turn_rate: float = 0.1
    normal_speed: float = 1.0
    sprint_speed: float = 2.0
    user_input_disabled: bool = False


@dataclasses.dataclass(frozen=True)
class SunConfig:
    """Reference Sun.Config (Sun.zig:4-11)."""

    animate: bool = True
    animate_speed: float = 0.1
    enabled: bool = True
    color: Tuple[float, float, float] = (1.0, 1.1, 1.0)
    radius: float = 5.0
    sun_distance: float = 1000.0


@dataclasses.dataclass(frozen=True)
class DenoiserConfig:
    """Reference GraphicsPipeline.PushConstant defaults (GraphicsPipeline.zig:27-39)."""

    samples: int = 20
    distribution_bias: float = 0.6
    pixel_multiplier: float = 1.5
    inverse_hue_tolerance: float = 20.0
    enabled: bool = True


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """Reference BrickGrid.Config (brick/Grid.zig:13-20).

    `workers_count` is kept for API parity; the TPU build's host scene
    construction is vectorized (and optionally multithreaded in the native
    C++ grid builder), so it only controls the native builder's threads.
    """

    brick_alloc: Optional[int] = None
    base_t: float = 0.01
    min_point: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    scale: float = 1.0
    workers_count: int = 4


@dataclasses.dataclass(frozen=True)
class TraceConfig:
    """Knobs of the TPU trace kernel that have no reference analog.

    `max_steps` bounds the flattened two-level DDA loop (the GLSL kernel's
    while loops are unbounded; XLA needs a bound for the fixed-shape path).
    `rays_per_batch` caps in-flight wavefront memory: the (H*W*spp) ray set
    is traced in chunks of at most this many rays.
    """

    max_steps: int = 768
    rays_per_batch: int = 4 * 1024 * 1024
    # route traversals (all ray classes since round 2) through the Pallas
    # coherent-tile region tracer (ops.tile_tracer) when the grid is
    # compatible. None = auto: enabled on TPU (the production path),
    # disabled on CPU (the kernel only runs interpreted there — correct but
    # far slower than the XLA wavefront). True forces it on (interpret mode
    # on CPU — used by tests); False forces the XLA wavefront.
    use_pallas: Optional[bool] = None
    # empty-space skipping via the Chebyshev distance field: semantically
    # hit-equivalent, but float re-derivation of the DDA cursor after a
    # jump can flip grazing-voxel outcomes in rare cases; disable for
    # bit-exact reference parity
    empty_skip: bool = True
    # sequential row bands per trace (lax.map): fast bands stop paying for
    # slow ones; ~1.6x at 1080p. Used when the band height divides evenly.
    row_bands: int = 8
    # bin incoherent ray classes (diffuse bounces + their shadows) by
    # (origin region, direction octant) before tiling, so the Pallas
    # tracer's region vote serves whole tiles instead of one straggler's
    # region per phase; dead lanes compact into tiles that retire in zero
    # phases. None = auto: ON for every scene (round-5 hardware A/B:
    # 424.4 ms binned vs 481.7 unbinned default frame; the round-4 "only
    # when degraded" policy predates the carried-cursor kernel and the
    # sort-based unsort). Only affects the Pallas path.
    bin_incoherent: Optional[bool] = None
    # concurrent multi-region serve for the incoherent classes (diffuse
    # bounces + their shadows): march ALL resident region slots in one
    # loop instead of one voted region per phase. None = auto: concurrent
    # on EVERY scene since round 4 (hardware class sweep: sequential
    # 61.2 ms vs concurrent-4 45.1 ms on the roamable default scene);
    # the slot count still adapts to roamability (4 roamable /
    # 8 degraded). False forces the sequential serve — used by
    # benchmarks/bounce_sweep.py hardware A/Bs.
    bounce_concurrent: Optional[bool] = None
    # slot count for that concurrent serve (binned AND unbinned
    # incoherent wavefronts — since the round-5 flip, binned classes
    # take the concurrent serve too). None = auto: 8 on degraded scenes
    # / 4 on roamable ones (hardware sweeps, rounds 3-5). Replaces the
    # round-3/4 ZVT_BOUNCE_N_SERVE env plumbing (round-5 verdict item).
    n_serve: Optional[int] = None
    # round 5: trace each bounce level's sun-shadow ray INSIDE the same
    # Pallas launch (the kernel's shadow-probe stage — the reference's
    # in-kernel structure, brick_raytracer.comp:240-249) instead of one
    # separate region-marching launch per shadow class. Bit-exact with
    # the separate-launch path, but measured SLOWER on hardware (default
    # workload 493.7 vs 460.4 ms/frame): the serialized scatter+shadow
    # march lengthens the tile's max-over-lanes phase loop and sun-ward
    # shadow rays share no region residency with the scatter rays, which
    # costs more than the halved launch overhead saves. None = auto
    # (currently OFF); True opts in (benchmarks/default_frame_ab.py
    # A/B). Only affects the Pallas path.
    sun_in_kernel: Optional[bool] = None
    # the scene counts as "degraded" (empty-space roaming collapsed;
    # incoherent ray classes switch to the concurrent multi-region serve)
    # when more than this fraction of regions is non-empty. Measured:
    # default terrain scene 0.27; BASELINE config-3 spray 0.56 after one
    # 512-voxel random-insert frame.
    degraded_nonempty_fraction: float = 0.5


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Reference VoxelRT.Config (VoxelRT.zig:22-28) + Pipeline.Config knobs.

    `internal_resolution_*` decouples render resolution from output
    resolution exactly like the reference (main.zig:23, Pipeline.zig:103-127);
    the denoiser pass resamples internal -> output.
    """

    internal_resolution_width: int = 1024
    internal_resolution_height: int = 576
    output_resolution_width: Optional[int] = None   # None = same as internal
    output_resolution_height: Optional[int] = None
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    sun: SunConfig = dataclasses.field(default_factory=SunConfig)
    denoiser: DenoiserConfig = dataclasses.field(default_factory=DenoiserConfig)
    trace: TraceConfig = dataclasses.field(default_factory=TraceConfig)
    # the "Debug build with validation layers" analog (SURVEY.md §5.2):
    # enables jax NaN/Inf checks and validates the scene at engine init
    debug_validation: bool = False


# Brick geometry constants (reference brick/State.zig:5-11). These are
# Vulkan specialization constants in the reference (Pipeline.zig:293-315);
# here they are module-level constants baked into jit traces.
BRICK_DIMENSION: int = 4
BRICK_BITS: int = BRICK_DIMENSION ** 3          # 64
BRICK_BYTES: int = BRICK_BITS // 8              # 8
BRICK_WORDS: int = BRICK_BYTES // 4             # 2
BRICK_VOXEL_SCALE: float = 1.0 / BRICK_DIMENSION  # Pipeline.zig:313
