"""Scene checkpoint / resume.

Superset feature (SURVEY.md §5.4: the reference has no save/load — its
closest analog is .vox import): the five brickmap arrays + material table
serialize to a single .npz, so interactive edit sessions and streamed
scenes survive restarts.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..core.grid import BrickGrid, GridArrays, GridStatic
from ..core.materials import MaterialTable


def save_scene(path: str, static: GridStatic, arrays: GridArrays,
               materials: MaterialTable, **extra) -> None:
    """`extra`: additional arrays stored alongside the scene (e.g. the
    scene-cache version tag) so callers don't have to rewrite the
    multi-MB compressed npz a second time to append a key."""
    np.savez_compressed(
        path,
        **extra,
        dim_x=static.dim_x, dim_y=static.dim_y, dim_z=static.dim_z,
        brick_alloc=static.brick_alloc,
        # float64 so GridStatic's Python floats round-trip exactly (they are
        # jit static args; a f32 round trip would retrace)
        min_point=np.asarray(static.min_point, dtype=np.float64),
        scale=np.float64(static.scale),
        base_t=np.float64(static.base_t),
        statuses=np.asarray(arrays.statuses),
        indices=np.asarray(arrays.indices),
        occupancy=np.asarray(arrays.occupancy),
        start_indices=np.asarray(arrays.start_indices),
        material_indices=np.asarray(arrays.material_indices),
        active_bricks=np.uint32(arrays.active_bricks),
        material_cursor=np.uint32(arrays.material_cursor),
        diel_mask=np.asarray(arrays.diel_mask),
        brick_ir=np.asarray(arrays.brick_ir),
        mat_type=materials.mtype,
        mat_albedo=materials.albedo,
        mat_type_data=materials.type_data,
    )


def load_scene(path: str) -> Tuple[BrickGrid, MaterialTable]:
    """Restore a scene saved with `save_scene` into a host BrickGrid."""
    from ..config import GridConfig

    z = np.load(path)
    grid = BrickGrid(
        int(z["dim_x"]), int(z["dim_y"]), int(z["dim_z"]),
        GridConfig(
            brick_alloc=int(z["brick_alloc"]),
            min_point=tuple(float(v) for v in z["min_point"]),
            scale=float(z["scale"]),
            base_t=float(z["base_t"]),
        ),
    )
    grid.arrays = GridArrays(
        statuses=z["statuses"],
        indices=z["indices"],
        occupancy=z["occupancy"],
        start_indices=z["start_indices"],
        material_indices=z["material_indices"],
        active_bricks=np.uint32(z["active_bricks"]),
        material_cursor=np.uint32(z["material_cursor"]),
        diel_mask=(z["diel_mask"] if "diel_mask" in z
                   else np.zeros_like(z["occupancy"])),
        brick_ir=(z["brick_ir"] if "brick_ir" in z
                  else np.full(z["start_indices"].shape, np.nan, np.float32)),
    )
    materials = MaterialTable(
        mtype=z["mat_type"].copy(),
        albedo=z["mat_albedo"].copy(),
        type_data=z["mat_type_data"].copy(),
    )
    # re-register the material classification so host insert_batch after a
    # load keeps maintaining diel_mask/brick_ir (the same-dielectric skip)
    grid.attach_materials(materials)
    return grid, materials
