"""Pallas VMEM-table lookups — replacing XLA's scalar-unit gathers.

XLA lowers per-lane gathers to the scalar unit at ~0.1 G elems/s
regardless of table size (docs/DESIGN_NOTES.md §1); for SMALL tables
(<= _MAX_ROWS*128 entries) a Pallas kernel holding the table in VMEM and
looking up via per-sublane 128-lane shuffles runs at ~1.2 G lookups/s —
10x+. Used for the material table resolution after traversal
(mats.albedo/mtype/type_data are 256-entry tables; the reference fetches
them per-hit from an SSBO, brick_raytracer.comp:226-239).

The kernel is loop-free (lowest possible Mosaic surface): one grid step
per 8x128 block of indices, the whole table resident per step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUB = 8
_BLOCK = _SUB * _LANES


def _lookup_kernel(n_tables: int, rows: int):
    def kernel(*refs):
        table_refs = refs[:n_tables]
        idx_ref = refs[n_tables]
        out_refs = refs[n_tables + 1:]
        idx = idx_ref[:]
        r = idx // _LANES
        c = idx % _LANES
        for t in range(n_tables):
            val = jnp.zeros(idx.shape, jnp.float32)
            for row in range(rows):
                cand = jnp.take_along_axis(
                    jnp.broadcast_to(table_refs[t][row], idx.shape), c,
                    axis=1)
                val = jnp.where(r == row, cand, val)
            out_refs[t][:] = val

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def table_lookup(tables, idx, interpret: bool = False):
    """Look `idx` (int32[N], values < table size) up in one or more f32
    tables of identical length; returns a tuple of f32[N] (or a single
    array if one table was passed). Table length must be a multiple of
    128 (pad with zeros) and small enough for VMEM (<= ~64K entries).
    """
    single = not isinstance(tables, (tuple, list))
    if single:
        tables = (tables,)
    size = tables[0].shape[0]
    assert size % _LANES == 0, "pad tables to a multiple of 128"
    rows = size // _LANES
    n = idx.shape[0]
    pad = (-n) % _BLOCK
    idx_p = jnp.pad(idx, (0, pad)) if pad else idx
    blocks = (n + pad) // _BLOCK

    t2 = [t.reshape(rows, _LANES).astype(jnp.float32) for t in tables]
    table_spec = pl.BlockSpec((rows, _LANES), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((_SUB, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _lookup_kernel(len(t2), rows),
        grid=(blocks,),
        in_specs=[table_spec] * len(t2) + [idx_spec],
        out_specs=[idx_spec] * len(t2),
        out_shape=[jax.ShapeDtypeStruct((blocks * _SUB, _LANES), jnp.float32)
                   for _ in t2],
        interpret=interpret,
    )(*t2, idx_p.reshape(blocks * _SUB, _LANES))
    outs = tuple(o.reshape(-1)[:n] for o in outs)
    return outs[0] if single else outs
