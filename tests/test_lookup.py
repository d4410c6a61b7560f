"""Pallas VMEM-table lookup vs plain indexing."""

import numpy as np

import jax.numpy as jnp

from zig_vulkan_tpu.ops.lookup import table_lookup


def test_single_table_matches_gather():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random(256, dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, 256, 3000), dtype=jnp.int32)
    got = np.asarray(table_lookup(table, idx, interpret=True))
    np.testing.assert_array_equal(got, np.asarray(table)[np.asarray(idx)])


def test_multi_table_and_odd_sizes():
    rng = np.random.default_rng(1)
    t1 = jnp.asarray(rng.random(512, dtype=np.float32))
    t2 = jnp.asarray(rng.integers(0, 5, 512).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 512, 1537), dtype=jnp.int32)
    g1, g2 = table_lookup((t1, t2), idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(g1),
                                  np.asarray(t1)[np.asarray(idx)])
    np.testing.assert_array_equal(np.asarray(g2),
                                  np.asarray(t2)[np.asarray(idx)])
