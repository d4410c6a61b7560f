"""Smoke the five BASELINE benchmark configs at tiny scale (CPU)."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks import configs


def test_config1():
    r = configs.config1_dense_primary(scale=0.15, frames=2)
    assert r["mrays_per_s"] > 0


def test_config2():
    r = configs.config2_sparse_diffuse_shadows(scale=0.05, frames=2)
    assert r["ms_per_frame"] > 0


def test_config3():
    r = configs.config3_interactive_edits(scale=0.05, frames=2)
    assert r["fps"] > 0


def test_config4():
    r = configs.config4_path_traced_emissive(scale=0.05, frames=2)
    assert r["ms_per_frame"] > 0


def test_config5():
    r = configs.config5_multichip_4k(scale=0.05, frames=1)
    assert r["devices"] == 8
    assert r["streamed_voxels"] > 0
