"""MagicaVoxel parser tests, including the reference's three header tests
(reference vox/loader.zig:265-281)."""

import numpy as np
import pytest

from zig_vulkan_tpu.io import vox


def test_validate_header_valid_accepted():
    buf = b"VOX " + bytes([150, 0, 0, 0]) + b"MAIN"
    vox.validate_header(buf)  # must not raise


def test_validate_header_invalid_id_detected():
    buf = b"!VOX" + bytes([150, 0, 0, 0]) + b"MAIN"
    with pytest.raises(vox.InvalidId):
        vox.validate_header(buf)


def test_validate_header_invalid_version_detected():
    buf = b"VOX " + bytes([169, 0, 0, 0]) + b"MAIN"
    with pytest.raises(vox.UnexpectedVersion):
        vox.validate_header(buf)


def _roundtrip(models, sizes, palette=None, strict=True):
    buf = vox.write(None, sizes, models, palette)
    return vox.parse_buffer(buf, strict=strict)


def test_roundtrip_single_model():
    voxels = np.asarray([[0, 0, 0, 1], [1, 2, 3, 7], [5, 5, 5, 255]], dtype=np.uint8)
    parsed = _roundtrip([voxels], [(6, 6, 6)])
    assert parsed.num_models == 1
    assert parsed.sizes == [(6, 6, 6)]
    np.testing.assert_array_equal(parsed.models[0], voxels)
    # no RGBA chunk written -> default palette
    np.testing.assert_array_equal(parsed.palette, vox.default_palette())


def test_roundtrip_multi_model_pack():
    m1 = np.asarray([[0, 0, 0, 1]], dtype=np.uint8)
    m2 = np.asarray([[1, 1, 1, 2], [2, 2, 2, 3]], dtype=np.uint8)
    parsed = _roundtrip([m1, m2], [(2, 2, 2), (3, 3, 3)])
    assert parsed.num_models == 2
    np.testing.assert_array_equal(parsed.models[1], m2)


def test_palette_quirk_slot0_and_255():
    rng = np.random.default_rng(0)
    pal = rng.integers(1, 255, size=(256, 4)).astype(np.uint8)
    parsed = _roundtrip([np.zeros((1, 4), np.uint8)], [(1, 1, 1)], palette=pal)
    # reference forces slot 0 to (0,0,0,1) and never fills slot 255
    np.testing.assert_array_equal(parsed.palette[0], [0, 0, 0, 1])
    np.testing.assert_array_equal(parsed.palette[1:255], pal[1:255])
    np.testing.assert_array_equal(parsed.palette[255], [0, 0, 0, 0])


def test_strict_detects_bad_size_header():
    buf = vox.write(None, [(1, 1, 1)], [np.zeros((1, 4), np.uint8)])
    corrupted = buf.replace(b"SIZE", b"SIZ!")
    with pytest.raises(vox.ExpectedSizeHeader):
        vox.parse_buffer(corrupted, strict=True)
    # non-strict mode parses positionally (like the reference with strict=false)
    parsed = vox.parse_buffer(corrupted, strict=False)
    assert parsed.num_models == 1


def test_default_palette_decoding():
    pal = vox.default_palette()
    # entry 1 = 0xffffffff -> white, opaque
    np.testing.assert_array_equal(pal[1], [255, 255, 255, 255])
    # entry 2 = 0xffccffff little-endian -> r=ff g=ff b=cc a=ff
    np.testing.assert_array_equal(pal[2], [255, 255, 204, 255])
    np.testing.assert_array_equal(pal[0], [0, 0, 0, 0])


def test_load_from_disk(tmp_path):
    voxels = np.asarray([[1, 2, 3, 4]], dtype=np.uint8)
    p = str(tmp_path / "model.vox")
    vox.write(p, [(4, 4, 4)], [voxels])
    parsed = vox.load(p, strict=True)
    np.testing.assert_array_equal(parsed.models[0], voxels)
