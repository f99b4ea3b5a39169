"""Native (C++) scene-build kernels must be bit-identical to numpy."""

import numpy as np
import pytest

from voxtracer import native
from voxtracer.scene import GridScene, default_scene, voxels_from_vox
from voxtracer.scene.grid import PALETTE_CAPACITY, _quantize_leaves
from voxtracer.scene.voxels import pack_leaves


@pytest.fixture(scope="module")
def lib():
    lib = native.get()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _numpy_tables(scene):
    """Force the numpy fallback paths for comparison."""
    import unittest.mock as mock

    with mock.patch.object(native, "pack_words", return_value=None), \
         mock.patch.object(native, "block_dist", return_value=None):
        return scene.device_tables()


def test_fill_grid_matches_numpy(lib):
    vl = default_scene(radius=14, seed=4)
    leaves = _quantize_leaves(pack_leaves(vl.mrgb))
    pos = vl.pos.astype(np.int64)
    lo = pos.min(axis=0)
    dims = tuple(int(-(-(int(h - l) + 1) // 8) * 8) for l, h in zip(lo, pos.max(axis=0)))
    ref = np.zeros(dims, np.int32)
    idx = pos - lo
    ref[idx[:, 0], idx[:, 1], idx[:, 2]] = leaves
    got = native.fill_grid(vl.pos, leaves, lo, dims)
    np.testing.assert_array_equal(got, ref)


def test_device_tables_native_vs_numpy(lib):
    scene = GridScene.from_voxels(default_scene(radius=12, seed=5))
    t_native = scene.device_tables()
    t_numpy = _numpy_tables(scene)
    np.testing.assert_array_equal(t_native["packed_idx"], t_numpy["packed_idx"])
    np.testing.assert_array_equal(t_native["palette"], t_numpy["palette"])
    assert t_native["zw"] == t_numpy["zw"]


def test_decode_xyzi(lib):
    raw = np.array([[1, 2, 3, 9], [250, 0, 7, 255]], np.uint8)
    pos, ci = native.decode_xyzi(raw)
    np.testing.assert_array_equal(pos, [[1, 3, 2], [250, 7, 0]])
    np.testing.assert_array_equal(ci, [9, 255])
