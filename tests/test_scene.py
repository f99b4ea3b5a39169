import os

import numpy as np
import pytest

from conftest import vox_dir
from voxtracer.io import vox as voxio
from voxtracer.scene import (
    GridScene,
    VoxelList,
    build_octree,
    default_scene,
    octree_depth,
    pack_leaves,
    resolve_octree,
    voxels_from_vox,
)
from voxtracer.scene.voxels import EMISSIVE_MATERIAL_BIT


def _random_voxels(n, lo, hi, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.integers(lo, hi, size=(n, 3)).astype(np.int16)
    mrgb = rng.integers(0, 256, size=(n, 4)).astype(np.uint8)
    return VoxelList(pos=pos, mrgb=mrgb)


def test_pack_leaves_bit_layout():
    mrgb = np.array([[0x40, 0x12, 0x34, 0x56]], dtype=np.uint8)
    leaf = pack_leaves(mrgb)[0]
    u = np.uint32(leaf)
    assert leaf < 0  # bit 31 set
    assert u == (1 << 31) | (0x40 << 24) | (0x12 << 16) | (0x34 << 8) | 0x56
    # emissive flag lands on bit 30 (EMMITANCE_BIT)
    assert u & (1 << 30)
    # material above 0x7f is masked
    leaf2 = pack_leaves(np.array([[0xFF, 0, 0, 0]], dtype=np.uint8))[0]
    assert np.uint32(leaf2) >> 24 == 0xFF  # 0x80 sign bit | 0x7f material


def test_octree_depth_cases():
    def d(*coords):
        return octree_depth(np.array(coords, dtype=np.int16).reshape(-1, 3))

    assert d(0, 0, 0) == 0
    assert d(1, 0, 0) == 1
    assert d(-1, 0, 0) == 0
    assert d(-2, 0, 0) == 1
    assert d(255, 255, 255) == 8
    assert d(-256, 0, 0) == 8
    assert d(256, 0, 0) == 9
    # the reference's abs(max)+1 quirk on all-negative coords
    assert d(-4, -4, -4) == 3


def test_octree_resolves_all_voxels():
    vl = _random_voxels(500, -40, 90)
    tree = build_octree(vl)
    leaves = pack_leaves(vl.mrgb)
    got = resolve_octree(tree, vl.pos)
    # duplicates: later insertion wins; compare per unique final value
    expected = {}
    for p, leaf in zip(map(tuple, vl.pos.tolist()), leaves):
        expected[p] = leaf
    for i, p in enumerate(map(tuple, vl.pos.tolist())):
        assert got[i] == expected[p]


def test_octree_header():
    vl = _random_voxels(10, 0, 200)
    tree = build_octree(vl)
    header = tree[:5].view(np.float32)
    assert header[0] == header[1] == header[2] == 0.0
    assert header[3] == 2.0 ** octree_depth(vl.pos)
    assert header[4] == 1.0


def test_octree_empty_positions_resolve_zero():
    vl = VoxelList(
        pos=np.array([[3, 4, 5]], dtype=np.int16),
        mrgb=np.array([[0, 1, 2, 3]], dtype=np.uint8),
    )
    tree = build_octree(vl)
    probe = np.array([[3, 4, 5], [0, 0, 0], [-3, -4, -5]], dtype=np.int16)
    got = resolve_octree(tree, probe)
    assert got[0] == pack_leaves(vl.mrgb)[0]
    assert got[1] == 0
    assert got[2] == 0


def test_grid_scene_matches_octree():
    vl = _random_voxels(300, -20, 50, seed=3)
    grid = GridScene.from_voxels(vl)
    tree = build_octree(vl)
    idx = vl.pos.astype(np.int64) - grid.origin
    grid_vals = grid.values[idx[:, 0], idx[:, 1], idx[:, 2]]
    tree_vals = resolve_octree(tree, vl.pos)
    np.testing.assert_array_equal(grid_vals, tree_vals)


def test_grid_mips_cover_occupancy():
    vl = _random_voxels(100, 0, 64, seed=5)
    grid = GridScene.from_voxels(vl)
    occ = grid.values != 0
    for level, mip in enumerate(grid.mips):
        scale = 2**level
        idx = (vl.pos.astype(np.int64) - grid.origin) // scale
        assert mip[idx[:, 0], idx[:, 1], idx[:, 2]].all()
    # mip occupancy is exactly the reduction of the level below
    for a, b in zip(grid.mips, grid.mips[1:]):
        dims = [-(-s // 2) * 2 for s in a.shape]
        padded = np.zeros(dims, bool)
        padded[: a.shape[0], : a.shape[1], : a.shape[2]] = a
        red = padded.reshape(
            dims[0] // 2, 2, dims[1] // 2, 2, dims[2] // 2, 2
        ).any(axis=(1, 3, 5))
        np.testing.assert_array_equal(red, b)


def test_vox_adapter_swizzle():
    path = os.path.join(vox_dir(), "8x8x8.vox")
    v = voxio.load(path)
    vl = voxels_from_vox(v)
    m = v.models[0]
    # engine y comes from vox z and vice versa
    assert vl.pos[:, 0].max() == m.voxels[:, 0].max()
    assert vl.pos[:, 1].max() == m.voxels[:, 2].max()
    assert vl.pos[:, 2].max() == m.voxels[:, 1].max()
    assert len(vl) == len(m.voxels)


def test_procedural_scene():
    vl = default_scene(radius=16, seed=1)
    assert len(vl) > 0
    # strip of emissive white voxels at y=-10, z=0
    strip = (vl.pos[:, 1] == -10) & (vl.pos[:, 2] == 0)
    strip_rows = vl.mrgb[strip]
    assert (strip_rows[:, 0] & EMISSIVE_MATERIAL_BIT).any()
    white = strip_rows[(strip_rows[:, 0] & EMISSIVE_MATERIAL_BIT) != 0]
    assert (white[:, 1:] == 255).all()
    # bowl interior: lowest voxel near -radius
    assert vl.pos[:, 1].min() <= -14
    # deterministic for a fixed seed
    vl2 = default_scene(radius=16, seed=1)
    np.testing.assert_array_equal(vl.pos, vl2.pos)
    np.testing.assert_array_equal(vl.mrgb, vl2.mrgb)
