"""The per-op profile tool runs the real frame fn under jax.profiler
and reports op totals (capability upgrade over the reference's
host-only fps counter, src/context.rs:559-588)."""

import numpy as np

import pytest

from voxtracer.app import camera_paths, profile as profile_mod
from voxtracer.engine.pipeline import Renderer
from voxtracer.scene import GridScene, VoxelList


def _tiny_scene():
    vl = VoxelList(
        pos=np.array([[0, 0, 0], [2, 1, 0]], dtype=np.int16),
        mrgb=np.array(
            [[0, 200, 100, 50], [0, 10, 255, 10]], dtype=np.uint8
        ),
    )
    return GridScene.from_voxels(vl)


@pytest.mark.slow
def test_profile_frames_reports_ops(tmp_path):
    scene = _tiny_scene()
    r = Renderer(scene=scene, height=64, width=64)
    path = camera_paths.static(scene)
    rows = profile_mod.profile_frames(
        r, [path(0.0)] * 2, str(tmp_path / "trace")
    )
    assert isinstance(rows, list)
    # the frame fn must appear among the recorded ops with real time
    assert rows, "no profiler events captured"
    assert all(ns >= 0 for _, ns in rows)
    names = " ".join(name for name, _ in rows)
    assert "render" in names or "jit" in names or "fusion" in names
