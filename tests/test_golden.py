"""Golden regression: the oracle's output for a pinned configuration.

The oracle defines the engine's semantics; any change to this output is
a semantics change and must be deliberate (re-bake tests/golden after
review)."""

import os

import numpy as np

from voxtracer.engine.camera import Camera
from voxtracer.engine.params import RenderParams
from voxtracer.io import vox as voxio
from voxtracer.ops import noise as noise_op
from voxtracer.oracle import renderer as oracle
from voxtracer.scene import GridScene, voxels_from_vox

from conftest import vox_dir

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "oracle_8x8x8_32.npz")


def test_oracle_matches_golden():
    scene = GridScene.from_voxels(
        voxels_from_vox(voxio.load(os.path.join(vox_dir(), "8x8x8.vox")))
    )
    cam = Camera(
        position=np.array([2.0, 3.0, -4.0]),
        direction=np.array([0.2, 0.1, 1.0]),
    )
    w = h = 32
    right, up, forward = cam.axis_scaled(w, h)
    planes = noise_op.noise_planes(
        noise_op.white_noise_buffer(seed=7), 1, h, w
    )
    o = oracle.render_sample(
        scene.values,
        scene.origin.astype(np.int64),
        np.asarray(cam.position),
        right,
        up,
        forward,
        RenderParams(),
        planes,
        w,
        h,
    )
    g = np.load(GOLDEN)
    np.testing.assert_array_equal(o["node"], g["node"])
    np.testing.assert_array_equal(o["depth"], g["depth"])
    np.testing.assert_array_equal(o["normal"], g["normal"])
    np.testing.assert_allclose(o["color"], g["color"], atol=1e-6)
    np.testing.assert_allclose(o["albedo"], g["albedo"], atol=1e-6)
