"""Multi-device sharding: row-tiled rendering must equal single-device
output (SURVEY.md §4 "multi-node without a cluster")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxtracer.engine import pipeline
from voxtracer.engine.camera import Camera
from voxtracer.engine.params import (
    DenoiseParams,
    RenderParams,
    TemporalParams,
)
from voxtracer.ops import noise as noise_op
from voxtracer.parallel import make_mesh, sharded_render_frame
from voxtracer.parallel.mesh import scene_device_args
from voxtracer.scene import GridScene, default_scene


def _setup(height, width):
    scene = GridScene.from_voxels(default_scene(radius=10, seed=2))
    meta, arrays = scene_device_args(scene)
    cam = Camera(
        position=np.array([0.0, 2.0, -8.0]),
        direction=np.array([0.0, -0.3, 1.0]),
    )
    right, up, forward = cam.axis_scaled(width, height)
    cam_arr = jnp.asarray(
        np.stack([cam.position, right, up, forward]).astype(np.float32)
    )
    args = (
        arrays,
        cam_arr,
        RenderParams(),
        TemporalParams(),
        DenoiseParams(),
        jnp.asarray(noise_op.white_noise_buffer(seed=1, count=32)),
        jnp.int32(1),
    )
    return scene, meta, args


@pytest.mark.parametrize(
    "radius", [0, pytest.param(2, marks=pytest.mark.slow)]
)
def test_sharded_matches_single_device(radius):
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should provide 8 virtual CPU devices"
    height, width = 32, 32
    scene, meta, args = _setup(height, width)

    single = pipeline.render_frame(
        pipeline.init_state(height, width),
        *args,
        scene_meta=meta,
        height=height,
        width=width,
        radius=radius,
        reproject=True,
    )

    mesh = make_mesh()
    fn, shard_state = sharded_render_frame(
        mesh,
        scene_meta=meta,
        height=height,
        width=width,
        radius=radius,
        reproject=True,
    )
    sharded = fn(shard_state(pipeline.init_state(height, width)), *args)

    for key in ("image", "linear", "depth", "node"):
        np.testing.assert_array_equal(
            np.asarray(single[1][key]),
            np.asarray(sharded[1][key]),
            err_msg=f"outputs[{key}] differs across sharding",
        )
    for key in ("accum_color", "accum_blend", "old_depth"):
        np.testing.assert_allclose(
            np.asarray(single[0][key]),
            np.asarray(sharded[0][key]),
            atol=1e-6,
            err_msg=f"state[{key}] differs across sharding",
        )


@pytest.mark.slow
def test_sharded_pallas_post_stages_bitmatch_with_motion():
    """Two frames with camera motion through the FULL Pallas pipeline
    under the mesh (fused temporal reprojection + denoise stencil, each
    fetching row halos from neighbor slabs via ppermute): frame 2's
    history resample reads rows that live on OTHER devices, and the
    result must still be bit-identical to the single-device render."""
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should provide 8 virtual CPU devices"
    height, width = 64, 128
    scene, meta, args = _setup(height, width)
    arrays = args[0]

    cam_a = Camera(
        position=np.array([0.0, 2.0, -8.0]),
        direction=np.array([0.0, -0.3, 1.0]),
    )
    # a few pixels of reprojection offset, crossing the 8-row slabs
    cam_b = Camera(
        position=np.array([0.15, 2.2, -8.1]),
        direction=np.array([0.02, -0.32, 1.0]),
    )

    def cam_arr(c):
        r, u, f = c.axis_scaled(width, height)
        return jnp.asarray(
            np.stack([c.position, r, u, f]).astype(np.float32)
        )

    def run_single():
        state = pipeline.init_state(height, width)
        for i, c in enumerate((cam_a, cam_b)):
            state, out = pipeline.render_frame(
                state, arrays, cam_arr(c), *args[2:5], args[5],
                jnp.int32(i + 1),
                scene_meta=meta, height=height, width=width,
                radius=2, reproject=True,
                trace_impl="pallas_interpret",
            )
        return out

    def run_sharded():
        mesh = make_mesh()
        fn, shard_state = sharded_render_frame(
            mesh, scene_meta=meta, height=height, width=width,
            radius=2, reproject=True, trace_impl="pallas_interpret",
        )
        state = shard_state(pipeline.init_state(height, width))
        for i, c in enumerate((cam_a, cam_b)):
            state, out = fn(
                state, arrays, cam_arr(c), *args[2:5], args[5],
                jnp.int32(i + 1),
            )
        return out

    single = run_single()
    sharded = run_sharded()
    for key in ("image", "linear", "depth", "node"):
        np.testing.assert_array_equal(
            np.asarray(single[key]),
            np.asarray(sharded[key]),
            err_msg=f"outputs[{key}] differs across pallas sharding",
        )


@pytest.mark.slow
def test_sharded_whip_pan_any_offset_fallback_bitmatch():
    """A whip pan whose reprojection offsets exceed the fused kernel's
    serve window takes the any-offset fallback (resample="xla").  Under
    the mesh that fallback all-gathers the history planes into every
    slab and resamples slab-locally — it must bit-match the
    single-device fallback render (VERDICT r3 next #2; the reference's
    temporal pass accepts ANY in-frame offset, temporal.comp:92-114)."""
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should provide 8 virtual CPU devices"
    height, width = 64, 128
    scene, meta, args = _setup(height, width)
    arrays = args[0]

    cam_a = Camera(
        position=np.array([0.0, 2.0, -8.0]),
        direction=np.array([0.0, -0.3, 1.0]),
    )
    # ~0.5 rad of yaw in one frame: far beyond the serve window in x
    # AND beyond the slab halos in y
    cam_b = Camera(
        position=np.array([0.3, 2.4, -8.2]),
        direction=np.array([np.sin(0.5), -0.45, np.cos(0.5)]),
    )
    # sanity: the offline predictor agrees this is out of window
    from voxtracer.engine.pipeline import (
        offsets_exceed_window, predict_path_offsets,
    )

    def cam_rows(c):
        r, u, f = c.axis_scaled(width, height)
        return np.stack([c.position, r, u, f]).astype(np.float32)

    assert offsets_exceed_window(
        *predict_path_offsets(
            [cam_rows(cam_a), cam_rows(cam_b)], height, width
        )
    )

    def cam_arr(c):
        return jnp.asarray(cam_rows(c))

    def run_single():
        state = pipeline.init_state(height, width)
        for i, c in enumerate((cam_a, cam_b)):
            state, out = pipeline.render_frame(
                state, arrays, cam_arr(c), *args[2:5], args[5],
                jnp.int32(i + 1),
                scene_meta=meta, height=height, width=width,
                radius=2, reproject=True, resample="xla",
                trace_impl="pallas_interpret",
            )
        return out

    def run_sharded():
        mesh = make_mesh()
        fn, shard_state = sharded_render_frame(
            mesh, scene_meta=meta, height=height, width=width,
            radius=2, reproject=True, resample="xla",
            trace_impl="pallas_interpret",
        )
        state = shard_state(pipeline.init_state(height, width))
        for i, c in enumerate((cam_a, cam_b)):
            state, out = fn(
                state, arrays, cam_arr(c), *args[2:5], args[5],
                jnp.int32(i + 1),
            )
        return out

    single = run_single()
    sharded = run_sharded()
    for key in ("image", "linear", "depth", "node"):
        np.testing.assert_array_equal(
            np.asarray(single[key]),
            np.asarray(sharded[key]),
            err_msg=f"outputs[{key}] differs across whip-pan sharding",
        )


@pytest.mark.slow
def test_sharded_pallas_matches_single_device():
    """The flagship Pallas kernel family composes with the mesh: the
    trace stage runs under shard_map (one row slab per device, params
    slot 30 carrying the slab's global row) and must reproduce the
    single-device Pallas render bit-for-bit.  Runs the kernel through
    the Pallas interpreter (trace_impl="pallas_interpret") since the
    suite executes on virtual CPU devices."""
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should provide 8 virtual CPU devices"
    height, width = 16, 16
    scene, meta, args = _setup(height, width)

    single = pipeline.render_frame(
        pipeline.init_state(height, width),
        *args,
        scene_meta=meta,
        height=height,
        width=width,
        radius=0,
        reproject=True,
        trace_impl="pallas_interpret",
    )

    mesh = make_mesh()
    fn, shard_state = sharded_render_frame(
        mesh,
        scene_meta=meta,
        height=height,
        width=width,
        radius=0,
        reproject=True,
        trace_impl="pallas_interpret",
    )
    sharded = fn(shard_state(pipeline.init_state(height, width)), *args)

    for key in ("image", "depth", "node"):
        np.testing.assert_array_equal(
            np.asarray(single[1][key]),
            np.asarray(sharded[1][key]),
            err_msg=f"outputs[{key}] differs across pallas sharding",
        )
