"""Fused temporal-reprojection kernel vs the XLA reference path.

The fused kernel (:mod:`voxtracer.ops.temporal_pallas`) is the whole
``temporal.comp`` stage in one Pallas pass; the XLA path in
:func:`voxtracer.ops.temporal.temporal_blend` is its portable twin.
Where the offset-serve covers a lane (any smooth camera motion) the
two must agree to float tolerance; lanes the window cannot serve must
degrade exactly like a failed history test (restart accumulation).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from voxtracer.engine.camera import Camera
from voxtracer.engine.params import TemporalParams
from voxtracer.ops import temporal as temporal_op
from voxtracer.ops import temporal_pallas


def _cams(h, w, d_pos, d_dir=0.0):
    old = Camera(
        position=np.array([0.0, 0.0, -10.0]),
        direction=np.array([0.0, d_dir, 1.0]),
    )
    new = Camera(
        position=np.array([0.0, 0.0, -10.0]) + d_pos,
        direction=np.array([0.0, 0.0, 1.0]),
    )

    def tup(c):
        r, u, f = c.axis_scaled(w, h)
        return (
            jnp.asarray(c.position, jnp.float32),
            jnp.asarray(r, jnp.float32),
            jnp.asarray(u, jnp.float32),
            jnp.asarray(f, jnp.float32),
        )

    return tup(new), tup(old)


def _inputs(h, w, seed=0):
    rng = np.random.default_rng(seed)
    color = jnp.asarray(rng.random((h, w, 3), np.float32))
    # smooth depth field facing the camera
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = jnp.asarray(8.0 + 0.01 * xx + 0.005 * yy)
    normal = jnp.asarray(
        np.broadcast_to(
            np.array([0.0, 0.0, -1.0], np.float32), (h, w, 3)
        ).copy()
    )
    old_color = jnp.asarray(rng.random((h, w, 3), np.float32))
    old_blend = jnp.asarray(np.full((h, w), 0.5, np.float32))
    old_depth = depth + 0.0
    return color, normal, depth, old_color, old_blend, old_depth


def _run_both(h, w, d_pos, history_valid=True, params=None):
    params = params or TemporalParams()
    cam, old_cam = _cams(h, w, np.asarray(d_pos))
    color, normal, depth, old_color, old_blend, old_depth = _inputs(h, w)

    ref, ref_nb = temporal_op.temporal_blend(
        color, normal, depth, old_color, old_blend, old_depth,
        cam, old_cam, params, jnp.asarray(history_valid),
        reproject=True, resample_impl="xla",
    )
    hist = jnp.stack(
        [
            old_color[..., 0], old_color[..., 1], old_color[..., 2],
            old_blend, old_depth,
        ]
    )
    out, nb = temporal_pallas.temporal_blend_fused(
        jnp.moveaxis(color, -1, 0), jnp.moveaxis(normal, -1, 0),
        depth, hist, cam, old_cam, params,
        jnp.asarray(history_valid), interpret=True,
    )
    return (
        np.asarray(ref), np.asarray(ref_nb),
        np.moveaxis(np.asarray(out), 0, -1), np.asarray(nb),
    )


@pytest.mark.parametrize(
    "d_pos", [(0.0, 0.0, 0.0), (0.05, -0.02, 0.1), (0.3, 0.2, -0.4)]
)
def test_fused_matches_xla_under_smooth_motion(d_pos):
    ref, ref_nb, out, nb = _run_both(64, 128, d_pos)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(nb, ref_nb, rtol=1e-5, atol=1e-6)


def test_fused_first_frame_passthrough():
    ref, ref_nb, out, nb = _run_both(
        64, 128, (0.02, 0.0, 0.0), history_valid=False
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(nb, ref_nb, rtol=1e-6, atol=0)


@pytest.mark.slow
def test_fast_rotation_falls_back_to_any_offset_resampler(monkeypatch):
    """A whip pan whose offsets exceed the Pallas serve window must
    select the XLA any-offset resampler and KEEP history (the
    reference's sampler accepts any in-frame offset,
    temporal.comp:92-114) — without the fallback every lane restarts."""
    from voxtracer.engine import pipeline as pl_mod
    from voxtracer.engine.pipeline import Renderer
    from voxtracer.scene import GridScene, default_scene

    scene = GridScene.from_voxels(default_scene(radius=10, seed=2))

    def run(force_pallas):
        if force_pallas:
            # disable the fallback: pretend the window is infinite
            monkeypatch.setattr(pl_mod, "_PRED_MARGIN_Y_NEG", 1e9)
            monkeypatch.setattr(pl_mod, "_PRED_MARGIN_Y_POS", 1e9)
            monkeypatch.setattr(pl_mod, "_PRED_MARGIN_X", 1e9)
        else:
            monkeypatch.setattr(pl_mod, "_PRED_MARGIN_Y_NEG", 18)
            monkeypatch.setattr(pl_mod, "_PRED_MARGIN_Y_POS", 32)
            monkeypatch.setattr(pl_mod, "_PRED_MARGIN_X", 100)
        # the distance-cutoff scales with pixel footprint: at this tiny
        # test resolution the default 1e-2 rejects most reprojections
        # on quantization error alone (footprint at depth 8 with a
        # 46 px focal is ~0.17 world units), so widen it — the test
        # targets the RESAMPLER fallback, not the validity tuning
        r = Renderer(
            scene=scene, height=64, width=128,
            trace_impl="pallas_interpret",
            temporal_params=TemporalParams(blending_distance_cutoff=0.08),
        )
        cam_a = Camera(
            position=np.array([0.0, 2.0, -8.0]),
            direction=np.array([0.0, -0.3, 1.0]),
        )
        # fast vertical tilt: ~35 degrees => |dy| well past the serve
        # window's MARGIN=24 rows (horizontal pans are served up to
        # ±126 px, so only vertical motion exercises the fallback)
        cam_b = Camera(
            position=np.array([0.0, 2.0, -8.0]),
            direction=np.array([0.0, 0.35, 1.0]),
        )
        out_a = r.render(cam_a)
        # the predictor consumes the depth probe via a NON-blocking
        # async fetch (so a realtime loop never stalls its dispatch
        # pipeline); make it land deterministically for this 2-frame
        # test by forcing frame A to completion
        np.asarray(out_a["depth_probe"])
        out_b = r.render(cam_b)
        depth_b = np.asarray(out_b["depth"])
        blend = np.asarray(r.state["accum_blend"])
        # accepted history: blending advanced past the restart value
        sb = 1.0 - r.temporal_params.sample_blending
        accepted = blend < sb - 1e-6

        # "where geometry agrees": hit pixels whose reprojection lands
        # inside the previous frame (the tilt pushes the rest off-
        # screen — no resampler can serve those)
        h, w = depth_b.shape
        ra, ua, fa = cam_a.axis_scaled(w, h)
        rb, ub, fb = cam_b.axis_scaled(w, h)
        px, py = np.meshgrid(
            np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64)
        )
        ray = px[..., None] * rb - py[..., None] * ub + fb
        ray /= np.linalg.norm(ray, axis=-1, keepdims=True)
        world = cam_b.position + depth_b[..., None] * ray
        inv = np.linalg.inv(np.stack([ra, ua, fa], axis=1))
        screen = (world - cam_a.position) @ inv.T
        sx = screen[..., 0] / screen[..., 2]
        sy = screen[..., 1] / screen[..., 2]
        inframe = (
            (depth_b >= 0)
            & (screen[..., 2] > 0)
            & (sx + 0.5 >= 1) & (sx + 0.5 <= w - 1)
            & (0.5 - sy >= 1) & (0.5 - sy <= h - 1)
        )
        return r.last_resample, accepted, inframe

    impl, accepted, inframe = run(force_pallas=False)
    assert impl == "xla", "fast tilt must select the any-offset resampler"
    assert inframe.sum() > 500
    acc = accepted[inframe].mean()
    assert acc > 0.8, f"history acceptance {acc} too low under fallback"

    impl_p, accepted_p, inframe_p = run(force_pallas=True)
    assert impl_p == "pallas"
    acc_p = accepted_p[inframe_p].mean()
    assert acc_p < 0.05, (
        "sanity: without the fallback the window cannot serve a whip "
        f"tilt (acceptance {acc_p} vs {acc})"
    )


def test_fused_large_motion_restarts_accumulation():
    """Offsets beyond the serve window invalidate history (blend
    restarts with the fresh sample) instead of fetching garbage."""
    params = TemporalParams()
    h, w = 64, 128
    cam, old_cam = _cams(h, w, np.array([0.0, 8.0, 0.0]))
    color, normal, depth, old_color, old_blend, old_depth = _inputs(h, w)
    hist = jnp.stack(
        [
            old_color[..., 0], old_color[..., 1], old_color[..., 2],
            old_blend, old_depth,
        ]
    )
    out, nb = temporal_pallas.temporal_blend_fused(
        jnp.moveaxis(color, -1, 0), jnp.moveaxis(normal, -1, 0),
        depth, hist, cam, old_cam, params,
        jnp.asarray(True), interpret=True,
    )
    # vertical whip pan: reprojection offsets far exceed MARGIN
    # everywhere, so every lane restarts (blended == fresh sample)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out), 0, -1), np.asarray(color),
        rtol=0, atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(nb),
        np.full((h, w), 1.0 - params.sample_blending, np.float32),
        rtol=1e-6,
    )
