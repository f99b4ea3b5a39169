"""Real-hardware kernel lane: ``VOX_TPU=1 python -m pytest -m tpu``.

The CPU suite exercises every Pallas kernel through the interpreter;
a Mosaic LOWERING regression (legal-looking kernel, wrong compiled
code) would previously only surface via the bench flow.  This lane
runs the hardware-critical parity checks on one real chip in ~2 min:

* trace kernel vs oracle (BASELINE config 1's gate, non-interpreted)
* fused temporal reprojection vs the XLA gather path
* Pallas denoise stencil vs the XLA stencil
* HBM-resident fine-table mode vs the VMEM-resident mode
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform in ("cpu",),
    reason="real-TPU lane (run with VOX_TPU=1 python -m pytest -m tpu)",
)


def _trace(scene, cam, h, w, **kw):
    import jax.numpy as jnp

    from voxtracer.engine.params import RenderParams
    from voxtracer.ops import noise as noise_op
    from voxtracer.ops import trace_pallas

    params = RenderParams()
    right, up, forward = cam.axis_scaled(w, h)
    buf = noise_op.white_noise_buffer(seed=7, count=32)
    t = scene.device_tables()
    cam_arr = np.stack([cam.position, right, up, forward]).astype(
        np.float32
    )
    pvec = trace_pallas.pack_params(cam_arr, params)
    nq = trace_pallas.noise_quads(jnp.asarray(buf), jnp.int32(1))
    out = trace_pallas.render_sample(
        jnp.asarray(t["packed_idx"]),
        jnp.asarray(t["meta_idx"]),
        jnp.asarray(t["brick_idx"]),
        jnp.asarray(t["palette"]),
        jnp.asarray(pvec),
        nq,
        dims=scene.values.shape,
        zw=t["zw"],
        origin=tuple(int(v) for v in scene.origin),
        n_rows=t["packed_idx"].shape[0],
        l3_dims=t["l3_dims"],
        m_rows=t["meta_idx"].shape[0],
        b_rows=t["brick_idx"].shape[1],
        height=h,
        width=w,
        **kw,
    )
    from tests.conftest import gbuf_hwc

    return gbuf_hwc(out), (buf, params)


@requires_tpu
def test_trace_kernel_matches_oracle_on_hardware():
    """BASELINE config 1's gate, on the real Mosaic lowering."""
    from voxtracer.engine.camera import Camera
    from voxtracer.io import vox as voxio
    from voxtracer.ops import noise as noise_op
    from voxtracer.oracle import renderer as oracle
    from voxtracer.scene import GridScene, voxels_from_vox

    import tests.conftest as cf

    scene = GridScene.from_voxels(
        voxels_from_vox(voxio.load(cf.vox_dir() + "/8x8x8.vox"))
    )
    h = w = 256
    cam = Camera(
        position=np.array([2.0, 3.0, -4.0]),
        direction=np.array([0.2, 0.1, 1.0]),
    )
    x, (buf, params) = _trace(scene, cam, h, w)
    right, up, forward = cam.axis_scaled(w, h)
    planes = noise_op.noise_planes(buf, 1, h, w)
    o = oracle.render_sample(
        scene.values, scene.origin.astype(np.int64),
        np.asarray(cam.position), right, up, forward,
        params, planes, w, h,
    )
    agree = o["node"] == x["node"]
    assert agree.mean() > 0.999, f"node agreement {agree.mean()}"
    hit = (o["depth"] >= 0) & agree
    np.testing.assert_allclose(
        x["depth"][hit], o["depth"][hit], rtol=1e-5, atol=1e-5
    )
    err = np.abs(x["color"] - o["color"]).max(axis=-1)
    assert (err[agree] < 1e-3).mean() > 0.995


@requires_tpu
def test_scramble_matches_unscrambled_on_hardware():
    """The divergent-phase lane decorrelation (knobs.scramble) is a
    pure permutation — the CPU suite proves bit-identity in the
    interpreter; here the real Mosaic lowering of pltpu.roll + the
    XOR lane gather is on trial.  Across two DIFFERENT compiled
    programs the compiler's FMA-contraction choices may differ, so a
    grazing SECONDARY ray can flip hit/miss on a 1-ulp t difference
    (the same tolerance class as the oracle gate): measured exactly
    2 color-only pixels at this scene/pose, every geometry channel
    bit-identical — both pinned here so a real lowering bug (wrong
    permutation => wholesale pixel swaps) cannot hide."""
    from voxtracer.engine.camera import Camera
    from voxtracer.io import vox as voxio
    from voxtracer.ops import trace_pallas
    from voxtracer.scene import GridScene, voxels_from_vox

    import tests.conftest as cf

    scene = GridScene.from_voxels(
        voxels_from_vox(voxio.load(cf.vox_dir() + "/menger.vox"))
    )
    h, w = 128, 768
    cam = Camera(
        position=np.array([36.0, 34.0, -5.0]),
        direction=np.array([-16.0, -14.0, 25.0]),
    )
    base, _ = _trace(
        scene, cam, h, w,
        knobs=trace_pallas.pick_knobs(h, w).replace(scramble=0),
    )
    scr, _ = _trace(
        scene, cam, h, w,
        knobs=trace_pallas.pick_knobs(h, w).replace(scramble=3),
    )
    # primary G-buffer channels: BIT-identical (a permutation bug
    # would scatter these wholesale)
    for k in ("normal", "depth", "node", "albedo"):
        np.testing.assert_array_equal(
            scr[k], base[k], err_msg=f"scramble {k}"
        )
    # color: secondary-bounce outcomes may flip on grazing rays
    # across the two compilations — pinned at the measured count
    dc = np.abs(scr["color"] - base["color"]).max(axis=-1)
    n_diff = int((dc > 0).sum())
    assert n_diff <= 4, (
        f"{n_diff} color-differing px (pinned: <=4 grazing secondary"
        " flips; more indicates a lane-permutation lowering bug)"
    )


@requires_tpu
def test_hbm_fine_table_mode_matches_vmem_mode():
    from voxtracer.engine.camera import Camera
    from voxtracer.io import vox as voxio
    from voxtracer.scene import GridScene, voxels_from_vox

    import tests.conftest as cf

    scene = GridScene.from_voxels(
        voxels_from_vox(voxio.load(cf.vox_dir() + "/menger.vox"))
    )
    cam = Camera(
        position=np.array([90.0, 70.0, -40.0]),
        direction=np.array([-0.45, -0.5, 1.0]),
    )
    a, _ = _trace(scene, cam, 128, 256, fine_in_hbm=False)
    b, _ = _trace(scene, cam, 128, 256, fine_in_hbm=True)
    agree = (a["node"] == b["node"]).mean()
    assert agree > 0.9999, f"hbm-mode node agreement {agree}"


@requires_tpu
def test_fused_temporal_matches_xla_on_hardware():
    import jax.numpy as jnp

    from voxtracer.engine.camera import Camera
    from voxtracer.engine.params import TemporalParams
    from voxtracer.ops import temporal as temporal_op
    from voxtracer.ops import temporal_pallas

    h, w = 256, 512
    rng = np.random.default_rng(3)
    color = jnp.asarray(rng.random((h, w, 3), np.float32))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = jnp.asarray(8.0 + 0.01 * xx + 0.005 * yy)
    normal = jnp.asarray(
        np.broadcast_to(
            np.array([0.0, 0.0, -1.0], np.float32), (h, w, 3)
        ).copy()
    )
    old_color = jnp.asarray(rng.random((h, w, 3), np.float32))
    old_blend = jnp.asarray(np.full((h, w), 0.5, np.float32))

    def cams():
        old = Camera(
            position=np.array([0.0, 0.0, -10.0]),
            direction=np.array([0.0, 0.0, 1.0]),
        )
        new = Camera(
            position=np.array([0.05, -0.02, -9.9]),
            direction=np.array([0.0, 0.0, 1.0]),
        )

        def tup(c):
            r, u, f = c.axis_scaled(w, h)
            return tuple(
                jnp.asarray(v, jnp.float32)
                for v in (c.position, r, u, f)
            )

        return tup(new), tup(old)

    cam, old_cam = cams()
    # a wide distance cutoff keeps the validity test far from its
    # threshold: at this depth/focal the default 1e-2 puts dist right
    # at the reconstruction-quantization scale, where TPU-vs-XLA float
    # rounding legitimately flips the decision per pixel — this test
    # targets the RESAMPLED VALUES, not threshold tie-breaking
    params = TemporalParams(blending_distance_cutoff=0.1)
    ref, ref_nb = temporal_op.temporal_blend(
        color, normal, depth, old_color, old_blend, depth,
        cam, old_cam, params, jnp.asarray(True),
        reproject=True, resample_impl="xla",
    )
    hist = jnp.stack(
        [
            old_color[..., 0], old_color[..., 1], old_color[..., 2],
            old_blend, depth,
        ]
    )
    out, nb = temporal_pallas.temporal_blend_fused(
        jnp.moveaxis(color, -1, 0), jnp.moveaxis(normal, -1, 0),
        depth, hist, cam, old_cam, params,
        jnp.asarray(True),
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out), 0, -1), np.asarray(ref),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(nb), np.asarray(ref_nb), rtol=1e-5, atol=1e-6
    )


@requires_tpu
def test_pallas_denoise_matches_xla_on_hardware():
    import jax.numpy as jnp

    from voxtracer.engine.camera import Camera
    from voxtracer.engine.params import DenoiseParams
    from voxtracer.ops import denoise as denoise_op
    from voxtracer.ops import denoise_pallas

    h, w = 256, 512
    rng = np.random.default_rng(5)
    color = jnp.asarray(rng.random((h, w, 3), np.float32))
    normal = jnp.asarray(rng.random((h, w, 3), np.float32))
    depth = jnp.asarray(1.0 + rng.random((h, w), np.float32))
    albedo = jnp.asarray(rng.random((h, w, 3), np.float32))
    node = jnp.asarray(
        rng.integers(0, 3, (h, w)).astype(np.int32) << 24
    )
    cam = Camera(position=np.array([0.0, 0.0, -5.0]))
    r, u, f = cam.axis_scaled(w, h)
    cam_t = tuple(
        jnp.asarray(v, jnp.float32) for v in (cam.position, r, u, f)
    )
    params = DenoiseParams()
    a = denoise_op.denoise(
        color, normal, depth, albedo, node, cam_t, params, radius=2
    )
    b = denoise_pallas.denoise(
        jnp.moveaxis(color, -1, 0), jnp.moveaxis(normal, -1, 0),
        depth, jnp.moveaxis(albedo, -1, 0), node, cam_t, params,
        radius=2,
    )
    np.testing.assert_allclose(
        np.asarray(a), np.moveaxis(np.asarray(b), 0, -1),
        rtol=1e-4, atol=1e-5,
    )
