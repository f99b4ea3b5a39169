"""Packed per-frame input vector: exact roundtrip.

The Renderer ships every dynamic scalar input in ONE (1, 32) f32
vector (engine/params.pack_frame_inputs) to avoid ~6 small
host->device copies per frame; these pin the contract — values
roundtrip exactly, and the frame number rides as int32 BITS (a value
cast would silently collapse consecutive frames past 2**24, ~2 days
of a live viewer, repeating noise planes).
"""

import numpy as np

from voxtracer.engine.params import (
    DenoiseParams,
    RenderParams,
    TemporalParams,
    pack_frame_inputs,
    unpack_frame_inputs,
)


def _roundtrip(frame_number):
    cam = np.arange(12, dtype=np.float32).reshape(4, 3) / 7.0
    rp = RenderParams(
        emit_strength=3.25, sun_strength=1.5, sun_size=0.125,
        sun_yaw=0.75, sun_pitch=0.5, sun_color=(0.25, 0.5, 0.75),
        sky_color=(0.1, 0.2, 0.3), specularity=0.375,
    )
    tp = TemporalParams(
        sample_blending=0.625, maximum_blending=0.9375,
        blending_distance_cutoff=0.03125,
    )
    dp = DenoiseParams(
        sigma_distance=2.5, sigma_range=1.25, albedo_factor=0.875
    )
    vec = pack_frame_inputs(cam, rp, tp, dp, frame_number)
    cam2, rp2, tp2, dp2, fn2 = unpack_frame_inputs(vec)
    np.testing.assert_array_equal(np.asarray(cam2), cam)
    for a, b in ((rp, rp2), (tp, tp2), (dp, dp2)):
        import jax

        for la, lb in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        ):
            # the packed lane is f32 — the same precision the
            # reference's uniform buffers carry (src/context.rs:425)
            assert np.float32(la) == np.float32(np.asarray(lb)), (la, lb)
    assert int(np.asarray(fn2)) == frame_number


def test_packed_roundtrip_exact():
    _roundtrip(7)


def test_frame_number_survives_past_f32_precision():
    # 2**24 + 1 is NOT representable in f32; the bitcast lane must
    # still return it exactly (and distinguish it from 2**24)
    _roundtrip(2**24 + 1)
    _roundtrip(2**24)
    _roundtrip(2**31 - 1)


def test_kernel_rows_match_traced_packs():
    """The host-packed (KROWS, 128) kernel-param rows must carry the
    SAME field layout the kernels' traced packers produce (row 1:
    temporal, row 2: denoise) — layout drift between the host and
    traced packers would silently misfeed every Pallas stage."""
    import jax.numpy as jnp

    from voxtracer.engine.params import pack_kernel_rows
    from voxtracer.ops import denoise_pallas, temporal_pallas

    # a well-conditioned basis: arange rows are coplanar and would
    # blow up the old-basis inverse
    cam = np.array(
        [[1.0, 2.0, -3.0], [0.5, 0.1, 0.0],
         [-0.1, 0.55, 0.2], [0.3, -0.2, 1.0]], np.float32
    )
    old = cam + np.float32(0.125)
    rp = RenderParams()
    tp = TemporalParams()
    dp = DenoiseParams(sigma_distance=2.5, sigma_range=1.25)
    rows = pack_kernel_rows(cam, old, rp, tp, dp, 9, True, 720)

    cam_t = tuple(jnp.asarray(cam[i]) for i in range(4))
    old_t = tuple(jnp.asarray(old[i]) for i in range(4))
    traced = np.asarray(
        temporal_pallas.pack_temporal_params(
            cam_t, old_t, tp, jnp.asarray(True),
            jnp.float32(0.0), jnp.float32(719.0), jnp.float32(0.0),
        )
    )
    # same layout; values equal to f32 rounding (host np vs traced
    # cross/dot may differ by FMA-contraction ulps on some backends)
    np.testing.assert_allclose(
        rows[1], traced[1], rtol=1e-6, atol=1e-7
    )
    assert rows.shape == traced.shape

    dvec = denoise_pallas.pack_denoise_row_host(cam, dp)
    assert dvec[12] == np.float32(2.5)
    assert dvec[14] == np.float32(dp.albedo_factor)
    np.testing.assert_array_equal(rows[2, :16], dvec)

    # row 3 carries the frame inputs; unpack reads the LAST row of
    # either packing
    cam2, rp2, tp2, dp2, fn2 = unpack_frame_inputs(rows)
    np.testing.assert_array_equal(np.asarray(cam2), cam)
    assert int(np.asarray(fn2)) == 9
    assert float(np.asarray(tp2.sample_blending)) == tp.sample_blending
