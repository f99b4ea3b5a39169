"""Pallas denoiser vs the XLA reference implementation (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from voxtracer.engine.camera import Camera
from voxtracer.engine.params import DenoiseParams
from voxtracer.ops import denoise as denoise_xla
from voxtracer.ops import denoise_pallas


def test_pallas_denoise_matches_xla():
    h, w = 64, 128
    rng = np.random.default_rng(0)
    colors = jnp.asarray(rng.random((h, w, 3), np.float32))
    n = rng.standard_normal((h, w, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    normal = jnp.asarray(n)
    depth = jnp.asarray(rng.random((h, w), np.float32) * 10 + 1)
    albedo = jnp.asarray(rng.random((h, w, 3), np.float32))
    material = jnp.asarray((rng.integers(0, 3, (h, w)) << 24).astype(np.int32))
    cam_o = Camera()
    r_, u_, f_ = cam_o.axis_scaled(w, h)
    cam = tuple(
        jnp.asarray(v, jnp.float32) for v in (cam_o.position, r_, u_, f_)
    )
    params = DenoiseParams()

    ref = np.asarray(
        jax.jit(partial(denoise_xla.denoise, radius=2))(
            colors, normal, depth, albedo, material, cam, params
        )
    )
    got = np.moveaxis(np.asarray(
        denoise_pallas.denoise(
            jnp.moveaxis(colors, -1, 0), jnp.moveaxis(normal, -1, 0),
            depth, jnp.moveaxis(albedo, -1, 0), material, cam, params,
            radius=2, interpret=True,
        )
    ), 0, -1)
    np.testing.assert_allclose(got, ref, atol=2e-5)

    # radius 0: pure albedo modulation on both paths
    ref0 = np.asarray(
        jax.jit(partial(denoise_xla.denoise, radius=0))(
            colors, normal, depth, albedo, material, cam, params
        )
    )
    got0 = np.moveaxis(np.asarray(
        denoise_pallas.denoise(
            jnp.moveaxis(colors, -1, 0), jnp.moveaxis(normal, -1, 0),
            depth, jnp.moveaxis(albedo, -1, 0), material, cam, params,
            radius=0, interpret=True,
        )
    ), 0, -1)
    np.testing.assert_allclose(got0, ref0, atol=1e-6)


def test_pallas_denoise_rolled_radius_matches_xla():
    """radius > 2 takes the rolled-window-row kernel path (fori_loop
    over sublane offsets; the full unroll's compile time is
    O((2r+1)^2) and ran past 9 minutes at r=4 on hardware).  Weight
    math is shared with the unrolled path — the result must match the
    XLA reference at the same tolerance the r=2 test uses."""
    h, w = 40, 96
    rng = np.random.default_rng(1)
    colors = jnp.asarray(rng.random((h, w, 3), np.float32))
    n = rng.standard_normal((h, w, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    normal = jnp.asarray(n)
    depth = jnp.asarray(rng.random((h, w), np.float32) * 10 + 1)
    albedo = jnp.asarray(rng.random((h, w, 3), np.float32))
    material = jnp.asarray(
        (rng.integers(0, 3, (h, w)) << 24).astype(np.int32)
    )
    cam_o = Camera()
    r_, u_, f_ = cam_o.axis_scaled(w, h)
    cam = tuple(
        jnp.asarray(v, jnp.float32) for v in (cam_o.position, r_, u_, f_)
    )
    params = DenoiseParams()

    ref = np.asarray(
        jax.jit(partial(denoise_xla.denoise, radius=3))(
            colors, normal, depth, albedo, material, cam, params
        )
    )
    got = np.moveaxis(np.asarray(
        denoise_pallas.denoise(
            jnp.moveaxis(colors, -1, 0), jnp.moveaxis(normal, -1, 0),
            depth, jnp.moveaxis(albedo, -1, 0), material, cam, params,
            radius=3, interpret=True,
        )
    ), 0, -1)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_padded_out_matches_cropped():
    """padded_out=True returns the tile-padded (3, hp, wp) stack whose
    crop equals the exact-shape result (the pipeline crops inside the
    u8 tonemap fusion instead of materializing sliced f32 planes)."""
    h, w = 48, 160  # not multiples of the (64, 256) tile
    rng = np.random.default_rng(2)
    stack = jnp.asarray(rng.standard_normal((12, h, w)).astype(np.float32))
    stack = stack.at[11].set(1.0)
    cam_o = Camera()
    r_, u_, f_ = cam_o.axis_scaled(w, h)
    cam = tuple(
        jnp.asarray(v, jnp.float32) for v in (cam_o.position, r_, u_, f_)
    )
    params = DenoiseParams()
    exact = np.asarray(
        denoise_pallas.denoise_from_stack(
            stack, cam, params, radius=2, interpret=True
        )
    )
    padded = np.asarray(
        denoise_pallas.denoise_from_stack(
            stack, cam, params, radius=2, interpret=True, padded_out=True
        )
    )
    assert exact.shape == (3, h, w)
    assert padded.shape[0] == 3
    assert padded.shape[1] >= h and padded.shape[2] >= w
    np.testing.assert_array_equal(padded[:, :h, :w], exact)
