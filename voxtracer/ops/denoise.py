"""Cross-bilateral spatial denoiser.

Semantics of ``shaders/denoise.comp``: one pass over a
``(2r+1) x (2r+1)`` window; each tap's weight is a Gaussian over pixel
distance times an edge-stopping term built from color difference,
normal difference, log-depth difference scaled by the view/normal
angle, and a material-id mismatch penalty (``denoise.comp:64-80``);
the filtered color is then remodulated by albedo
(``out = mix(out, albedo * out, albedo_factor)``, ``denoise.comp:90``).

TPU realization: the radius is a static structural parameter, so the
window is unrolled into shifted dense slices — a stencil of elementwise
VPU ops XLA can fuse — rather than a per-pixel loop with bounds checks.
Out-of-frame taps are excluded by validity masks, matching the
reference's bounds test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .trace_xla import _normalize


def _shift2d(arr: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift so result[y, x] = arr[y + dy, x + dx], zero-padded."""
    pad_y = (max(0, -dy), max(0, dy))
    pad_x = (max(0, -dx), max(0, dx))
    pad = [pad_y, pad_x] + [(0, 0)] * (arr.ndim - 2)
    h, w = arr.shape[:2]
    padded = jnp.pad(arr, pad)
    return padded[
        pad_y[0] + dy : pad_y[0] + dy + h,
        pad_x[0] + dx : pad_x[0] + dx + w,
    ]


def denoise(
    colors: jnp.ndarray,  # (H, W, 3) temporally blended color
    normal: jnp.ndarray,  # (H, W, 3)
    depth: jnp.ndarray,  # (H, W)
    albedo: jnp.ndarray,  # (H, W, 3)
    material: jnp.ndarray,  # (H, W) int32 (top 8 bits compared)
    cam: tuple,  # origin, right, up, forward (pixel-scaled)
    params,  # DenoiseParams (traced sigmas / albedo factor)
    radius: int,  # static
) -> jnp.ndarray:
    height, width = depth.shape
    if radius == 0:
        out = colors
    else:
        origin, right, up, forward = cam
        px = jax.lax.broadcasted_iota(jnp.float32, (height, width, 1), 1)
        py = jax.lax.broadcasted_iota(jnp.float32, (height, width, 1), 0)
        ray = _normalize(px * right - py * up + forward)
        depth_bias = jnp.maximum(
            0.0, jnp.sum(normal * -ray, axis=-1)
        )

        sigma_d2 = 2.0 * params.sigma_distance**2
        sigma_r2 = 2.0 * params.sigma_range**2

        log_depth = jnp.log(jnp.abs(depth))
        mat_id = material >> 24

        valid = jnp.ones_like(depth, dtype=bool)
        norm_sum = jnp.zeros_like(depth)
        color_sum = jnp.zeros_like(colors)
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                w_color = _shift2d(colors, dy, dx)
                w_normal = _shift2d(normal, dy, dx)
                w_logd = _shift2d(log_depth, dy, dx)
                w_mat = _shift2d(mat_id, dy, dx)
                w_valid = _shift2d(valid, dy, dx)

                cd = colors - w_color
                nd = normal - w_normal
                dd = log_depth - w_logd
                md = (mat_id != w_mat).astype(jnp.float32)

                factor_range = (
                    jnp.sum(cd * cd, axis=-1)
                    + 1e4 * jnp.sum(nd * nd, axis=-1)
                    + 1e4 * (depth_bias * dd) ** 2
                    + 1e4 * md
                ) / sigma_r2
                factor_dist = (dx * dx + dy * dy) / sigma_d2
                f = jnp.exp(-factor_range - factor_dist) * w_valid
                norm_sum = norm_sum + f
                color_sum = color_sum + f[..., None] * w_color
        out = color_sum / norm_sum[..., None]

    factor = params.albedo_factor
    return out * (1.0 - factor) + albedo * out * factor
