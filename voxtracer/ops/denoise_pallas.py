"""Cross-bilateral denoiser as a Pallas TPU kernel.

Same math as :func:`voxtracer.ops.denoise.denoise` (itself the semantic
twin of ``shaders/denoise.comp``), but the whole ``(2r+1)^2`` stencil
runs out of VMEM: each grid program DMAs one haloed window of the
stacked G-buffer and accumulates every tap on-chip.  The XLA version
streams ~25 full-image slices through HBM per frame (~90 ms at 1080p
r=2); this kernel reads each pixel once.

Channel stack layout (built by :func:`denoise`): planes
``[cr cg cb nx ny nz log|depth| mat_id albedo_r albedo_g albedo_b
valid]`` padded by ``radius`` with zeros (valid=0 outside the frame, so
border taps drop out exactly like the reference's bounds test,
``denoise.comp:57``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# (64, 256) tiles quarter the program count vs (32, 128) and shrink
# the halo DMA per covered pixel; sweepable for perf probes.
TILE_H = int(_os.environ.get("VOX_DEN_TILE_H", 64))
TILE_W = int(_os.environ.get("VOX_DEN_TILE_W", 256))

# stacked-channel indices
_CR, _CG, _CB, _NX, _NY, _NZ, _LOGD, _MAT, _AR, _AG, _AB, _VALID = range(12)

# SMEM params ride the frame's unified (KROWS, 128) kernel-param rows
# (engine/params.pack_kernel_rows); the denoise fields live in row
# KROW: [origin 0-2 | right 3-5 | up 6-8 | fwd 9-11 | sigma_distance
# 12 | sigma_range 13 | albedo_factor 14 | row0 15].
KROWS = 4
KROW = 2
ROW_LEN = 128
DROW_LEN = 16  # used field count within the row


def pack_denoise_row_host(cam, params):
    """Host numpy twin of the traced field pack in
    :func:`denoise_from_stack` (single-device: ``row0 = 0``)."""
    import numpy as np

    vec = np.zeros(DROW_LEN, np.float32)
    vec[0:12] = np.asarray(cam, np.float32).reshape(12)
    vec[12] = params.sigma_distance
    vec[13] = params.sigma_range
    vec[14] = params.albedo_factor
    vec[15] = 0.0
    return vec


def _make_kernel(radius: int, height: int, width: int):
    # DMA slice shapes must align to the (8, 128) tiling
    wh = -(-(TILE_H + 2 * radius) // 8) * 8
    ww = -(-(TILE_W + 2 * radius) // 128) * 128

    def kernel(params_ref, stack_ref, out_ref,
               win_ref, nxt_ref, sem, sem_loc):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        ni = pl.num_programs(0)
        nj = pl.num_programs(1)

        # Double-buffered window pipeline: the HBM fetch for program
        # i+1 overlaps program i's stencil compute (the grid runs
        # sequentially on the core, so scratch state persists across
        # programs).  Program i waits on the fetch its predecessor
        # started into ``nxt``, bounces it to ``cur`` with a cheap
        # VMEM->VMEM copy (keeps ONE compute body — a parity-selected
        # ref would force Mosaic to materialize the window), then
        # prefetches i+1.  Measured at 4K r=2: 9.9 -> 8.8 ms.
        idx = ti * nj + tj

        def window_src(i):
            return stack_ref.at[
                :,
                pl.ds((i // nj) * TILE_H, wh),
                pl.ds(jax.lax.rem(i, nj) * TILE_W, ww),
            ]

        @pl.when(idx == 0)
        def _():
            pltpu.make_async_copy(window_src(idx), nxt_ref, sem).start()

        pltpu.make_async_copy(window_src(idx), nxt_ref, sem).wait()
        bounce = pltpu.make_async_copy(nxt_ref, win_ref, sem_loc)
        bounce.start()
        bounce.wait()

        @pl.when(idx + 1 < ni * nj)
        def _():
            pltpu.make_async_copy(
                window_src(idx + 1), nxt_ref, sem
            ).start()

        def P(i):
            return params_ref[KROW, i]

        shape = (TILE_H, TILE_W)
        fy = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
        fx = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
        px = tj.astype(jnp.float32) * TILE_W + fx
        # P(15): global pixel row of row 0 (nonzero under a row-sharded
        # mesh, where each slab runs this kernel on its own rows)
        py = ti.astype(jnp.float32) * TILE_H + fy + P(15)

        # ray direction for the depth bias term (denoise.comp:28-32,47)
        rdx = px * P(3) - py * P(6) + P(9)
        rdy = px * P(4) - py * P(7) + P(10)
        rdz = px * P(5) - py * P(8) + P(11)
        rn = jnp.sqrt(rdx * rdx + rdy * rdy + rdz * rdz)
        rdx, rdy, rdz = rdx / rn, rdy / rn, rdz / rn

        sigma_d2 = 2.0 * P(12) * P(12)
        sigma_r2 = 2.0 * P(13) * P(13)
        albedo_factor = P(14)

        win = win_ref[:]  # (12, wh, ww)

        def center(c):
            return win[c, radius : radius + TILE_H, radius : radius + TILE_W]

        c_cr, c_cg, c_cb = center(_CR), center(_CG), center(_CB)
        c_nx, c_ny, c_nz = center(_NX), center(_NY), center(_NZ)
        c_logd = center(_LOGD)
        c_mat = center(_MAT)

        depth_bias = jnp.maximum(
            0.0, c_nx * -rdx + c_ny * -rdy + c_nz * -rdz
        )

        def tap_math(tap, dist2f, carry):
            """One tap's weight math against the center pixel —
            shared verbatim by the unrolled (r<=2) and rolled (r>2)
            paths; ``tap(c)`` yields the (TILE_H, TILE_W) window at
            this offset for channel c."""
            norm_sum, sum_r, sum_g, sum_b = carry
            w_cr, w_cg, w_cb = tap(_CR), tap(_CG), tap(_CB)
            cdr = c_cr - w_cr
            cdg = c_cg - w_cg
            cdb = c_cb - w_cb
            ndx = c_nx - tap(_NX)
            ndy = c_ny - tap(_NY)
            ndz = c_nz - tap(_NZ)
            dd = c_logd - tap(_LOGD)
            md = (c_mat != tap(_MAT)).astype(jnp.float32)

            factor_range = (
                cdr * cdr + cdg * cdg + cdb * cdb
                + 1e4 * (ndx * ndx + ndy * ndy + ndz * ndz)
                + 1e4 * (depth_bias * dd) * (depth_bias * dd)
                + 1e4 * md
            ) / sigma_r2
            factor_dist = dist2f / sigma_d2
            f = jnp.exp(-factor_range - factor_dist) * tap(_VALID)
            return (
                norm_sum + f,
                sum_r + f * w_cr,
                sum_g + f * w_cg,
                sum_b + f * w_cb,
            )

        zero = fx * 0.0
        carry = (zero, zero, zero, zero)
        if radius <= 2:
            # fully unrolled on the materialized window: the
            # production r<=2 shape (25 taps), Mosaic schedules
            # across taps
            for dy in range(-radius, radius + 1):
                for dx in range(-radius, radius + 1):
                    y0 = radius + dy
                    x0 = radius + dx
                    carry = tap_math(
                        lambda c, y0=y0, x0=x0: win[
                            c, y0 : y0 + TILE_H, x0 : x0 + TILE_W
                        ],
                        float(dx * dx + dy * dy),
                        carry,
                    )
        else:
            # rolled window rows, dx still unrolled: compile time
            # stays O(2r+1) tap bodies instead of O((2r+1)^2) — the
            # full unroll at r=4 already ran past 9 minutes of TPU
            # compile and r=8 was unbuildable (VERDICT r4 #8: the
            # GUI offers r<=8).  Mosaic requires DYNAMIC sublane
            # offsets to be provably 8-aligned, so the row is picked
            # by a dynamic circular shift (tpu.dynamic_rotate via
            # pltpu.roll) and a static [0:TILE_H] slice; rows past
            # TILE_H wrap circularly but are never read.
            K = 2 * radius + 1
            chans = (
                _CR, _CG, _CB, _NX, _NY, _NZ, _LOGD, _MAT, _VALID
            )

            def dy_body(t, carry):
                dyf = (t - radius).astype(jnp.float32)
                dy2f = dyf * dyf
                rolled = {
                    c: pltpu.roll(win[c], -t, 0) for c in chans
                }
                for dx in range(-radius, radius + 1):
                    x0 = radius + dx
                    carry = tap_math(
                        lambda c, x0=x0: rolled[c][
                            :TILE_H, x0 : x0 + TILE_W
                        ],
                        dx * dx + dy2f,
                        carry,
                    )
                return carry

            carry = jax.lax.fori_loop(0, K, dy_body, carry)
        norm_sum, sum_r, sum_g, sum_b = carry

        out_r = sum_r / norm_sum
        out_g = sum_g / norm_sum
        out_b = sum_b / norm_sum

        mod_r = 1.0 - albedo_factor + albedo_factor * center(_AR)
        mod_g = 1.0 - albedo_factor + albedo_factor * center(_AG)
        mod_b = 1.0 - albedo_factor + albedo_factor * center(_AB)
        # one (3, hp, wp) output array: the kernel writes the planar
        # stack directly, so no post-call 3-plane restack (at 4K the
        # crop+stack of separate plane outputs materialized ~6 ms of
        # async slice copies per frame)
        out_ref[0] = out_r * mod_r
        out_ref[1] = out_g * mod_g
        out_ref[2] = out_b * mod_b

    return kernel, wh, ww


def _pad_to(x, m):
    return -(-x // m) * m


def build_stack(colors, normal, depth, albedo, material):
    """The 12-plane channel stack the stencil consumes (valid=1).

    Inputs are PLANAR — colors/normal/albedo are (3, H, W) plane
    stacks — so this is one contiguous concatenate XLA fuses with the
    downstream pad, instead of twelve strided channel extractions."""
    return jnp.concatenate(
        [
            colors,
            normal,
            jnp.log(jnp.abs(depth))[None],
            (material >> 24).astype(jnp.float32)[None],
            albedo,
            jnp.ones_like(depth)[None],
        ]
    )


@functools.partial(
    jax.jit, static_argnames=("radius", "interpret", "padded_out")
)
def denoise(
    colors: jnp.ndarray,  # (3, H, W) planar
    normal: jnp.ndarray,  # (3, H, W)
    depth: jnp.ndarray,  # (H, W)
    albedo: jnp.ndarray,  # (3, H, W)
    material: jnp.ndarray,  # (H, W) int32
    cam: Tuple,  # origin, right, up, forward (pixel-scaled)
    params,  # DenoiseParams
    radius: int,
    interpret: bool = False,
    params_rows=None,  # see denoise_from_stack
    padded_out: bool = False,  # see denoise_from_stack (radius 0
    #   output is always exact-shape; a crop of it is a no-op)
) -> jnp.ndarray:
    if radius == 0:
        factor = params.albedo_factor
        return colors * (1.0 - factor + factor * albedo)
    stack = build_stack(colors, normal, depth, albedo, material)
    return denoise_from_stack(
        stack, cam, params, radius=radius, interpret=interpret,
        params_rows=params_rows, padded_out=padded_out,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "top_halo", "bot_halo", "interpret", "padded_out"
    ),
)
def denoise_from_stack(
    stack: jnp.ndarray,  # (12, top_halo + H + bot_halo, W)
    cam: Tuple,
    params,
    radius: int,
    top_halo: int = 0,
    bot_halo: int = 0,
    row0=None,  # traced: global pixel row of row 0 (sharded slabs)
    interpret: bool = False,
    params_rows=None,  # (KROWS, 128) host-packed kernel-param rows
    #   (engine/params.pack_kernel_rows); when given, cam/params are
    #   not packed on device (they must already be in row KROW)
    padded_out: bool = False,  # return the tile-padded (3, hp, wp)
    #   stack; callers crop lazily (fuses into the u8 tonemap)
) -> jnp.ndarray:
    """Stencil over a channel stack that may carry row halos.

    A row-sharded mesh runs this per slab: ``top_halo``/``bot_halo``
    rows (up to ``radius`` each) are REAL neighbor-slab rows fetched by
    a ``lax.ppermute`` edge exchange (zeros with valid=0 at the image
    border, exactly like the single-device zero padding), and ``row0``
    offsets the in-kernel pixel rows so the depth-bias ray matches the
    global image.  The single-device path passes the bare stack."""
    assert top_halo <= radius and bot_halo <= radius
    height = stack.shape[1] - top_halo - bot_halo
    width = stack.shape[2]
    hp = _pad_to(height, TILE_H)
    wp = _pad_to(width, TILE_W)

    kernel, wh, ww = _make_kernel(radius, hp, wp)
    # window slices start at (ti*TILE_H, tj*TILE_W) with aligned sizes
    # (wh, ww) >= TILE + 2r: pad so every slice stays in bounds
    stack = jnp.pad(
        stack,
        (
            (0, 0),
            (
                radius - top_halo,
                (hp - TILE_H + wh) - height - radius - bot_halo,
            ),
            (radius, (wp - TILE_W + ww) - width - radius),
        ),
    )

    if params_rows is not None:
        pvec = params_rows
    else:
        _, right, up, forward = cam
        origin = cam[0]
        vec = jnp.concatenate(
            [
                origin.reshape(3),
                right.reshape(3),
                up.reshape(3),
                forward.reshape(3),
                jnp.stack(
                    [
                        jnp.asarray(params.sigma_distance, jnp.float32),
                        jnp.asarray(params.sigma_range, jnp.float32),
                        jnp.asarray(params.albedo_factor, jnp.float32),
                        jnp.asarray(
                            0.0 if row0 is None else row0, jnp.float32
                        ),
                    ]
                ),
            ]
        ).astype(jnp.float32)
        pvec = jnp.zeros((KROWS, ROW_LEN), jnp.float32).at[
            KROW, : vec.shape[0]
        ].set(vec)

    grid = (hp // TILE_H, wp // TILE_W)

    out_p = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((3, hp, wp), jnp.float32),
        in_specs=[
            pl.BlockSpec(
                (KROWS, ROW_LEN), lambda i, j: (0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # stacked G-buffer (HBM)
        ],
        out_specs=pl.BlockSpec(
            (3, TILE_H, TILE_W), lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((12, wh, ww), jnp.float32),
            pltpu.VMEM((12, wh, ww), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            # r=2 fits the default 16M scoped budget; the GUI's full
            # radius range (r<=8, 17x17 taps) needs the tap
            # temporaries' live ranges — same 100M ceiling as the
            # trace kernel
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pvec, stack)

    if padded_out:
        # (3, hp, wp): the caller crops lazily (e.g. inside the u8
        # tonemap fusion) instead of materializing a cropped copy
        return out_p
    return out_p[:, :height, :width]
