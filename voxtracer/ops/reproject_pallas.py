"""History resampling for temporal reprojection as a Pallas TPU kernel.

The XLA path (``temporal._bilinear``) fetches 4 bilinear taps per pixel
with flat ``jnp.take`` gathers — the TPU's slowest primitive (~50 ms at
1080p).  This kernel exploits what camera motion actually looks like:
between consecutive frames the integer part of the reprojection offset
``(src - dst)`` is *piecewise constant* — a (32, 128) pixel tile
typically contains only a handful of distinct integer offsets.  So it
serves taps **by offset**: each round min-reduces the pending offset
keys to a scalar, rotates the channel-stacked history window by that
offset (``pltpu.roll`` with a dynamic positive shift — Mosaic forbids
unaligned dynamic vector slices, and negative dynamic roll shifts
mis-lower on this chip), then retires every lane whose offset falls in
the ``SERVE_NY x SERVE_NX`` rectangle anchored there — the extra
offsets are static slices of the same rolled band, so one roll + one
reduce serve the whole cluster.  No gathers anywhere.  Smooth motion ⇒
~1-4 rounds per tile.

Lanes whose offset exceeds the window margin M or that remain unserved
at the round cap report invalid — the blend treats them like a failed
history test and restarts accumulation there (quality-conservative,
never wrong).  The pipeline uses this kernel on TPU and falls back to
the XLA gather path elsewhere; both implement ``temporal.comp:75-124``
sampling semantics (clamp-to-edge bilinear at pixel centers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

TILE_H = int(_os.environ.get("VOX_REPRO_TILE_H", 32))
TILE_W = 128
MARGIN = 24  # max |integer offset| served; beyond -> invalid history
# window rows: the worst-case tap row is wy_max + TILE_H + 1 where
# wy_max = MARGIN + 31 (offset + 8-alignment residual of the origin)
WIN_H = -(-(MARGIN + 31 + TILE_H + 2) // 8) * 8
WIN_W = TILE_W + 2 * 128  # 128-aligned origin; slices need tile slack
# history is edge-padded by (PAD_Y, PAD_X) so window origins never clamp
# at image borders (replicated padding == clamp-to-edge sampling)
PAD_Y = 40
PAD_X = 128
MAX_ROUNDS = int(_os.environ.get("VOX_REPRO_ROUNDS", 48))
BIG = np.int32(1 << 30)
# Offsets served per round: a round retires the whole
# [sy, sy+SERVE_NY) x [sx, sx+SERVE_NX) offset rectangle anchored at
# the min pending key (the anchor lane itself is always in the
# rectangle, guaranteeing progress).  Static slices of the rolled band
# feed each extra offset — no extra rolls or reduces.  Measured WORSE
# than 1x1 on a 1080p zoom+pan field (2x1: 23.3, 2x2: 23.5, 4x2: 26.6
# vs 21.8 ms): the per-round tap fan-out outweighs the round savings,
# so the default serves one offset; kept as oracle-parity-tested
# probe knobs.
SERVE_NY = int(_os.environ.get("VOX_REPRO_NY", 1))
SERVE_NX = int(_os.environ.get("VOX_REPRO_NX", 1))
# Resolve the 0..7 y residual with lax.switch (static tap rows, one
# branch runs) instead of a y shift network over the whole band.
# Measured WORSE in-frame (12.3 vs 11.4 ms at 1080p dolly — per-round
# branch dispatch beats the roll it saves); kept as a probe knob.
Y_SWITCH = _os.environ.get("VOX_REPRO_YSWITCH", "0") == "1"
# 8-aligned row band sliced around a served offset; must fit the tile,
# the +1 bilinear row, the y-offset fan-out and the <=7 residual
BAND_H = -(-(TILE_H + 1 + (SERVE_NY - 1) + 7) // 8) * 8
# Largest servable tap-row offset: the serve band must start 8-aligned
# at or below it and still end inside the channel's window rows (the
# in_win test enforces this bound, so larger offsets simply invalidate
# history instead of overrunning the scratch window).
WY_MAX = min(WIN_H - TILE_H - 2, WIN_H - BAND_H + 7)
assert WY_MAX >= MARGIN, "SERVE_NY too large for WIN_H"


def _make_kernel(height, width, img_h, img_w, channels):
    def kernel(xf_ref, yf_ref, hist_ref, out_ref, valid_ref, win_ref, sem):
        ti = pl.program_id(0)
        tj = pl.program_id(1)

        ty0 = ti * TILE_H
        tx0 = tj * TILE_W
        # window origin in PADDED history coords: 8/128-aligned and
        # covering the tile +- MARGIN; the edge padding guarantees it
        # never needs clamping, so every |offset| <= MARGIN lane is
        # servable even at image borders
        oy = ((ty0 - MARGIN) // 8) * 8 + PAD_Y
        ox = tx0

        # channels stack along sublanes: (C*WIN_H, WIN_W) scratch, one
        # DMA per channel; a single dynamic roll then serves every
        # channel at once (each round's taps stay inside the serving
        # channel's BAND_H rows, so a full-stack roll never
        # contaminates across channels)
        copies = [
            pltpu.make_async_copy(
                hist_ref.at[c, pl.ds(oy, WIN_H), pl.ds(ox, WIN_W)],
                win_ref.at[pl.ds(c * WIN_H, WIN_H), :],
                sem.at[c],
            )
            for c in range(channels)
        ]
        for cp in copies:
            cp.start()

        shape = (TILE_H, TILE_W)
        ly = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)

        # bilinear footprint at pixel centers, clamp-to-edge (matches
        # temporal._bilinear exactly)
        xf = xf_ref[...] - 0.5
        yf = yf_ref[...] - 0.5
        x0f = jnp.floor(xf)
        y0f = jnp.floor(yf)
        tx = xf - x0f
        ty = yf - y0f
        # clamp each tap independently from the UNclipped floor, like
        # the XLA path: at the image edge both taps land on the same
        # pixel (dx1/dy1 == 0 selects the shared value below).  Clamp
        # to the TRUE image bounds, not the tile-padded ones — the pad
        # rows hold zeros, the edge row is the correct clamp target.
        x0 = jnp.clip(x0f.astype(jnp.int32), 0, img_w - 1)
        y0 = jnp.clip(y0f.astype(jnp.int32), 0, img_h - 1)
        x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, img_w - 1)
        y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, img_h - 1)

        # window-relative integer offset of tap00 from the lane; a
        # round's (TILE_H, TILE_W) slices start at (offset_y, offset_x),
        # so the offset must keep the whole slice (and its +1 taps)
        # inside the window
        wy = y0 + PAD_Y - oy - ly
        wx = x0 + PAD_X - ox - lx
        in_win = (
            (wy >= 0)
            & (wy <= WY_MAX)
            & (wx >= 0)
            & (wx <= WIN_W - TILE_W - 2)
        )
        key = jnp.where(in_win, wy * np.int32(WIN_W + 1) + wx, BIG)

        dx1 = x1 - x0  # 0 at the right edge (clamped), else 1
        dy1 = y1 - y0

        for cp in copies:
            cp.wait()

        zf = xf * 0.0
        acc = [zf for _ in range(channels)]
        served = jnp.zeros_like(key) + (~in_win).astype(jnp.int32)

        def cond(s):
            k, served_ = s[0], s[1]
            return jnp.logical_and(
                k < MAX_ROUNDS, jnp.min(jnp.where(served_ == 0, key, BIG)) < BIG
            )

        def body(s):
            k, served_ = s[0], s[1]
            accs = list(s[2:])
            pend_ = served_ == 0
            pend = jnp.where(pend_, key, BIG)
            skey = jnp.min(pend)
            sy = skey // np.int32(WIN_W + 1)
            sx = skey - sy * np.int32(WIN_W + 1)
            # Rotates are log2(n)-pass shift networks — keep the
            # rotated working set small: slice an 8-aligned row band
            # per channel and a 128-aligned 256-col band (aligned
            # dynamic slices are legal), then rotate only the residual
            # (reads stay inside each channel's band, so the circular
            # wrap never contaminates across channels).
            sy8 = pl.multiple_of((sy >> 3) << 3, 8)
            syr = sy - sy8
            sx128 = pl.multiple_of((sx >> 7) << 7, 128)
            sxr = sx - sx128
            band = jnp.concatenate(
                [
                    win_ref[pl.ds(c * WIN_H + sy8, BAND_H), pl.ds(sx128, 256)]
                    for c in range(channels)
                ],
                axis=0,
            )
            if Y_SWITCH:
                # the y residual is only 0..7: branch on it with
                # lax.switch and read rows at a STATIC offset — one
                # branch executes, replacing the (C*BAND_H, 256) y
                # shift network entirely (the x residual spans 128
                # values, so x keeps the roll)
                rolled = pltpu.roll(band, np.int32(256) - sxr, 1)
            else:
                rolled = pltpu.roll(
                    band, np.int32(channels * BAND_H) - syr, 0
                )
                rolled = pltpu.roll(rolled, np.int32(256) - sxr, 1)

            def serve_taps(row0, served_b, accs_b):
                """Serve the offset rectangle with tap rows at the
                static row offset ``row0`` of each channel's band.

                Taps use at most a handful of live temporaries —
                caching shared interpolants across offsets measured
                catastrophic (register spills: 4x2 cached
                interpolants ran the 1080p resample at 47 ms vs 11
                under a dolly field)."""
                accs_b = list(accs_b)
                for d in range(SERVE_NY):
                    for dx in range(SERVE_NX):
                        # dx > 0 taps must not read past the
                        # unwrapped part of the circular x-roll: the
                        # last tap col is dx + TILE_W, valid while
                        # sxr <= 127 - dx
                        sel = pend_ & (wy == sy + d) & (wx == sx + dx)
                        if dx > 0:
                            sel = sel & (sxr <= np.int32(127 - dx))
                        for c in range(channels):
                            r0 = c * BAND_H + row0 + d
                            blk = rolled[
                                r0 : r0 + TILE_H + 1,
                                dx : dx + TILE_W + 1,
                            ]
                            s00 = blk[:TILE_H, :TILE_W]
                            s10 = blk[:TILE_H, 1:]
                            s01 = blk[1:, :TILE_W]
                            s11 = blk[1:, 1:]
                            # edge-clamped taps: where x1==x0 /
                            # y1==y0 the +1 slice read a neighbor the
                            # clamp forbids; select the shared
                            # tap00-side value back in
                            top = s00 * (1.0 - tx) + jnp.where(
                                dx1 == 1, s10, s00
                            ) * tx
                            bot = s01 * (1.0 - tx) + jnp.where(
                                dx1 == 1, s11, s01
                            ) * tx
                            v = top * (1.0 - ty) + jnp.where(
                                dy1 == 1, bot, top
                            ) * ty
                            accs_b[c] = jnp.where(sel, v, accs_b[c])
                        served_b = jnp.where(sel, 1, served_b)
                return (served_b,) + tuple(accs_b)

            if Y_SWITCH:
                res = jax.lax.switch(
                    syr,
                    [
                        (lambda r: lambda: serve_taps(r, served_, accs))(r)
                        for r in range(8)
                    ],
                )
            else:
                res = serve_taps(0, served_, accs)
            served_ = res[0]
            accs = list(res[1:])
            return (k + 1, served_) + tuple(accs)

        out = jax.lax.while_loop(cond, body, (np.int32(0), served) + tuple(acc))
        served = out[1]
        accs = out[2:]
        for c in range(channels):
            out_ref[c, :, :] = accs[c]
        valid_ref[:, :] = (in_win & (served == 1)).astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def resample(
    hist: jnp.ndarray,  # (C, H, W) f32 history channels
    px_f: jnp.ndarray,  # (H, W) f32 source x in pixel units
    py_f: jnp.ndarray,  # (H, W) f32 source y in pixel units
    interpret: bool = False,
):
    """Bilinear-resample ``hist`` at (py_f, px_f) per output pixel.

    Returns ``(sampled (C, H, W), ok (H, W) bool)`` where ``ok`` is
    False for lanes the offset-serve could not cover (history there
    must be treated as invalid).
    """
    channels, height, width = hist.shape
    hp = -(-height // TILE_H) * TILE_H
    wp = -(-width // TILE_W) * TILE_W
    if (hp, wp) != (height, width):
        hist = jnp.pad(hist, ((0, 0), (0, hp - height), (0, wp - width)))
        px_f = jnp.pad(px_f, ((0, hp - height), (0, wp - width)))
        py_f = jnp.pad(py_f, ((0, hp - height), (0, wp - width)))
    # border pad keeps window DMAs in bounds; its CONTENTS are never
    # read (every tap index is clamped to the true image bounds before
    # the window offset is formed), so cheap zero padding suffices —
    # mode="edge" here measured 24 ms/frame at 1080p (XLA lowers
    # replicated pads abysmally on TPU) for values nobody looks at
    hist = jnp.pad(hist, ((0, 0), (PAD_Y, PAD_Y), (PAD_X, PAD_X)))

    grid = (hp // TILE_H, wp // TILE_W)
    kernel = _make_kernel(hp, wp, height, width, channels)
    tile = pl.BlockSpec(
        (TILE_H, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    out, valid = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((channels, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        ),
        in_specs=[
            tile,
            tile,
            pl.BlockSpec(memory_space=pl.ANY),  # history stays in HBM
        ],
        out_specs=(
            pl.BlockSpec(
                (channels, TILE_H, TILE_W),
                lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            tile,
        ),
        scratch_shapes=[
            pltpu.VMEM((channels * WIN_H, WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA((channels,)),
        ],
        interpret=interpret,
    )(px_f, py_f, hist)
    return out[:, :height, :width], valid[:height, :width] > 0.5
