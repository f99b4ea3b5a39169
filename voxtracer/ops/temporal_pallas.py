"""Fully-fused temporal reprojection stage as one Pallas TPU kernel.

Round-2 profiling showed the history resample at 11.4 ms of a 30.4 ms
1080p frame — nearly the cost of the whole path trace — even though
the offset-serve kernel itself was fast: the reprojection coordinates,
validity test and blend ran as separate XLA ops around it, each a
full-image HBM pass (write px/py, write 5 sampled channels + valid,
re-read everything plus color/normal/depth for the blend).

This kernel is the whole of ``shaders/temporal.comp`` in one pass:

  in  : current color/normal/depth tiles + the 5-channel history stack
        (rgb, blending, depth) windowed out of HBM
  out : blended color + next blending

Per tile it computes the reprojected screen coordinates from the old
camera basis (``temporal.comp:75-85``), bilinearly resamples history
by the offset-serve scheme of :mod:`voxtracer.ops.reproject_pallas`
(one ``pltpu.roll`` serves every lane sharing an integer offset — no
gathers), applies the world-distance validity test (``:109-114``) and
the blend/next-blending update (``:121-124``).  Lanes whose offset the
window cannot serve report invalid history — accumulation restarts
there, which is quality-conservative and never wrong.

Multi-chip: the same kernel runs per row-slab under ``shard_map``.
The caller passes a history stack extended by ``hist_top``/``hist_bot``
halo rows fetched from the neighboring slabs (one ``lax.ppermute``
edge exchange each) plus the slab's global row offset and the TRUE
image clamp bounds — tap clamping and servability are then computed in
global-image terms, so a sharded render bit-matches the single-device
kernel (which is the ``hist_top == hist_bot == row0 == 0`` case).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

TILE_H = 32
TILE_W = 128
MARGIN = 24  # max |integer y offset| served; beyond -> invalid history
# window rows: covers tap offsets in [-MARGIN, WY_MAX - MARGIN]
WIN_H = -(-(MARGIN + 31 + TILE_H + 2) // 8) * 8
WIN_W = TILE_W + 2 * 128
PAD_Y = 40
PAD_X = 128
MAX_ROUNDS = int(_os.environ.get("VOX_REPRO_ROUNDS", 48))
BIG = np.int32(1 << 30)
BAND_H = -(-(TILE_H + 1 + 7) // 8) * 8
WY_MAX = min(WIN_H - TILE_H - 2, WIN_H - BAND_H + 7)
assert WY_MAX >= MARGIN

# history halo a sharded slab needs from its neighbors: served y
# offsets span [-MARGIN, WY_MAX - MARGIN], bilinear taps add +1 below
HALO_TOP = MARGIN  # multiple of 8 (window DMA alignment)
HALO_BOT = -(-(WY_MAX - MARGIN + 1) // 8) * 8

CHANNELS = 5  # history stack: r, g, b, blending, depth

# SMEM params: the frame's unified (KROWS, 128) kernel-param rows
# (engine/params.pack_kernel_rows) — the temporal fields live in row
# KROW at the offsets below.  Passing the SAME host-packed block to
# every Pallas stage removes all device-side packing of small param
# tensors (XLA staged each through scoped memory with copy-start
# ping-pongs, ~1.5 ms/frame of serialized glue at 4K).
KROWS = 4
KROW = 1  # temporal row index within the block
ROW_LEN = 128
_P_ORIGIN = 0  # 3: new camera origin
_P_RIGHT = 3  # 3 (pixel-scaled basis)
_P_UP = 6
_P_FWD = 9
_P_OORIGIN = 12  # old camera
_P_ORIGHT = 15
_P_OUP = 18
_P_OFWD = 21
_P_INV = 24  # 9: row-major inverse of old basis columns
_P_SAMPLE_BLEND = 33
_P_MAX_BLEND = 34
_P_CUTOFF = 35
_P_HVALID = 36
_P_CLAMP_LO = 37  # true-image y bounds in lane-local rows
_P_CLAMP_HI = 38
_P_ROW0 = 39  # global pixel row of lane row 0
PARAMS_LEN = 48


def _make_kernel(img_w, real_h, real_w, hist_top):
    """``img_w``: full image width (x is never sharded).  ``real_h``/
    ``real_w``: un-padded lane extents (pad lanes are masked out of the
    serve).  ``hist_top``: history rows above lane row 0 (slab halo)."""

    def kernel(
        p_ref,  # (KROWS, 128) f32 SMEM — temporal fields in row KROW
        cr_ref, cg_ref, cb_ref,  # current sample color tiles
        nx_ref, ny_ref, nz_ref,  # first-hit normal tiles
        d_ref,  # depth tile
        hist_ref,  # (5, Hh_padded, Wp_padded) f32 HBM
        out_r_ref, out_g_ref, out_b_ref, nb_ref,
        win_ref, sem,
    ):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        ty0 = ti * TILE_H
        tx0 = tj * TILE_W
        # window origin in the padded history stack; ty0 and MARGIN are
        # multiples of 8, so oy is 8-aligned iff hist_top is
        oy = ty0 - MARGIN + hist_top + PAD_Y
        ox = tx0

        copies = [
            pltpu.make_async_copy(
                hist_ref.at[c, pl.ds(oy, WIN_H), pl.ds(ox, WIN_W)],
                win_ref.at[pl.ds(c * WIN_H, WIN_H), :],
                sem.at[c],
            )
            for c in range(CHANNELS)
        ]
        for cp in copies:
            cp.start()

        def P(i):
            return p_ref[KROW, i]

        shape = (TILE_H, TILE_W)
        ly = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        fy = ly.astype(jnp.float32)
        fx = lx.astype(jnp.float32)

        row0 = P(_P_ROW0)
        px = fx + np.float32(TILE_W) * tj.astype(jnp.float32)
        py = fy + np.float32(TILE_H) * ti.astype(jnp.float32) + row0

        # current-pixel ray and first-hit world position
        # (temporal.comp:40-46; matches temporal._pixel_rays rounding)
        rdx = px * P(_P_RIGHT) - py * P(_P_UP) + P(_P_FWD)
        rdy = px * P(_P_RIGHT + 1) - py * P(_P_UP + 1) + P(_P_FWD + 1)
        rdz = px * P(_P_RIGHT + 2) - py * P(_P_UP + 2) + P(_P_FWD + 2)
        rn = jnp.sqrt(rdx * rdx + rdy * rdy + rdz * rdz)
        rdx, rdy, rdz = rdx / rn, rdy / rn, rdz / rn
        depth = d_ref[...]
        wx_p = P(_P_ORIGIN) + depth * rdx
        wy_p = P(_P_ORIGIN + 1) + depth * rdy
        wz_p = P(_P_ORIGIN + 2) + depth * rdz

        # world -> old screen through the inverse old pixel basis
        # (temporal.comp:75-85)
        relx = wx_p - P(_P_OORIGIN)
        rely = wy_p - P(_P_OORIGIN + 1)
        relz = wz_p - P(_P_OORIGIN + 2)
        s0 = P(_P_INV) * relx + P(_P_INV + 1) * rely + P(_P_INV + 2) * relz
        s1 = (
            P(_P_INV + 3) * relx
            + P(_P_INV + 4) * rely
            + P(_P_INV + 5) * relz
        )
        s2 = (
            P(_P_INV + 6) * relx
            + P(_P_INV + 7) * rely
            + P(_P_INV + 8) * relz
        )
        sx = s0 / s2
        sy = s1 / s2
        # the tex roundtrip reproduces temporal.py's exact rounding
        img_h_f = P(_P_CLAMP_HI) - P(_P_CLAMP_LO) + 1.0
        tex_x = (sx + 0.5) / np.float32(img_w)
        tex_y = (sy - 0.5) / -img_h_f
        in_range = (
            (tex_x >= 0.0) & (tex_x <= 1.0)
            & (tex_y >= 0.0) & (tex_y <= 1.0)
        )
        px_f = tex_x * np.float32(img_w)
        py_f = tex_y * img_h_f
        py_l = py_f - row0  # lane-local history row coordinate

        # bilinear footprint at pixel centers, clamp-to-edge at the
        # TRUE image bounds (global, so sharded == single-device)
        xf = px_f - 0.5
        yf = py_l - 0.5
        x0f = jnp.floor(xf)
        y0f = jnp.floor(yf)
        tx = xf - x0f
        ty = yf - y0f
        lo_y = P(_P_CLAMP_LO).astype(jnp.int32)
        hi_y = P(_P_CLAMP_HI).astype(jnp.int32)
        x0 = jnp.clip(x0f.astype(jnp.int32), 0, img_w - 1)
        y0 = jnp.clip(y0f.astype(jnp.int32), lo_y, hi_y)
        x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, img_w - 1)
        y1 = jnp.clip(y0f.astype(jnp.int32) + 1, lo_y, hi_y)
        dx1 = x1 - x0
        dy1 = y1 - y0

        # window-relative integer offsets; key servability is purely
        # offset-based (wy = y_offset + MARGIN, wx = x_offset + PAD_X)
        wy = y0 + (hist_top + PAD_Y) - oy - ly
        wx = x0 + PAD_X - ox - lx
        # only real-image hit lanes join the serve: pad lanes and
        # misses never cost rounds (a miss's blend is independent of
        # history: valid is false there either way)
        need = (
            (depth >= 0.0)
            & (ly + ty0 < real_h)
            & (lx + tx0 < real_w)
        )
        in_win = (
            need
            & (wy >= 0)
            & (wy <= WY_MAX)
            & (wx >= 0)
            & (wx <= WIN_W - TILE_W - 2)
        )
        key = jnp.where(in_win, wy * np.int32(WIN_W + 1) + wx, BIG)

        for cp in copies:
            cp.wait()

        zf = xf * 0.0
        acc = [zf for _ in range(CHANNELS)]
        served = jnp.zeros_like(key) + (~in_win).astype(jnp.int32)

        def cond(s):
            k, served_ = s[0], s[1]
            return jnp.logical_and(
                k < MAX_ROUNDS,
                jnp.min(jnp.where(served_ == 0, key, BIG)) < BIG,
            )

        def body(s):
            k, served_ = s[0], s[1]
            accs = list(s[2:])
            pend_ = served_ == 0
            pend = jnp.where(pend_, key, BIG)
            skey = jnp.min(pend)
            sy_ = skey // np.int32(WIN_W + 1)
            sx_ = skey - sy_ * np.int32(WIN_W + 1)
            sy8 = pl.multiple_of((sy_ >> 3) << 3, 8)
            syr = sy_ - sy8
            sx128 = pl.multiple_of((sx_ >> 7) << 7, 128)
            sxr = sx_ - sx128
            band = jnp.concatenate(
                [
                    win_ref[
                        pl.ds(c * WIN_H + sy8, BAND_H), pl.ds(sx128, 256)
                    ]
                    for c in range(CHANNELS)
                ],
                axis=0,
            )
            rolled = pltpu.roll(
                band, np.int32(CHANNELS * BAND_H) - syr, 0
            )
            rolled = pltpu.roll(rolled, np.int32(256) - sxr, 1)

            sel = pend_ & (wy == sy_) & (wx == sx_)
            for c in range(CHANNELS):
                blk = rolled[
                    c * BAND_H : c * BAND_H + TILE_H + 1, : TILE_W + 1
                ]
                s00 = blk[:TILE_H, :TILE_W]
                s10 = blk[:TILE_H, 1:]
                s01 = blk[1:, :TILE_W]
                s11 = blk[1:, 1:]
                top = s00 * (1.0 - tx) + jnp.where(dx1 == 1, s10, s00) * tx
                bot = s01 * (1.0 - tx) + jnp.where(dx1 == 1, s11, s01) * tx
                v = top * (1.0 - ty) + jnp.where(dy1 == 1, bot, top) * ty
                accs[c] = jnp.where(sel, v, accs[c])
            served_ = jnp.where(sel, 1, served_)
            return (k + 1, served_) + tuple(accs)

        out = jax.lax.while_loop(
            cond, body, (np.int32(0), served) + tuple(acc)
        )
        served = out[1]
        h_r, h_g, h_b, h_blend, old_nd = out[2:]
        ok = in_win & (served == 1)

        # old-ray reconstruction quantizes to the pixel lattice
        # (temporal.comp:99-103); int() truncates toward zero
        qx = jnp.sign(sx + 0.5) * jnp.floor(jnp.abs(sx + 0.5))
        qy = jnp.sign(sy - 0.5) * jnp.floor(jnp.abs(sy - 0.5))
        ox_ = qx * P(_P_ORIGHT) + qy * P(_P_OUP) + P(_P_OFWD)
        oy_ = (
            qx * P(_P_ORIGHT + 1)
            + qy * P(_P_OUP + 1)
            + P(_P_OFWD + 1)
        )
        oz_ = (
            qx * P(_P_ORIGHT + 2)
            + qy * P(_P_OUP + 2)
            + P(_P_OFWD + 2)
        )
        on = jnp.sqrt(ox_ * ox_ + oy_ * oy_ + oz_ * oz_)
        ox_, oy_, oz_ = ox_ / on, oy_ / on, oz_ / on
        owx = P(_P_OORIGIN) + old_nd * ox_
        owy = P(_P_OORIGIN + 1) + old_nd * oy_
        owz = P(_P_OORIGIN + 2) + old_nd * oz_

        # world-distance validity scaled by depth and view angle
        # (temporal.comp:109-114)
        cdx = P(_P_ORIGIN) - wx_p
        cdy = P(_P_ORIGIN + 1) - wy_p
        cdz = P(_P_ORIGIN + 2) - wz_p
        cn = jnp.sqrt(cdx * cdx + cdy * cdy + cdz * cdz)
        cdx, cdy, cdz = cdx / cn, cdy / cn, cdz / cn
        nxv = nx_ref[...]
        nyv = ny_ref[...]
        nzv = nz_ref[...]
        bias = jnp.maximum(0.0, cdx * nxv + cdy * nyv + cdz * nzv)
        ddx = owx - wx_p
        ddy = owy - wy_p
        ddz = owz - wz_p
        dist = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
        same_pos = dist < bias * P(_P_CUTOFF) * depth

        valid = (
            in_range & ok & same_pos & (depth >= 0.0)
            & (P(_P_HVALID) > 0.0)
        )
        use_r = jnp.where(valid, h_r, 0.0)
        use_g = jnp.where(valid, h_g, 0.0)
        use_b = jnp.where(valid, h_b, 0.0)
        blending = jnp.where(valid, h_blend, 1.0)

        hitp = depth >= 0.0
        cr = cr_ref[...]
        cg = cg_ref[...]
        cb = cb_ref[...]
        out_r_ref[...] = jnp.where(
            hitp, use_r * (1.0 - blending) + cr * blending, cr
        )
        out_g_ref[...] = jnp.where(
            hitp, use_g * (1.0 - blending) + cg * blending, cg
        )
        out_b_ref[...] = jnp.where(
            hitp, use_b * (1.0 - blending) + cb * blending, cb
        )
        # next = clamp((1-sample)*blending, 1-max, 1)  (:121-124)
        nb_ref[...] = jnp.clip(
            (1.0 - P(_P_SAMPLE_BLEND)) * blending,
            1.0 - P(_P_MAX_BLEND),
            1.0,
        )

    return kernel


def pack_temporal_params(
    cam, old_cam, params, history_valid, clamp_lo, clamp_hi, row0
):
    """Traced (KROWS, 128) kernel-param rows with the temporal fields
    in row KROW — the mesh path (dynamic per-slab row0) and any caller
    without host-packed rows."""
    origin, right, up, fwd = cam
    o_origin, o_right, o_up, o_fwd = old_cam
    from .temporal import _inv3

    basis = jnp.stack([o_right, o_up, o_fwd], axis=1)
    # the ONE adjugate-inverse implementation — fused-vs-XLA parity
    # depends on both paths inverting bit-identically
    inv = _inv3(basis)
    vec = jnp.concatenate(
        [
            origin.reshape(3), right.reshape(3), up.reshape(3),
            fwd.reshape(3),
            o_origin.reshape(3), o_right.reshape(3), o_up.reshape(3),
            o_fwd.reshape(3),
            inv.reshape(9),
            jnp.stack(
                [
                    jnp.asarray(params.sample_blending, jnp.float32),
                    jnp.asarray(params.maximum_blending, jnp.float32),
                    jnp.asarray(
                        params.blending_distance_cutoff, jnp.float32
                    ),
                ]
            ),
            jnp.stack(
                [
                    jnp.asarray(history_valid, jnp.float32),
                    jnp.asarray(clamp_lo, jnp.float32),
                    jnp.asarray(clamp_hi, jnp.float32),
                    jnp.asarray(row0, jnp.float32),
                ]
            ),
        ]
    ).astype(jnp.float32)
    rows = jnp.zeros((KROWS, ROW_LEN), jnp.float32)
    return rows.at[KROW, : vec.shape[0]].set(vec)


def pack_temporal_row_host(cam, old_cam, params, history_valid,
                           img_height):
    """Host numpy twin of :func:`pack_temporal_params` for the
    single-device packed-row path (``row0 = 0``, clamps spanning the
    whole image).  Layout pinned to the ``_P_*`` offsets above; the
    traced and host packers are asserted equal in the test suite."""
    import numpy as np

    from .temporal import _inv3_np

    cam = np.asarray(cam, np.float32)
    old = np.asarray(old_cam, np.float32)
    basis = np.stack([old[1], old[2], old[3]], axis=1)
    inv = _inv3_np(basis)
    vec = np.zeros(PARAMS_LEN, np.float32)
    vec[0:12] = cam.reshape(12)
    vec[12:24] = old.reshape(12)
    vec[_P_INV : _P_INV + 9] = inv.reshape(9)
    vec[_P_SAMPLE_BLEND] = params.sample_blending
    vec[_P_MAX_BLEND] = params.maximum_blending
    vec[_P_CUTOFF] = params.blending_distance_cutoff
    vec[_P_HVALID] = float(bool(history_valid))
    vec[_P_CLAMP_LO] = 0.0
    vec[_P_CLAMP_HI] = float(img_height - 1)
    vec[_P_ROW0] = 0.0
    return vec


@functools.partial(
    jax.jit,
    static_argnames=("img_height", "hist_top", "hist_bot", "interpret"),
)
def temporal_blend_fused(
    sampled_color: jnp.ndarray,  # (3, H, W) current trace output
    normal: jnp.ndarray,  # (3, H, W)
    depth: jnp.ndarray,  # (H, W)
    hist: jnp.ndarray,  # (5, hist_top + H + hist_bot, W) history stack
    cam,  # tuple of 4 (3,) f32: origin, right, up, forward
    old_cam,
    params,  # TemporalParams
    history_valid,  # () bool
    *,
    img_height: int = None,  # full image height (defaults to H)
    hist_top: int = 0,  # slab halo rows above lane row 0
    hist_bot: int = 0,
    row0=None,  # traced scalar: global row of lane row 0
    interpret: bool = False,
    params_rows=None,  # (KROWS, 128) host-packed kernel-param rows
    #   (engine/params.pack_kernel_rows).  When given, cam/old_cam/
    #   params/history_valid are NOT packed on device (they must
    #   already be in row KROW) — the production single-device path,
    #   avoiding the scoped-memory staging of tiny traced fusions.
):
    """Returns ``(blended (3,H,W), next_blending (H,W))`` — the whole
    reproject+validate+blend stage of ``temporal.comp`` in one kernel.
    Color/normal I/O is PLANAR: plane slices of a (3, H, W) stack are
    contiguous and fuse into the pre-kernel pads, where channels-last
    ``[..., c]`` slices each cost a full-plane copy on TPU.

    The single-device case is ``hist_top == hist_bot == 0`` with
    ``hist`` exactly the (5, H, W) history.  A sharded caller passes
    the halo-extended slab stack plus its global ``row0``; results are
    bitwise identical to the single-device kernel because taps clamp
    to the true image bounds and servability depends only on the
    global integer offset."""
    height, width = depth.shape
    if img_height is None:
        img_height = height
    if row0 is None:
        row0 = jnp.float32(0.0)
    assert hist_top % 8 == 0, "hist_top must keep window DMAs 8-aligned"
    assert hist.shape[1] == hist_top + height + hist_bot

    hp = -(-height // TILE_H) * TILE_H
    wp = -(-width // TILE_W) * TILE_W

    if params_rows is not None:
        pvec = params_rows
    else:
        clamp_lo = -jnp.asarray(row0, jnp.float32)
        clamp_hi = np.float32(img_height - 1) - jnp.asarray(
            row0, jnp.float32
        )
        pvec = pack_temporal_params(
            cam, old_cam, params, history_valid, clamp_lo, clamp_hi,
            row0,
        )

    def pad2(a):
        return jnp.pad(a, ((0, hp - height), (0, wp - width)))

    cr = pad2(sampled_color[0])
    cg = pad2(sampled_color[1])
    cb = pad2(sampled_color[2])
    nx = pad2(normal[0])
    ny = pad2(normal[1])
    nz = pad2(normal[2])
    dd = pad2(depth)

    # pad history: PAD_Y rows above the halo, enough below for the last
    # tile's window, PAD_X + lane padding in x.  Pad contents are never
    # selected (taps clamp to the true image bounds first).
    hist_p = jnp.pad(
        hist,
        (
            (0, 0),
            (PAD_Y, hp - height + PAD_Y),
            (PAD_X, PAD_X + (wp - width)),
        ),
    )

    grid = (hp // TILE_H, wp // TILE_W)
    kernel = _make_kernel(width, height, width, hist_top)
    tile = pl.BlockSpec(
        (TILE_H, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    plane = jax.ShapeDtypeStruct((hp, wp), jnp.float32)
    out_r, out_g, out_b, nb = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(plane, plane, plane, plane),
        in_specs=[
            pl.BlockSpec(
                (KROWS, ROW_LEN), lambda i, j: (0, 0),
                memory_space=pltpu.SMEM,
            ),
            tile, tile, tile,  # color
            tile, tile, tile,  # normal
            tile,  # depth
            pl.BlockSpec(memory_space=pl.ANY),  # history (HBM)
        ],
        out_specs=(tile, tile, tile, tile),
        scratch_shapes=[
            pltpu.VMEM((CHANNELS * WIN_H, WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA((CHANNELS,)),
        ],
        interpret=interpret,
    )(pvec, cr, cg, cb, nx, ny, nz, dd, hist_p)
    blended = jnp.stack(
        [
            out_r[:height, :width],
            out_g[:height, :width],
            out_b[:height, :width],
        ],
        axis=0,
    )
    return blended, nb[:height, :width]
