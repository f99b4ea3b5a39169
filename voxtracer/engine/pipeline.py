"""The jitted frame function and its host-side driver.

The reference drives one command encoder per frame through three
sequential compute dispatches (trace -> temporal -> denoise), a
g-buffer ping-pong copy and a swapchain blit
(``src/context.rs:2004-2075``).  The TPU equivalent is a single jitted
pure function ``(state, inputs) -> (state, outputs)``:

  * the g-buffer ping-pong becomes a donated carry (no copies at all —
    XLA aliases the buffers),
  * per-frame "uniform upload" becomes traced scalar arguments (no
    recompilation when parameters move),
  * the swapchain blit becomes an on-device sRGB/u8 encode; only the
    final u8 image crosses back to the host.

Static configuration (resolution, denoise radius, whether the camera
moved) selects among cached jit specializations.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import logging

log = logging.getLogger("voxtracer.engine.pipeline")

# Largest packed-index table the Pallas kernel keeps VMEM-resident
# (probed: a v5e fits >110 MB; leave headroom for scratch + carries).
PALLAS_TABLE_BUDGET_BYTES = 96 * 1024 * 1024

from ..ops import denoise as denoise_op
from ..ops import denoise_pallas as denoise_pallas_op
from ..ops import noise as noise_op
from ..ops import temporal as temporal_op
from ..ops import temporal_pallas
from ..ops import tonemap
from ..ops import trace_pallas
from ..ops import trace_xla
from ..scene.grid import GridScene
from .camera import Camera
from .params import DenoiseParams, RenderParams, TemporalParams


def _history_stack(accum_color, accum_blend, old_depth):
    """(5, H, W) history stack the fused temporal kernel consumes —
    the ONE place its channel order (r, g, b, blend, depth) lives;
    both the single-device and the per-slab sharded paths build it
    here.  ``accum_color`` is PLANAR (3, H, W), so this is one
    contiguous concatenate (channels-last history cost three strided
    channel extractions per frame)."""
    return jnp.concatenate(
        [accum_color, accum_blend[None], old_depth[None]]
    )


def _edge_rows(x, n, axis_name, n_dev, side):
    """``n`` rows of the row-sharded array ``x`` adjacent to this slab,
    fetched from neighboring shards via ``lax.ppermute`` edge exchange
    (several hops when the slab is shorter than the halo).  Beyond the
    mesh edge the permute yields zeros — those rows lie outside the
    image and are never selected (taps clamp to the true image bounds;
    the denoiser's valid channel is 0 there, like its zero padding)."""
    if n == 0:
        return x[:, :0]
    slab = x.shape[1]
    if side == "bot":
        perm = [(i, i - 1) for i in range(1, n_dev)]
    else:
        perm = [(i, i + 1) for i in range(n_dev - 1)]
    if n <= slab:
        # common case: ship ONLY the n edge rows the neighbor needs
        # (permuting the whole slab and slicing after multiplied the
        # pipeline's only steady-state ICI traffic by slab/n)
        payload = x[:, :n] if side == "bot" else x[:, -n:]
        return jax.lax.ppermute(payload, axis_name, perm)
    # halo taller than a slab: relay whole slabs hop by hop
    parts = []
    cur = x
    for _ in range(-(-n // slab)):
        cur = jax.lax.ppermute(cur, axis_name, perm)
        parts.append(cur)
    if side == "bot":
        return jnp.concatenate(parts, axis=1)[:, :n]
    return jnp.concatenate(parts[::-1], axis=1)[:, -n:]


def _cyclic_to_contig(x, nbl, block, n_dev, axis_name, rows_axis=0):
    """Resort a cyclically block-row-sharded plane to contiguous slabs.

    Under the cyclic trace layout chip ``c`` holds local block-rows
    ``bi`` = global block-rows ``bi*n_dev + c`` (each ``block`` pixel
    rows tall).  The stencil stages need contiguous slabs, so every
    chip ships each block to the chip whose slab contains it: one
    ``lax.all_to_all`` of ``u = ceil(nbl/n_dev)``-block chunks (padded
    — n_dev need not divide nbl) between a send-side scatter and a
    receive-side gather whose indices come from the chip index.  The
    per-chip payload is the slab itself (~(n-1)/n of it crosses ICI),
    which is why this rides the G-buffer once per frame rather than
    any stencil operand."""
    if rows_axis != 0:
        x = jnp.moveaxis(x, rows_axis, 0)
    n, u = n_dev, -(-nbl // n_dev)
    c = jax.lax.axis_index(axis_name)
    body = x.reshape((nbl, block) + x.shape[1:])

    def ceil_div(a):
        return (a + n - 1) // n

    # sender: local block bi -> chunk c' (dest chip), slot s
    bi = jnp.arange(nbl, dtype=jnp.int32)
    g = bi * n + c
    dest = g // nbl
    slot = bi - ceil_div(dest * nbl - c)
    buf = jnp.zeros((n * u,) + body.shape[1:], body.dtype)
    buf = buf.at[dest * u + slot].set(body)
    recv = jax.lax.all_to_all(
        buf.reshape((n, u) + body.shape[1:]), axis_name, 0, 0, tiled=False
    )
    # receiver: slab position p <- (source chip, slot)
    p = jnp.arange(nbl, dtype=jnp.int32)
    gp = c * nbl + p
    src = gp % n
    slot2 = (gp // n) - ceil_div(c * nbl - src)
    out = jnp.take(
        recv.reshape((n * u,) + body.shape[1:]), src * u + slot2, axis=0
    )
    out = out.reshape((nbl * block,) + x.shape[1:])
    if rows_axis != 0:
        out = jnp.moveaxis(out, 0, rows_axis)
    return out


def init_state(height: int, width: int) -> Dict[str, jnp.ndarray]:
    """Fresh accumulation / history state (all-invalid history)."""
    return {
        # PLANAR (3, H, W): the layout every Pallas stage consumes and
        # produces.  The XLA-twin path transposes at its boundary.
        "accum_color": jnp.zeros((3, height, width), jnp.float32),
        "accum_blend": jnp.ones((height, width), jnp.float32),
        "old_depth": jnp.full((height, width), -1.0, jnp.float32),
        "old_cam": jnp.zeros((4, 3), jnp.float32),
        "history_valid": jnp.zeros((), bool),
    }


def render_frame_impl(
    state: Dict[str, jnp.ndarray],
    scene_arrays: Dict[str, jnp.ndarray],
    cam: jnp.ndarray,  # (4, 3): origin, right, up, forward (pixel-scaled)
    render_params: RenderParams,
    temporal_params: TemporalParams,
    denoise_params: DenoiseParams,
    noise_buffer: jnp.ndarray,  # (S, 128, 128)
    frame_number: jnp.ndarray,  # int32 scalar
    *,
    scene_meta: Tuple,  # hashable static scene geometry, see Renderer
    height: int,
    width: int,
    radius: int,
    reproject: bool,
    trace_impl: str = "xla",
    resample: str = "pallas",  # "pallas" (offset-serve window) or
    #   "xla" (any-offset gather — the fast-camera-motion fallback the
    #   Renderer selects when predicted offsets exceed the window)
    lean: bool = False,  # realtime outputs only (image/depth/probe):
    #   the full G-buffer outputs are (H, W, 3)-interleaved arrays,
    #   a pathological TPU layout (minor dim 3 under (8,128) tiling)
    #   that costs ~15 ms/frame at 1080p just to materialize — skip
    #   them unless the caller actually reads them
    shard_mesh=None,  # jax.sharding.Mesh: shard the Pallas trace stage
    shard_axis: str = "rows",
    shard_layout: str = "contiguous",  # "cyclic": the trace stage
    #   renders every n-th 16-row block per chip (near-perfect work
    #   balance across the image's vertical skew — app/slabprobe
    #   measured 2.11x on castle 4K contiguous) in ONE launch via the
    #   kernel's row_stride, then one all_to_all resorts the G-buffer
    #   into contiguous slabs for the stencil stages (whose per-pixel
    #   cost is uniform).  Requires height % (n_dev * block) == 0 —
    #   the mesh wrapper pads the render height and crops.
    trace_knobs=None,  # TraceKnobs override (hashable static); None ->
    #   trace_pallas.pick_knobs(height, width).  The in-process A/B
    #   harness (app/abench.py) and per-scene tuning thread through
    #   here; every knob participates in the jit cache key.
    kernel_rows=None,  # (KROWS, 128) host-packed kernel-param rows
    #   (params.pack_kernel_rows); when present the single-device
    #   Pallas stages take them as their SMEM operand directly instead
    #   of packing params on device (the packed production path)
):
    dims, origin, zw, n_rows, l3_dims, m_rows, b_rows = scene_meta
    use_pallas = trace_impl.startswith("pallas")
    interpret = trace_impl == "pallas_interpret"
    knobs = trace_knobs or trace_pallas.pick_knobs(height, width)

    cam_tuple = (cam[0], cam[1], cam[2], cam[3])
    old = state["old_cam"]
    old_cam_tuple = (old[0], old[1], old[2], old[3])

    if use_pallas:
        # "pallas_interpret" runs the same kernel through the Pallas
        # interpreter — how CPU tests exercise the TPU kernel family.
        # "pallas_hbm" keeps the packed fine table HBM-resident (scenes
        # beyond the VMEM budget) and DMAs serve windows on demand.
        if kernel_rows is not None:
            params_vec = kernel_rows  # trace fields in row 0
        else:
            params_vec = trace_pallas.pack_params_traced(
                cam, render_params
            )
        trace_kw = dict(
            dims=dims,
            zw=zw,
            origin=origin,
            n_rows=n_rows,
            l3_dims=l3_dims,
            m_rows=m_rows,
            b_rows=b_rows,
            width=width,
            interpret=interpret,
            fine_in_hbm=trace_impl == "pallas_hbm",
            knobs=knobs,
        )

    if use_pallas and shard_mesh is not None:
        # Pallas under SPMD: XLA cannot partition a custom call, so the
        # WHOLE per-pixel pipeline runs under shard_map — each chip
        # traces, reprojects and denoises its own row slab against the
        # replicated scene.  Ray-gen stays image-global (params slot 30
        # carries the slab row; noise quads pre-roll by it), and the
        # two stencil stages keep their single-chip Pallas kernels: the
        # history resample and the denoise window each fetch a fixed
        # row halo from the neighboring slabs with one lax.ppermute
        # edge exchange — the only steady-state ICI traffic.
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        n_dev = shard_mesh.devices.size
        slab = height // n_dev
        cyc_block = trace_pallas.BLOCK_OF[knobs.tile_h]
        if shard_layout == "cyclic" and slab % cyc_block:
            raise ValueError(
                f"cyclic layout needs height {height} % "
                f"(n_dev {n_dev} * block {cyc_block}) == 0"
            )
        cyc_nbl = slab // cyc_block  # local block-rows per chip

        def _slab_frame(
            packed, meta, brick, pal, pv, nbuf, fnum, cam_arr,
            acc_color, acc_blend, old_depth, old_cam_arr, hvalid,
            t_params, d_params,
        ):
            chip = jax.lax.axis_index(shard_axis)
            row0 = chip * slab  # contiguous slab base (stencil stages)
            row0f = row0.astype(jnp.float32)
            if shard_layout == "cyclic":
                # ray-gen offset: local block-row bi renders global
                # block-row bi*n_dev + chip (kernel row_stride path)
                trow0 = chip * cyc_block
            else:
                trow0 = row0
            trow0f = trow0.astype(jnp.float32)
            pv = pv.at[0, 30].set(trow0f)
            nq = trace_pallas.noise_quads(
                nbuf, fnum, roll=trow0, tile_h=knobs.tile_h,
            )
            gbuf = trace_pallas.render_sample(
                packed, meta, brick, pal, pv, nq,
                height=slab,
                row_stride=n_dev if shard_layout == "cyclic" else 1,
                **trace_kw,
            )
            if shard_layout == "cyclic":
                # one all_to_all resorts the balanced-trace G-buffer
                # into the contiguous slabs every stencil stage needs
                gbuf = {
                    k: (
                        v
                        if k == "debug_iters"
                        else _cyclic_to_contig(
                            v, cyc_nbl, cyc_block, n_dev, shard_axis,
                            rows_axis=v.ndim - 2,
                        )
                    )
                    for k, v in gbuf.items()
                }
            cam_t = tuple(cam_arr[i] for i in range(4))
            old_t = tuple(old_cam_arr[i] for i in range(4))
            if reproject and resample != "pallas":
                # Whip-pan (any-offset) fallback under the mesh: the
                # predicted reprojection offsets exceed the fused
                # kernel's serve window, so fixed row halos cannot
                # cover the history reads.  All-gather the 5-plane
                # history into every slab (≈18 MB at 720p — a
                # rare-frame cost, the predictor only trips on fast
                # motion) and run the any-offset resampler slab-
                # locally against the full image, exactly as the
                # single-chip fallback does (temporal.comp:92-114
                # accepts any in-frame offset).
                # The any-offset twin is channels-last; these
                # transposes only run on predictor-tripped frames.
                blended_hwc, next_blend = temporal_op.temporal_blend(
                    jnp.moveaxis(gbuf["color"], 0, -1),
                    jnp.moveaxis(gbuf["normal"], 0, -1),
                    gbuf["depth"],
                    jnp.moveaxis(
                        jax.lax.all_gather(
                            acc_color, shard_axis, axis=1, tiled=True
                        ),
                        0, -1,
                    ),
                    jax.lax.all_gather(
                        acc_blend, shard_axis, axis=0, tiled=True
                    ),
                    jax.lax.all_gather(
                        old_depth, shard_axis, axis=0, tiled=True
                    ),
                    cam_t, old_t, t_params, hvalid,
                    reproject=True, resample_impl="xla", row0=row0f,
                )
                blended = jnp.moveaxis(blended_hwc, -1, 0)
            elif reproject:
                hist = _history_stack(acc_color, acc_blend, old_depth)
                ht = temporal_pallas.HALO_TOP
                hb = temporal_pallas.HALO_BOT
                hist_ext = jnp.concatenate(
                    [
                        _edge_rows(hist, ht, shard_axis, n_dev, "top"),
                        hist,
                        _edge_rows(hist, hb, shard_axis, n_dev, "bot"),
                    ],
                    axis=1,
                )
                blended, next_blend = temporal_pallas.temporal_blend_fused(
                    gbuf["color"], gbuf["normal"], gbuf["depth"],
                    hist_ext, cam_t, old_t, t_params, hvalid,
                    img_height=height, hist_top=ht, hist_bot=hb,
                    row0=row0f, interpret=interpret,
                )
            else:
                blended, next_blend = temporal_op.temporal_blend_still_planar(
                    gbuf["color"], gbuf["normal"], gbuf["depth"],
                    acc_color, acc_blend, old_depth, cam_t, old_t,
                    t_params, hvalid, row0=row0f,
                )
            if radius > 0:
                stack = denoise_pallas_op.build_stack(
                    blended, gbuf["normal"], gbuf["depth"],
                    gbuf["albedo"], gbuf["node"],
                )
                stack_ext = jnp.concatenate(
                    [
                        _edge_rows(stack, radius, shard_axis, n_dev, "top"),
                        stack,
                        _edge_rows(stack, radius, shard_axis, n_dev, "bot"),
                    ],
                    axis=1,
                )
                out = denoise_pallas_op.denoise_from_stack(
                    stack_ext, cam_t, d_params, radius=radius,
                    top_halo=radius, bot_halo=radius, row0=row0f,
                    interpret=interpret,
                )
            else:
                out = denoise_pallas_op.denoise(
                    blended, gbuf["normal"], gbuf["depth"],
                    gbuf["albedo"], gbuf["node"], cam_t, d_params,
                    radius=0,
                )
            return gbuf, blended, next_blend, out

        sharded = P(shard_axis)
        # planar (3, H, W) arrays carry rows on axis 1
        sharded_c = P(None, shard_axis)
        gbuf_specs = {
            "color": sharded_c,
            "normal": sharded_c,
            "depth": sharded,
            "albedo": sharded_c,
            "node": sharded,
            "debug_iters": sharded,
        }
        gbuf, blended, next_blend, out = shard_map(
            _slab_frame,
            mesh=shard_mesh,
            in_specs=(
                P(), P(), P(), P(), P(), P(), P(), P(),
                sharded_c, sharded, sharded, P(), P(), P(), P(),
            ),
            out_specs=(gbuf_specs, sharded_c, sharded, sharded_c),
            check_rep=False,
        )(
            scene_arrays["packed_idx"],
            scene_arrays["meta_idx"],
            scene_arrays["brick_idx"],
            scene_arrays["palette"],
            params_vec,
            jnp.asarray(noise_buffer),
            frame_number,
            cam,
            state["accum_color"],
            state["accum_blend"],
            state["old_depth"],
            state["old_cam"],
            state["history_valid"],
            temporal_params,
            denoise_params,
        )
    else:
        if use_pallas:
            nq = trace_pallas.noise_quads(
                jnp.asarray(noise_buffer), frame_number,
                tile_h=knobs.tile_h,
            )
            gbuf = trace_pallas.render_sample(
                scene_arrays["packed_idx"],
                scene_arrays["meta_idx"],
                scene_arrays["brick_idx"],
                scene_arrays["palette"],
                params_vec,
                nq,
                height=height,
                **trace_kw,
            )
        else:
            planes = noise_op.noise_planes(
                noise_buffer, frame_number, height, width, xp=jnp
            )
            gbuf = trace_xla.render_sample(
                scene_arrays["flat_grid"],
                dims,
                scene_arrays["grid_origin"],
                cam[0],
                cam[1],
                cam[2],
                cam[3],
                render_params,
                planes,
                height,
                width,
            )

        if reproject and use_pallas and resample == "pallas":
            # the fused kernel is the whole temporal.comp stage in one
            # Pallas pass (reproject + offset-serve resample +
            # validity + blend) — no full-image XLA passes around it
            blended, next_blend = temporal_pallas.temporal_blend_fused(
                gbuf["color"],
                gbuf["normal"],
                gbuf["depth"],
                _history_stack(
                    state["accum_color"], state["accum_blend"],
                    state["old_depth"],
                ),
                cam_tuple,
                old_cam_tuple,
                temporal_params,
                state["history_valid"],
                interpret=interpret,
                params_rows=kernel_rows,
            )
        elif use_pallas and not reproject:
            # camera at rest: the planar elementwise blend — the
            # accumulation steady state, zero layout conversions
            blended, next_blend = temporal_op.temporal_blend_still_planar(
                gbuf["color"],
                gbuf["normal"],
                gbuf["depth"],
                state["accum_color"],
                state["accum_blend"],
                state["old_depth"],
                cam_tuple,
                old_cam_tuple,
                temporal_params,
                state["history_valid"],
            )
        elif use_pallas:
            # whip-pan any-offset fallback: the channels-last twin,
            # paid only on predictor-tripped frames
            blended_hwc, next_blend = temporal_op.temporal_blend(
                jnp.moveaxis(gbuf["color"], 0, -1),
                jnp.moveaxis(gbuf["normal"], 0, -1),
                gbuf["depth"],
                jnp.moveaxis(state["accum_color"], 0, -1),
                state["accum_blend"],
                state["old_depth"],
                cam_tuple,
                old_cam_tuple,
                temporal_params,
                state["history_valid"],
                reproject=True,
                resample_impl="xla",
            )
            blended = jnp.moveaxis(blended_hwc, -1, 0)
        else:
            blended_hwc, next_blend = temporal_op.temporal_blend(
                gbuf["color"],
                gbuf["normal"],
                gbuf["depth"],
                jnp.moveaxis(state["accum_color"], 0, -1),
                state["accum_blend"],
                state["old_depth"],
                cam_tuple,
                old_cam_tuple,
                temporal_params,
                state["history_valid"],
                reproject=reproject,
                resample_impl="xla",
            )
            blended = jnp.moveaxis(blended_hwc, -1, 0)

        # The VMEM-windowed Pallas stencil reads each pixel once; the
        # XLA stencil streams ~(2r+1)^2 full-image slices through HBM.
        if use_pallas:
            # padded_out: the kernel's (3, hp, wp) output goes to the
            # tonemap uncropped; the crop rides the u8 fusion instead
            # of materializing sliced f32 planes
            out = denoise_pallas_op.denoise(
                blended,
                gbuf["normal"],
                gbuf["depth"],
                gbuf["albedo"],
                gbuf["node"],
                cam_tuple,
                denoise_params,
                radius=radius,
                interpret=interpret,
                params_rows=kernel_rows,
                padded_out=True,
            )
        else:
            out = denoise_op.denoise(
                blended_hwc,
                gbuf["normal"],
                gbuf["depth"],
                gbuf["albedo"],
                gbuf["node"],
                cam_tuple,
                denoise_params,
                radius=radius,
            )

    # `out` (and `blended`, `gbuf` color planes) are planar on the
    # Pallas path (`out` possibly tile-padded to (3, hp, wp)); the
    # XLA-twin path stays channels-last end-to-end and transposes only
    # at the state store.
    if use_pallas:
        image_u8 = tonemap.to_u8_planar_cropped(out, height, width)
    else:
        image_u8 = tonemap.to_u8(out)

    new_state = {
        "accum_color": blended,
        "accum_blend": next_blend,
        "old_depth": gbuf["depth"],
        "old_cam": cam,
        "history_valid": state["history_valid"] | True,
    }
    outputs = {
        "image": image_u8,
        "depth": gbuf["depth"],
        # strided depth probe (~2 KB) feeds the Renderer's host-side
        # fast-motion predictor next frame.  Per-sample depths matter:
        # predicting from the global depth MINIMUM misfires on any
        # ground-level dolly (the near pixels' large offsets don't
        # apply to the rest of the image) and would pin the slow
        # any-offset resampler on.  The Renderer fetches this
        # asynchronously so the frame loop keeps its dispatch pipeline.
        "depth_probe": gbuf["depth"][
            _PROBE_STRIDE_Y(height) // 2 :: _PROBE_STRIDE_Y(height),
            _PROBE_STRIDE_X(width) // 2 :: _PROBE_STRIDE_X(width),
        ],
    }
    if not lean:
        # public debug outputs keep the channels-last (H, W, 3) API;
        # the transposes only exist in non-lean (test/debug) jits
        def _hwc(a):
            if use_pallas:
                return jnp.moveaxis(a[:, :height, :width], 0, -1)
            return a

        outputs.update(
            {
                "linear": _hwc(out),
                "trace_color": _hwc(gbuf["color"]),
                "normal": _hwc(gbuf["normal"]),
                "albedo": _hwc(gbuf["albedo"]),
                "node": gbuf["node"],
            }
        )
    return new_state, outputs


# Safety margins under the fused kernel's serve window (it covers y
# offsets in [-MARGIN, WY_MAX-MARGIN] and x in ~[-128, 126]): the
# strided probe can under-read the true extreme by a few px.  The
# error costs are asymmetric — an under-read restarts accumulation on
# a few pixels for one frame (the pre-fallback behavior), an over-read
# pays the ~10x slower any-offset resampler for the whole frame — so
# the margins sit close to the true window.
# The served y window is ASYMMETRIC: [-MARGIN, WY_MAX-MARGIN] =
# [-24, +38] (temporal_pallas), so the down-motion margin is larger —
# a symmetric 20 needlessly pinned the ~10x slower any-offset
# resampler on for downward pans at +25..+38 px that the fused
# kernel serves fine.
_PRED_MARGIN_Y_NEG = 20   # offsets below -20 px -> fallback
_PRED_MARGIN_Y_POS = 34   # offsets above +34 px -> fallback
_PRED_MARGIN_X = 110
# Cadence of depth-probe refreshes for the predictor (frames).
_PROBE_EVERY = 4


def _PROBE_STRIDE_Y(height):
    return max(1, height // 16)


def _PROBE_STRIDE_X(width):
    return max(1, width // 32)


def predict_max_offset(cam, old_cam, depth_probe, height, width):
    """Host-side estimate of this frame's reprojection offsets.

    Evaluates the ``temporal.comp:75-85`` reprojection at the previous
    frame's strided depth probe — each sample at its OWN depth (pure
    numpy, ~20 us).  Camera motion is continuous, so the previous
    depths predict the current ones to a frame's motion.  Returns the
    SIGNED offset extremes ``(dy_min, dy_max, dx_max)`` over valid
    reprojections in pixels — signed in y because the fused kernel's
    serve window is asymmetric.
    """
    origin, right, up, fwd = (np.asarray(v, np.float64) for v in cam)
    oo, orr, ou, of = (np.asarray(v, np.float64) for v in old_cam)
    d = np.asarray(depth_probe, np.float64)
    sy_str = _PROBE_STRIDE_Y(height)
    sx_str = _PROBE_STRIDE_X(width)
    py = (
        sy_str // 2 + sy_str * np.arange(d.shape[0], dtype=np.float64)
    )[:, None]
    px = (
        sx_str // 2 + sx_str * np.arange(d.shape[1], dtype=np.float64)
    )[None, :]
    px = np.broadcast_to(px, d.shape)
    py = np.broadcast_to(py, d.shape)
    ok = d >= 0.0
    if not ok.any():  # no hits last frame: nothing to resample
        return 0.0, 0.0, 0.0
    ray = px[..., None] * right - py[..., None] * up + fwd
    ray /= np.linalg.norm(ray, axis=-1, keepdims=True)
    inv = np.linalg.inv(np.stack([orr, ou, of], axis=1))
    world = origin + d[..., None] * ray
    screen = (world - oo) @ inv.T
    s2 = screen[..., 2]
    ok &= s2 > 1e-9
    s2s = np.where(ok, s2, 1.0)
    sx = np.where(ok, screen[..., 0] / s2s, 0.0)
    sy = np.where(ok, screen[..., 1] / s2s, 0.0)
    px_f = sx + 0.5
    py_f = 0.5 - sy
    ok &= (
        (px_f >= 0) & (px_f <= width) & (py_f >= 0) & (py_f <= height)
    )
    if not ok.any():
        return 0.0, 0.0, 0.0
    dy = (py_f - py)[ok]
    dx_max = float(np.abs(px_f - px)[ok].max())
    return float(dy.min()), float(dy.max()), dx_max


# Depth sweep for the OFFLINE (no depth probe) conservative offset
# estimate: reprojection offsets grow as depth shrinks, so evaluating
# the predictor at a geometric ladder of constant depths down to a
# fraction of a voxel brackets the true per-pixel offsets from above
# (plus rotation terms, which are depth-independent and covered too).
_AUTO_PROBE_DEPTHS = (
    0.25, 0.5, 1.0, 2.0, 4.0, 8.0, 16.0, 32.0,
    64.0, 128.0, 256.0, 512.0, 1024.0,
)


def predict_path_offsets(cam_rows, height, width):
    """Conservative reprojection-offset extremes over a camera path.

    For every consecutive camera pair, evaluates
    :func:`predict_max_offset` with constant-depth probes swept over
    ``_AUTO_PROBE_DEPTHS`` — the offline analog of the realtime
    depth-probe predictor (which has last frame's true depths; a batch
    has none, so it brackets over all plausible depths).  Returns
    ``(dy_min, dy_max, dx_max)`` in pixels.
    """
    sy = _PROBE_STRIDE_Y(height)
    sx = _PROBE_STRIDE_X(width)
    ny = len(range(sy // 2, height, sy))
    nx = len(range(sx // 2, width, sx))
    dy_min = dy_max = dx_max = 0.0
    for old, new in zip(cam_rows[:-1], cam_rows[1:]):
        if old is None or np.array_equal(old, new):
            continue
        for d in _AUTO_PROBE_DEPTHS:
            probe = np.full((ny, nx), d, np.float64)
            a, b, c = predict_max_offset(
                tuple(new), tuple(old), probe, height, width
            )
            dy_min = min(dy_min, a)
            dy_max = max(dy_max, b)
            dx_max = max(dx_max, c)
    return dy_min, dy_max, dx_max


def offsets_exceed_window(dy_min, dy_max, dx_max):
    """Whether predicted offsets exceed the fused Pallas resampler's
    serve window (shared by the realtime predictor and the offline
    auto-resample picker)."""
    return (
        dy_min < -_PRED_MARGIN_Y_NEG
        or dy_max > _PRED_MARGIN_Y_POS
        or dx_max > _PRED_MARGIN_X
    )


render_frame = partial(
    jax.jit,
    static_argnames=(
        "scene_meta", "height", "width", "radius", "reproject",
        "trace_impl", "resample", "lean", "shard_mesh", "shard_axis",
        "shard_layout", "trace_knobs",
    ),
    donate_argnames=("state",),
)(render_frame_impl)


def _render_frame_packed_impl(
    state, scene_arrays, packed, noise_buffer, **static_kw
):
    """Same frame function, but every dynamic scalar input rides in
    ONE packed host array per frame instead of ~6 small copies (each
    profiled at 0.2-0.6 ms through the remote-tunnel dispatch path;
    see params.py).

    ``packed`` is either the legacy (1, 32) frame-input vector or the
    full (KROWS, 128) kernel-param rows from ``pack_kernel_rows``; in
    the latter case the rows feed the Pallas kernels' SMEM operands
    DIRECTLY, so no device-side fusion ever packs a small param tensor
    (profiled at 4K: the traced packs were staged through scoped
    memory as ~10 copy-start/copy-done pairs, ~1.5-2 ms/frame of
    serialized glue)."""
    from .params import KROWS, unpack_frame_inputs

    cam, rp, tp, dp, frame_number = unpack_frame_inputs(packed)
    kernel_rows = packed if packed.shape[0] == KROWS else None
    return render_frame_impl(
        state, scene_arrays, cam, rp, tp, dp, noise_buffer,
        frame_number, kernel_rows=kernel_rows, **static_kw,
    )


render_frame_packed = partial(
    jax.jit,
    static_argnames=(
        "scene_meta", "height", "width", "radius", "reproject",
        "trace_impl", "resample", "lean", "shard_mesh", "shard_axis",
        "shard_layout", "trace_knobs",
    ),
    donate_argnames=("state",),
)(_render_frame_packed_impl)


def _render_sequence_impl(
    state, scene_arrays, packed_seq, noise_buffer, **static_kw
):
    """N frames in ONE device dispatch: ``lax.scan`` over the packed
    per-frame input rows.

    The realtime loop pays one host->device dispatch per frame; on the
    dispatch-bound configs that floor is most of the frame (chr_knight
    720p: 6.9 ms wall for 2.5 ms of device work).  Offline work —
    converged stills, turntables, animation exports — has the whole
    camera path up front, so the frame loop can run ON DEVICE: the
    scan body is the exact packed frame function, the carry is the
    accumulation state, and the stacked per-frame inputs
    (``packed_seq``, (N, KROWS, 128)) are the scanned xs.  Returns the
    final state and the (N, H, W, 3) u8 tonemapped frames.

    ``reproject``/``resample`` are static jit args, uniform across the
    scan; the Renderer splits a MIXED still/moving camera path into
    per-segment sub-scans (each with its own static ``reproject``), so
    still frames keep the cheap elementwise blend and every segment
    stays bit-identical to the per-frame ``render()`` loop.  (A traced
    per-frame ``lax.cond`` was tried instead and rejected: the cond
    boundary changes XLA's fusion/FMA contraction enough to flip
    validity-threshold pixels, breaking the "never a semantic fork"
    invariant.)
    """

    def step(st, packed):
        st, outputs = _render_frame_packed_impl(
            st, scene_arrays, packed, noise_buffer, **static_kw
        )
        return st, outputs["image"]

    return jax.lax.scan(step, state, packed_seq)


render_sequence_jit = partial(
    jax.jit,
    static_argnames=(
        "scene_meta", "height", "width", "radius", "reproject",
        "trace_impl", "resample", "lean", "shard_mesh", "shard_axis",
        "shard_layout", "trace_knobs",
    ),
    donate_argnames=("state",),
)(_render_sequence_impl)


def _render_burst_impl(
    state, scene_arrays, packed_seq, noise_buffer, **static_kw
):
    """Carry-only burst scan: N accumulation passes, ONE output frame.

    ``_render_sequence_impl`` stacks every step's u8 image as scan ys —
    at 4K a 256-pass converged still would hold ~6 GB of HBM for output
    that is 24 MB.  A burst only wants the LAST frame, so the image
    rides in the carry instead (one (H, W, 3) u8 buffer, overwritten —
    and donated — each step)."""
    height = static_kw["height"]
    width = static_kw["width"]

    def body(carry, packed):
        st, _ = carry
        st, outputs = _render_frame_packed_impl(
            st, scene_arrays, packed, noise_buffer, **static_kw
        )
        return (st, outputs["image"]), None

    init = (state, jnp.zeros((height, width, 3), jnp.uint8))
    (st, image), _ = jax.lax.scan(body, init, packed_seq)
    return st, image


render_burst_jit = partial(
    jax.jit,
    static_argnames=(
        "scene_meta", "height", "width", "radius", "reproject",
        "trace_impl", "resample", "lean", "shard_mesh", "shard_axis",
        "shard_layout", "trace_knobs",
    ),
    donate_argnames=("state",),
)(_render_burst_impl)


@dataclasses.dataclass
class Renderer:
    """Host-side frame driver: owns device scene + state, advances frames.

    Capability analog of the reference's ``Context`` render half: frame
    counters, camera-motion detection (selects the no-resample temporal
    path, and resets ``still_sample`` like ``src/context.rs:1999``),
    and scene swapping (``recreate_octree``, ``:799-810``).
    """

    scene: GridScene
    height: int
    width: int
    render_params: RenderParams = RenderParams()
    temporal_params: TemporalParams = TemporalParams()
    denoise_params: DenoiseParams = DenoiseParams()
    denoise_radius: int = 0
    noise_buffer: Optional[np.ndarray] = None
    trace_impl: Optional[str] = None  # "pallas" (TPU), "xla" (portable)
    lean: bool = False  # default render() output set (see render_frame_impl)
    trace_knobs: Optional[trace_pallas.TraceKnobs] = None  # kernel perf
    #   knob override for probes / per-scene tuning (None -> pick_knobs)

    def __post_init__(self):
        if self.trace_impl is None:
            platform = jax.devices()[0].platform
            self.trace_impl = "xla" if platform == "cpu" else "pallas"
        if self.noise_buffer is None:
            # Blue noise is the reference's RNG source
            # (src/context.rs:1019-1116); the baked asset loads instantly.
            # White noise is only the emergency fallback (e.g. missing
            # asset on a machine where baking is unavailable).
            try:
                from ..ops import bluenoise

                self.noise_buffer = bluenoise.cached_buffer()
            except Exception:
                log.warning("blue-noise asset unavailable; using white noise")
                self.noise_buffer = noise_op.white_noise_buffer()
        self._noise = jnp.asarray(self.noise_buffer)
        self._upload_scene(self.scene)
        self.state = init_state(self.height, self.width)
        self.frame_number = 0
        self.still_sample = 0
        self._last_cam: Optional[np.ndarray] = None
        self._probe_pending = None
        self._probe_host = None
        # force a probe registration on the next render() regardless of
        # frame-number cadence (set after sequences/bursts, which drop
        # the stale probe — otherwise the fast-motion predictor is
        # blind for up to _PROBE_EVERY frames after a batch)
        self._probe_rearm = False
        # host mirror of state["history_valid"] for the packed kernel
        # rows (False only before the first frame after init/scene
        # swap; snapshot.load syncs it on resume)
        self._history_valid = False
        self.last_resample = "pallas"  # observable: last frame's choice

    def _upload_scene(self, scene: GridScene):
        from ..parallel.mesh import scene_device_args

        self.scene = scene
        self._scene_meta, self._scene_arrays = scene_device_args(
            scene, trace_impl=self.trace_impl
        )
        table_bytes = self._scene_arrays["packed_idx"].size * 4
        node_bytes = (
            self._scene_arrays["meta_idx"].size
            + self._scene_arrays["brick_idx"].size
        ) * 4
        if self.trace_impl == "pallas_hbm" and table_bytes <= (
            PALLAS_TABLE_BUDGET_BYTES
        ):
            # a previously-oversized session swapped to a small scene
            self.trace_impl = "pallas"
        if self.trace_impl == "pallas" and table_bytes > PALLAS_TABLE_BUDGET_BYTES:
            if node_bytes <= PALLAS_TABLE_BUDGET_BYTES // 2:
                # The march tables still fit VMEM; only the fine
                # hit-resolve table moves to HBM with DMA'd serve
                # windows — the Pallas path survives big scenes.
                log.info(
                    "scene index table (%.0f MB) exceeds the VMEM "
                    "budget (%.0f MB); keeping it HBM-resident "
                    "(DMA-windowed hit resolve)",
                    table_bytes / 2**20,
                    PALLAS_TABLE_BUDGET_BYTES / 2**20,
                )
                self.trace_impl = "pallas_hbm"
            else:
                log.warning(
                    "scene node tables (%.0f MB) exceed the VMEM budget "
                    "(%.0f MB); falling back to the XLA trace kernel",
                    node_bytes / 2**20,
                    PALLAS_TABLE_BUDGET_BYTES / 2**20,
                )
                self.trace_impl = "xla"
                self._scene_arrays["flat_grid"] = jnp.asarray(
                    scene.values.reshape(-1)
                )
                self._scene_arrays["grid_origin"] = jnp.asarray(
                    scene.origin.astype(np.int32)
                )

    def set_scene(self, scene: GridScene):
        """Swap scenes and restart accumulation (src/context.rs:1406-1424)."""
        self._upload_scene(scene)
        self.reset_accumulation()

    def reset_accumulation(self):
        self.state = init_state(self.height, self.width)
        self.still_sample = 0
        self._probe_pending = None
        self._probe_host = None
        self._probe_rearm = False
        self._history_valid = False

    def resize(self, height: int, width: int):
        """Live resolution change: keep the scene tables, params and
        camera; restart accumulation at the new shape (history is
        size-bound).  The reference recreates every size-dependent
        resource on window resize (``src/context.rs:1430-1461``); here
        the scene upload survives untouched and the jit cache simply
        gains a specialization for the new shape on the next frame."""
        if (height, width) == (self.height, self.width):
            return
        if height <= 0 or width <= 0:
            raise ValueError(f"invalid size {width}x{height}")
        self.height = int(height)
        self.width = int(width)
        self._last_cam = None  # pixel-scaled basis changed shape
        self.reset_accumulation()

    def render(
        self, camera: Camera, lean: Optional[bool] = None
    ) -> Dict[str, np.ndarray]:
        lean = self.lean if lean is None else lean
        right, up, forward = camera.axis_scaled(self.width, self.height)
        cam = np.stack(
            [np.asarray(camera.position), right, up, forward]
        ).astype(np.float32)

        prev_cam = self._last_cam
        moved = prev_cam is None or not np.array_equal(cam, prev_cam)
        self._last_cam = cam
        if moved:
            self.still_sample = 0

        # Fast-motion fallback: when the predicted reprojection offset
        # exceeds the fused kernel's serve window, the any-offset XLA
        # resampler keeps history alive instead of restarting
        # accumulation (temporal.comp:92-114 accepts any in-frame
        # offset; the Pallas window covers ~±24 px of y motion).
        # Materialize the async depth-probe fetch ONLY when it has
        # already landed: a blocking fetch would cap the dispatch
        # pipeline at one frame of lookahead and add a host round-trip
        # per frame (measured +20 ms/frame through the axon tunnel).
        # The probe being a few frames stale is fine — camera motion
        # is continuous and the margins absorb a frame of drift.
        if self._probe_pending is not None:
            ready = True
            try:
                ready = bool(self._probe_pending.is_ready())
            except (AttributeError, NotImplementedError, TypeError):
                # backend without is_ready: treat as landed.  Only
                # API-absence errors are swallowed — a blanket except
                # here could silently turn the non-blocking pipeline
                # into a per-frame blocking fetch (+20 ms/frame).
                pass
            if ready:
                self._probe_host = np.asarray(self._probe_pending)
                self._probe_pending = None

        resample = "pallas"
        if (
            moved
            and prev_cam is not None
            and self.trace_impl.startswith("pallas")
            and self._probe_host is not None
        ):
            dy_min, dy_max, dx = predict_max_offset(
                tuple(cam), tuple(prev_cam), self._probe_host,
                self.height, self.width,
            )
            if offsets_exceed_window(dy_min, dy_max, dx):
                resample = "xla"
        self.last_resample = resample

        self.frame_number += 1
        self.still_sample += 1

        from .params import pack_kernel_rows

        self.state, outputs = render_frame_packed(
            self.state,
            self._scene_arrays,
            pack_kernel_rows(
                cam,
                prev_cam if prev_cam is not None else cam,
                self.render_params, self.temporal_params,
                self.denoise_params, self.frame_number,
                self._history_valid, self.height,
            ),
            self._noise,
            scene_meta=self._scene_meta,
            height=self.height,
            width=self.width,
            radius=self.denoise_radius,
            reproject=moved,
            trace_impl=self.trace_impl,
            resample=resample,
            lean=lean,
            trace_knobs=self.trace_knobs,
        )
        # Refresh the probe every few frames, not every frame: the
        # registration + materialize cycle costs ~2 ms/frame through
        # the axon tunnel (measured on chr_knight 720p: 12.5 vs 10.2
        # ms/frame), real money on small frames, and camera-motion
        # continuity already tolerates a few frames of staleness (the
        # prediction margins absorb one frame of drift per frame of
        # age).  Frame 1 registers immediately so the very first
        # motion has a probe to predict from.
        if self._probe_pending is None and (
            self.frame_number == 1
            or self.frame_number % _PROBE_EVERY == 0
            or self._probe_rearm
        ):
            self._probe_rearm = False
            self._probe_pending = outputs["depth_probe"]
            try:
                self._probe_pending.copy_to_host_async()
            except (AttributeError, NotImplementedError, TypeError):
                pass  # backend without async copy: is_ready-gated fetch
        self._history_valid = True
        return outputs

    def _pack_sequence(self, cameras, resample):
        """Shared sequence prep: per-frame packed rows, per-frame
        reproject flags (True where a moved camera meets live history),
        and the resolved ``resample`` (``"auto"`` brackets the path's
        worst-case offsets over a depth sweep — offline there is no
        depth probe to predict from — and picks the any-offset
        resampler only when they exceed the fused kernel's serve
        window).  Returns
        ``(packed_seq, flags, resample, still, last_cam)``."""
        from .params import pack_kernel_rows

        cams = []
        for camera in cameras:
            right, up, forward = camera.axis_scaled(self.width, self.height)
            cams.append(
                np.stack(
                    [np.asarray(camera.position), right, up, forward]
                ).astype(np.float32)
            )
        if not cams:
            raise ValueError("render_sequence needs at least one camera")

        if resample == "auto":
            if self.trace_impl.startswith("pallas"):
                dy_min, dy_max, dx = predict_path_offsets(
                    [self._last_cam if self._history_valid else None]
                    + cams,
                    self.height, self.width,
                )
                resample = (
                    "xla"
                    if offsets_exceed_window(dy_min, dy_max, dx)
                    else "pallas"
                )
            else:
                resample = "pallas"  # the XLA trace path ignores it

        prev = self._last_cam
        rows = []
        flags = []
        still = self.still_sample
        for i, cam in enumerate(cams):
            moved = prev is None or not np.array_equal(cam, prev)
            hvalid = self._history_valid if i == 0 else True
            # reproject matters only where history exists to resample
            flags.append(bool(moved and hvalid))
            still = 0 if moved else still
            still += 1
            rows.append(
                pack_kernel_rows(
                    cam,
                    prev if prev is not None else cam,
                    self.render_params, self.temporal_params,
                    self.denoise_params, self.frame_number + i + 1,
                    hvalid, self.height,
                )
            )
            prev = cam
        return np.stack(rows), flags, resample, still, prev

    @staticmethod
    def _segments(flags):
        """Run-length encode the per-frame reproject flags into
        ``(start, end, reproject)`` sub-scan segments.  A mixed
        still/moving path dispatches one scan per segment — each with
        its static ``reproject`` — so still frames keep the cheap
        elementwise blend AND every frame stays bit-identical to the
        per-frame ``render()`` loop (a traced per-frame ``lax.cond``
        was measured to flip validity-threshold pixels: the cond
        boundary perturbs XLA's fusion/FMA contraction)."""
        segs = []
        start = 0
        for i in range(1, len(flags)):
            if flags[i] != flags[start]:
                segs.append((start, i, flags[start]))
                start = i
        segs.append((start, len(flags), flags[start]))
        return segs

    def _finish_sequence(self, n, still, last_cam, resample, reproject):
        self.frame_number += n
        self.still_sample = still
        self._last_cam = last_cam
        self._history_valid = True
        # the depth probe predates the batch; drop it and re-arm so the
        # next render() registers a fresh one immediately (otherwise
        # the fast-motion predictor is blind for up to _PROBE_EVERY
        # frames after a batch)
        self._probe_host = None
        self._probe_pending = None
        self._probe_rearm = True
        self.last_resample = (
            resample if reproject is not False else "pallas"
        )

    def render_sequence(
        self, cameras, resample: str = "auto"
    ) -> jnp.ndarray:
        """Render ``len(cameras)`` frames in ONE device dispatch.

        The device runs the whole frame loop as a ``lax.scan`` over
        host-packed per-frame input rows — no per-frame dispatch, no
        per-frame host round trip.  Returns the (N, H, W, 3) u8 frame
        stack (device array; ``np.asarray`` it once at the end).
        Advances the renderer's accumulation state and frame counters
        exactly as N sequential :meth:`render` calls would — mixed
        still/moving paths scan with a per-frame traced reproject
        choice, so still frames keep the cheap elementwise blend.

        ``resample`` picks the history resampler for moving frames:
        "auto" (default) brackets the path's worst-case reprojection
        offsets over a conservative depth sweep and selects "xla" (the
        any-offset gather) only when they exceed the fused Pallas
        kernel's serve window; "pallas"/"xla" force the choice.

        Output frames stay on device: at 4K a 32-frame stack is
        ~760 MB of HBM — chunk long exports into multiple calls.
        Note each distinct (segment length, reproject) pair compiles
        its own scan; paths that alternate motion every frame would
        compile many — batch such paths per-frame instead.
        """
        packed_seq, flags, resample, still, last = (
            self._pack_sequence(cameras, resample)
        )
        parts = []
        for start, end, reproject in self._segments(flags):
            self.state, frames = render_sequence_jit(
                self.state,
                self._scene_arrays,
                packed_seq[start:end],
                self._noise,
                scene_meta=self._scene_meta,
                height=self.height,
                width=self.width,
                radius=self.denoise_radius,
                reproject=reproject,
                trace_impl=self.trace_impl,
                resample=resample,
                lean=True,
                trace_knobs=self.trace_knobs,
            )
            parts.append(frames)
        self._finish_sequence(
            len(cameras), still, last, resample, any(flags)
        )
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    def render_burst(self, camera: "Camera", n: int) -> jnp.ndarray:
        """N accumulation passes at a fixed camera in one dispatch;
        returns the final (converged) u8 frame (device array).  The
        offline-still analog of holding the realtime loop still for N
        frames (the reference's progressive accumulation,
        ``src/context.rs:1999``).  Unlike :meth:`render_sequence` the
        scan is carry-only — the intermediate frames are never
        materialized, so a 256-pass 4K burst holds one output image,
        not ~6 GB of ys."""
        packed_seq, flags, resample, still, last = (
            self._pack_sequence([camera] * n, "auto")
        )
        image = None
        for start, end, reproject in self._segments(flags):
            self.state, image = render_burst_jit(
                self.state,
                self._scene_arrays,
                packed_seq[start:end],
                self._noise,
                scene_meta=self._scene_meta,
                height=self.height,
                width=self.width,
                radius=self.denoise_radius,
                reproject=reproject,
                trace_impl=self.trace_impl,
                resample=resample,
                lean=True,
                trace_knobs=self.trace_knobs,
            )
        self._finish_sequence(n, still, last, resample, any(flags))
        return image
