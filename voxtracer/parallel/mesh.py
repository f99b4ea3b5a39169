"""Multi-chip scaling: image-tile data parallelism over a device mesh.

The reference's only parallelism is the GPU's own SIMT grid (16x16
workgroups, ``src/context.rs:2018-2037``) — single device, no
communication layer.  The TPU-native scaling axis is sharding the pixel
dimension of every per-pixel array over a 1-D ``jax.sharding.Mesh``
("rows"), with the scene, noise buffer and camera replicated:

  * the path-trace stage is embarrassingly parallel per pixel — no
    collectives at all on its hot loop;
  * the temporal resample and the denoise stencil read across row-tile
    boundaries.  On the Pallas path the WHOLE per-pixel pipeline runs
    under ``shard_map`` and keeps its single-chip kernels: each stencil
    stage fetches a fixed row halo from the neighboring slabs with one
    ``lax.ppermute`` edge exchange (``pipeline._edge_rows``), so a mesh
    run pays single-chip per-stage cost plus two edge exchanges — and
    bit-matches the single-device render.  On the portable XLA path the
    stages are ordinary jnp ops under ``jit`` with sharding
    annotations, and the SPMD partitioner inserts the halos.

Scene data is replicated (voxel scenes are tens of MB — far below HBM),
so the only steady-state ICI traffic is the stencil halos.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine import pipeline


def make_mesh(devices: Optional[Sequence] = None, axis: str = "rows") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


def _state_specs(axis: str) -> Dict[str, P]:
    return {
        # accum_color is planar (3, H, W): rows live on axis 1
        "accum_color": P(None, axis),
        "accum_blend": P(axis),
        "old_depth": P(axis),
        "old_cam": P(),
        "history_valid": P(),
    }


def sharded_render_frame(
    mesh: Mesh,
    *,
    scene_meta: Tuple,
    height: int,
    width: int,
    radius: int = 0,
    reproject: bool = True,
    trace_impl: str = "xla",
    resample: str = "pallas",  # "xla": the any-offset whip-pan
    #   fallback — all-gathers history into each slab (rare-frame cost)
    axis: str = "rows",
    layout: str = "contiguous",  # "cyclic": balanced trace — each chip
    #   renders every n-th 16-row block (one launch, kernel row_stride)
    #   and one all_to_all resorts the G-buffer into contiguous slabs
    #   for the stencils.  Answers the measured vertical work skew
    #   (app/slabprobe: castle 4K contiguous max/mean = 2.11x, and
    #   every per-slab-launch interleaving LOSES to launch overhead).
    #   Pallas trace only; needs height % (n_dev * block) == 0
    #   (block = trace_pallas.BLOCK_OF[tile_h]).
    trace_knobs=None,  # TraceKnobs override (tests pin tile_h so the
    #   cyclic block granularity divides tiny image heights)
):
    """Build a jitted frame function with row-sharded pixel arrays.

    Returns ``(fn, shard_state)`` where ``shard_state`` places a host
    state dict onto the mesh.  ``fn`` has the same signature as
    :func:`voxtracer.engine.pipeline.render_frame` minus the static
    keywords.
    """
    n_dev = mesh.devices.size
    if height % n_dev != 0:
        raise ValueError(
            f"height {height} must divide evenly over {n_dev} devices"
        )
    if layout == "cyclic" and not trace_impl.startswith("pallas"):
        raise ValueError("cyclic layout needs the Pallas trace path")

    def spec(p):
        return NamedSharding(mesh, p)

    state_shardings = {k: spec(v) for k, v in _state_specs(axis).items()}
    rep = spec(P())

    out_shardings = (
        state_shardings,
        {
            "image": spec(P(axis)),
            "linear": spec(P(axis)),
            "trace_color": spec(P(axis)),
            "depth": spec(P(axis)),
            "normal": spec(P(axis)),
            "albedo": spec(P(axis)),
            "node": spec(P(axis)),
            "depth_probe": rep,
        },
    )

    # Prefix sharding: replicate every scene array regardless of which
    # table set (xla dense grid / pallas packed tables) was uploaded.
    scene_shardings = rep
    fn = jax.jit(
        partial(
            pipeline.render_frame_impl,
            scene_meta=scene_meta,
            height=height,
            width=width,
            radius=radius,
            reproject=reproject,
            trace_impl=trace_impl,
            resample=resample,
            # XLA's partitioner cannot split a Pallas custom call, so
            # the pallas trace stage runs under shard_map on this mesh
            # (the xla path shards transparently through annotations).
            shard_mesh=mesh if trace_impl.startswith("pallas") else None,
            shard_axis=axis,
            shard_layout=layout,
            trace_knobs=trace_knobs,
        ),
        in_shardings=(
            state_shardings,  # state
            scene_shardings,  # scene arrays (replicated)
            rep,  # cam
            None,  # render params (scalars)
            None,  # temporal params
            None,  # denoise params
            rep,  # noise buffer
            None,  # frame number
        ),
        out_shardings=out_shardings,
        donate_argnums=(0,),
    )

    def shard_state(state):
        return {
            k: jax.device_put(v, state_shardings[k]) for k, v in state.items()
        }

    return fn, shard_state


def scene_device_args(scene, trace_impl: str = "all"):
    """(scene_meta, scene_arrays) for render_frame from a GridScene.

    ``trace_impl`` selects which device tables to upload: the dense
    int32 grid is only read by the XLA kernel and can be hundreds of
    MB (procedural bowl ~285 MB), so ``trace_impl="pallas"`` skips it.
    ``"all"`` uploads everything (tests, dryruns).
    """
    import jax.numpy as jnp

    tables = scene.device_tables()
    meta = (
        tuple(int(d) for d in scene.values.shape),
        tuple(int(v) for v in scene.origin),
        int(tables["zw"]),
        int(tables["packed_idx"].shape[0]),
        tuple(int(d) for d in tables["l3_dims"]),
        int(tables["meta_idx"].shape[0]),
        int(tables["brick_idx"].shape[1]),
    )
    arrays = {
        "packed_idx": jnp.asarray(tables["packed_idx"]),
        "meta_idx": jnp.asarray(tables["meta_idx"]),
        "brick_idx": jnp.asarray(tables["brick_idx"]),
        "palette": jnp.asarray(tables["palette"]),
    }
    if trace_impl not in ("pallas", "pallas_hbm"):
        arrays["flat_grid"] = jnp.asarray(scene.values.reshape(-1))
        arrays["grid_origin"] = jnp.asarray(scene.origin.astype(np.int32))
    return meta, arrays
