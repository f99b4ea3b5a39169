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
from ..ops import tonemap
from ..ops import trace_pallas
from ..ops import trace_xla
from ..scene.grid import GridScene
from .camera import Camera
from .params import DenoiseParams, RenderParams, TemporalParams


def init_state(height: int, width: int) -> Dict[str, jnp.ndarray]:
    """Fresh accumulation / history state (all-invalid history)."""
    return {
        "accum_color": jnp.zeros((height, width, 3), jnp.float32),
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
    shard_mesh=None,  # jax.sharding.Mesh: shard the Pallas trace stage
    shard_axis: str = "rows",
):
    dims, origin, zw, n_rows, l3_dims, m_rows, b_rows = scene_meta

    if trace_impl.startswith("pallas"):
        # "pallas_interpret" runs the same kernel through the Pallas
        # interpreter — how CPU tests exercise the TPU kernel family.
        # "pallas_hbm" keeps the packed fine table HBM-resident (scenes
        # beyond the VMEM budget) and DMAs serve windows on demand.
        interpret = trace_impl == "pallas_interpret"
        params_vec = trace_pallas.pack_params_traced(cam, render_params)
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
        )
        if shard_mesh is None:
            nq = trace_pallas.noise_quads(
                jnp.asarray(noise_buffer), frame_number,
                tile_h=trace_pallas.pick_tile(height, width),
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
            # Pallas under SPMD: XLA cannot partition a custom call, so
            # the trace stage runs under shard_map — each chip traces
            # its own row slab against the replicated scene (zero
            # collectives; params slot 30 carries the slab's global
            # row so ray-gen stays image-global, and the noise quads
            # are pre-rolled by the slab's row offset).
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            n_dev = shard_mesh.devices.size
            slab = height // n_dev

            def _trace(packed, meta, brick, pal, pv, nbuf, fnum):
                row0 = jax.lax.axis_index(shard_axis) * slab
                pv = pv.at[0, 30].set(row0.astype(jnp.float32))
                nq = trace_pallas.noise_quads(
                    nbuf, fnum, roll=row0,
                    tile_h=trace_pallas.pick_tile(slab, width),
                )
                return trace_pallas.render_sample(
                    packed, meta, brick, pal, pv, nq,
                    height=slab, **trace_kw,
                )

            out_specs = {
                "color": P(shard_axis),
                "normal": P(shard_axis),
                "depth": P(shard_axis),
                "albedo": P(shard_axis),
                "node": P(shard_axis),
                "debug_iters": P(shard_axis),
            }
            gbuf = shard_map(
                _trace,
                mesh=shard_mesh,
                in_specs=(P(), P(), P(), P(), P(), P(), P()),
                out_specs=out_specs,
                check_rep=False,
            )(
                scene_arrays["packed_idx"],
                scene_arrays["meta_idx"],
                scene_arrays["brick_idx"],
                scene_arrays["palette"],
                params_vec,
                jnp.asarray(noise_buffer),
                frame_number,
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

    cam_tuple = (cam[0], cam[1], cam[2], cam[3])
    old = state["old_cam"]
    old_cam_tuple = (old[0], old[1], old[2], old[3])
    blended, next_blend = temporal_op.temporal_blend(
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
        reproject=reproject,
        # The pallas resampler rides the single-chip TPU path; under a
        # mesh the XLA gather path lets the SPMD partitioner insert the
        # cross-slab halo exchanges.
        resample_impl=(
            "pallas"
            if trace_impl in ("pallas", "pallas_hbm") and shard_mesh is None
            else "xla"
        ),
    )

    # The VMEM-windowed Pallas stencil reads each pixel once; the XLA
    # stencil streams ~(2r+1)^2 full-image slices through HBM.  Pair it
    # with the Pallas trace path (single-chip TPU); under a mesh the
    # XLA stencil shards through annotations (partitioned halos).
    denoise_fn = (
        denoise_pallas_op.denoise
        if trace_impl in ("pallas", "pallas_hbm") and shard_mesh is None
        else denoise_op.denoise
    )
    out = denoise_fn(
        blended,
        gbuf["normal"],
        gbuf["depth"],
        gbuf["albedo"],
        gbuf["node"],
        cam_tuple,
        denoise_params,
        radius=radius,
    )

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
        "linear": out,
        "trace_color": gbuf["color"],
        "depth": gbuf["depth"],
        "normal": gbuf["normal"],
        "albedo": gbuf["albedo"],
        "node": gbuf["node"],
    }
    return new_state, outputs


render_frame = partial(
    jax.jit,
    static_argnames=(
        "scene_meta", "height", "width", "radius", "reproject",
        "trace_impl", "shard_mesh", "shard_axis",
    ),
    donate_argnames=("state",),
)(render_frame_impl)


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

    def render(self, camera: Camera) -> Dict[str, np.ndarray]:
        right, up, forward = camera.axis_scaled(self.width, self.height)
        cam = np.stack(
            [np.asarray(camera.position), right, up, forward]
        ).astype(np.float32)

        moved = self._last_cam is None or not np.array_equal(
            cam, self._last_cam
        )
        self._last_cam = cam
        if moved:
            self.still_sample = 0

        self.frame_number += 1
        self.still_sample += 1

        self.state, outputs = render_frame(
            self.state,
            self._scene_arrays,
            jnp.asarray(cam),
            self.render_params,
            self.temporal_params,
            self.denoise_params,
            self._noise,
            jnp.int32(self.frame_number),
            scene_meta=self._scene_meta,
            height=self.height,
            width=self.width,
            radius=self.denoise_radius,
            reproject=moved,
            trace_impl=self.trace_impl,
        )
        return outputs
