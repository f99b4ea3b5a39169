"""Render parameter pytrees — the uniform ABI, reborn as jit arguments.

Mirrors the reference's uniform structs and defaults:
``Uniforms`` (``src/context.rs:425-498``), ``TemporalUniforms``
(``:502-525``) and ``DenoiseUniforms`` (``:304-325``).  Instead of
hand-packed GPU buffers these are dataclass pytrees whose leaves flow
into the jitted frame function as traced scalars, so parameter changes
never retrace.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_pytree_node(
        cls,
        lambda obj: (
            tuple(getattr(obj, name) for name in fields),
            None,
        ),
        lambda _, leaves: cls(**dict(zip(fields, leaves))),
    )
    return cls


@_pytree_dataclass
class RenderParams:
    """Lighting / material parameters of the path tracer."""

    emit_strength: float = 4.0
    sun_strength: float = 4.0
    sun_size: float = 0.05
    sun_yaw: float = 1.32
    sun_pitch: float = 1.0
    sun_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    sky_color: Tuple[float, float, float] = (0.45, 0.6, 0.65)
    specularity: float = 0.0


@_pytree_dataclass
class TemporalParams:
    """Temporal reprojection blending parameters."""

    sample_blending: float = 0.5
    maximum_blending: float = 0.98
    blending_distance_cutoff: float = 1e-2


@_pytree_dataclass
class DenoiseParams:
    """Cross-bilateral denoiser parameters.

    ``radius`` is a *static* structural parameter (it fixes the stencil
    footprint, so changing it recompiles); the sigmas and albedo factor
    are traced.
    """

    sigma_distance: float = 2.0
    sigma_range: float = 1.5
    albedo_factor: float = 1.0


DENOISE_RADIUS_DEFAULT = 0  # src/context.rs:316-325


# Note on the reference's PointLight uniform (src/context.rs:527-534):
# it is only consumed by the legacy Whitted-style fragment shader
# (shaders/basic.frag), which no pipeline ever dispatches — the loaded
# display shaders are basic.vert + display.frag (src/context.rs:1364).
# It is therefore vestigial and intentionally not part of RenderParams.
