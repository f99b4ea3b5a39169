"""Checkpoint / resume for progressive renders.

The reference has no persistence at all (SURVEY §5: camera, uniforms
and accumulation are ephemeral).  Headless progressive rendering makes
resumability cheap and useful: a snapshot captures the accumulation
state, camera pose, frame counters and all render parameters, so a
long-converging frame can continue across sessions.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from .camera import Camera
from .params import DenoiseParams, RenderParams, TemporalParams
from .pipeline import Renderer

FORMAT_VERSION = 1


def save(path: str | os.PathLike, renderer: Renderer, camera: Camera):
    meta = {
        "version": FORMAT_VERSION,
        "height": renderer.height,
        "width": renderer.width,
        "frame_number": renderer.frame_number,
        "still_sample": renderer.still_sample,
        "denoise_radius": renderer.denoise_radius,
        "trace_impl": renderer.trace_impl,
        "render_params": dataclasses.asdict(renderer.render_params),
        "temporal_params": dataclasses.asdict(renderer.temporal_params),
        "denoise_params": dataclasses.asdict(renderer.denoise_params),
        "camera_position": list(map(float, camera.position)),
        "camera_direction": list(map(float, camera.direction)),
        "camera_fov": camera.fov,
    }
    arrays = {k: np.asarray(v) for k, v in renderer.state.items()}
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


def load(path: str | os.PathLike, renderer: Renderer) -> Camera:
    """Restore state into ``renderer`` (scene must already be set);
    returns the snapshotted camera."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    if meta["version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported snapshot version {meta['version']}")
    if (meta["height"], meta["width"]) != (renderer.height, renderer.width):
        raise ValueError(
            "snapshot resolution mismatch: "
            f"{meta['height']}x{meta['width']} vs "
            f"{renderer.height}x{renderer.width}"
        )
    renderer.state = {
        k: jnp.asarray(data[k]) for k in renderer.state
    }
    renderer.frame_number = int(meta["frame_number"])
    renderer.still_sample = int(meta["still_sample"])
    renderer.denoise_radius = int(meta["denoise_radius"])
    if meta["trace_impl"] != renderer.trace_impl:
        # trace_impl is platform-selected (pallas on TPU, xla on CPU);
        # keep the live choice but surface the divergence.
        import logging

        logging.getLogger("voxtracer.engine.snapshot").warning(
            "snapshot was written with trace_impl=%r; resuming with %r",
            meta["trace_impl"],
            renderer.trace_impl,
        )
    renderer.render_params = RenderParams(**meta["render_params"])
    renderer.temporal_params = TemporalParams(**meta["temporal_params"])
    renderer.denoise_params = DenoiseParams(**meta["denoise_params"])
    cam = Camera(
        position=np.array(meta["camera_position"]),
        direction=np.array(meta["camera_direction"]),
        fov=meta["camera_fov"],
    )
    # history continues seamlessly only if the camera is unchanged;
    # mark it as the renderer's last pose
    right, up, forward = cam.axis_scaled(renderer.width, renderer.height)
    renderer._last_cam = np.stack(
        [np.asarray(cam.position), right, up, forward]
    ).astype(np.float32)
    # sync the host mirror the packed kernel rows read (the restored
    # device state carries the authoritative flag)
    renderer._history_valid = bool(np.asarray(data["history_valid"]))
    return cam
