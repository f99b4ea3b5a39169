"""BASELINE measurement harness: the five driver-defined configs.

Runs each config from BASELINE.md and prints one JSON line per metric.
Config 1 is the correctness gate (TPU kernel vs the NumPy oracle);
configs 2-5 are throughput.  ``--quick`` limits frame counts; ``--skip``
drops configs (e.g. the 4K stretch).

Run: ``python -m voxtracer.app.bench [--quick] [--skip 5]``
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from ..engine.camera import Camera
from ..engine.pipeline import Renderer
from . import camera_paths
from .cli import load_scene


def _emit(**kv):
    print(json.dumps(kv), flush=True)


def _sync(out):
    """Force execution with a 4-byte transfer.  Under the axon tunnel a
    full-image np.asarray pays ~25 ms roundtrip + ~145 MB/s bandwidth —
    a measurement artifact (a real host link DMAs the 2.7 MB u8 frame
    in ~2 ms), so frame timings sync on an on-device scalar instead."""
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(out["depth"])))


def _time_frames(renderer, cameras, full_out=True, per_frame=None):
    # Warm pass over the WHOLE camera sequence first: it compiles
    # every jit variant the sequence triggers (moving + static
    # temporal, and any predictor-selected any-offset resample
    # fallback) and rides out the remote service's slow first
    # executions of a fresh compile (10-200 s variance — measured
    # contaminating a 2-frame-warmup timed region by 2-3x).  Then two
    # timed passes, best reported (same best-of-N philosophy as the
    # headline bench: the shared service swings ±30% across minutes
    # and the ramp can outlive one warm pass at 4K).  Timing runs
    # LEAN (realtime output set — what a production loop
    # materializes); one full render afterwards supplies the G-buffer
    # for post-analysis.  ``per_frame(i)`` lets a config mutate live
    # parameters mid-sequence (config 5's animated sun).
    def run(pass_cams, start):
        for i, cam in enumerate(pass_cams, start):
            if per_frame is not None:
                per_frame(i)
            out = renderer.render(cam, lean=True)
        _sync(out)

    run(cameras, 0)
    dt = None
    for _ in range(2):
        t0 = time.perf_counter()
        run(cameras[1:], 1)
        cand = (time.perf_counter() - t0) / max(1, len(cameras) - 1)
        dt = cand if dt is None else min(dt, cand)
    if full_out:
        out = renderer.render(cameras[-1], lean=False)
    else:
        out = renderer.render(cameras[-1], lean=True)
    return dt, out


def _exact_rays(scene, cam, h, w):
    """Exact rays/frame from the trace kernel's own segment counters
    (debug column 10 — every primary/bounce/shadow segment actually
    traced), measured on ONE instrumented sample outside the timed
    region, exactly like the headline bench (bench.py:79-98).  This is
    the honest numerator BASELINE.md's "Mrays/sec" metric wants — the
    reference's per-pixel budget (voxels.comp:4,309,352) is only an
    upper bound of 6 traversals/pixel.  Returns 0.0 where the counters
    are unavailable (XLA fallback path)."""
    try:
        from .phasestats import phase_stats

        rows = phase_stats(scene, cam, h, w)
        return float(sum(r["rays"] for r in rows))
    except Exception:
        return 0.0


def config1_oracle_match(quick=False):
    """8x8x8.vox, 256x256, 1 spp, static camera: TPU kernel vs oracle."""
    from ..engine.params import RenderParams
    from ..ops import noise as noise_op
    from ..ops import trace_pallas

    scene = load_scene("8x8x8")
    size = 128 if quick else 256
    cam = Camera(
        position=np.array([2.0, 3.0, -4.0]),
        direction=np.array([0.2, 0.1, 1.0]),
    )
    params = RenderParams()
    right, up, forward = cam.axis_scaled(size, size)
    buf = noise_op.white_noise_buffer(seed=7)
    planes = noise_op.noise_planes(buf, 1, size, size)

    from ..oracle import renderer as oracle

    o = oracle.render_sample(
        scene.values,
        scene.origin.astype(np.int64),
        np.asarray(cam.position),
        right,
        up,
        forward,
        params,
        planes,
        size,
        size,
    )

    import jax.numpy as jnp

    t = scene.device_tables()
    cam_arr = np.stack([cam.position, right, up, forward]).astype(np.float32)
    x = trace_pallas.render_sample(
        jnp.asarray(t["packed_idx"]),
        jnp.asarray(t["meta_idx"]),
        jnp.asarray(t["brick_idx"]),
        jnp.asarray(t["palette"]),
        jnp.asarray(trace_pallas.pack_params(cam_arr, params)),
        trace_pallas.noise_quads(
            jnp.asarray(buf), jnp.int32(1),
            tile_h=trace_pallas.pick_tile(size, size),
        ),
        dims=scene.values.shape,
        zw=t["zw"],
        origin=tuple(int(v) for v in scene.origin),
        n_rows=t["packed_idx"].shape[0],
        l3_dims=t["l3_dims"],
        m_rows=t["meta_idx"].shape[0],
        b_rows=t["brick_idx"].shape[1],
        height=size,
        width=size,
    )
    x = {k: np.asarray(v) for k, v in x.items()}
    for k in ("color", "normal", "albedo"):  # planar kernel output
        x[k] = np.moveaxis(x[k], 0, -1)

    agree = float((o["node"] == x["node"]).mean())
    err = (x["color"] - o["color"]).astype(np.float64)
    mse = float(np.mean(err**2))
    psnr = 10 * np.log10(max(1.0, float(o["color"].max())) ** 2 / max(mse, 1e-12))
    _emit(
        config=1,
        name="8x8x8 oracle match",
        resolution=f"{size}x{size}",
        node_agreement=round(agree, 6),
        color_psnr_db=round(psnr, 2),
    )


def config2_menger(quick=False):
    scene = load_scene("menger")
    frames = 4 if quick else 10
    r = Renderer(scene=scene, height=720, width=1280)
    cam = Camera(
        position=np.array([36.0, 34.0, -5.0]),
        direction=np.array([-16.0, -14.0, 25.0]),
    )
    dt, _ = _time_frames(r, [cam] * (frames + 1))
    rays = _exact_rays(scene, cam, 720, 1280)
    _emit(
        config=2,
        name="menger 720p progressive",
        ms_per_frame=round(dt * 1e3, 1),
        fps=round(1 / dt, 2),
        rays_per_frame=round(rays),
        mrays_per_s=round(rays / dt / 1e6, 1),
    )


def config3_knight_temporal(quick=False):
    scene = load_scene("chr_knight")
    frames = 4 if quick else 10
    r = Renderer(scene=scene, height=720, width=1280)
    path = camera_paths.orbit(scene)
    cams = [path(i / 30.0) for i in range(frames + 1)]
    dt, out = _time_frames(r, cams)
    blend = np.asarray(r.state["accum_blend"])
    rays = _exact_rays(scene, cams[-1], 720, 1280)
    _emit(
        config=3,
        name="chr_knight 720p temporal reprojection (orbit)",
        ms_per_frame=round(dt * 1e3, 1),
        fps=round(1 / dt, 2),
        reprojection_accepted=round(float((blend < 1.0).mean()), 3),
        rays_per_frame=round(rays),
        mrays_per_s=round(rays / dt / 1e6, 1),
    )


def config4_monu9_full(quick=False):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from ..engine.params import DenoiseParams, TemporalParams
    from ..ops import denoise as denoise_op
    from ..ops import denoise_pallas as denoise_pallas_op
    from ..ops import temporal as temporal_op
    from ..ops import tonemap as tonemap_op

    scene = load_scene("monu9")
    frames = 3 if quick else 8
    h, w = 1080, 1920
    r = Renderer(scene=scene, height=h, width=w, denoise_radius=2)
    path = camera_paths.dolly(scene)
    cams = [path(i / 30.0) for i in range(frames + 1)]
    dt, out = _time_frames(r, cams)

    # per-stage device timings (the reference has no GPU timestamps at
    # all — SURVEY §5; these run each stage as its own jit)
    right, up, forward = cams[-1].axis_scaled(w, h)
    cam_t = tuple(
        jnp.asarray(v, jnp.float32)
        for v in (cams[-1].position, right, up, forward)
    )
    gN = jnp.asarray(out["normal"])
    gD = jnp.asarray(out["depth"])
    gA = jnp.asarray(out["albedo"])
    gC = jnp.asarray(out["trace_color"])
    gM = jnp.asarray(out["node"])

    def _t(fn, *args, n=5):
        def sync(res):
            # 4-byte scalar sync — a full-image np.asarray would bill
            # the axon tunnel's ~145 MB/s to the stage (see _sync)
            leaf = jax.tree_util.tree_leaves(res)[0]
            return float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))

        sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            res = fn(*args)
        sync(res)
        return (time.perf_counter() - t0) / n

    # time the denoiser the pipeline actually selected for this device
    den_mod = (
        denoise_pallas_op if r.trace_impl.startswith("pallas") else denoise_op
    )
    den = jax.jit(partial(den_mod.denoise, radius=2))
    if den_mod is denoise_pallas_op:
        # the Pallas denoiser's I/O is planar (3, H, W)
        t_denoise = _t(
            den,
            jnp.moveaxis(gC, -1, 0), jnp.moveaxis(gN, -1, 0), gD,
            jnp.moveaxis(gA, -1, 0), gM, cam_t, DenoiseParams(),
        )
    else:
        t_denoise = _t(den, gC, gN, gD, gA, gM, cam_t, DenoiseParams())
    # time the resampler the pipeline actually selected for this device
    tmp = jax.jit(
        partial(
            temporal_op.temporal_blend,
            reproject=True,
            resample_impl=(
                "pallas" if r.trace_impl.startswith("pallas") else "xla"
            ),
        )
    )
    t_temporal = _t(
        tmp, gC, gN, gD, gC, gD * 0 + 0.5, gD, cam_t, cam_t,
        TemporalParams(), jnp.asarray(True),
    )
    t_tone = _t(jax.jit(tonemap_op.to_u8), gC)

    rays = _exact_rays(scene, cams[-1], h, w)
    _emit(
        config=4,
        name="monu9 1080p full pipeline (trace+temporal+denoise r=2)",
        ms_per_frame=round(dt * 1e3, 1),
        fps=round(1 / dt, 2),
        rays_per_frame=round(rays),
        mrays_per_s=round(rays / dt / 1e6, 1),
        standalone_stage_ms_incl_dispatch={
            "temporal_reproject": round(t_temporal * 1e3, 2),
            "denoise_r2": round(t_denoise * 1e3, 2),
            "tonemap_u8": round(t_tone * 1e3, 2),
        },
    )


def config5_castle_4k(quick=False):
    import dataclasses

    scene = load_scene("castle")
    frames = 2 if quick else 4
    r = Renderer(scene=scene, height=2160, width=3840)
    cam = camera_paths.static(scene)(0.0)
    cams = [cam] * (frames + 1)

    def sun_sweep(i):
        # animated sun: yaw sweeps while the camera holds still
        # (params are traced jit args — the sweep must not recompile)
        r.render_params = dataclasses.replace(
            r.render_params, sun_yaw=1.32 + 0.05 * i
        )

    dt, _ = _time_frames(r, cams, per_frame=sun_sweep)
    rays = _exact_rays(scene, cam, 2160, 3840)
    _emit(
        config=5,
        name="castle 4K animated sun (stretch)",
        ms_per_frame=round(dt * 1e3, 1),
        fps=round(1 / dt, 3),
        rays_per_frame=round(rays),
        mrays_per_s=round(rays / dt / 1e6, 1),
    )


def config6_asset_sweep(quick=False):
    """Every shipped .vox asset through the full Pallas pipeline: one
    JSON line per asset with fps, iteration-fuse pixel count and node
    agreement vs the oracle on a small crop (VERDICT #9's regression
    net for kernel surgery across the whole asset set)."""
    import glob
    import os

    from ..engine.params import RenderParams
    from ..ops import noise as noise_op
    from ..ops import trace_pallas
    from ..oracle import renderer as oracle

    here = os.path.dirname(os.path.abspath(__file__))
    vox_dir = os.path.join(here, "..", "..", "assets", "vox")
    names = sorted(
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(vox_dir, "*.vox"))
    )
    h, w = (180, 320) if quick else (360, 640)
    ch, cw = 72, 128  # oracle-agreement crop
    frames = 2 if quick else 5
    for name in names:
        scene = load_scene(name)
        path = camera_paths.orbit(scene)
        cam = path(0.15)
        r = Renderer(scene=scene, height=h, width=w)
        dt, out = _time_frames(r, [cam] * (frames + 2))
        node = np.asarray(out["node"])
        fuse_px = int((node == trace_pallas.LEAF_BIT).sum())

        # node agreement vs the oracle at a small crop (shared noise)
        params = RenderParams()
        right, up, forward = cam.axis_scaled(cw, ch)
        buf = noise_op.white_noise_buffer(seed=3)
        planes = noise_op.noise_planes(buf, 1, ch, cw)
        o = oracle.render_sample(
            scene.values, scene.origin.astype(np.int64),
            np.asarray(cam.position), right, up, forward,
            params, planes, cw, ch,
        )
        import jax.numpy as jnp

        t = scene.device_tables()
        cam_arr = np.stack(
            [cam.position, right, up, forward]
        ).astype(np.float32)
        x = trace_pallas.render_sample(
            jnp.asarray(t["packed_idx"]),
            jnp.asarray(t["meta_idx"]),
            jnp.asarray(t["brick_idx"]),
            jnp.asarray(t["palette"]),
            jnp.asarray(trace_pallas.pack_params(cam_arr, params)),
            trace_pallas.noise_quads(
                jnp.asarray(buf), jnp.int32(1),
                tile_h=trace_pallas.pick_tile(ch, cw),
            ),
            dims=scene.values.shape,
            zw=t["zw"],
            origin=tuple(int(v) for v in scene.origin),
            n_rows=t["packed_idx"].shape[0],
            l3_dims=t["l3_dims"],
            m_rows=t["meta_idx"].shape[0],
            b_rows=t["brick_idx"].shape[1],
            height=ch,
            width=cw,
        )
        agree = float((o["node"] == np.asarray(x["node"])).mean())
        _emit(
            config=6,
            name=f"asset sweep: {name}",
            resolution=f"{w}x{h}",
            ms_per_frame=round(dt * 1e3, 1),
            fps=round(1 / dt, 2),
            fuse_pixels=fuse_px,
            node_agreement=round(agree, 5),
        )


CONFIGS = {
    1: config1_oracle_match,
    2: config2_menger,
    3: config3_knight_temporal,
    4: config4_monu9_full,
    5: config5_castle_4k,
    6: config6_asset_sweep,
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--skip", type=int, nargs="*", default=[])
    p.add_argument("--only", type=int, nargs="*", default=None)
    args = p.parse_args(argv)
    for idx, fn in CONFIGS.items():
        if idx in args.skip or (args.only and idx not in args.only):
            continue
        try:
            fn(quick=args.quick)
        except Exception as e:  # keep measuring the rest
            _emit(config=idx, error=str(e)[:200])
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
