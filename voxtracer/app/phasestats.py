"""Per-phase kernel counters: steps, serve rounds, lane utilization.

Reads the trace kernel's ``debug_iters`` output (per-program counters
the kernel banks at lane (0, 6*c+k): c = outer steps / meta serves /
brick serves / fine serves / live-lane integral / rays traced (c=10),
k = phase [b0, s0, b1, s1, b2, s2]) and prints per-phase totals plus the
live-lane utilization (live integral / (steps x lanes)) — the measured
basis for queue-depth and decorrelation decisions (VERDICT round-2 #4:
bounce-phase utilization was 27% on menger 720p).

Run: python -m voxtracer.app.phasestats --scene menger --size 1280x720 \
         --pos 36,34,-5 --dir -16,-14,25 [--cfg scramble=1]
"""

from __future__ import annotations

import argparse

import numpy as np

from ..engine.camera import Camera
from ..ops import noise as noise_op
from ..ops import trace_pallas
from . import camera_paths
from .abench import parse_cfg
from .cli import load_scene

PHASES = ["b0", "s0", "b1", "s1", "b2", "s2"]


def render_one_sample(scene, cam, h, w, knobs=None, interpret=False):
    """One traced sample via the Pallas kernel; the raw output dict
    (color/normal/depth/node/albedo planes + debug counters)."""
    import jax.numpy as jnp

    from ..engine.params import RenderParams

    params = RenderParams()
    right, up, forward = cam.axis_scaled(w, h)
    buf = noise_op.white_noise_buffer(seed=7)
    t = scene.device_tables()
    cam_arr = np.stack(
        [cam.position, right, up, forward]
    ).astype(np.float32)
    knobs = knobs or trace_pallas.pick_knobs(h, w)
    return trace_pallas.render_sample(
        jnp.asarray(t["packed_idx"]),
        jnp.asarray(t["meta_idx"]),
        jnp.asarray(t["brick_idx"]),
        jnp.asarray(t["palette"]),
        jnp.asarray(trace_pallas.pack_params(cam_arr, params)),
        trace_pallas.noise_quads(
            jnp.asarray(buf), jnp.int32(1), tile_h=knobs.tile_h
        ),
        dims=scene.values.shape,
        zw=t["zw"],
        origin=tuple(int(v) for v in scene.origin),
        n_rows=t["packed_idx"].shape[0],
        l3_dims=t["l3_dims"],
        m_rows=t["meta_idx"].shape[0],
        b_rows=t["brick_idx"].shape[1],
        height=h,
        width=w,
        interpret=interpret,
        knobs=knobs,
    )


def phase_stats(scene, cam, h, w, knobs=None, interpret=False):
    """One traced sample's per-phase counter table (list of dicts)."""
    knobs = knobs or trace_pallas.pick_knobs(h, w)
    out = render_one_sample(scene, cam, h, w, knobs=knobs,
                            interpret=interpret)
    dbg = np.asarray(out["debug_iters"])  # (programs, >=30)
    lanes = knobs.tile_h * trace_pallas.TILE_W
    rows = []
    for k, name in enumerate(PHASES):
        steps = dbg[:, 6 * 0 + k]
        meta = dbg[:, 6 * 1 + k]
        brick = dbg[:, 6 * 2 + k]
        fine = dbg[:, 6 * 3 + k]
        live = dbg[:, 6 * 4 + k]
        rays = dbg[:, 6 * 10 + k] if dbg.shape[1] > 6 * 10 + k else None
        tot_steps = float(steps.sum())
        row = dict(
            phase=name,
            steps=tot_steps,
            steps_max=float(steps.max()),
            meta_serves=float(meta.sum()),
            brick_serves=float(brick.sum()),
            fine_serves=float(fine.sum()),
            util=float(live.sum()) / max(1.0, tot_steps * lanes),
            rays=float(rays.sum()) if rays is not None else 0.0,
        )
        if knobs.decay_stats:
            # live-decay quantile crossings (counters c=5..9): mean
            # over programs of trips with >= f lanes live, as a
            # fraction of that program's total trips — the capped-
            # phase design curve (how early could the while stop)
            t = np.maximum(steps.astype(np.float64), 1.0)
            for j, frac in enumerate(("t75", "t50", "t25", "t12",
                                      "t03")):
                row[frac] = float(
                    np.mean(dbg[:, 6 * (5 + j) + k] / t)
                )
        rows.append(row)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", default="menger")
    p.add_argument("--size", default="1280x720", help="WxH")
    p.add_argument("--pos", default=None, help="camera position x,y,z")
    p.add_argument("--dir", default=None, help="camera direction x,y,z")
    p.add_argument("--cfg", default=None,
                   help="knob overrides k=v,k=v (TraceKnobs fields)")
    p.add_argument("--decay", action="store_true",
                   help="bank + print live-decay quantiles "
                        "(sets knobs.decay_stats)")
    p.add_argument("--floor", default=None,
                   help="comma list of live_floor values: render base "
                        "vs capped and count abandoned pixels/blocks "
                        "(the residual workload of an exact capped-"
                        "phase scheme)")
    p.add_argument("--interpret", action="store_true")
    args = p.parse_args(argv)

    w, h = (int(v) for v in args.size.split("x"))
    scene = load_scene(args.scene)
    if args.pos:
        cam = Camera(
            position=np.array([float(v) for v in args.pos.split(",")]),
            direction=np.array(
                [float(v) for v in (args.dir or "0,0,1").split(",")]
            ),
        )
    else:
        cam = camera_paths.static(scene)(0.0)
    knobs = trace_pallas.pick_knobs(h, w)
    if args.cfg:
        _, kw = parse_cfg(":" + args.cfg)
        knobs = knobs.replace(**kw)
    if args.decay:
        knobs = knobs.replace(decay_stats=1)

    if args.floor:
        base = {
            k: np.asarray(v)
            for k, v in render_one_sample(
                scene, cam, h, w, knobs=knobs,
                interpret=args.interpret).items()
        }
        for F in (int(v) for v in args.floor.split(",")):
            fk = knobs.replace(live_floor_b=F, live_floor_s=F)
            capped = render_one_sample(scene, cam, h, w, knobs=fk,
                                       interpret=args.interpret)
            anydiff = np.zeros((h, w), bool)
            per = {}
            for key, db in capped.items():
                da = base[key]
                db = np.asarray(db)
                if da.shape[:2] != (h, w):
                    continue
                d = (da != db)
                d = d.any(axis=-1) if d.ndim == 3 else d
                per[key] = int(d.sum())
                anydiff |= d
            bh, bw = knobs.tile_h, trace_pallas.TILE_W
            blocks = anydiff[: h // bh * bh, : w // bw * bw].reshape(
                h // bh, bh, w // bw, bw).any(axis=(1, 3))
            print(f"floor={F}: pixels any-diff {int(anydiff.sum())} "
                  f"({100 * anydiff.sum() / (h * w):.3f}%), blocks "
                  f"{int(blocks.sum())}/{blocks.size}, "
                  f"per-channel {per}")
        return 0

    rows = phase_stats(scene, cam, h, w, knobs=knobs,
                       interpret=args.interpret)
    print(f"# {args.scene} {w}x{h} knobs={knobs}")
    qcols = ("t75", "t50", "t25", "t12", "t03") if args.decay else ()
    print(f"{'phase':>6} {'steps':>12} {'max/prog':>9} {'meta':>10} "
          f"{'brick':>10} {'fine':>8} {'util':>6} {'Mrays':>8}"
          + "".join(f" {c:>6}" for c in qcols))
    for r in rows:
        print(f"{r['phase']:>6} {r['steps']:12.0f} {r['steps_max']:9.0f} "
              f"{r['meta_serves']:10.0f} {r['brick_serves']:10.0f} "
              f"{r['fine_serves']:8.0f} {r['util']:6.1%} "
              f"{r['rays'] / 1e6:8.3f}"
              + "".join(f" {r[c]:6.1%}" for c in qcols))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
