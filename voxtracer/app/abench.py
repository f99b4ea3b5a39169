"""In-process interleaved A/B kernel-knob benchmark.

The shared TPU service's load swings +-30% across minutes, so
subprocess-per-config sweeps (and even back-to-back single-process
runs) routinely invert A/B verdicts.  The only measurement that has
held up across round 2/3 kernel work is the INTERLEAVED pair: compile
every candidate config in one process, then alternate short bursts
A,B,A,B,... and compare per-round deltas.  TraceKnobs being a static
jit argument makes this safe — each config is its own cache entry.

Run (ONE TPU process at a time — see the verify skill's gotchas):

    python -m voxtracer.app.abench --scene menger --size 1280x720 \
        --cfg base --cfg qswap1:qswap=1 --cfg deep:q_blocks=40

Each ``--cfg`` is ``name[:knob=value,knob=value...]`` over the fields
of :class:`voxtracer.ops.trace_pallas.TraceKnobs` (ints, or
true/false for booleans).  ``--pipeline full`` times the whole frame
function (trace + temporal + denoise at ``--radius``) on a moving
camera; ``--pipeline trace`` (default) times a static-camera frame
with temporal accumulation only, like the headline bench.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from ..engine.camera import Camera
from ..engine.pipeline import Renderer
from ..ops.trace_pallas import TraceKnobs, pick_knobs
from . import camera_paths
from .cli import load_scene


def parse_cfg(spec: str) -> tuple:
    name, _, kvs = spec.partition(":")
    kw = {}
    if kvs:
        for item in kvs.split(","):
            k, _, v = item.partition("=")
            field = TraceKnobs.__dataclass_fields__[k]
            if field.type in ("bool",):
                kw[k] = v.lower() in ("1", "true", "yes")
            else:
                kw[k] = int(v)
    return name, kw


def _sync(out):
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(out["depth"])))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", default="menger")
    p.add_argument("--size", default="1280x720", help="WxH")
    p.add_argument("--cfg", action="append", required=True,
                   help="name[:knob=v,...] (repeat)")
    p.add_argument("--pipeline", choices=["trace", "full"],
                   default="trace")
    p.add_argument("--radius", type=int, default=2,
                   help="denoise radius for --pipeline full")
    p.add_argument("--frames", type=int, default=8,
                   help="frames per burst")
    p.add_argument("--rounds", type=int, default=4,
                   help="interleaved rounds")
    p.add_argument("--path", default=None,
                   choices=[None, "static", "orbit", "dolly"],
                   help="camera path (default: static for trace, "
                        "dolly for full)")
    args = p.parse_args(argv)

    w, h = (int(v) for v in args.size.split("x"))
    scene = load_scene(args.scene)
    full = args.pipeline == "full"
    path_name = args.path or ("dolly" if full else "static")
    path = getattr(camera_paths, path_name)(scene)

    cfgs = [parse_cfg(s) for s in args.cfg]
    base = pick_knobs(h, w)
    renderers = []
    for name, kw in cfgs:
        r = Renderer(
            scene=scene, height=h, width=w, lean=True,
            denoise_radius=args.radius if full else 0,
            trace_knobs=base.replace(**kw),
        )
        renderers.append((name, r))

    def cams_for():
        if path_name == "static":
            return [path(0.0)] * args.frames
        # the same path restart every burst, so every burst traces
        # the same work
        return [path((i + 1) / 30.0) for i in range(args.frames)]

    # Warm every config over the FULL burst sequence before any
    # timing: a mid-sequence jit variant (e.g. the predictor's
    # any-offset resample fallback on a fast dolly frame) would
    # otherwise compile inside a timed round — the exact contamination
    # this tool exists to avoid (first executions of a fresh compile
    # run 10-200 s through the service).
    for name, r in renderers:
        if full:
            r.reset_accumulation()
        for cam in cams_for():
            out = r.render(cam)
        _sync(out)
        print(f"# warmed {name}: knobs={r.trace_knobs}", flush=True)

    results = {name: [] for name, _ in renderers}
    for rnd in range(args.rounds):
        for name, r in renderers:
            if full:
                r.reset_accumulation()
            cams = cams_for()
            out = r.render(cams[0])
            _sync(out)  # drain queued work before the timer
            t0 = time.perf_counter()
            for cam in cams:
                out = r.render(cam)
            _sync(out)
            dt = (time.perf_counter() - t0) / args.frames
            results[name].append(dt * 1e3)
            print(f"round {rnd} {name:>16}: {dt * 1e3:7.2f} ms",
                  flush=True)

    print()
    ref = None
    for name, _ in renderers:
        ms = results[name]
        line = (f"{name:>16}: min {min(ms):7.2f}  "
                f"mean {sum(ms) / len(ms):7.2f} ms")
        if ref is None:
            ref = ms
        else:
            # per-round deltas vs the first config — the load-robust
            # verdict (same-minute pairs)
            d = [b - a for a, b in zip(ref, ms)]
            line += (f"  dvs[0]/round: "
                     f"{' '.join(f'{x:+.2f}' for x in d)}")
        print(line)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
