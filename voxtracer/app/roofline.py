"""Trace-kernel roofline: analytic time bound vs measured device time.

Converts "beats the fps gate" into "near what the chip permits"
(VERDICT r3 next #1): assembles the already-measured pieces — per-phase
while-step and serve-round counters (``phasestats``), the ~338-cycle
vector→scalar handoff stall (measured IN CONTEXT round 5 by
``app/stallbench.py``: 329/335/346 cycles at 1/2/4 serialized
reduce→slice→sweep chains per trip, corroborating the round-2
marginal ~350), serve-window sweep sizes, per-step op counts audited
from the kernel source — into a per-config analytic execution-time
model, and compares it against the profiler-measured device time of
the trace kernel.

Interpreting the gap: measured/t_model lands at 1.6-1.9 across
configs.  Round 4 attributed the whole residual to the handoffs (an
"effective" 727-900-cycle stall); the round-5 direct measurement
rules that out — the residual is UNAUDITED VECTOR TIME (the audit
counts semantic plane-ops at perfect 4-way ILP; real codegen adds
register spills at 30+ carried planes, masked-lane bookkeeping,
gather/shift lowering of ``take_along_axis``, sublane reshapes), not
stall.  Stalls are the t_sync share of measured time: ~28-33% on
every config (docs/BASELINE_RESULTS.md round 5).

Hardware constants (TPU v5e, one TensorCore; public spec sheet):

  * CLOCK 1.50 GHz — from 197 bf16 TFLOP/s = 4 MXUs x (128x128 MACs)
    x 2 flop x clock.
  * VPU retires 4 (8,128) vector ops/cycle (4 independent ALUs over
    the (8,128) lane grid), so ONE op on a (32,128) register plane
    (= 4 vregs) costs >= 1 cycle; the model counts plane-ops and
    charges tile_h/32 cycles each.  This assumes perfect 4-way ILP —
    optimistic, which is the correct direction for a bound.
  * Each vector→scalar handoff (reduce feeding a dynamic-slice base,
    a while condition, or a scalar loop carry) stalls ~SYNC=338 cycles
    (measured in context, ``app/stallbench.py`` round 5; the round-2
    (8,128)-tile experiment gave the same ~350 marginal).  Handoffs
    serialize with vector work in Mosaic's current scheduling
    (stallbench --mid: inserting up to 256 independent plane-ops
    between reduce and use hides <60 cycles); INDEPENDENT handoffs
    issued back-to-back pipeline almost fully (h=2: 80, h=4: ~0
    cycles each).  The STRICT bound takes max(compute, sync) instead
    of their sum.
  * HBM 819 GB/s (pallas_hbm fine-table DMA term only).

Per-step plane-op audit (hand-counted from ``trace_pallas.one_step``
and friends; each term names its code section):

  one_step fixed      ~160:  signs 6, live integral 8, bounds 14,
                             meta addressing 17, val/occ 5,
                             hit-record updates 33, box advance 77
  micro-DDA           ~55/step x micro_steps (brick_bit 10,
                             3x bt_axis 18, mins/sel 8, updates 11,
                             run update 8)
  brick dedup sweep   ~10/row x b_rows + 7 (3 broadcast+gather+select
                             per row + row compare)
  meta ladder serve   ~4/row x meta_win + 26 (broadcast+gather+
                             compare+select per row; min-reduce,
                             clip, serve-cond eval)
  queue (per step)    (fuse 11 + swap 100+15q + outer cond 8)/qswap
  adaptive meta round ~4/row x meta_win + 41
  per-phase overhead  per program: shading ~120 plane-ops/group,
                             finish ~56/queue-entry + fine serve

Handoffs (post-r4 serve restructure): 2 per step (the ladder-base min
and the pending max — issued back-to-back from the same operands, so
their stalls may partially overlap; counted fully, which keeps the
model conservative) + 1/qswap (outer while cond) + 1 per adaptive
serve round (its window-base min; the round's pending test is a
scalar compare).  The live-lane integral accumulates as a plane
(reduced once after the loop) and costs no per-step handoff.

Model outputs per config:

  t_vpu    — plane-op count / VPU issue rate (compute floor)
  t_sync   — handoff count x 338 cycles (scalar-stall floor)
  t_model  — t_vpu + t_sync (serial; Mosaic today does not overlap
             the stall with vector work — the EXPECTED time if the
             audit captured every vector op; the 1.6-1.9x gap above
             it is codegen overhead on the VPU term)
  t_bound  — max(t_vpu, t_sync, t_dma) (the optimistic hardware
             bound: a perfect scheduler overlapping everything)
  measured — profiler device time of the trace custom-call
  Mrays/s  — exact kernel ray counters (debug c=10) / measured time

Run (TPU):  python -m voxtracer.app.roofline --scene menger \
                --size 1280x720 --pos 36,34,-5 --dir=-16,-14,25
Add --no-measure on CPU (counters via the interpreter, no profiler).
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from ..engine.camera import Camera
from ..ops import trace_pallas
from . import camera_paths
from .cli import load_scene
from .phasestats import PHASES, phase_stats

CLOCK_HZ = 1.50e9  # v5e: 197e12 bf16 flop/s / (4 MXU * 128*128 * 2)
SYNC_CYCLES = 338.0  # measured in-context (stallbench r5: 329-346)
HBM_BW = 819e9  # B/s

# audited plane-op coefficients (see module docstring)
OPS_STEP_FIXED = 160.0
OPS_MICRO_PER_STEP = 55.0
OPS_BRICK_PER_ROW = 10.0
OPS_BRICK_FIXED = 7.0
OPS_SERVE_PER_ROW = 4.0
OPS_LADDER_FIXED = 26.0
OPS_ADAPTIVE_FIXED = 41.0
OPS_FUSE = 11.0
OPS_SWAP_FIXED = 100.0
OPS_SWAP_PER_Q = 15.0
OPS_OUTER_COND = 8.0
OPS_SHADE_PER_GROUP = 120.0
OPS_FINISH_PER_ENTRY = 56.0
HANDOFFS_PER_STEP = 2.0  # ladder-base min + pending max
HANDOFFS_PER_ADAPTIVE = 1.0  # window-base min (pending test is scalar)
HANDOFFS_PER_FINISH = 1.0


def model_config(
    scene, cam, h, w, knobs=None, interpret=False, fine_in_hbm=False
):
    """Run one instrumented sample, return the per-phase counter rows
    plus the assembled model terms (seconds)."""
    knobs = knobs or trace_pallas.pick_knobs(h, w)
    rows = phase_stats(scene, cam, h, w, knobs=knobs,
                       interpret=interpret)

    t = scene.device_tables()
    b_rows = int(t["brick_idx"].shape[1])
    n_fine_rows = int(t["packed_idx"].shape[0])

    # program geometry (mirrors render_sample's block math)
    block = trace_pallas.BLOCK_OF[knobs.tile_h]
    hp = -(-h // block) * block
    nbx0 = -(-w // block)
    cap = knobs.q_blocks
    q = 1
    for cand in range(1, min(cap, nbx0) + 1):
        if -(-nbx0 // cand) * cand <= nbx0 + max(1, nbx0 // 16):
            q = cand
    wp = -(-w // (q * block)) * q * block
    n_programs = (hp // block) * (wp // block // q)
    plane_cycles = knobs.tile_h / 32.0  # cycles per plane-op at peak

    ops_step = (
        OPS_STEP_FIXED
        + OPS_MICRO_PER_STEP * knobs.micro_steps
        + OPS_BRICK_PER_ROW * b_rows + OPS_BRICK_FIXED
        + OPS_SERVE_PER_ROW * knobs.meta_win + OPS_LADDER_FIXED
        + (OPS_FUSE + OPS_SWAP_FIXED + OPS_SWAP_PER_Q * q
           + OPS_OUTER_COND) / knobs.qswap
    )
    ops_adaptive = OPS_SERVE_PER_ROW * knobs.meta_win + OPS_ADAPTIVE_FIXED
    ops_fine_round = OPS_SERVE_PER_ROW * min(knobs.fine_win,
                                             n_fine_rows) + OPS_ADAPTIVE_FIXED

    total_steps = sum(r["steps"] for r in rows)
    total_adaptive = sum(r["meta_serves"] for r in rows)
    total_fine = sum(r["fine_serves"] for r in rows)
    total_rays = sum(r["rays"] for r in rows)
    n_phases = len(PHASES)

    compute_ops = (
        total_steps * ops_step
        + total_adaptive * ops_adaptive
        + total_fine * ops_fine_round
        # per-phase fixed work outside the while loop
        + n_programs * n_phases * (
            OPS_SHADE_PER_GROUP * q + OPS_FINISH_PER_ENTRY * q
        )
    )
    handoffs = (
        total_steps * (HANDOFFS_PER_STEP + 1.0 / knobs.qswap)
        + total_adaptive * HANDOFFS_PER_ADAPTIVE
        + total_fine * HANDOFFS_PER_ADAPTIVE
        + n_programs * n_phases * q * HANDOFFS_PER_FINISH
    )

    t_vpu = compute_ops * plane_cycles / CLOCK_HZ
    t_sync = handoffs * SYNC_CYCLES / CLOCK_HZ
    t_dma = 0.0
    if fine_in_hbm:
        t_dma = total_fine * min(knobs.fine_win, n_fine_rows) * 128 * 4 / HBM_BW
    return rows, dict(
        n_programs=n_programs,
        q_blocks=q,
        b_rows=b_rows,
        steps=total_steps,
        adaptive_serves=total_adaptive,
        fine_serves=total_fine,
        rays=total_rays,
        plane_ops=compute_ops,
        handoffs=handoffs,
        t_vpu_ms=t_vpu * 1e3,
        t_sync_ms=t_sync * 1e3,
        t_dma_ms=t_dma * 1e3,
        t_model_ms=(t_vpu + t_sync + t_dma) * 1e3,
        t_bound_ms=max(t_vpu, t_sync, t_dma) * 1e3,
    )


def measure_trace_ms(scene, cam, h, w):
    """Profiler-measured device ms/frame of the trace kernel custom
    call (the honest in-frame number; standalone jits measure tunnel
    dispatch — see app/profile docstring)."""
    import shutil
    import tempfile

    from ..engine.pipeline import Renderer
    from .profile import profile_frames

    r = Renderer(scene=scene, height=h, width=w, lean=True)
    logdir = tempfile.mkdtemp(prefix="voxroof_")
    try:
        n = 3
        rows = profile_frames(r, [cam] * n, logdir)
    finally:
        shutil.rmtree(logdir, ignore_errors=True)
    # the trace kernel dominates; identify it as the largest
    # custom-call/fusion containing a while loop (name heuristics per
    # XLA op naming), falling back to the single largest op
    for name, ns in rows:
        low = name.lower()
        if "custom-call" in low or "custom_call" in low or "while" in low:
            return ns / n / 1e6, name
    return (rows[0][1] / n / 1e6, rows[0][0]) if rows else (0.0, "?")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--scene", default="menger")
    p.add_argument("--size", default="1280x720", help="WxH")
    p.add_argument("--pos", default=None)
    p.add_argument("--dir", default=None)
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--no-measure", action="store_true",
                   help="skip the profiler measurement (CPU runs)")
    p.add_argument("--json", action="store_true")
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

    rows, model = model_config(
        scene, cam, h, w, interpret=args.interpret
    )
    measured_ms = name = None
    if not args.no_measure:
        measured_ms, name = measure_trace_ms(scene, cam, h, w)
        model["measured_trace_ms"] = round(measured_ms, 2)
        model["measured_op"] = name[:80]
        model["measured_over_model"] = round(
            measured_ms / max(model["t_model_ms"], 1e-9), 2
        )
        model["measured_over_bound"] = round(
            measured_ms / max(model["t_bound_ms"], 1e-9), 2
        )
        model["mrays_per_s"] = round(
            model["rays"] / (measured_ms * 1e-3) / 1e6, 1
        )
    if args.json:
        print(json.dumps(model))
        return 0
    print(f"# roofline {args.scene} {w}x{h}")
    for r in rows:
        print(f"  {r['phase']:>3}: steps {r['steps']:>9.0f}  adaptive "
              f"{r['meta_serves']:>8.0f}  fine {r['fine_serves']:>6.0f}"
              f"  rays {r['rays'] / 1e6:7.3f}M  util {r['util']:.1%}")
    for k, v in model.items():
        print(f"  {k}: {v}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
