"""Per-slab trace work-skew probe for the row-sharded mesh design.

The 8-chip projection in docs/BASELINE_RESULTS.md scales per-slab
device time linearly from the single-chip frame, implicitly assuming
uniform work per row slab.  Contiguous slabs inherit the image's
vertical work skew — a sky-heavy top slab idles at the halo-exchange
barrier while the geometry-heavy slab gates the frame (the mesh frame
is an SPMD program; every collective is a barrier).  This tool
measures the skew on the single chip today (VERDICT r5 #4): it times
each contiguous slab's trace standalone — ``render_sample`` with
``height = H/n`` and the slab's global row in params slot 30 plus the
noise pre-roll, byte-for-byte the call ``engine/pipeline.py``'s
``_slab_frame`` makes under ``shard_map`` — and reports

* per-slab best-of-``reps`` device-path ms,
* the contiguous skew ``max/mean`` (the mesh frame's trace term runs
  at ``max``; perfect balance would run at ``mean``),
* the same image cut into ``n * k`` thin slabs and dealt round-robin
  (chip c gets thin slabs c, c+n, c+2n, …) — the classic interleaved
  decomposition a GPU gets from hardware rasterization order — with
  the projected per-chip sums and their skew, for each ``--interleave``
  k.

One jit serves every slab: the slab row enters as a TRACED scalar
(exactly how ``lax.axis_index`` feeds it under the mesh), so the probe
compiles twice per k (once per slab height), not 8/16/32 times.

Run (TPU):  python -m voxtracer.app.slabprobe --scene menger
            python -m voxtracer.app.slabprobe --scene castle \
                --size 3840x2160 --interleave 2,4

Reference context: the reference renders the full frame on one GPU —
its SIMT scheduler load-balances warps across the whole image for
free (voxels.comp dispatches 8x8 tiles over the full surface,
src/context.rs render pass).  A row-sharded mesh must earn the same
balance explicitly; this probe prices the contiguous layout's slack.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from ..ops import noise as noise_op
from ..ops import trace_pallas
from . import camera_paths
from .cli import load_scene


def slab_fn(scene, h_full, w, slab_h, knobs, row_stride=1):
    """Jitted ``row0 -> slab G-buffer`` at the mesh's exact call shape.

    ``row_stride > 1`` times the CYCLIC layout instead: the launch
    renders every ``row_stride``-th block-row starting at
    ``row0/block`` — one launch per chip, near-uniform work (the
    balanced decomposition ``engine/pipeline`` runs under
    ``layout="cyclic"``)."""
    import jax
    import jax.numpy as jnp

    from ..engine.params import RenderParams

    t = scene.device_tables()
    packed = jnp.asarray(t["packed_idx"])
    meta = jnp.asarray(t["meta_idx"])
    brick = jnp.asarray(t["brick_idx"])
    pal = jnp.asarray(t["palette"])
    nbuf = jnp.asarray(noise_op.white_noise_buffer(seed=7))
    trace_kw = dict(
        dims=scene.values.shape,
        zw=t["zw"],
        origin=tuple(int(v) for v in scene.origin),
        n_rows=t["packed_idx"].shape[0],
        l3_dims=t["l3_dims"],
        m_rows=t["meta_idx"].shape[0],
        b_rows=t["brick_idx"].shape[1],
        height=slab_h,
        width=w,
        knobs=knobs,
        row_stride=row_stride,
    )

    def fn(cam_arr, row0):
        pv = trace_pallas.pack_params_traced(cam_arr, RenderParams())
        pv = pv.at[0, 30].set(row0.astype(jnp.float32))
        nq = trace_pallas.noise_quads(
            nbuf, jnp.int32(1), roll=row0, tile_h=knobs.tile_h
        )
        color = trace_pallas.render_sample(
            packed, meta, brick, pal, pv, nq, **trace_kw
        )["color"]
        # scalar out: the probe must NOT bill the axon tunnel's
        # full-plane fetch (~70 ms for 1.4 MB in a degraded window) to
        # a ~1.5 ms slab — sync on 4 bytes instead
        return jnp.sum(color)

    return jax.jit(fn)


def time_slabs(fn, cam_arr, n_slabs, slab_h, reps, chain=32):
    """Best-of-``reps`` amortized ms per slab render.

    Each sample dispatches ``chain`` back-to-back renders and blocks
    once on the last scalar: the ~1-25 ms host<->device roundtrip
    (service-window dependent) amortizes to <1 ms/render, so the
    number is device-throughput, not tunnel latency."""
    import jax.numpy as jnp

    ms = []
    for s in range(n_slabs):
        row0 = jnp.int32(s * slab_h)
        float(np.asarray(fn(cam_arr, row0)))  # compile (s=0) + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(chain):
                out = fn(cam_arr, row0)
            float(np.asarray(out))
            best = min(best, time.perf_counter() - t0)
        ms.append(best / chain * 1e3)
    return ms


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--scene", default="menger")
    p.add_argument("--size", default="1280x720", help="WxH")
    p.add_argument("--ndev", type=int, default=8)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--chain", type=int, default=32,
                   help="renders per timing sample (roundtrip amortizer)")
    p.add_argument(
        "--interleave", default="2,3,5",
        help="comma list of k (thin slabs per chip) to project; "
        "720p and 4K both divide by 8k for k in {2,3,5}",
    )
    p.add_argument("--json", action="store_true")
    p.add_argument("--cyclic", action="store_true",
                   help="time the balanced cyclic layout instead: one "
                   "row_stride=n launch per chip (pipeline "
                   "layout='cyclic'); reports per-chip ms + skew")
    p.add_argument("--no-base", action="store_true",
                   help="skip the contiguous k=1 row (already measured)")
    p.add_argument("--full-ms", type=float, default=None,
                   help="known full-frame single-launch ms (skips "
                   "re-timing it; one compile fewer per run)")
    p.add_argument("--tile", type=int, default=None,
                   help="override knobs.tile_h (2/8/32/128): tile 8 "
                   "gives 32-row cyclic blocks — finer balance and "
                   "less height padding, at whatever per-pixel cost "
                   "the (8,128) tile carries vs the (32,128) optimum")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    w, h = (int(v) for v in args.size.split("x"))
    n = args.ndev
    scene = load_scene(args.scene)
    cam = camera_paths.static(scene)(0.0)
    right, up, forward = cam.axis_scaled(w, h)
    cam_arr = jnp.asarray(
        np.stack([cam.position, right, up, forward]).astype(np.float32)
    )
    knobs = trace_pallas.pick_knobs(h, w)
    if args.tile is not None:
        import dataclasses

        knobs = dataclasses.replace(knobs, tile_h=args.tile)

    # single-launch full frame: the per-launch overhead yardstick.
    # sum(slab_ms) - full_ms spread over n_slabs launches bounds the
    # fixed cost each extra launch pays (it also absorbs the narrower
    # slabs' lost serve amortization, so it is an upper bound).
    if args.full_ms is not None:
        full_ms = args.full_ms
    elif args.cyclic:
        full_ms = None  # not needed: one launch per chip either way
    else:
        full_fn = slab_fn(scene, h, w, h, knobs)
        full_ms = time_slabs(
            full_fn, cam_arr, 1, 0, args.reps,
            chain=max(4, args.chain // 4),
        )[0]
    if full_ms is not None:
        print(f"# full-frame single launch: {full_ms:.2f} ms", flush=True)

    def report(k):
        n_slabs = n * k
        if h % n_slabs:
            print(f"# skip k={k}: {h} % {n_slabs} != 0")
            return None
        slab_h = h // n_slabs
        fn = slab_fn(scene, h, w, slab_h, knobs)
        ms = time_slabs(
            fn, cam_arr, n_slabs, slab_h, args.reps, chain=args.chain
        )
        ovh = max((sum(ms) - full_ms) / n_slabs, 0.0)
        # round-robin deal: chip c gets thin slabs c, c+n, c+2n, ...
        chip = [sum(ms[c::n]) for c in range(n)]
        # fused projection: ONE launch per chip covering its k thin
        # slabs (in-kernel row remap) pays the overhead once, not k
        # times: chip work minus (k-1) launch overheads
        fused = [c - (k - 1) * ovh for c in chip]
        row = dict(
            k=k, slab_h=slab_h, launch_ovh_ms=round(ovh, 3),
            slab_ms=[round(v, 3) for v in ms],
            chip_ms=[round(v, 3) for v in chip],
            max_ms=round(max(chip), 3),
            mean_ms=round(sum(chip) / n, 3),
            skew=round(max(chip) / (sum(chip) / n), 3),
            fused_max_ms=round(max(fused), 3),
        )
        print(json.dumps(row) if args.json else row, flush=True)
        return row

    if args.cyclic:
        # the balanced layout pipeline.render_frame runs under
        # layout="cyclic": chip c renders every n-th `block`-row in
        # ONE launch (kernel row_stride).  Height pads to n*block —
        # the honest cost of the coarse (64-row at tile_h=32)
        # granularity — and rays past the true image height are
        # traced and discarded.
        block = trace_pallas.BLOCK_OF[knobs.tile_h]
        h_pad = -(-h // (n * block)) * (n * block)
        slab_h = h_pad // n
        fn = slab_fn(scene, h, w, slab_h, knobs, row_stride=n)
        ms = []
        # time each chip's launch (row0 = c*block, traced -> 1 compile)
        import jax.numpy as jnp

        float(np.asarray(fn(cam_arr, jnp.int32(0))))  # compile+warm
        for c in range(n):
            r0 = jnp.int32(c * block)
            float(np.asarray(fn(cam_arr, r0)))  # warm this operand
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                for _ in range(args.chain):
                    out = fn(cam_arr, r0)
                float(np.asarray(out))
                best = min(best, time.perf_counter() - t0)
            ms.append(best / args.chain * 1e3)
        row = dict(
            layout="cyclic", block=block, h_pad=h_pad, slab_h=slab_h,
            pad_waste=round(h_pad / h - 1, 4),
            chip_ms=[round(v, 3) for v in ms],
            max_ms=round(max(ms), 3),
            mean_ms=round(sum(ms) / n, 3),
            skew=round(max(ms) / (sum(ms) / n), 3),
        )
        print(json.dumps(row) if args.json else row, flush=True)
        return 0

    rows = [] if args.no_base else [report(1)]
    for k in (int(v) for v in args.interleave.split(",") if v):
        rows.append(report(k))
    good = [r for r in rows if r]
    if not args.json and len(good) > 1:
        base = good[0]
        best = min(good, key=lambda r: r["max_ms"])
        print(
            f"\ncontiguous skew {base['skew']:.2f} "
            f"(frame trace term {base['max_ms']:.2f} ms); best layout "
            f"k={best['k']}: skew {best['skew']:.2f}, "
            f"{best['max_ms']:.2f} ms "
            f"({base['max_ms'] / best['max_ms']:.2f}x vs contiguous)"
        )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
