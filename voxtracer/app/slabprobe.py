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


def slab_fn(scene, h_full, w, slab_h, knobs):
    """Jitted ``row0 -> slab G-buffer`` at the mesh's exact call shape."""
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
    )

    def fn(cam_arr, row0):
        pv = trace_pallas.pack_params_traced(cam_arr, RenderParams())
        pv = pv.at[0, 30].set(row0.astype(jnp.float32))
        nq = trace_pallas.noise_quads(
            nbuf, jnp.int32(1), roll=row0, tile_h=knobs.tile_h
        )
        return trace_pallas.render_sample(
            packed, meta, brick, pal, pv, nq, **trace_kw
        )["color"]

    return jax.jit(fn)


def time_slabs(fn, cam_arr, n_slabs, slab_h, reps):
    import jax.numpy as jnp

    ms = []
    for s in range(n_slabs):
        row0 = jnp.int32(s * slab_h)
        np.asarray(fn(cam_arr, row0))  # compile (s=0) + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(cam_arr, row0))
            best = min(best, time.perf_counter() - t0)
        ms.append(best * 1e3)
    return ms


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--scene", default="menger")
    p.add_argument("--size", default="1280x720", help="WxH")
    p.add_argument("--ndev", type=int, default=8)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument(
        "--interleave", default="2,4",
        help="comma list of k (thin slabs per chip) to project",
    )
    p.add_argument("--json", action="store_true")
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

    def report(k):
        n_slabs = n * k
        if h % n_slabs:
            print(f"# skip k={k}: {h} % {n_slabs} != 0")
            return None
        slab_h = h // n_slabs
        fn = slab_fn(scene, h, w, slab_h, knobs)
        ms = time_slabs(fn, cam_arr, n_slabs, slab_h, args.reps)
        # round-robin deal: chip c gets thin slabs c, c+n, c+2n, ...
        chip = [sum(ms[c::n]) for c in range(n)]
        row = dict(
            k=k, slab_h=slab_h,
            slab_ms=[round(v, 3) for v in ms],
            chip_ms=[round(v, 3) for v in chip],
            max_ms=round(max(chip), 3),
            mean_ms=round(sum(chip) / n, 3),
            skew=round(max(chip) / (sum(chip) / n), 3),
        )
        print(json.dumps(row) if args.json else row, flush=True)
        return row

    rows = [report(1)]
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
