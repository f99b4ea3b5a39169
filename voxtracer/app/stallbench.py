"""Direct microbenchmark of the vector→scalar handoff stall.

The round-4 roofline certified the trace kernel scalar-handoff-bound,
but its per-handoff constant (~727-900 cycles) was INFERRED from the
measured-minus-VPU residual, not measured (the two-term fit is
collinear).  This tool measures it directly, in the full-kernel
context the residual attribution assumed: a loop-carried vector plane
feeds a min-reduce, whose scalar result is the base of a dependent
``pl.ds`` window slice, consumed by the real serve sweep (win rows of
broadcast + ``take_along_axis`` + select — byte-for-byte the
``_serve_loop`` ladder body in :mod:`voxtracer.ops.trace_pallas`),
with deep in-flight vector work at reduce time.

Three kernel modes, identical vector work, differing ONLY in where
the window base comes from:

* ``static`` — base derived from the scalar loop counter (no
  vector→scalar handoff at all).  The control: same sweeps, same
  chains, zero stalls.
* ``ser``    — H chains per trip, SERIALIZED: chain k's address
  depends on chain k-1's served word (reduce → slice → sweep →
  reduce → …).  ``(t_ser - t_static) / H`` is the direct in-context
  cycles-per-handoff measurement (VERDICT r4 next #1a).
* ``ind``    — H chains per trip, INDEPENDENT: every chain's address
  derives from the trip-entry state, all H min-reduces issue before
  any sweep consumes its base.  This is the dual-queue-group
  software-pipelining probe (VERDICT r4 next #1b): if H independent
  handoffs cost ~1 stall, splitting the trace queue into interleaved
  groups pays; if they cost ~H stalls, the handoff is a pipeline
  DRAIN and no manual interleave can hide it.

Knobs shared by all modes: ``--pre K`` adds K plane-ops of
independent in-flight vector work ahead of the reduce (drain-depth
probe); ``--mid K`` puts K plane-ops of independent vector work
between the reduce and its consuming slice (latency-hiding probe —
if the stall shrinks by ~K cycles, Mosaic overlaps independent
vector work with the scalar round trip and the pipelining design is
confirmed from a second direction).

Run (TPU, one process):  python -m voxtracer.app.stallbench
Cheap smoke (CPU):       python -m voxtracer.app.stallbench --interpret \
                             --trips 8 --reps 1

Reference context: the stall this measures is the TPU cost of what
``voxels.comp`` gets for free from SIMT oversubscription — the GPU
hides per-warp memory latency behind other warps; the TPU vector
core has ONE instruction stream, so a scalar-dependent slice is a
hard wait unless software provides the overlap.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

WIN = 24  # rows per serve window — matches META_WIN
M_ROWS = 256  # serve-table rows — menger-scale meta table
TILE_H, TILE_W = 32, 128  # the kernel's register-plane shape
CLOCK_HZ = 1.50e9  # v5e TensorCore clock (see app/roofline.py)


def _make_kernel(trips, mode, h, pre, mid, win=WIN, m_rows=M_ROWS):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    A = np.int32(1103515245)

    def vchain(v, n, salt):
        # dependent int chain: one plane-op per round, not foldable
        for i in range(n):
            v = v * A + np.int32(12345 + 97 * salt + i)
        return v

    def kernel(tab_ref, x_ref, out_ref):
        def sweep(word, waddr, base):
            # _serve_loop's ladder sweep body, verbatim shape
            window = tab_ref[pl.ds(base, win), :]
            rows = waddr >> 7
            off = rows - base
            col = waddr & 127
            for s8 in range(win):
                row_b = jnp.broadcast_to(
                    window[s8 : s8 + 1, :], waddr.shape
                )
                g = jnp.take_along_axis(row_b, col, axis=1)
                word = jnp.where(off == s8, g, word)
            return word

        def body(s):
            k, x, y = s
            # independent in-flight vector work ahead of the reduce
            y = vchain(y, pre, 1)
            zero = jnp.zeros_like(x)
            if mode == "static":
                for c in range(h):
                    waddr = ((x >> 1) + np.int32(131 * c)) % np.int32(
                        m_rows * 128
                    )
                    base = (k * np.int32(7 + 6 * c)) % np.int32(
                        m_rows - win
                    )
                    y = vchain(y, mid, 2 + c)
                    x = x ^ sweep(zero, waddr, base)
            elif mode == "ser":
                for c in range(h):
                    # chain c's address depends on chain c-1's word
                    waddr = ((x >> 1) + np.int32(131 * c)) % np.int32(
                        m_rows * 128
                    )
                    r_min = jnp.min(waddr >> 7)
                    base = jnp.clip(r_min, 0, np.int32(m_rows - win))
                    y = vchain(y, mid, 2 + c)
                    x = x ^ sweep(zero, waddr, base)
            elif mode == "ind":
                # all addresses from trip-entry x; all reduces issue
                # before any dependent slice — the dual-queue-group
                # interleave shape
                waddrs, bases = [], []
                for c in range(h):
                    waddr = (
                        (x >> 1) * np.int32(2 * c + 1)
                        + np.int32(131 * c)
                    ) % np.int32(m_rows * 128)
                    r_min = jnp.min(waddr >> 7)
                    bases.append(
                        jnp.clip(r_min, 0, np.int32(m_rows - win))
                    )
                    waddrs.append(waddr)
                y = vchain(y, mid, 2)
                acc = zero
                for c in range(h):
                    acc = acc ^ sweep(zero, waddrs[c], bases[c])
                x = x ^ acc
            else:  # pragma: no cover - guarded by argparse choices
                raise ValueError(mode)
            # fold y back so the in-flight chain is real work on the
            # next trip's critical path (like march state), and keep
            # x's serve dependence (like the next step's addresses)
            return k + np.int32(1), x ^ (y >> 16), y

        x0 = x_ref[:]
        k, x, y = jax.lax.while_loop(
            lambda s: s[0] < np.int32(trips),
            body,
            (np.int32(0), x0, x0 ^ np.int32(0x5A5A5A5A)),
        )
        out_ref[:] = x + y

    return kernel


def run_case(mode, h, pre, mid, trips, reps, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _make_kernel(trips, mode, h, pre, mid)
    rng = np.random.default_rng(7)
    tab = jnp.asarray(
        rng.integers(0, 1 << 20, size=(M_ROWS, 128), dtype=np.int32)
    )
    x = jnp.asarray(
        rng.integers(0, 1 << 20, size=(TILE_H, TILE_W), dtype=np.int32)
    )
    fn = jax.jit(
        lambda t, v: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((TILE_H, TILE_W), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(t, v)
    )
    out = fn(tab, x)
    np.asarray(out)  # compile + warm (block_until_ready lies, see verify)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(tab, x)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    cyc = best / trips * CLOCK_HZ
    return dict(
        mode=mode, h=h, pre=pre, mid=mid,
        ms=round(best * 1e3, 3),
        cycles_per_trip=round(cyc, 1),
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--trips", type=int, default=16384)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--json", action="store_true")
    p.add_argument(
        "--case", action="append", default=None,
        help="mode:h[:pre[:mid]] (repeat); default = full matrix",
    )
    args = p.parse_args(argv)

    if args.case:
        cases = []
        for s in args.case:
            parts = s.split(":")
            cases.append(
                (
                    parts[0],
                    int(parts[1]),
                    int(parts[2]) if len(parts) > 2 else 0,
                    int(parts[3]) if len(parts) > 3 else 0,
                )
            )
    else:
        cases = (
            # baseline linearity in sweep count
            [("static", hh, 0, 0) for hh in (1, 2, 4)]
            # direct serial cycles/handoff (the VERDICT #1a number)
            + [("ser", hh, 0, 0) for hh in (1, 2, 4)]
            # pairing probe: do independent handoffs pipeline?
            + [("ind", hh, 0, 0) for hh in (2, 4)]
            # latency-hiding probe: vector work between reduce & use
            + [("ser", 1, 0, mm) for mm in (64, 128, 256)]
            + [("static", 1, 0, mm) for mm in (64, 128, 256)]
            # drain-depth probe: in-flight work ahead of the reduce
            + [("ser", 1, pp, 0) for pp in (128, 512)]
            + [("static", 1, pp, 0) for pp in (128, 512)]
        )

    rows = []
    static_at = {}
    for mode, h, pre, mid in cases:
        r = run_case(
            mode, h, pre, mid, args.trips, args.reps,
            interpret=args.interpret,
        )
        rows.append(r)
        if mode == "static":
            static_at[(h, pre, mid)] = r["cycles_per_trip"]
        else:
            base = static_at.get((h, pre, mid)) or static_at.get(
                (1, 0, 0)
            )
            if base is not None:
                extra = r["cycles_per_trip"] - base
                r["stall_cycles_total"] = round(extra, 1)
                r["stall_cycles_per_handoff"] = round(extra / h, 1)
        print(json.dumps(r) if args.json else r, flush=True)
    if not args.json:
        print(
            "\ncycles/handoff = (mode cycles/trip - matching static)"
            " / h; CLOCK %.2f GHz" % (CLOCK_HZ / 1e9)
        )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
