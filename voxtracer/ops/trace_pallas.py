"""Path-trace stage as a Pallas TPU kernel — the performance path.

Same observable semantics as :mod:`voxtracer.oracle.renderer` /
:mod:`voxtracer.ops.trace_xla` (which mirror ``shaders/voxels.comp``),
engineered for what the TPU vector core actually supports:

  * Each grid program owns TWO adjacent 64x64 pixel blocks and path
    traces them together (3 bounces + sun shadow rays) with all state
    in (32, 128) register planes — the TPU analog of the reference's
    16x16 GPU workgroups (``voxels.comp:15``).  Every traversal phase
    runs as a two-ray-per-lane queue (``traverse_q2``) pairing the two
    blocks' rays: a lane whose ray finishes swaps in its second ray
    instead of idling, so the while-trip count approaches max+mean
    over lanes instead of 2*max (divergent phases measured 4-10% lane
    utilization unpaired).
  * The scene is three tables: a 16-bit-per-node META march table
    (occupied: uniform palette slot; empty: chebyshev node distance —
    the octree's multi-level pop, ``voxels.comp:191-221``), split
    lo/hi BRICK tables holding each 4x4x4 node's 64-bit fine mask
    (marched in registers by an unrolled micro-DDA), and the packed
    10-bit-palette-index FINE table consulted once per traversal at
    mixed-node hits (HBM-resident with DMA'd windows for scenes past
    the VMEM budget).
  * Per-lane random access is the TPU's weak spot: the only fast
    primitive is a cross-lane ``dynamic_gather`` within 128-word rows.
    Word fetches run through "row serve" sweeps: one min-reduce of the
    pending row indices feeds a LADDER of static-offset windows
    (broadcast each row + within-row gather), with an adaptive while
    loop for rare stragglers.  Coherent rays need ~1 sweep per step;
    divergent bounce rays degrade gracefully.
  * Palette resolution is a flat gather over a (8, 128) table.

Mosaic restrictions honored here (probed empirically, see repo notes
and docs/BASELINE_RESULTS.md "dead ends"): ``dynamic_gather`` rows
must be exactly 128 wide; bool loop carries must not be updated in the
body (int32 0/1 masks instead); scalar dynamic-slice indices may come
from vector reductions but each such handoff stalls ~350 cycles; a 2D
gather does NOT decompose into a row-select tree + column gather.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.grid import CELL_SIZE, RESERVED_SLOTS

import os as _os

# Lanes per grid program: (TILE_H, 128) register planes.  Sweepable,
# but (8,128) tiles measured 1.4x SLOWER than (32,128): the scalar
# sync each while-iteration pays dominates, and 4x the programs means
# ~4x the while iterations.
TILE_H = int(_os.environ.get("VOX_TILE_H", 32))
TILE_W = 128
MAX_BOUNCES = 3
RANDS_PER_BOUNCE = 8
PLANES_PER_FRAME = 24  # RANDS_PER_BOUNCE * MAX_BOUNCES
# Per-RAY march-step fuse: at the cap the ray fuses to an opaque black
# leaf at its current cell and the lane's queue advances — the per-ray
# guarantee of voxels.comp:166-169 (2048 iterations/ray), which a
# shared-budget queue cap could not make (rays behind a runaway ray
# would report miss).  Steps here are hierarchical DDA steps (box
# skips / brick visits), not the reference's octree iterations, so the
# cap bounds work per ray rather than bit-matching the reference's
# fuse count.
MAX_RAY_STEPS = int(_os.environ.get("VOX_RAY_CAP", 2048))
ALMOST_INFINITY = float(1 << 30)
LEAF_BIT = np.int32(-(1 << 31))
EMISSIVE_BIT = np.int32(1 << 30)
MISS_NODE = np.int32(0xFFFFFF)
RAY_EPS = 1e-5
BIG_I32 = np.int32(1 << 30)
WIN_ROWS = 16  # rows per serve window (8 and 32 measured slower)
# Per-table serve window sizes (sweepable via env for perf probes):
# pending rows are dense on the fine table but sparse on the small
# L3/supercell tables, where narrow windows waste fewer gathers.
META_WIN = int(_os.environ.get("VOX_META_WIN", 24))  # 8/16/32 slower
BRICK_WIN = int(_os.environ.get("VOX_BRICK_WIN", 16))  # 8/32/64 slower
# Unrolled in-register fine-DDA steps per brick visit.  10 covers any
# chord through a 4x4x4 brick (4+4+4-2); fewer steps are still correct
# (the outer loop re-enters with the brick cached) but re-pay the
# outer-iteration overhead.
MICRO_STEPS = int(_os.environ.get("VOX_MICRO", 5))  # 3/10 measured slower
FINE_WIN = int(_os.environ.get("VOX_FINE_WIN", WIN_ROWS))
UNROLL = int(_os.environ.get("VOX_UNROLL", 1))  # DDA steps/while round
# Ladder depth: serve windows at static offsets r0, r0+win, … after
# ONE min-reduce, before adaptive straggler rounds (see _serve_loop).
# Swept: 1 best (55.9 ms menger 720p vs 59.1 at 2, 66+ pure-adaptive).
LADDER = int(_os.environ.get("VOX_LADDER", 1))
BLADDER = int(_os.environ.get("VOX_BLADDER", LADDER))  # brick-table ladder
# Pair each program's second pixel block from the far image half
# (decorrelates paired traversal lengths) instead of the adjacent
# block (better serve locality).  Measured on menger; see commit log.
FARPAIR = _os.environ.get("VOX_FARPAIR", "0") == "1"
# Cap on pixel blocks per grid program (rays queued per lane per
# phase).  More queued rays amortize the SIMD divergence tail toward
# mean ray length: menger 720p measured 49.1/48.0/42.8/37.8/35.3 ms
# at Q=2/3/4/10/20.  render_sample picks the largest Q <= cap whose
# padding stays small for the image width.
Q_BLOCKS = int(_os.environ.get("VOX_QBLOCKS", 30))
# DDA steps per queue swap: >1 amortizes the (N-1)-deep init-select
# chains at the cost of finished lanes idling <= QSWAP-1 steps.
# 2 wins at 1080p q=30 (15.5 vs 16.8 ms) and 4K q=20 (32.6 vs 36.8)
# and is exactly neutral at 720p q=20 over interleaved pairs.
QSWAP = int(_os.environ.get("VOX_QSWAP", 2))
# Block-rows of the image per grid program: each program's ray queue
# spans an r x c RECTANGLE of pixel blocks (q = r*c rays per lane),
# deepening the queue beyond the image's width in blocks.  Measured
# WORSE than same-depth column queues (menger 720p r2: 17.7 vs 17.3;
# monu9 1080p r2 q30: 19.9 vs column q30 17.3 — cross-row queues lose
# serve locality), so the default stays one row; kept as a probe knob.
Q_ROWS = int(_os.environ.get("VOX_QROWS", 1))
# Shadow rays of bounce b-1 ride bounce b's march as extra queue
# entries: 4 traversal while-loops per frame instead of 6, and the
# divergence tail averages over 2x the rays per lane.  Measured WORSE
# on menger 720p (18.7 vs 17.2 ms trace): the doubled per-iteration
# qidx select chain outweighs the tail savings.  Kept as a probe knob.
MERGE_SHADOW = _os.environ.get("VOX_MERGE_SHADOW", "0") == "1"
# Lane decorrelation of the divergent phases: without it, a lane's q
# queued rays share the same pixel offset in q adjacent blocks — the
# SAME image row — so per-lane total bounce work is q correlated draws
# and the while-trip tail (max over lanes) runs far past the mean
# (~27% live-lane utilization measured on menger 720p bounce phases).
# A static per-queue-entry lane permutation (sublane roll + lane XOR,
# an exact involution pair, applied to the ray planes going in and the
# result planes coming out) makes each lane's queue ~independent draws
# instead.  bit0: scramble bounce>=1 marches (b1/s1/b2/s2); bit1: also
# the primary-hit shadow phase (s0).  Bit-exact as an algebra (pure
# permutation; the interpreter suite proves output bit-identity).  On
# hardware, comparing the scrambled and unscrambled COMPILED programs
# carries the usual cross-compilation caveat: FMA-contraction choices
# differ between the two programs, so a grazing secondary ray can
# flip hit/miss on a 1-ulp t difference (measured: 2 color-only px at
# 128x768 menger, all geometry channels bit-identical —
# tests/test_tpu.py pins both).
# Measured (menger 720p, interleaved A/B): b1/b2 steps -21%, s1/s2
# -10%, bounce utilization 26->34%, frame -0.5..-1.0 ms of ~14 — the
# default.  Mode 3 (s0 too) is neutral-to-worse: primary-hit shadow
# rays are coherent enough that the serve-locality loss cancels the
# tail gain.
SCRAMBLE = int(_os.environ.get("VOX_SCRAMBLE", 1))
# Dual-queue-group software pipelining: split each lane's ray queue
# into two interleaved groups marched by ONE while loop, their meta
# serves paired so both groups' vector->scalar pre-pass reduces issue
# before either dependent window slice (see _serve_dual).  Hides the
# ~330-cycle handoff stall (measured directly, app/stallbench r5)
# under the other group's vector work — the manual latency hiding the
# GPU gets from SIMT oversubscription (voxels.comp warps) and Mosaic
# does not do automatically (stallbench --mid: <60 cycles hidden).
# Measured a NET LOSS on the full kernel (menger 720p 12.24 vs 11.39
# ms — carried-state and drain-idle overheads beat the ~0.7 ms stall
# win); default off, see traverse_q2g and the dead-end ledger.
DUALQ = int(_os.environ.get("VOX_DUALQ", 0))
# Lanes cover a square BLOCK x BLOCK pixel region per program (better
# 3-D locality for the serve loop than a raw TILE_H x TILE_W image
# strip: ~2.5x fewer serve iterations on menger).  The image<->lane
# remaps outside the kernel cost ~9 ms at 720p — far below the serve
# iterations they save.  BLOCK*BLOCK == TILE_H*TILE_W.
BLOCK_OF = {2: 16, 8: 32, 32: 64, 128: 128}
BLOCK = BLOCK_OF[TILE_H]


@dataclasses.dataclass(frozen=True)
class TraceKnobs:
    """Kernel perf knobs as one hashable static argument: every knob
    participates in the jit cache key, so in-process sweeps and tests
    never need ``clear_cache`` hacks and a stale specialization can
    never be silently reused.  The module-level ``VOX_*`` env vars
    feed the DEFAULTS (probe-only path for subprocess sweeps);
    production code passes knobs explicitly via :func:`pick_knobs`.

    The values baked here are the round-2 swept optima (see
    docs/BASELINE_RESULTS.md, including the measured dead-ends before
    re-probing): (32, 128) tiles, META_WIN 24 / BRICK_WIN 16 serve
    windows, 5-step micro-DDA, single-window ladder, column queues up
    to 30 blocks with a two-step swap cadence.
    """

    tile_h: int = TILE_H
    meta_win: int = META_WIN
    brick_win: int = BRICK_WIN
    micro_steps: int = MICRO_STEPS
    fine_win: int = FINE_WIN
    ladder: int = LADDER
    bladder: int = BLADDER
    farpair: bool = FARPAIR
    q_blocks: int = Q_BLOCKS
    qswap: int = QSWAP
    q_rows: int = Q_ROWS
    merge_shadow: bool = MERGE_SHADOW
    scramble: int = SCRAMBLE
    # Dual-queue-group software pipelining (see DUALQ above): 0 = one
    # queue per lane (the r2-r4 shape), 1 = two interleaved groups
    # with paired serve pre-passes.  Bit-exact either way (grouping
    # changes scheduling, not per-ray math — pinned by test).
    dualq: int = DUALQ
    # Diagnostics-only (default off — adds per-trip scalar work):
    # bank per-phase live-decay quantiles (trips until the live-lane
    # count drops below 3/4, 1/2, 1/4, 1/8, 1/32 of lanes) as extra
    # debug counters c=5..9.  Read via app/phasestats --decay; the
    # measured basis for capped-phase / residual-retrace decisions.
    decay_stats: int = 0
    # PROBE-ONLY phase caps (default 0 = exact): stop a divergent
    # phase's while loop once fewer than this many lanes are live —
    # *_b for bounce>=1 marches, *_s for bounce>=1 shadow phases.
    # Pending rays resolve as miss/unobstructed, so the image is WRONG
    # under a floor; the knobs exist to measure the gross ceiling of a
    # capped-phase + residual-retrace scheme before building its exact
    # spill path (VERDICT round-2 #4).
    live_floor_b: int = 0
    live_floor_s: int = 0
    # Dead-entry jump chains in the lane queue (exact; see
    # traverse_qn): 0 is the pre-jump +1 drain, kept as the A/B
    # control.
    qjump: int = 1
    # Unrolled pre-while swap calls (-1 = the full N-1 chain).  With
    # qjump, ONE swap reaches every lane's first mask-live entry, so
    # a short chain (probe 2-3) only leaves consecutive slab-miss
    # entries to drain in-loop; a pending-entry guard in the while
    # cond keeps that exact (no lane can strand queued live rays
    # behind an inactive loaded entry).
    init_swaps: int = -1

    def replace(self, **kw) -> "TraceKnobs":
        return dataclasses.replace(self, **kw)


DEFAULT_KNOBS = TraceKnobs()


def pick_knobs(height: int = 0, width: int = 0) -> TraceKnobs:
    """Per-image knob selection.

    The swept optima are resolution-independent for tile shape and
    serve windows (every alternative measured worse — see the
    dead-ends list in docs/BASELINE_RESULTS.md).  The one genuinely
    image-dependent choice is queue depth vs image width: wide images
    (>32 block columns) split each block-row into ~20-block programs
    (4K castle: q=30 42 ms vs q=20 35.9), narrower ones may take the
    full row (1080p: q=30 17.3 ms beats its only alternative q=15 at
    18.6).  The policy lives HERE so an explicitly-passed knobs value
    is always authoritative in render_sample (probe configs do what
    they say).  The env defaults ride in via ``DEFAULT_KNOBS``."""
    k = DEFAULT_KNOBS
    nbx0 = -(-width // BLOCK_OF[k.tile_h]) if width else 0
    if nbx0 > 32 and "VOX_QBLOCKS" not in _os.environ:
        k = k.replace(q_blocks=min(k.q_blocks, 20))
    return k


def pick_tile(height: int = 0, width: int = 0) -> int:
    """Lane-tile height for :func:`noise_quads` (the image size is
    accepted for a future resolution-dependent policy; the choice
    measured resolution-independent).

    Full (128, 128) register planes were probed as an alternative to
    the (32, 128) tile: fewer, larger programs, but a clean in-process
    A/B on menger 720p measured them consistently SLOWER (19.2-19.6 vs
    17.4-17.8 ms/trace over repeated pairs — bigger live register
    planes hurt more than the amortized fixed costs help), so the
    (32, 128) tile stays the choice at every resolution.  The 128 path
    remains fully supported (oracle-parity tested) for perf probes via
    the VOX_TILE_H env override."""
    return pick_knobs(height, width).tile_h

# float32 params vector layout (SMEM row):
#   0-2 cam origin | 3-5 right | 6-8 up | 9-11 forward(pixel-scaled)
#   12 sun_yaw | 13 sun_pitch | 14 sun_size | 15 sun_strength
#   16 emit_strength | 17 specularity | 18-20 sun_color | 21-23 sky_color
#   24-26 sun direction (raw) | 27-29 sun direction (normalized)
#   30 row0 — global pixel row of this image slab (0 single-chip; the
#      shard_map wrapper sets it so each chip ray-gens its own rows)
# (sun trig is precomputed host/XLA-side: Mosaic has no scalar trig)
PARAMS_LEN = 32


def pack_params(cam: np.ndarray, p) -> np.ndarray:
    out = np.zeros((1, PARAMS_LEN), np.float32)
    out[0, 0:12] = np.asarray(cam, np.float32).reshape(12)
    out[0, 12] = p.sun_yaw
    out[0, 13] = p.sun_pitch
    out[0, 14] = p.sun_size
    out[0, 15] = p.sun_strength
    out[0, 16] = p.emit_strength
    out[0, 17] = p.specularity
    out[0, 18:21] = np.asarray(p.sun_color)
    out[0, 21:24] = np.asarray(p.sky_color)
    sd = np.array(
        [
            np.cos(p.sun_yaw) * np.cos(p.sun_pitch),
            -np.sin(p.sun_pitch),
            np.sin(p.sun_yaw) * np.cos(p.sun_pitch),
        ],
        np.float32,
    )
    out[0, 24:27] = sd
    out[0, 27:30] = sd / np.linalg.norm(sd)
    return out


def pack_params_traced(cam, p):
    """Traced variant (for use inside jit): returns (1, PARAMS_LEN) f32."""
    flat = [cam.reshape(12)] + [
        jnp.stack(
            [
                jnp.asarray(p.sun_yaw, jnp.float32),
                jnp.asarray(p.sun_pitch, jnp.float32),
                jnp.asarray(p.sun_size, jnp.float32),
                jnp.asarray(p.sun_strength, jnp.float32),
                jnp.asarray(p.emit_strength, jnp.float32),
                jnp.asarray(p.specularity, jnp.float32),
            ]
        ),
        jnp.asarray(p.sun_color, jnp.float32),
        jnp.asarray(p.sky_color, jnp.float32),
    ]
    sd = jnp.stack(
        [
            jnp.cos(p.sun_yaw) * jnp.cos(p.sun_pitch),
            -jnp.sin(p.sun_pitch),
            jnp.sin(p.sun_yaw) * jnp.cos(p.sun_pitch),
        ]
    ).astype(jnp.float32)
    flat += [sd, sd / jnp.linalg.norm(sd)]
    vec = jnp.concatenate(flat)
    return jnp.pad(vec, (0, PARAMS_LEN - vec.shape[0])).reshape(1, PARAMS_LEN)


def noise_quads(buffer, frame, count=PLANES_PER_FRAME, roll=None, tile_h=None):
    """Lane-layout RNG planes as (count, P, P, tile_h, TILE_W) quads.

    The reference's rand() value at pixel (py, px) is
    ``buffer[(frame+1+k) % S, py % 128, px % 128]``
    (``voxels.comp:65-71, 268-275``) — 128-periodic in both pixel
    axes.  Since kernel blocks are BLOCK-sized and BLOCK divides 128,
    grid program (i, j) needs only quadrant (i % P, j % P) of each
    slice (P = 128 // BLOCK), already reshaped to the (TILE_H, 128)
    lane plane.  That replaces the full-image noise materialization +
    lane remap (~90 MB of HBM traffic per 720p frame) with a ~1.5 MB
    table the BlockSpec indexes by program-id parity.

    ``roll`` (int32, optional): global row offset of this image slab —
    the sharded path pre-rolls the y axis so in-kernel parity stays
    ``i % P`` regardless of slab alignment.

    ``tile_h``: lane-tile height (default: the module TILE_H); must
    match the :func:`render_sample` call consuming the quads —
    render_sample derives its tile from the quad shape, so using
    :func:`pick_tile` here keeps them consistent by construction."""
    th = TILE_H if tile_h is None else tile_h
    block = BLOCK_OF[th]
    n_slices = buffer.shape[0]
    P = 128 // block
    sl = jnp.stack(
        [buffer[(frame + 1 + k) % n_slices] for k in range(count)]
    )
    if roll is not None:
        sl = jnp.roll(sl, -roll, axis=1)
    q = sl.reshape(count, P, block, P, block).transpose(0, 1, 3, 2, 4)
    return q.reshape(count, P, P, th, TILE_W)


def _flat_gather_1024(table, idx):
    """Per-lane gather from a (8, 128) table; idx in [0, 1024)."""
    lo = idx & 127
    hi = idx >> 7
    out = jnp.zeros_like(idx)
    for s in range(8):
        row = jnp.broadcast_to(table[s : s + 1, :], idx.shape)
        g = jnp.take_along_axis(row, lo, axis=1)
        out = jnp.where(hi == s, g, out)
    return out


def _div3(v):
    """Exact v // 3 for 0 <= v < 32768 without integer division.

    (v*21846)>>16 first fails at v=32768 (v%3==2); _make_traverse
    asserts the z extent stays below that.
    """
    return (v * 21846) >> 16


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize3(x, y, z):
    inv = jax.lax.rsqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _norm_div3(x, y, z):
    """normalize via sqrt-divide (matches oracle/XLA rounding more
    closely than rsqrt)."""
    n = jnp.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def _serve_loop(
    ref, n_rows_, waddr, need0, word, cached, win=WIN_ROWS, ladder=LADDER
):
    """Window-serve per-lane word fetches from ``ref``.

    Cost model: every adaptive round pays a vector→scalar handoff
    (min-reduce feeding a dynamic slice, ~hundreds of cycles of
    pipeline stall).  So the serve runs as a LADDER first — one
    min-reduce, then ``LADDER`` windows at static offsets r0, r0+win,
    … (scalar adds, no further reduces) — which covers the measured
    per-step pending spans in the common case; an adaptive while loop
    then serves rare stragglers (gaps wider than the ladder).
    Returns (word, cached, rounds)."""
    win = min(win, n_rows_)
    rows = waddr >> 7
    need_i = need0.astype(jnp.int32)
    # ONE pre-pass computes the pending-row min (ladder base) AND max:
    # ladder coverage is contiguous from the min, so "anything left?"
    # is the SCALAR test r_max >= last_window_end — the adaptive while
    # cond then needs no plane reduce at all, and each adaptive round
    # pays exactly ONE vector->scalar handoff (its window-base min)
    # instead of two (min + unserved.any()).  Roofline r4: handoff
    # stalls were the largest modeled term (~40% of the trace frame).
    needf0 = (need_i == 1) & (waddr != cached)
    r_min = jnp.min(jnp.where(needf0, rows, BIG_I32))
    r_max = jnp.max(jnp.where(needf0, rows, -1))
    return _serve_tail(
        ref, n_rows_, rows, waddr, need_i, word, cached,
        r_min, r_max, win, ladder,
    )


def _serve_dual(ref, n_rows_, a, b, win=WIN_ROWS, ladder=LADDER):
    """Meta serve for TWO independent march groups, pre-passes paired.

    Both groups' min/max reduces issue back-to-back BEFORE either
    scalar base is consumed by a dependent window slice, so the two
    vector→scalar handoffs overlap in the scalar pipeline instead of
    serializing.  Measured directly (app/stallbench, TPU v5e, r5):
    a serial pair of reduce→slice→sweep chains stalls ~670 cycles,
    the paired-issue shape ~160 — the dual-queue software pipelining
    VERDICT r4 #1b asked for.  Each group is (waddr, need0, word,
    cached); returns the two (word, cached, rounds) triples."""
    win = min(win, n_rows_)
    waddr_a, need_a, word_a, cached_a = a
    waddr_b, need_b, word_b, cached_b = b
    rows_a = waddr_a >> 7
    rows_b = waddr_b >> 7
    na = need_a.astype(jnp.int32)
    nb = need_b.astype(jnp.int32)
    needf_a = (na == 1) & (waddr_a != cached_a)
    needf_b = (nb == 1) & (waddr_b != cached_b)
    # all four handoff reduces issue together (the whole point)
    r_min_a = jnp.min(jnp.where(needf_a, rows_a, BIG_I32))
    r_max_a = jnp.max(jnp.where(needf_a, rows_a, -1))
    r_min_b = jnp.min(jnp.where(needf_b, rows_b, BIG_I32))
    r_max_b = jnp.max(jnp.where(needf_b, rows_b, -1))
    out_a = _serve_tail(
        ref, n_rows_, rows_a, waddr_a, na, word_a, cached_a,
        r_min_a, r_max_a, win, ladder,
    )
    out_b = _serve_tail(
        ref, n_rows_, rows_b, waddr_b, nb, word_b, cached_b,
        r_min_b, r_max_b, win, ladder,
    )
    return out_a, out_b


def _serve_tail(
    ref, n_rows_, rows, waddr, need_i, word, cached, r_min, r_max,
    win, ladder,
):
    """Ladder + adaptive straggler rounds of :func:`_serve_loop`,
    taking the pre-pass reduces as arguments (so :func:`_serve_dual`
    can issue two groups' reduces together)."""

    def sweep(word_, cached_, r_base):
        """One window at r_base — pure vector work, no reduces.
        ``off == s8`` alone suffices as the serve mask: a non-pending
        lane whose off lands in-window just re-gathers the word its
        own address maps to (same row ⇒ same value — a no-op write),
        so the needf/in_win factors are hoisted out of the row loop."""
        window = ref[pl.ds(r_base, win), :]
        off = rows - r_base
        for s8 in range(win):
            row_b = jnp.broadcast_to(window[s8 : s8 + 1, :], waddr.shape)
            g = jnp.take_along_axis(row_b, waddr & 127, axis=1)
            word_ = jnp.where(off == s8, g, word_)
        in_win = (off >= 0) & (off < win)
        cached_ = jnp.where(in_win, waddr, cached_)
        return word_, cached_

    r0 = jnp.clip(r_min, 0, n_rows_ - win)
    nladder = min(ladder, -(-n_rows_ // win))
    last_base = None
    for k in range(nladder):
        base = jnp.minimum(r0 + k * win, n_rows_ - win)
        word, cached = sweep(word, cached, base)
        last_base = base
    if nladder > 0:
        # pending rows never lie below the first window (r0 <= r_min)
        # and the ladder windows are contiguous, so only rows past the
        # last window's end can still be unserved
        hp0 = (r_max >= last_base + win).astype(jnp.int32)
    else:
        hp0 = (r_min < BIG_I32).astype(jnp.int32)

    def serve_cond(ss):
        k, hp, word_, cached_ = ss
        return jnp.logical_and(k < 256, hp == 1)

    def serve_body(ss):
        k, hp, word_, cached_ = ss
        needf = (need_i == 1) & (waddr != cached_)
        rm = jnp.min(jnp.where(needf, rows, BIG_I32))
        r_base = jnp.clip(rm, 0, n_rows_ - win)
        word_, cached_ = sweep(word_, cached_, r_base)
        # all pending rows >= rm and [r_base, r_base+win) was served,
        # so pending survives iff the max lies past the window end
        return (
            k + 1,
            (r_max >= r_base + win).astype(jnp.int32),
            word_,
            cached_,
        )

    kf, _, word, cached = jax.lax.while_loop(
        serve_cond, serve_body, (np.int32(0), hp0, word, cached)
    )
    return word, cached, kf


def _serve_loop_hbm(
    ref, scratch, sem, n_rows_, waddr, need0, word, cached, win
):
    """Like :func:`_serve_loop` but ``ref`` lives in HBM: each round
    DMAs the window into the VMEM ``scratch`` before gathering.  Used
    for the fine-table hit resolve on scenes whose packed table
    exceeds the VMEM budget — the resolve runs once per traversal, so
    the DMA latency is paid per hit batch, not per march step."""
    win = min(win, n_rows_)
    rows = waddr >> 7
    need_i = need0.astype(jnp.int32)

    # scalar-carried pending test — see _serve_loop (one handoff per
    # round: the window-base min; the cond is a pure scalar compare)
    needf0 = (need_i == 1) & (waddr != cached)
    r_max = jnp.max(jnp.where(needf0, rows, -1))
    hp0 = (r_max >= 0).astype(jnp.int32)

    def serve_body(ss):
        k, hp, word_, cached_ = ss
        needf = (need_i == 1) & (waddr != cached_)
        rm = jnp.min(jnp.where(needf, rows, BIG_I32))
        r_base = jnp.clip(rm, 0, n_rows_ - win)
        dma = pltpu.make_async_copy(
            ref.at[pl.ds(r_base, win), :], scratch, sem
        )
        dma.start()
        dma.wait()
        off = rows - r_base
        # serve mask is just ``off == s8`` — see _serve_loop
        for s8 in range(win):
            row_b = jnp.broadcast_to(
                scratch[s8 : s8 + 1, :], waddr.shape
            )
            g = jnp.take_along_axis(row_b, waddr & 127, axis=1)
            word_ = jnp.where(off == s8, g, word_)
        in_win = (off >= 0) & (off < win)
        cached_ = jnp.where(in_win, waddr, cached_)
        return (
            k + 1,
            (r_max >= r_base + win).astype(jnp.int32),
            word_,
            cached_,
        )

    def serve_cond(ss):
        return jnp.logical_and(ss[0] < 256, ss[1] == 1)

    kf, _, word, cached = jax.lax.while_loop(
        serve_cond, serve_body, (np.int32(0), hp0, word, cached)
    )
    return word, cached, kf


def _serve_loop_pair(
    ref, n_rows_, waddr, need0, lo, hi, cached, win, ladder=BLADDER
):
    """Window-serve per-lane word PAIRS from the split brick tables:
    ``ref`` is (2, rows, 128), both halves indexed by the same node
    linear address.  One window sweep serves lo and hi together, and a
    brick spans one column instead of two, so pending row spans halve
    vs the old adjacent-word-pair layout.  Returns
    (lo, hi, cached, rounds)."""
    win = min(win, n_rows_)
    rows = waddr >> 7
    need_i = need0.astype(jnp.int32)
    col = waddr & 127

    def sweep(lo_, hi_, cached_, r_base):
        win_lo = ref[0, pl.ds(r_base, win), :]
        win_hi = ref[1, pl.ds(r_base, win), :]
        off = rows - r_base
        # serve mask is just ``off == s8`` — see _serve_loop
        for s8 in range(win):
            lo_b = jnp.broadcast_to(win_lo[s8 : s8 + 1, :], waddr.shape)
            hi_b = jnp.broadcast_to(win_hi[s8 : s8 + 1, :], waddr.shape)
            serve = off == s8
            lo_ = jnp.where(
                serve, jnp.take_along_axis(lo_b, col, axis=1), lo_
            )
            hi_ = jnp.where(
                serve, jnp.take_along_axis(hi_b, col, axis=1), hi_
            )
        in_win = (off >= 0) & (off < win)
        cached_ = jnp.where(in_win, waddr, cached_)
        return lo_, hi_, cached_

    # static ladder after one min-reduce, scalar-carried pending test
    # for the adaptive rounds — see _serve_loop
    needf0 = (need_i == 1) & (waddr != cached)
    r_min = jnp.min(jnp.where(needf0, rows, BIG_I32))
    r_max = jnp.max(jnp.where(needf0, rows, -1))
    r0 = jnp.clip(r_min, 0, n_rows_ - win)
    nladder = min(ladder, -(-n_rows_ // win))
    last_base = None
    for k in range(nladder):
        base = jnp.minimum(r0 + k * win, n_rows_ - win)
        lo, hi, cached = sweep(lo, hi, cached, base)
        last_base = base
    if nladder > 0:
        hp0 = (r_max >= last_base + win).astype(jnp.int32)
    else:
        hp0 = (r_min < BIG_I32).astype(jnp.int32)

    def serve_cond(ss):
        return jnp.logical_and(ss[0] < 256, ss[1] == 1)

    def serve_body(ss):
        k, hp, lo_, hi_, cached_ = ss
        needf = (need_i == 1) & (waddr != cached_)
        rm = jnp.min(jnp.where(needf, rows, BIG_I32))
        r_base = jnp.clip(rm, 0, n_rows_ - win)
        lo_, hi_, cached_ = sweep(lo_, hi_, cached_, r_base)
        return (
            k + 1,
            (r_max >= r_base + win).astype(jnp.int32),
            lo_,
            hi_,
            cached_,
        )

    kf, _, lo, hi, cached = jax.lax.while_loop(
        serve_cond, serve_body, (np.int32(0), hp0, lo, hi, cached)
    )
    return lo, hi, cached, kf


def _make_traverse(
    dims, zw, origin, n_rows, l3_dims, m_rows, b_rows,
    fine_in_hbm=False, brick_dedup=True, qswap=None,
    max_ray_steps=None, knobs: TraceKnobs = DEFAULT_KNOBS,
):
    """Build the in-kernel node-DDA traversal closure.

    One logical node per 4x4x4 fine-cell block — the TPU shape of an
    octree node read whole (voxels.comp:175-189) — split over two
    tables by access pattern.  The march serves the tiny 16-bit META
    table every L3-scale step: an empty node's meta is a chebyshev
    distance d certifying every node within radius d-1 empty, so the
    ray jumps to the exit of that box (the octree's multi-level pop,
    voxels.comp:191-221); an occupied node's meta carries its uniform
    palette slot, resolving hit color on the spot for single-color
    blocks (mixed blocks consult the fine table once, at the recorded
    hit).  On entering an occupied node the BRICK table supplies the
    block's 64-bit fine mask as an adjacent word pair, marched by an
    unrolled micro-DDA with in-register bit tests — zero further
    fetches.
    """
    if qswap is None:
        qswap = knobs.qswap
    if max_ray_steps is None:
        max_ray_steps = MAX_RAY_STEPS
    decay_stats = bool(knobs.decay_stats)
    # live-decay quantile thresholds (fractions of lanes still live)
    DECAY_FRACS = (0.75, 0.5, 0.25, 0.125, 0.03125)
    # <=0 disables the per-ray fuse (perf A/B probe): the queue falls
    # back to the shared 4096-step backstop only
    fuse_on = max_ray_steps > 0
    X, Y, Z = (int(d) for d in dims)
    QX, QY, QZ = (int(d) for d in l3_dims)
    QZW2 = -(-QZ // 2)
    assert Z < 32768, f"z extent {Z} exceeds the _div3 exact range"
    # 15-bit cell coordinates (packed banked records in traverse_q2)
    assert X < 32768 and Y < 32768, f"extent {X}x{Y} exceeds 15 bits"
    PY4 = -(-Y // 4)
    QY4 = -(-QY // 4)
    oxi, oyi, ozi = (int(o) for o in origin)
    wlo = (oxi * CELL_SIZE, oyi * CELL_SIZE, ozi * CELL_SIZE)
    whi = (
        (oxi + X) * CELL_SIZE,
        (oyi + Y) * CELL_SIZE,
        (ozi + Z) * CELL_SIZE,
    )

    def cell_from_float(o, d, t, og):
        p = o + t * d
        cf = p / CELL_SIZE - og
        c = jnp.floor(cf)
        return jnp.where((cf == c) & (d < 0), c - 1.0, c).astype(
            jnp.int32
        )

    def ray_setup(o3, d3, mask=None):
        """Pre-march state for a ray batch: returns
        (ray, cx, cy, cz, t0, active0) where ``ray`` is the 12-plane
        tuple (o, d, 1/d, sign) the march consumes."""
        ox_, oy_, oz_ = o3
        dx, dy, dz = d3
        inf = jnp.float32(np.inf)
        invx = jnp.where(dx != 0.0, 1.0 / dx, inf)
        invy = jnp.where(dy != 0.0, 1.0 / dy, inf)
        invz = jnp.where(dz != 0.0, 1.0 / dz, inf)

        def slab(lo, hi, o, inv):
            a = (lo - o) * inv
            b = (hi - o) * inv
            return jnp.minimum(a, b), jnp.maximum(a, b)

        enx, exx = slab(wlo[0], whi[0], ox_, invx)
        eny, exy = slab(wlo[1], whi[1], oy_, invy)
        enz, exz = slab(wlo[2], whi[2], oz_, invz)
        t_entry = jnp.maximum(jnp.maximum(enx, eny), enz)
        t_exit = jnp.minimum(jnp.minimum(exx, exy), exz)
        intersects = (t_exit >= 0.0) & (t_entry < t_exit)

        t0 = jnp.maximum(0.0, t_entry)

        cx = jnp.clip(cell_from_float(ox_, dx, t0, float(oxi)), 0, X - 1)
        cy = jnp.clip(cell_from_float(oy_, dy, t0, float(oyi)), 0, Y - 1)
        cz = jnp.clip(cell_from_float(oz_, dz, t0, float(ozi)), 0, Z - 1)

        if mask is not None:
            intersects = intersects & mask
        active0 = intersects.astype(jnp.int32)
        # step signs are derived per-iteration from d (3 cheap ops)
        # rather than carried: 3 fewer loop-state planes
        ray = (ox_, oy_, oz_, dx, dy, dz, invx, invy, invz)
        return ray, cx, cy, cz, t0, active0

    def make_step(meta_ref, brick_ref):
        """One DDA step over carried state; ``ray`` may be a closure
        constant (single-ray loop) or loop-carried planes (ray queue).

        ``mst`` (march-state planes) is (m_cached, m_word) in dedup
        mode — the brick sweep is stateless — plus
        (b_cached, b_lo, b_hi) in per-node (legacy) mode."""

        inf = jnp.float32(np.inf)

        def step_pre(nlive, trav):
            """Address phase of one DDA step: bounds check, node
            coords, and the meta serve address — everything the serve
            pre-pass reduces need.  Split out so the dual-queue path
            can run both groups' pre phases, pair their serve reduces
            (:func:`_serve_dual`), then run both post phases."""
            (active, cx, cy, cz, t) = trav
            # live-lane integral: Σ_steps (active lanes) — utilization
            # diagnostics for compaction headroom (read via
            # debug_iters).  Accumulated as a PLANE and reduced once
            # after the while loop: the old per-step jnp.sum was a
            # vector->scalar loop carry costing a ~350-cycle handoff
            # EVERY step (roofline r4: the single largest removable
            # sync term, ~1 ms/frame at 720p).
            nlive = nlive + active
            # 1. bounds check (oracle order: before the value test)
            inb = (
                (cx >= 0)
                & (cx < X)
                & (cy >= 0)
                & (cy < Y)
                & (cz >= 0)
                & (cz < Z)
            ).astype(jnp.int32)
            active = active * inb
            act = active == 1

            # 2. the node's 16-bit meta address (tiny march table:
            # occupancy + brick index / uniform slot, or empty-space
            # distance)
            qx = cx >> 2
            qy = cy >> 2
            qz = cz >> 2
            l3_col = ((qx >> 2) * QY4 + (qy >> 2)) * 16 + (
                (qx & 3) << 2
            ) + (qy & 3)
            m_addr = jnp.where(act, l3_col * QZW2 + (qz >> 1), 0)
            trav = (active, cx, cy, cz, t)
            return nlive, trav, act, (qx, qy, qz, l3_col), m_addr

        def step_post(
            ray, nserv, nact, trav, bst, act, qctx, m_word, m_cached,
            kf, recs,
        ):
            """Everything after the meta serve: value decode, brick
            resolve, micro-DDA, empty-box advance."""
            (active, cx, cy, cz, t) = trav
            (hslot_u, hit, rfuse, hit_t, hcx, hcy, hcz) = recs
            (ox_, oy_, oz_, dx, dy, dz, invx, invy, invz) = ray
            qx, qy, qz, l3_col = qctx
            if brick_dedup:
                assert bst == ()
            else:
                b_cached, b_lo, b_hi = bst
            sx = jnp.sign(dx).astype(jnp.int32)
            sy = jnp.sign(dy).astype(jnp.int32)
            sz = jnp.sign(dz).astype(jnp.int32)
            nserv = nserv + kf
            val = (m_word >> ((qz & 1) << 4)) & 0xFFFF
            occ3 = (val & 0x8000) != 0

            # 3. lanes in an occupied node resolve its brick (64-bit
            # fine mask + uniform slot)
            b_need = act & occ3
            if brick_dedup:
                # occupied meta carries a 15-bit index into the tiny
                # unique-brick table (mask lo / mask hi / slot): ONE
                # static full-table sweep — no min-reduce handoff, no
                # adaptive rounds, no cached-word loop state.
                waddr_b = jnp.where(b_need, val & 0x7FFF, 0)
                rowb = waddr_b >> 7
                colb = waddr_b & 127
                b_lo = jnp.zeros_like(cx)
                b_hi = jnp.zeros_like(cx)
                b_slot = jnp.zeros_like(cx)
                for s8 in range(b_rows):
                    serve = rowb == s8
                    lo_b = jnp.broadcast_to(
                        brick_ref[0, s8 : s8 + 1, :], cx.shape
                    )
                    hi_b = jnp.broadcast_to(
                        brick_ref[1, s8 : s8 + 1, :], cx.shape
                    )
                    sl_b = jnp.broadcast_to(
                        brick_ref[2, s8 : s8 + 1, :], cx.shape
                    )
                    b_lo = jnp.where(
                        serve, jnp.take_along_axis(lo_b, colb, axis=1), b_lo
                    )
                    b_hi = jnp.where(
                        serve, jnp.take_along_axis(hi_b, colb, axis=1), b_hi
                    )
                    b_slot = jnp.where(
                        serve, jnp.take_along_axis(sl_b, colb, axis=1), b_slot
                    )
            else:
                b_addr = jnp.where(b_need, l3_col * QZ + qz, 0)
                b_lo, b_hi, b_cached, kf2 = _serve_loop_pair(
                    brick_ref, b_rows, b_addr, b_need, b_lo, b_hi,
                    b_cached, win=knobs.brick_win, ladder=knobs.bladder,
                )
                nact = nact + kf2
                b_slot = val & 0x3FF

            def bt_axis(lo, hi, og, sgn, o, inv):
                bnd = jnp.where(sgn > 0, hi, lo)
                nb = (og + bnd.astype(jnp.float32)) * CELL_SIZE
                return jnp.where(sgn != 0, (nb - o) * inv, inf)

            # 4a. micro-DDA: lanes in an occupied node march its fine
            # cells with in-register bit tests — test the current
            # cell, single-cell exact DDA advance, stop on hit or on
            # leaving the node.  All other lanes skip (masked).
            qx0, qy0, qz0 = qx, qy, qz
            run = act & occ3

            def brick_bit(cx_, cy_, cz_):
                cxm = cx_ & 3
                w = jnp.where(cxm < 2, b_lo, b_hi)
                bitk = ((cxm & 1) << 4) | ((cy_ & 3) << 2) | (cz_ & 3)
                return ((w >> bitk) & 1) == 1

            for _ in range(knobs.micro_steps):
                # lanes stop on a set bit, freezing (cell, t) AT the
                # hit — recorded once after the unroll
                run = run & (~brick_bit(cx, cy, cz))
                # exact single-cell DDA advance (bit-identical to the
                # box path's single-cell case)
                btx = bt_axis(cx, cx + 1, float(oxi), sx, ox_, invx)
                bty = bt_axis(cy, cy + 1, float(oyi), sy, oy_, invy)
                btz = bt_axis(cz, cz + 1, float(ozi), sz, oz_, invz)
                bt = jnp.minimum(jnp.minimum(btx, bty), btz)
                bsx = (btx <= bty) & (btx <= btz)
                bsy = (~bsx) & (bty <= btz)
                bsz = (~bsx) & (~bsy)
                cx = cx + jnp.where(run & bsx, sx, 0)
                cy = cy + jnp.where(run & bsy, sy, 0)
                cz = cz + jnp.where(run & bsz, sz, 0)
                t = jnp.where(run, jnp.maximum(t, bt), t)
                run = run & (
                    ((cx >> 2) == qx0) & ((cy >> 2) == qy0)
                    & ((cz >> 2) == qz0)
                )
            found_any = (
                act & occ3
                & ((cx >> 2) == qx0) & ((cy >> 2) == qy0)
                & ((cz >> 2) == qz0)
                & brick_bit(cx, cy, cz)
            )
            hit = jnp.where(found_any, 1, hit)
            hit_t = jnp.where(found_any, t, hit_t)
            hcx = jnp.where(found_any, cx, hcx)
            hcy = jnp.where(found_any, cy, hcy)
            hcz = jnp.where(found_any, cz, hcz)
            hslot_u = jnp.where(found_any, b_slot, hslot_u)
            active = active * (1 - found_any.astype(jnp.int32))

            # 4b. box advance for empty nodes: distance d certifies
            # the node box [ (q-d+1)*4, (q+d)*4 ) empty in fine cells.
            step = act & (~occ3)
            d = jnp.maximum(val & 0x1FF, 1)

            def box_axis(q, dd):
                return (q - dd + 1) << 2, (q + dd) << 2

            lox, hix = box_axis(qx, d)
            loy, hiy = box_axis(qy, d)
            loz, hiz = box_axis(qz, d)

            btx = bt_axis(lox, hix, float(oxi), sx, ox_, invx)
            bty = bt_axis(loy, hiy, float(oyi), sy, oy_, invy)
            btz = bt_axis(loz, hiz, float(ozi), sz, oz_, invz)
            bt = jnp.minimum(jnp.minimum(btx, bty), btz)
            bsx = (btx <= bty) & (btx <= btz)
            bsy = (~bsx) & (bty <= btz)
            bsz = (~bsx) & (~bsy)
            jx = jnp.where(sx > 0, hix, lox - 1)
            jy = jnp.where(sy > 0, hiy, loy - 1)
            jz = jnp.where(sz > 0, hiz, loz - 1)
            # crossing axis exits the box exactly (monotone, so the
            # march always terminates); other axes follow the ray
            fxc = cell_from_float(ox_, dx, bt, float(oxi))
            fyc = cell_from_float(oy_, dy, bt, float(oyi))
            fzc = cell_from_float(oz_, dz, bt, float(ozi))
            cx = jnp.where(step, jnp.where(bsx, jx, fxc), cx)
            cy = jnp.where(step, jnp.where(bsy, jy, fyc), cy)
            cz = jnp.where(step, jnp.where(bsz, jz, fzc), cz)
            # max() guards against float ping-pong freezing t; cell
            # progress is monotone regardless, t only feeds hit_t
            t = jnp.where(step, jnp.maximum(t, bt), t)

            mst_out = (
                (m_cached, m_word)
                if brick_dedup
                else (m_cached, m_word, b_cached, b_lo, b_hi)
            )
            return (
                nserv,
                nact,
                (active, cx, cy, cz, t),
                mst_out,
                (hslot_u, hit, rfuse, hit_t, hcx, hcy, hcz),
            )

        def one_step(ray, nserv, nact, nlive, trav, mst, recs):
            """One DDA step = pre (addresses) → meta serve → post
            (decode / brick / micro-DDA / box advance).  The split is
            pure code movement: the single-queue graph is the same op
            sequence the fused body emitted."""
            if brick_dedup:
                m_cached, m_word = mst
                bst = ()
            else:
                m_cached, m_word = mst[0], mst[1]
                bst = mst[2:]
            nlive, trav, act, qctx, m_addr = step_pre(nlive, trav)
            m_word, m_cached, kf = _serve_loop(
                meta_ref, m_rows, m_addr, act, m_word, m_cached,
                win=knobs.meta_win, ladder=knobs.ladder,
            )
            nserv, nact, trav, mst_out, recs = step_post(
                ray, nserv, nact, trav, bst, act, qctx, m_word,
                m_cached, kf, recs,
            )
            return nserv, nact, nlive, trav, mst_out, recs

        return one_step, step_pre, step_post

    def finish(table_ref, ray, fuse_mask, cur, recs, fine_dma):
        """Post-march resolution for one ray's hit records: iteration
        fuse -> opaque black leaf (voxels.comp:166-169), palette slot
        at the hit, and the face normal (voxels.comp:181-187).

        Fused lanes arrive two ways: the per-ray step cap recorded the
        fuse in ``recs`` (rfuse) mid-march, or the lane was still
        active when the outer backstop died (``fuse_mask``, uses the
        live ``cur`` position)."""
        ox_, oy_, oz_, dx, dy, dz = ray[:6]
        cx, cy, cz, t = cur
        hslot_u, hit, rfuse, hit_t, hcx, hcy, hcz = recs
        zero_i = jnp.zeros_like(cx)
        hit = jnp.where(fuse_mask, 1, hit)
        hit_t = jnp.where(fuse_mask, t, hit_t)
        hcx = jnp.where(fuse_mask, cx, hcx)
        hcy = jnp.where(fuse_mask, cy, hcy)
        hcz = jnp.where(fuse_mask, cz, hcz)
        fused = fuse_mask | (rfuse == 1)
        hitb = hit == 1

        # resolve the palette slot at the hit cell: hits in uniform
        # blocks carry it in the node record; only mixed blocks pay a
        # fine-table serve (once per traversal; fused lanes render as
        # opaque black and skip it)
        need_slot = hitb & (~fused) & (hslot_u == 0)
        fzw = _div3(hcz)
        fcol = ((hcx >> 2) * PY4 + (hcy >> 2)) * 16 + ((hcx & 3) << 2) + (
            hcy & 3
        )
        fwaddr = jnp.where(need_slot, fcol * zw + fzw, 0)
        if fine_in_hbm:
            # fine table lives in HBM (too big for VMEM): each serve
            # round DMAs its window into VMEM scratch first.  Paid once
            # per traversal at the hit, not per march step.
            scratch, sem = fine_dma
            fword, _, kf2 = _serve_loop_hbm(
                table_ref, scratch, sem, n_rows, fwaddr, need_slot,
                zero_i, zero_i - 1, win=knobs.fine_win,
            )
        else:
            fword, _, kf2 = _serve_loop(
                table_ref, n_rows, fwaddr, need_slot, zero_i, zero_i - 1,
                win=knobs.fine_win, ladder=0,
            )
        hslot = jnp.where(
            need_slot, (fword >> ((hcz - fzw * 3) * 10)) & 1023, hslot_u
        )
        hslot = jnp.where(hitb & (~fused), hslot, 0)
        n_fine = kf2

        # normal: dominant axis of (hit point - cell center), sign
        # opposing the ray; exact ties set several components
        px = ox_ + hit_t * dx
        py = oy_ + hit_t * dy
        pz = oz_ + hit_t * dz
        ccx = (float(oxi) + hcx.astype(jnp.float32)) * CELL_SIZE + 0.5 * CELL_SIZE
        ccy = (float(oyi) + hcy.astype(jnp.float32)) * CELL_SIZE + 0.5 * CELL_SIZE
        ccz = (float(ozi) + hcz.astype(jnp.float32)) * CELL_SIZE + 0.5 * CELL_SIZE
        ax = jnp.abs(px - ccx)
        ay = jnp.abs(py - ccy)
        az = jnp.abs(pz - ccz)
        m = jnp.maximum(jnp.maximum(ax, ay), az)
        nx = jnp.where((ax == m) & hitb, -jnp.sign(dx), 0.0)
        ny = jnp.where((ay == m) & hitb, -jnp.sign(dy), 0.0)
        nz = jnp.where((az == m) & hitb, -jnp.sign(dz), 0.0)
        return hit, hit_t, hslot, fused, (nx, ny, nz), n_fine

    def traverse(
        table_ref, meta_ref, brick_ref, o3, d3, mask=None, fine_dma=None
    ):
        """Single-ray march — the ray queue with a dead second slot
        (identical per-ray semantics; kept for probes and shadow-only
        callers).  Returns
        (hit i32, t, slot i32, fused, normal tuple, counters)."""
        dead = jnp.zeros_like(o3[0], dtype=bool)
        res, counters = traverse_qn(
            table_ref, meta_ref, brick_ref,
            [(o3, d3, mask), (o3, d3, dead)], fine_dma=fine_dma,
        )
        return res[0] + (counters,)

    def setup_from_raw(rw):
        return ray_setup(rw[0:3], rw[3:6], rw[6] == 1)

    # banked records travel packed:
    # (hcx|hcy, hcz|slot|hit|fused, hit_t) — 3 loop-state planes
    # per banked ray instead of 7
    def pack_recs(recs):
        hslot_u, hit, rfuse, hit_t, hcx, hcy, hcz = recs
        p1 = hcx | (hcy << 15)
        p2 = hcz | (hslot_u << 15) | (hit << 25) | (rfuse << 26)
        return (p1, p2, hit_t)

    def unpack_recs(p):
        p1, p2, hit_t = p
        return (
            (p2 >> 15) & 0x3FF,  # hslot_u
            (p2 >> 25) & 1,  # hit
            (p2 >> 26) & 1,  # rfuse
            hit_t,
            p1 & 0x7FFF,  # hcx
            (p1 >> 15) & 0x7FFF,  # hcy
            p2 & 0x7FFF,  # hcz
        )

    def fuse_capped(steps, trav, recs):
        """Per-ray step fuse (voxels.comp:166-169): a ray at the
        cap records a fused hit at its current cell and retires,
        so the lane's remaining queued rays still get their full
        budget (never 'report miss because a queue-mate ran
        long')."""
        active, cx, cy, cz, t = trav
        capped = (active == 1) & (steps >= max_ray_steps)
        hslot_u, hit, rfuse, hit_t, hcx, hcy, hcz = recs
        recs = (
            hslot_u,
            jnp.where(capped, 1, hit),
            jnp.where(capped, 1, rfuse),
            jnp.where(capped, t, hit_t),
            jnp.where(capped, cx, hcx),
            jnp.where(capped, cy, hcy),
            jnp.where(capped, cz, hcz),
        )
        trav = (
            active * (1 - capped.astype(jnp.int32)),
            cx, cy, cz, t,
        )
        return trav, recs

    def make_queue(rays):
        """Lane-queue machinery for one march group: raw ray planes,
        the done-lane swap (bank records, load next entry), the
        pre-while init chain, and the pending-entry guard.  Shared by
        the single-queue (:func:`traverse_qn`) and dual-queue-group
        (:func:`traverse_q2g`) paths."""
        N = len(rays)
        raw = []
        for (o3, d3, mask) in rays:
            m = (
                jnp.ones_like(o3[0], dtype=bool)
                if mask is None
                else mask
            )
            raw.append(
                (o3[0], o3[1], o3[2], d3[0], d3[1], d3[2],
                 m.astype(jnp.int32))
            )

        setup0 = setup_from_raw(raw[0])
        zero_i = jnp.zeros_like(setup0[1])
        zero_f = jnp.zeros_like(setup0[4])
        rec_zero = (
            zero_i, zero_i, zero_i, zero_f, zero_i, zero_i, zero_i
        )

        # Dead-entry jump chains: a lane's next queue position is the
        # next entry whose MASK is live, not qidx+1 — masked-off
        # entries (no shadow ray at this pixel / path already ended)
        # cost ZERO trips instead of one body each on the critical
        # lane.  Entry liveness is static over the whole traverse, so
        # the jump is a pure function of qidx; skipped entries keep
        # their zero banked records and read back as masked-out in
        # ``finish`` exactly as a drained dead entry would.
        qjump = bool(knobs.qjump) and N > 2
        lv = [rw[6] == 1 for rw in raw] if qjump else None

        def next_live(qidx):
            """Smallest live entry index > qidx (N-1 if none) via a
            descending static select chain — one plane, N-1 selects."""
            qn = jnp.full_like(qidx, N - 1)
            for r in range(N - 1, 0, -1):
                qn = jnp.where((qidx < r) & lv[r], np.int32(r), qn)
            return qn

        def swap(qidx, steps, ray, trav, recs, saved):
            """Lanes whose current ray just finished: bank its records
            and load the next ray's init state."""
            if N == 1:  # no queue to advance
                return qidx, steps, ray, trav, recs, saved
            active = trav[0]
            done = (active == 0) & (qidx < N - 1)
            packed = pack_recs(recs)
            saved = list(saved)
            for r in range(N - 1):
                m = done & (qidx == r)
                for i in range(3):
                    saved[3 * r + i] = jnp.where(
                        m, packed[i], saved[3 * r + i]
                    )
            qn = next_live(qidx) if qjump else None
            # per-lane next ray's RAW planes (o3, d3, mask) via the
            # qidx chain, then ONE vectorized ray_setup for the batch
            nraw = raw[1]
            for r in range(2, N):
                m = (qn == r) if qjump else (qidx == r - 1)
                nraw = tuple(
                    jnp.where(m, b, c) for b, c in zip(raw[r], nraw)
                )
            rayN, cxN, cyN, czN, t0N, a0N = setup_from_raw(nraw)
            ray = tuple(
                jnp.where(done, b, c) for b, c in zip(rayN, ray)
            )
            trav = (
                jnp.where(done, a0N, trav[0]),
                jnp.where(done, cxN, trav[1]),
                jnp.where(done, cyN, trav[2]),
                jnp.where(done, czN, trav[3]),
                jnp.where(done, t0N, trav[4]),
            )
            recs = tuple(
                jnp.where(done, z, c) for z, c in zip(rec_zero, recs)
            )
            steps = jnp.where(done, 0, steps)
            if qjump:
                qidx = jnp.where(done, qn, qidx)
            else:
                qidx = qidx + done.astype(jnp.int32)
            return qidx, steps, ray, trav, recs, tuple(saved)

        # lanes with dead leading rays start further down the queue;
        # with qjump a short chain suffices (one swap clears any run
        # of mask-dead entries), leaving only consecutive slab-miss
        # entries to drain in-loop under the pending-entry guard
        n_init = N - 1
        if qjump and knobs.init_swaps >= 0:
            n_init = min(N - 1, knobs.init_swaps)
        ray0 = setup0[0]
        trav0 = (setup0[5],) + tuple(setup0[1:5])
        qidx0 = zero_i
        steps0 = zero_i
        recs0 = rec_zero
        saved0 = tuple([zero_i, zero_i, zero_f] * (N - 1))
        for _ in range(n_init):
            qidx0, steps0, ray0, trav0, recs0, saved0 = swap(
                qidx0, steps0, ray0, trav0, recs0, saved0
            )
        # guard needed only when the init chain may stop short of a
        # live entry: keep the while alive for lanes whose LOADED
        # entry is inactive but whose queue still holds live entries
        pending_guard = n_init < N - 1
        last_live = None
        if pending_guard:
            last_live = zero_i - 1
            for r in range(N):
                last_live = jnp.where(lv[r], np.int32(r), last_live)
        mst0 = (
            (zero_i - 1, zero_i)
            if brick_dedup
            else (zero_i - 1, zero_i, zero_i - 1, zero_i, zero_i)
        )
        return dict(
            N=N, raw=raw, swap=swap, zero_i=zero_i, zero_f=zero_f,
            rec_zero=rec_zero, qidx0=qidx0, steps0=steps0, ray0=ray0,
            trav0=trav0, recs0=recs0, saved0=saved0, mst0=mst0,
            pending_guard=pending_guard, last_live=last_live,
            n_lanes=int(np.prod(setup0[5].shape)),
        )

    def traverse_qn(
        table_ref, meta_ref, brick_ref, rays, fine_dma=None,
        live_floor=0,
    ):
        """N rays per lane, traced SEQUENTIALLY in one while loop.

        ``rays``: list of (o3, d3, mask) batches.  Each lane marches
        ray 0 to completion, banks its hit records (packed into 3
        planes), swaps ray 1's precomputed init state into its
        registers, and so on — the tile's while-trip count approaches
        max over lanes of the SUM of its ray lengths instead of the
        sum of per-ray maxima, converting the SIMD divergence tail
        (measured 4-10% lane utilization on unpaired bounce phases)
        into useful work.  The meta/brick word caches survive swaps
        (addresses are global).  Returns (results, counters):
        results[r] = (hit, t, slot, fused, normals) for ray r.

        Cap edge: each ray carries its OWN step budget
        (``max_ray_steps``, default 2048 like ``voxels.comp:166``) —
        at the cap it fuses at its current cell (opaque black leaf)
        and the lane's queue advances, so every queued ray always
        gets its full budget regardless of queue-mates.

        Queue storage is RAW rays only — 7 planes per queued ray
        (o3, d3, mask) instead of the 14-plane precomputed setup; the
        swap recomputes the DDA entry state (1/d, slab t0, entry
        cell) once per swap call for all lanes.  The while body reads
        every queued ray's stored planes each iteration through the
        qidx select chain, so halving the planes halves that VMEM
        traffic — measured faster than precomputed setups at Q=20.

        With ``knobs.dualq`` and a deep enough queue the trace runs
        as TWO interleaved groups instead (:func:`traverse_q2g`)."""
        N = len(rays)
        if knobs.dualq and N >= 4 and brick_dedup:
            return traverse_q2g(
                table_ref, meta_ref, brick_ref, rays,
                fine_dma=fine_dma, live_floor=live_floor,
            )
        Q = make_queue(rays)
        raw = Q["raw"]
        swap = Q["swap"]
        zero_i, zero_f = Q["zero_i"], Q["zero_f"]
        rec_zero = Q["rec_zero"]
        qidx0, steps0 = Q["qidx0"], Q["steps0"]
        ray0, trav0, recs0 = Q["ray0"], Q["trav0"], Q["recs0"]
        saved0, mst0 = Q["saved0"], Q["mst0"]
        pending_guard, last_live = Q["pending_guard"], Q["last_live"]
        one_step, _, _ = make_step(meta_ref, brick_ref)
        M = len(mst0)

        # Outer backstop: with the per-ray fuse guaranteeing
        # termination, this only guards against a logic bug — set it
        # past the worst case (every queued ray fusing) so it can
        # never starve a ray of its per-ray budget.  Clamped into
        # int32 range: a huge VOX_RAY_CAP probe value times the queue
        # depth would otherwise overflow (OverflowError on NumPy 2,
        # a silently-black all-fused frame on NumPy 1).
        outer_cap = np.int32(
            min(N * max_ray_steps + N * qswap, 2**31 - 1)
            if fuse_on
            else 4096
        )

        # state layout: it | counters(3) | qidx | steps | ray(9) |
        #               trav(5) | mst(M) | recs(7) | saved(3*(N-1)) |
        #               [decay quantile counters (5), knob-gated]
        TRAV0 = 15
        MST0 = TRAV0 + 5
        REC0 = MST0 + M
        SAV0 = REC0 + 7
        DQ0 = SAV0 + 3 * (N - 1)
        n_lanes = Q["n_lanes"]
        decay_thresh = tuple(
            np.int32(max(1, int(np.ceil(f * n_lanes))))
            for f in DECAY_FRACS
        )

        def cond(s):
            if live_floor > 0:
                # probe cap: live >= floor also implies liveness
                return jnp.logical_and(
                    s[0] < outer_cap,
                    jnp.sum(s[TRAV0]) >= np.int32(live_floor),
                )
            live = s[TRAV0]
            if pending_guard:
                live = live + (s[4] < last_live).astype(jnp.int32)
            return jnp.logical_and(
                s[0] < outer_cap, jnp.max(live) > 0
            )

        def body(s):
            it = s[0]
            nserv, nact, nlive = s[1:4]
            qidx = s[4]
            steps = s[5]
            ray = s[6:15]
            trav = s[TRAV0:MST0]
            mst = s[MST0:REC0]
            recs = s[REC0:SAV0]
            saved = s[SAV0:DQ0]
            # qswap march steps per swap: the while cond only ever
            # observes post-swap state, so queue-pending lanes can
            # never be mistaken for done
            for _ in range(qswap):
                nserv, nact, nlive, trav, mst, recs = one_step(
                    ray, nserv, nact, nlive, trav, mst, recs
                )
            # the step count advances in qswap quanta, so a capped ray
            # may overrun by <= qswap-1 steps before fusing — the cap
            # bounds work per ray; it is not a step-exact reference
            # match (the algorithms count different step kinds anyway)
            if fuse_on:
                steps = steps + np.int32(qswap)
                trav, recs = fuse_capped(steps, trav, recs)
            qidx, steps, ray, trav, recs, saved = swap(
                qidx, steps, ray, trav, recs, saved
            )
            tq = s[DQ0:]
            if decay_stats:
                # trips while the live count still clears each
                # threshold = the decay curve's quantile crossings
                # (live is monotone nonincreasing: a lane never
                # revives once its queue drains)
                live = jnp.sum(trav[0])
                tq = tuple(
                    t + np.int32(qswap) * (live >= th).astype(
                        jnp.int32
                    )
                    for t, th in zip(tq, decay_thresh)
                )
            return (
                (it + qswap, nserv, nact, nlive, qidx, steps)
                + ray + trav + mst + recs + saved + tq
            )

        tq0 = (np.int32(0),) * 5 if decay_stats else ()
        state = (
            # n_live (slot 3) is a PLANE carry, reduced once after the
            # loop (a scalar carry paid a per-step handoff stall)
            (np.int32(0), np.int32(0), np.int32(0), zero_i,
             qidx0, steps0)
            + ray0 + trav0 + mst0 + recs0 + saved0 + tq0
        )
        out = jax.lax.while_loop(cond, body, state)
        n_iters, n_serves, n_act = out[0], out[1], out[2]
        n_live, qidx = jnp.sum(out[3]), out[4]
        active = out[TRAV0]
        cur = tuple(out[TRAV0 + 1 : TRAV0 + 5])  # cx, cy, cz, t
        recs = out[REC0:SAV0]
        saved = out[SAV0:DQ0]

        results = []
        n_fine = np.int32(0)
        for r in range(N):
            cur_r = qidx == r
            if r < N - 1:
                banked = unpack_recs(saved[3 * r : 3 * r + 3])
                recs_r = tuple(
                    jnp.where(qidx > r, b, jnp.where(cur_r, c, z))
                    for b, c, z in zip(banked, recs, rec_zero)
                )
            else:
                recs_r = tuple(
                    jnp.where(cur_r, c, z)
                    for c, z in zip(recs, rec_zero)
                )
            hit, t, slot, fused, nrm, nf = finish(
                table_ref, raw[r], cur_r & (active == 1), cur,
                recs_r, fine_dma,
            )
            n_fine = n_fine + nf
            results.append((hit, t, slot, fused, nrm))
        counters = (
            (n_iters, n_serves, n_act, n_fine, n_live) + out[DQ0:]
        )
        return results, counters

    def traverse_q2g(
        table_ref, meta_ref, brick_ref, rays, fine_dma=None,
        live_floor=0,
    ):
        """Dual-queue-group software pipelining (knob ``dualq``).

        The lane queue splits into two interleaved groups (entries
        0,2,4,… / 1,3,5,…), each with its OWN carried march state,
        advanced together by ONE while loop whose meta serves are
        PAIRED (:func:`_serve_dual`): both groups' vector→scalar
        pre-pass reduces issue before either dependent window slice,
        so one group's ~330-cycle scalar handoff stall executes under
        the other group's vector work.  This is the latency hiding a
        GPU gets free from SIMT warp oversubscription
        (voxels.comp:15 — other warps run while one waits) and that
        Mosaic does NOT perform automatically across a reduce→slice
        dependence (measured: <60 of ~330 cycles hidden,
        app/stallbench --mid); pairing the issue is the software
        version.  Measured cycles (stallbench, TPU v5e): serial pair
        ~670, paired ~160.

        Per-ray math is UNCHANGED — grouping alters instruction
        scheduling, never values (serve results are address-
        deterministic; the word caches are per-group) — so results
        match :func:`traverse_qn` bit-exactly on every discrete and
        accumulated plane; depth agrees to 1 ulp (whole-graph
        recompilation moves FMA contraction in the primary t chain —
        pinned by test).  Trips ≈ halve (two steps of vector work per
        trip), per-step serve stalls ≈ quarter, the while-cond
        liveness reduce amortizes over two steps, and each group's
        qidx/saved select chains run over N/2 entries.  Costs: ~23
        extra carried planes and masked idle steps when one group
        drains first (the even/odd interleave balances expected group
        work).

        MEASURED NET LOSS — kept as a knob, default off: menger 720p
        interleaved A/B (abench, r5) ran 12.24 ms dual vs 11.39 ms
        single.  With the stall measured at ~330 cycles the paired-
        reduce win is only ~0.7 ms/frame at menger's step counts,
        and the extra carried-state spill pressure plus max-over-
        groups drain idling exceed it (docs/BASELINE_RESULTS.md
        round 5, dead-end ledger)."""
        assert brick_dedup, "dualq requires the dedup brick table"
        N = len(rays)
        idxs = [list(range(0, N, 2)), list(range(1, N, 2))]
        Qs = [make_queue([rays[i] for i in sub]) for sub in idxs]
        _, step_pre, step_post = make_step(meta_ref, brick_ref)

        # per-group state block: qidx | steps | ray(9) | trav(5) |
        # mst(2) | recs(7) | saved(3*(Ng-1))
        GQ, GST, GRAY, GTRAV, GMST, GREC, GSAV = 0, 1, 2, 11, 16, 18, 25

        def gsize(q):
            return GSAV + 3 * (q["N"] - 1)

        base = [4, 4 + gsize(Qs[0])]
        DQ0 = base[1] + gsize(Qs[1])

        outer_cap = np.int32(
            min(
                max(q["N"] for q in Qs) * (max_ray_steps + qswap),
                2**31 - 1,
            )
            if fuse_on
            else 4096
        )
        # both groups live concurrently: quantile thresholds scale x2
        decay_thresh = tuple(
            np.int32(max(1, int(np.ceil(f * 2 * Qs[0]["n_lanes"]))))
            for f in DECAY_FRACS
        )

        def glive(s, g):
            live = s[base[g] + GTRAV]
            if Qs[g]["pending_guard"]:
                live = live + (
                    s[base[g] + GQ] < Qs[g]["last_live"]
                ).astype(jnp.int32)
            return live

        def cond(s):
            live = glive(s, 0) + glive(s, 1)
            if live_floor > 0:
                # probe cap: total live lanes across both groups
                return jnp.logical_and(
                    s[0] < outer_cap,
                    jnp.sum(s[base[0] + GTRAV] + s[base[1] + GTRAV])
                    >= np.int32(live_floor),
                )
            return jnp.logical_and(
                s[0] < outer_cap, jnp.max(live) > 0
            )

        def body(s):
            it = s[0]
            nserv, nact, nlive = s[1:4]
            g = []
            for k in range(2):
                b = base[k]
                g.append(dict(
                    qidx=s[b + GQ], steps=s[b + GST],
                    ray=s[b + GRAY : b + GTRAV],
                    trav=s[b + GTRAV : b + GMST],
                    mst=s[b + GMST : b + GREC],
                    recs=s[b + GREC : b + GSAV],
                    saved=s[b + GSAV : b + gsize(Qs[k])],
                ))
            for _ in range(qswap):
                # pre phases of BOTH groups, then the paired serve
                # (all four pre-pass reduces issue together), then
                # both post phases — the pipelined shape
                pres = []
                for k in range(2):
                    nlive, trav, act, qctx, m_addr = step_pre(
                        nlive, g[k]["trav"]
                    )
                    g[k]["trav"] = trav
                    pres.append((act, qctx, m_addr))
                (wA, cA, kA), (wB, cB, kB) = _serve_dual(
                    meta_ref, m_rows,
                    (pres[0][2], pres[0][0], g[0]["mst"][1],
                     g[0]["mst"][0]),
                    (pres[1][2], pres[1][0], g[1]["mst"][1],
                     g[1]["mst"][0]),
                    win=knobs.meta_win, ladder=knobs.ladder,
                )
                for k, (w, c, kf) in enumerate(
                    ((wA, cA, kA), (wB, cB, kB))
                ):
                    act, qctx, _ = pres[k]
                    nserv, nact, trav, mst, recs = step_post(
                        g[k]["ray"], nserv, nact, g[k]["trav"], (),
                        act, qctx, w, c, kf, g[k]["recs"],
                    )
                    g[k].update(trav=trav, mst=mst, recs=recs)
            for k in range(2):
                if fuse_on:
                    g[k]["steps"] = g[k]["steps"] + np.int32(qswap)
                    g[k]["trav"], g[k]["recs"] = fuse_capped(
                        g[k]["steps"], g[k]["trav"], g[k]["recs"]
                    )
                (g[k]["qidx"], g[k]["steps"], rayk, g[k]["trav"],
                 g[k]["recs"], g[k]["saved"]) = Qs[k]["swap"](
                    g[k]["qidx"], g[k]["steps"], g[k]["ray"],
                    g[k]["trav"], g[k]["recs"], g[k]["saved"],
                )
                g[k]["ray"] = rayk
            tq = s[DQ0:]
            if decay_stats:
                live = jnp.sum(g[0]["trav"][0] + g[1]["trav"][0])
                tq = tuple(
                    t + np.int32(qswap) * (live >= th).astype(
                        jnp.int32
                    )
                    for t, th in zip(tq, decay_thresh)
                )
            flat = (it + qswap, nserv, nact, nlive)
            for k in range(2):
                flat = flat + (
                    (g[k]["qidx"], g[k]["steps"])
                    + tuple(g[k]["ray"]) + tuple(g[k]["trav"])
                    + tuple(g[k]["mst"]) + tuple(g[k]["recs"])
                    + tuple(g[k]["saved"])
                )
            return flat + tq

        tq0 = (np.int32(0),) * 5 if decay_stats else ()
        state = (
            np.int32(0), np.int32(0), np.int32(0), Qs[0]["zero_i"],
        )
        for q in Qs:
            state = state + (
                (q["qidx0"], q["steps0"]) + q["ray0"] + q["trav0"]
                + q["mst0"] + q["recs0"] + q["saved0"]
            )
        state = state + tq0
        out = jax.lax.while_loop(cond, body, state)
        n_iters, n_serves, n_act = out[0], out[1], out[2]
        n_live = jnp.sum(out[3])

        results_all = [None] * N
        n_fine = np.int32(0)
        for k in range(2):
            b = base[k]
            q = Qs[k]
            qidx = out[b + GQ]
            active = out[b + GTRAV]
            cur = tuple(out[b + GTRAV + 1 : b + GTRAV + 5])
            recs = out[b + GREC : b + GSAV]
            saved = out[b + GSAV : b + gsize(q)]
            for r in range(q["N"]):
                cur_r = qidx == r
                if r < q["N"] - 1:
                    banked = unpack_recs(saved[3 * r : 3 * r + 3])
                    recs_r = tuple(
                        jnp.where(qidx > r, bb, jnp.where(cur_r, c, z))
                        for bb, c, z in zip(
                            banked, recs, q["rec_zero"]
                        )
                    )
                else:
                    recs_r = tuple(
                        jnp.where(cur_r, c, z)
                        for c, z in zip(recs, q["rec_zero"])
                    )
                hit, t, slot, fused, nrm, nf = finish(
                    table_ref, q["raw"][r], cur_r & (active == 1),
                    cur, recs_r, fine_dma,
                )
                n_fine = n_fine + nf
                results_all[idxs[k][r]] = (hit, t, slot, fused, nrm)
        counters = (
            (n_iters, n_serves, n_act, n_fine, n_live) + out[DQ0:]
        )
        return results_all, counters

    return traverse, traverse_qn


def _make_kernel(
    dims, zw, origin, n_rows, l3_dims, m_rows, b_rows,
    max_bounces=MAX_BOUNCES, fine_in_hbm=False, nbx2=1, q_cols=2,
    q_rows=1, brick_dedup=True, tile_h=TILE_H, qswap=None,
    max_ray_steps=None, knobs: TraceKnobs = DEFAULT_KNOBS,
    row_stride=1,
):
    traverse, traverse_qn = _make_traverse(
        dims, zw, origin, n_rows, l3_dims, m_rows, b_rows,
        fine_in_hbm=fine_in_hbm, brick_dedup=brick_dedup, qswap=qswap,
        max_ray_steps=max_ray_steps, knobs=knobs,
    )
    block = BLOCK_OF[tile_h]
    p_par = 128 // block  # noise-quad parity period per axis
    q_blocks = q_rows * q_cols  # rays queued per lane
    farpair = knobs.farpair
    merge_shadow = knobs.merge_shadow
    scramble = knobs.scramble

    assert not (farpair and (q_cols, q_rows) != (2, 1)), (
        "farpair needs a 1x2 program rectangle"
    )

    def kernel(
        params_ref,  # (1, PARAMS_LEN) f32 SMEM
        table_ref,  # (n_rows, 128) int32 VMEM
        meta_ref,  # (m_rows, 128) int32 VMEM
        brick_ref,  # (2|3, b_rows, 128) int32 VMEM: per-node lo/hi
        #   mask words, or dedup (mask lo / mask hi / uniform slot)
        palette_ref,  # (8, 128) int32 VMEM
        noise_ref,  # (24, 1|P, P, tile_h, TILE_W) f32 VMEM parity
        #   quads (y-parity slab pre-selected when q_rows == 1)
        color_r_ref,  # out blocks are (TILE_H, 2*TILE_W): pixel group
        color_g_ref,  # q lives in columns [q*TILE_W, (q+1)*TILE_W)
        color_b_ref,
        normal_x_ref,
        normal_y_ref,
        normal_z_ref,
        depth_ref,
        nodeid_ref,
        albedo_r_ref,
        albedo_g_ref,
        albedo_b_ref,
        debug_ref,
        *fine_dma_refs,  # (scratch, sem) iff fine_in_hbm
    ):
        fine_dma = tuple(fine_dma_refs) if fine_in_hbm else None
        ti = pl.program_id(0)
        tj = pl.program_id(1)

        def P(i):
            return params_ref[0, i]

        shape = (tile_h, TILE_W)
        iy = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        ix = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        fy = iy.astype(jnp.float32)
        fx = ix.astype(jnp.float32)
        # traced zero/one planes (plain jnp.zeros here would become an
        # eagerly-created device constant - see module docstring)
        zf = fx * 0.0
        onef = zf + 1.0
        zi = zf.astype(jnp.int32)
        lane = iy * TILE_W + ix

        def _lane_shuffle(x, sq, inv):
            """Static lane decorrelation for queue entry ``sq``:
            sublane roll (crosses pixel-row bands) + a row-mixed
            affine lane permutation (odd multiplier => bijective mod
            128; the row term makes the column map differ per sublane,
            so the whole map is NOT a translation — a pure XOR/shift
            left neighboring lanes with neighboring queue sums and the
            while-trip max barely moved).  Within-row gather is the
            fast primitive; the two directions are exact inverses, so
            scrambled phases stay bit-identical.  sq == 0 is identity."""
            r = (sq * 11) % tile_h
            a = (2 * sq + 1) % TILE_W  # odd: invertible mod 128
            c = (sq * 37) % TILE_W
            if sq == 0:
                return x
            a_inv = pow(a, -1, TILE_W)
            isbool = x.dtype == jnp.bool_
            xb = x.astype(jnp.int32) if isbool else x
            mixed = 13 * iy
            if not inv:
                if r:
                    xb = pltpu.roll(xb, r, 0)
                idx = (a * ix + c + mixed) & (TILE_W - 1)
                xb = jnp.take_along_axis(xb, idx, axis=1)
            else:
                idx = (a_inv * (ix - c - mixed)) & (TILE_W - 1)
                xb = jnp.take_along_axis(xb, idx, axis=1)
                if r:
                    xb = pltpu.roll(xb, tile_h - r, 0)
            return xb == 1 if isbool else xb

        def scram_rays(rays_list, on):
            if not on:
                return rays_list
            return [
                (
                    tuple(_lane_shuffle(v, sq, False) for v in o3),
                    tuple(_lane_shuffle(v, sq, False) for v in d3),
                    _lane_shuffle(m, sq, False),
                )
                for sq, (o3, d3, m) in enumerate(rays_list)
            ]

        def unscram_results(results, on):
            if not on:
                return results
            out = []
            for sq, (hit, t, slot, fused, nrm) in enumerate(results):
                inv = lambda v: _lane_shuffle(v, sq, True)
                out.append(
                    (inv(hit), inv(t), inv(slot), inv(fused),
                     tuple(inv(v) for v in nrm))
                )
            return out

        cam_o = (P(0), P(1), P(2))
        right = (P(3), P(4), P(5))
        up = (P(6), P(7), P(8))
        fwd = (P(9), P(10), P(11))

        sun_yaw, sun_pitch = P(12), P(13)
        sun_size, sun_strength = P(14), P(15)
        emit_strength, specularity = P(16), P(17)
        sun_col = (P(18) * sun_strength, P(19) * sun_strength, P(20) * sun_strength)
        sky = (P(21), P(22), P(23))

        sdx, sdy, sdz = P(24), P(25), P(26)
        nsx, nsy, nsz = P(27), P(28), P(29)
        sun_on = sun_strength > 0.0

        def block_rc(q):
            """Group q's (block-row, block-col) in the image block
            grid; the program owns a q_rows x q_cols rectangle."""
            rr, cc = divmod(q, q_cols)
            bi = ti * q_rows + rr
            if farpair:
                bj = tj + cc * nbx2
            else:
                bj = tj * q_cols + cc
            return bi, bj

        def noise(k, q):
            # (y, x)-parity of group q's pixel block (dynamic
            # scalars).  With one block-row per program the BlockSpec
            # pre-selects the program's y-parity slab (axis 1 size 1).
            bi, bj = block_rc(q)
            # under a cyclic row layout local block-row bi is global
            # block-row bi*row_stride + chip (the chip offset rides
            # the pre-roll), so parity strides too
            row = (bi * row_stride) % p_par if q_rows > 1 else 0
            return noise_ref[k, row, bj % p_par, :, :]

        def slot_color(slot_vals):
            node = _flat_gather_1024(palette_ref[:, :], slot_vals)
            return node

        def node_rgb(node):
            r = ((node >> 16) & 0xFF).astype(jnp.float32) / 255.0
            g = ((node >> 8) & 0xFF).astype(jnp.float32) / 255.0
            b = (node & 0xFF).astype(jnp.float32) / 255.0
            return r, g, b

        # Per-pixel-group state: this program owns TWO adjacent
        # BLOCK x BLOCK pixel blocks (2*tj and 2*tj+1).  Every
        # traversal phase pairs group 0's ray with group 1's in the
        # two-ray-per-lane queue (traverse_q2): iid traversal lengths
        # make the merged trip count ~max+mean instead of 2*max,
        # recovering the measured 90%+ divergence-tail waste.
        G = []
        for q in range(q_blocks):
            bi, bj = block_rc(q)
            px = (bj * block + (lane % block)).astype(jnp.float32)
            # row_stride > 1: cyclic block-row image decomposition —
            # local block-row bi renders global block-row
            # bi*row_stride + P(30)/block (the mesh's work-skew
            # balancer; P(30) carries the chip's pixel-row offset)
            py = (
                bi * (block * row_stride) + (lane // block)
            ).astype(jnp.float32) + P(30)
            rdx = px * right[0] - py * up[0] + fwd[0]
            rdy = px * right[1] - py * up[1] + fwd[1]
            rdz = px * right[2] - py * up[2] + fwd[2]
            rdx, rdy, rdz = _norm_div3(rdx, rdy, rdz)
            G.append(
                dict(
                    q=q,
                    rdx=rdx, rdy=rdy, rdz=rdz,
                    rox=zf + cam_o[0],
                    roy=zf + cam_o[1],
                    roz=zf + cam_o[2],
                    sample_r=zf, sample_g=zf, sample_b=zf,
                    blend_r=onef, blend_g=onef, blend_b=onef,
                    ambient=onef,
                    alive=zi + 1,
                    first_node=zi + MISS_NODE,
                    first_nx=zf + ALMOST_INFINITY,
                    first_ny=zf + ALMOST_INFINITY,
                    first_nz=zf + ALMOST_INFINITY,
                    first_t=zf - 1.0,
                )
            )

        iter_counts = []
        ray_counts = []  # rays actually traced per phase (mask sums)

        def count_rays(rays_list):
            """Exact count of rays entering a traversal phase: the sum
            of the phase's queue-entry masks.  Plane adds + ONE reduce
            per phase, all outside the while loop — the honest
            numerator for Mrays/s (BASELINE.md's stated metric; the
            old bench line only had the 6-per-pixel upper bound)."""
            acc = zi
            for (_, _, m) in rays_list:
                acc = acc + m.astype(jnp.int32)
            ray_counts.append(jnp.sum(acc))

        def shade_hit(g, res, bounce):
            """Bounce-hit shading through the shadow-ray build; the
            occlusion-dependent pieces wait for the paired shadow
            traversal (shade_light)."""
            k0 = RANDS_PER_BOUNCE * bounce
            q = g["q"]
            hit_i, t, slot, fused, (nx, ny, nz) = res
            hit = (hit_i == 1) & (g["alive"] == 1)
            node = slot_color(slot)
            node = jnp.where(fused, LEAF_BIT, node)

            hx_pos = g["rox"] + t * g["rdx"]
            hy_pos = g["roy"] + t * g["rdy"]
            hz_pos = g["roz"] + t * g["rdz"]

            cr, cg, cb = node_rgb(node)
            if bounce == 0:
                col_r = onef
                col_g = col_r
                col_b = col_r
            else:
                col_r, col_g, col_b = cr, cg, cb
            emissive = ((node & EMISSIVE_BIT) != 0).astype(jnp.float32)
            g["sample_r"] += jnp.where(
                hit, emissive * emit_strength * cr * g["blend_r"], 0.0
            )
            g["sample_g"] += jnp.where(
                hit, emissive * emit_strength * cg * g["blend_g"], 0.0
            )
            g["sample_b"] += jnp.where(
                hit, emissive * emit_strength * cb * g["blend_b"], 0.0
            )

            if bounce == 0:
                g["first_node"] = jnp.where(hit, node, g["first_node"])
                g["first_nx"] = jnp.where(hit, nx, g["first_nx"])
                g["first_ny"] = jnp.where(hit, ny, g["first_ny"])
                g["first_nz"] = jnp.where(hit, nz, g["first_nz"])
                g["first_t"] = jnp.where(hit, t, g["first_t"])

            specular = noise(k0, q) < specularity

            # specular reflection
            ddn = _dot3(nx, ny, nz, g["rdx"], g["rdy"], g["rdz"])
            rfx, rfy, rfz = _norm_div3(
                g["rdx"] - 2.0 * ddn * nx,
                g["rdy"] - 2.0 * ddn * ny,
                g["rdz"] - 2.0 * ddn * nz,
            )
            g["spec_dot"] = _dot3(rfx, rfy, rfz, nx, ny, nz)

            # sun next-event estimation
            rdax = noise(k0 + 1, q)
            rday = noise(k0 + 2, q)
            rdaz = noise(k0 + 3, q)
            upx = rday * sdz - rdaz * sdy
            upy = rdaz * sdx - rdax * sdz
            upz = rdax * sdy - rday * sdx
            upx, upy, upz = _norm_div3(upx, upy, upz)
            rix = sdy * upz - sdz * upy
            riy = sdz * upx - sdx * upz
            riz = sdx * upy - sdy * upx
            rix, riy, riz = _norm_div3(rix, riy, riz)
            ddx = 2.0 * noise(k0 + 4, q) - 1.0
            ddy = 2.0 * noise(k0 + 5, q) - 1.0
            ldx = nsx + (ddx * rix + ddy * upx) * sun_size
            ldy = nsy + (ddx * riy + ddy * upy) * sun_size
            ldz = nsz + (ddx * riz + ddy * upz) * sun_size
            shx, shy, shz = _norm_div3(-ldx, -ldy, -ldz)
            sox = hx_pos + RAY_EPS * nx
            soy = hy_pos + RAY_EPS * ny
            soz = hz_pos + RAY_EPS * nz
            # NEE elision: when the sun is behind the surface the
            # contribution is cos_term-clamped to zero regardless of
            # occlusion, so the shadow traversal is skipped exactly
            # (voxels.comp:339-361 pays it unconditionally).
            cos_term = jnp.maximum(0.0, _dot3(nx, ny, nz, shx, shy, shz))
            g["s_ray"] = (
                (sox, soy, soz),
                (shx, shy, shz),
                hit & (~specular) & sun_on & (cos_term > 0.0),
            )

            # hemisphere sample
            phi = 2.0 * np.float32(np.pi) * noise(k0 + 6, q)
            hxs = 2.0 * noise(k0 + 7, q) - 1.0
            pr = jnp.sqrt(jnp.maximum(0.0, 1.0 - hxs * hxs))
            spx = hxs
            spy = pr * jnp.cos(phi)
            spz = pr * jnp.sin(phi)
            ndot = _dot3(nx, ny, nz, spx, spy, spz)
            flip = jnp.minimum(0.0, 2.0 * ndot)
            hmx = spx - nx * flip
            hmy = spy - ny * flip
            hmz = spz - nz * flip
            g["diff_dot"] = _dot3(nx, ny, nz, hmx, hmy, hmz)

            spec_sel = specular & hit
            diff_sel = (~specular) & hit
            g["ambient"] += (diff_sel & sun_on).astype(jnp.float32)

            # miss sky color (sun disk only on the primary ray) uses
            # the CURRENT ray direction
            if bounce == 0:
                base = jnp.maximum(
                    1e-38,
                    _dot3(g["rdx"], g["rdy"], g["rdz"], -nsx, -nsy, -nsz),
                )
                glow = jnp.exp(
                    jnp.log(base)
                    / jnp.maximum(sun_size * sun_size, 1e-12)
                )
                sky_c = (
                    sky[0] + sun_col[0] * glow,
                    sky[1] + sun_col[1] * glow,
                    sky[2] + sun_col[2] * glow,
                )
            else:
                sky_c = (zf + sky[0], zf + sky[1], zf + sky[2])

            # The occlusion-gated sun add waits for the paired shadow
            # traversal (shade_light) and multiplies THIS bounce's
            # pre-update blend — saved here so the blend update, miss
            # shading and next-ray selection can all complete now (the
            # sun add touches a disjoint lane set from the miss add,
            # so the deferred ordering is bit-identical).
            g["lt_diff"] = diff_sel
            g["lt_ct"] = cos_term
            g["lt_col"] = (col_r, col_g, col_b)
            g["lt_blend"] = (g["blend_r"], g["blend_g"], g["blend_b"])

            bf_spec = 2.0 * g["spec_dot"]
            dd = g["diff_dot"]
            g["blend_r"] = jnp.where(
                spec_sel,
                g["blend_r"] * col_r * bf_spec,
                jnp.where(diff_sel, g["blend_r"] * col_r * dd, g["blend_r"]),
            )
            g["blend_g"] = jnp.where(
                spec_sel,
                g["blend_g"] * col_g * bf_spec,
                jnp.where(diff_sel, g["blend_g"] * col_g * dd, g["blend_g"]),
            )
            g["blend_b"] = jnp.where(
                spec_sel,
                g["blend_b"] * col_b * bf_spec,
                jnp.where(diff_sel, g["blend_b"] * col_b * dd, g["blend_b"]),
            )

            miss = (g["alive"] == 1) & (~hit)
            g["sample_r"] += jnp.where(miss, sky_c[0] * g["blend_r"], 0.0)
            g["sample_g"] += jnp.where(miss, sky_c[1] * g["blend_g"], 0.0)
            g["sample_b"] += jnp.where(miss, sky_c[2] * g["blend_b"], 0.0)

            g["alive"] = g["alive"] * hit.astype(jnp.int32)

            # next ray
            g["rdx"] = jnp.where(
                spec_sel, rfx, jnp.where(diff_sel, hmx, g["rdx"])
            )
            g["rdy"] = jnp.where(
                spec_sel, rfy, jnp.where(diff_sel, hmy, g["rdy"])
            )
            g["rdz"] = jnp.where(
                spec_sel, rfz, jnp.where(diff_sel, hmz, g["rdz"])
            )
            g["rox"] = jnp.where(hit, sox, g["rox"])
            g["roy"] = jnp.where(hit, soy, g["roy"])
            g["roz"] = jnp.where(hit, soz, g["roz"])

        def shade_light(g, obst_i):
            """Deferred occlusion-gated sun add for the bounce whose
            shadow rays just resolved (all other shading completed at
            shade_hit time against the saved pre-update blend)."""
            sun_gate = g["lt_diff"] & (obst_i == 0) & sun_on
            ct = g["lt_ct"]
            cr, cg, cb = g["lt_col"]
            br, bg, bb = g["lt_blend"]
            g["sample_r"] += jnp.where(
                sun_gate, sun_col[0] * cr * br * ct, 0.0
            )
            g["sample_g"] += jnp.where(
                sun_gate, sun_col[1] * cg * bg * ct, 0.0
            )
            g["sample_b"] += jnp.where(
                sun_gate, sun_col[2] * cb * bb * ct, 0.0
            )

        for bounce in range(max_bounces):
            brays = [
                (
                    (g["rox"], g["roy"], g["roz"]),
                    (g["rdx"], g["rdy"], g["rdz"]),
                    g["alive"] == 1,
                )
                for g in G
            ]
            sc_b = bool(scramble & 1) and bounce >= 1
            if merge_shadow and bounce > 0:
                count_rays([g["s_ray"] for g in G] + brays)
                # the previous bounce's shadow rays ride this march as
                # extra queue entries: 4 while loops/frame instead of
                # 6, and 2x the rays per lane to average the
                # divergence tail over
                res_all, it_b = traverse_qn(
                    table_ref, meta_ref, brick_ref,
                    scram_rays(
                        [g["s_ray"] for g in G] + brays, sc_b
                    ),
                    fine_dma=fine_dma,
                )
                res_all = unscram_results(res_all, sc_b)
                iter_counts.append(it_b)
                for g, sres in zip(G, res_all[: len(G)]):
                    shade_light(g, sres[0])
                results = res_all[len(G) :]
            else:
                count_rays(brays)
                results, it_b = traverse_qn(
                    table_ref, meta_ref, brick_ref,
                    scram_rays(brays, sc_b),
                    fine_dma=fine_dma,
                    live_floor=(
                        knobs.live_floor_b if bounce >= 1 else 0
                    ),
                )
                results = unscram_results(results, sc_b)
                iter_counts.append(it_b)
            for g, res in zip(G, results):
                shade_hit(g, res, bounce)
            if not merge_shadow:
                sc_s = bool(scramble & (1 if bounce >= 1 else 2))
                count_rays([g["s_ray"] for g in G])
                sresults, it_s = traverse_qn(
                    table_ref, meta_ref, brick_ref,
                    scram_rays([g["s_ray"] for g in G], sc_s),
                    fine_dma=fine_dma,
                    live_floor=(
                        knobs.live_floor_s if bounce >= 1 else 0
                    ),
                )
                sresults = unscram_results(sresults, sc_s)
                iter_counts.append(it_s)
                for g, sres in zip(G, sresults):
                    shade_light(g, sres[0])

        if merge_shadow:
            # the last bounce's shadow rays get their own (final) phase
            sc_s = bool(scramble & 1)
            count_rays([g["s_ray"] for g in G])
            sresults, it_s = traverse_qn(
                table_ref, meta_ref, brick_ref,
                scram_rays([g["s_ray"] for g in G], sc_s),
                fine_dma=fine_dma,
            )
            sresults = unscram_results(sresults, sc_s)
            iter_counts.append(it_s)
            for g, sres in zip(G, sresults):
                shade_light(g, sres[0])

        for q in range(q_blocks):
            g = G[q]
            rr, cc = divmod(q, q_cols)
            rs = slice(rr * tile_h, (rr + 1) * tile_h)
            sl = slice(cc * TILE_W, (cc + 1) * TILE_W)
            color_r_ref[rs, sl] = g["sample_r"] / g["ambient"]
            color_g_ref[rs, sl] = g["sample_g"] / g["ambient"]
            color_b_ref[rs, sl] = g["sample_b"] / g["ambient"]
            normal_x_ref[rs, sl] = g["first_nx"]
            normal_y_ref[rs, sl] = g["first_ny"]
            normal_z_ref[rs, sl] = g["first_nz"]
            depth_ref[rs, sl] = g["first_t"]
            nodeid_ref[rs, sl] = g["first_node"]
            emiss_first = (g["first_node"] & EMISSIVE_BIT) != 0
            fr, fg, fb = node_rgb(g["first_node"])
            albedo_r_ref[rs, sl] = jnp.where(emiss_first, 1.0, fr)
            albedo_g_ref[rs, sl] = jnp.where(emiss_first, 1.0, fg)
            albedo_b_ref[rs, sl] = jnp.where(emiss_first, 1.0, fb)

        # per-phase counters at lane (0, 6*c + k) of the group-0 block:
        # phase k = [b0, s0, b1, s1, b2, s2] pairs, counter c: 0 outer
        # iters, 1 meta rounds, 2 brick rounds, 3 fine-resolve rounds,
        # 4 live-lane integral (each counts BOTH pixel groups' rays);
        # with knobs.decay_stats, c = 5..9 are the live-decay quantile
        # crossings (trips with >= 3/4, 1/2, 1/4, 1/8, 1/32 lanes live)
        dbg = zf
        for k, counters in enumerate(iter_counts):
            for c, ctr in enumerate(counters):
                dbg = jnp.where(
                    (fy == 0.0) & (fx == float(6 * c + k)),
                    ctr.astype(jnp.float32),
                    dbg,
                )
        # c = 10: rays traced per phase (exact mask sums; includes the
        # block-grid padding lanes — they are real traced work)
        for k, rc in enumerate(ray_counts):
            dbg = jnp.where(
                (fy == 0.0) & (fx == float(6 * 10 + k)),
                rc.astype(jnp.float32),
                dbg,
            )
        debug_ref[:tile_h, :TILE_W] = dbg
        for q in range(1, q_blocks):
            rr, cc = divmod(q, q_cols)
            debug_ref[
                rr * tile_h : (rr + 1) * tile_h,
                cc * TILE_W : (cc + 1) * TILE_W,
            ] = zf

    return kernel


def _pad_to(x, m):
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims", "zw", "origin", "n_rows", "l3_dims", "m_rows",
        "b_rows", "height", "width", "interpret", "max_bounces",
        "fine_in_hbm", "max_ray_steps", "knobs", "row_stride",
    ),
)
def render_sample(
    packed_idx: jnp.ndarray,  # (n_rows, 128) int32
    meta_idx: jnp.ndarray,  # (m_rows, 128) int32
    brick_idx: jnp.ndarray,  # (2|3, b_rows, 128) int32 (see _pack_nodes)
    palette: jnp.ndarray,  # (8, 128) int32
    params_vec: jnp.ndarray,  # (1, PARAMS_LEN) f32, or (4, 128)
    #   unified kernel-param rows (trace fields in row 0)
    noise_q: jnp.ndarray,  # (24, P, P, TILE_H, TILE_W) f32, noise_quads()
    *,
    dims: Tuple[int, int, int],
    zw: int,
    origin: Tuple[int, int, int],
    n_rows: int,
    l3_dims: Tuple[int, int, int],
    m_rows: int,
    b_rows: int,
    height: int,
    width: int,
    interpret: bool = False,
    max_bounces: int = MAX_BOUNCES,
    fine_in_hbm: bool = False,
    max_ray_steps: int = None,
    knobs: TraceKnobs = None,
    row_stride: int = 1,  # cyclic block-row decomposition: local
    #   block-row bi renders global block-row bi*row_stride + the
    #   chip offset carried by params slot 30 (in pixels) — the
    #   row-sharded mesh's work-skew balancer (single chip: 1)
) -> Dict[str, jnp.ndarray]:
    """Trace one sample with the Pallas kernel; same output dict as
    :func:`voxtracer.ops.trace_xla.render_sample` except PLANAR:
    color/normal/albedo are (3, H, W) plane stacks (the XLA twin is
    channels-last (H, W, 3) — transpose at the boundary to compare).
    ``noise_q`` is the tiny periodic quad table from
    :func:`noise_quads` — no full-image noise planes exist anywhere.
    The lane-tile height is DERIVED from the quad shape (axis 3), so
    callers pick it once, at noise_quads time (pick_tile).  ``knobs``
    (default :func:`pick_knobs`) is a static argument, so every perf
    knob is part of the jit cache key."""
    if knobs is None:
        knobs = pick_knobs(height, width)
    tile_h = int(noise_q.shape[3])
    block = BLOCK_OF[tile_h]
    # q_rows block-rows per program (height padding must stay small:
    # a full wasted block-row is real traced work)
    q_rows = 1
    for cand in range(1, knobs.q_rows + 1):
        if _pad_to(height, cand * block) <= _pad_to(height, block) + block:
            q_rows = cand
    hp = _pad_to(height, q_rows * block)
    nbx0 = _pad_to(width, block) // block
    # Queue-depth cap: knobs.q_blocks is authoritative (the wide-image
    # ~20-block policy lives in pick_knobs, where default knobs are
    # chosen — an explicit probe config is never silently clamped).
    cap = knobs.q_blocks
    # largest column count <= the cap whose width padding stays small
    q = 1
    for cand in range(1, min(cap, nbx0) + 1):
        if -(-nbx0 // cand) * cand <= nbx0 + max(1, nbx0 // 16):
            q = cand
    wp = _pad_to(width, q * block)
    nby, nbx = hp // block, wp // block
    P = 128 // block

    grid = (nby // q_rows, nbx // q)
    # brick table layout is content-addressed dedup (3 parallel tables:
    # mask lo / mask hi / uniform slot) vs per-node (2 tables) — the
    # mode is carried by the leading axis (scene/grid.py _pack_nodes)
    brick_dedup = int(brick_idx.shape[0]) == 3
    kernel = _make_kernel(
        dims, zw, origin, n_rows, l3_dims, m_rows, b_rows,
        max_bounces=max_bounces, fine_in_hbm=fine_in_hbm,
        nbx2=nbx // 2, q_cols=q, q_rows=q_rows,
        brick_dedup=brick_dedup, tile_h=tile_h,
        max_ray_steps=max_ray_steps, knobs=knobs,
        row_stride=row_stride,
    )

    plane = jax.ShapeDtypeStruct((nby * tile_h, nbx * TILE_W), jnp.float32)
    iplane = jax.ShapeDtypeStruct((nby * tile_h, nbx * TILE_W), jnp.int32)
    # each program writes a (q_rows*tile_h, q*TILE_W) rectangle:
    # q_rows*q pixel groups
    tile_spec = pl.BlockSpec(
        (q_rows * tile_h, q * TILE_W), lambda i, j: (i, j),
        memory_space=pltpu.VMEM,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    fine_spec = (
        pl.BlockSpec(memory_space=pl.ANY)
        if fine_in_hbm
        else full((n_rows, 128))
    )
    scratch_shapes = (
        [
            pltpu.VMEM((min(knobs.fine_win, n_rows), 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ]
        if fine_in_hbm
        else []
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            plane, plane, plane,  # color rgb
            plane, plane, plane,  # normal xyz
            plane,  # depth
            iplane,  # node
            plane, plane, plane,  # albedo rgb
            plane,  # debug (per-traversal iteration counts)
        ),
        in_specs=[
            # (1, PARAMS_LEN) legacy vector, or the frame's unified
            # (4, 128) kernel-param rows with the trace fields in row
            # 0 (engine/params.pack_kernel_rows) — the kernel reads
            # row 0 either way
            pl.BlockSpec(
                tuple(int(d) for d in params_vec.shape),
                lambda i, j: (0, 0),
                memory_space=pltpu.SMEM,
            ),
            fine_spec,
            full((m_rows, 128)),
            full(tuple(int(d) for d in brick_idx.shape)),
            full((8, 128)),
            pl.BlockSpec(
                # group q reads (block row % P, block col % P) of the
                # P x P parity quads; with one block-row per program
                # the y-parity is static per program, so only that
                # slab ships (the full table rides along when a
                # program spans several block-rows)
                (24, 1 if q_rows == 1 else P, P, tile_h, TILE_W),
                (lambda i, j: (0, (i * row_stride) % P, 0, 0, 0))
                if q_rows == 1
                else (lambda i, j: (0, 0, 0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=tuple([tile_spec] * 12),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(params_vec, packed_idx, meta_idx, brick_idx, palette, noise_q)

    (cr, cg, cb, nx, ny, nz, depth, node, ar, ag, ab, dbg) = outs

    def crop(a):
        # invert the square-block lane layout back to image space
        if knobs.farpair:
            # program j wrote pixel blocks (j, j+nbx/2) into the
            # adjacent block-column pair (2j, 2j+1): un-interleave
            b = a.reshape(nby, tile_h, nbx // 2, 2, TILE_W)
            a = jnp.concatenate(
                [b[:, :, :, 0, :], b[:, :, :, 1, :]], axis=2
            ).reshape(nby * tile_h, nbx * TILE_W)
        img = (
            a.reshape(nby, tile_h, nbx, TILE_W)
            .transpose(0, 2, 1, 3)  # (i, j, r, c)
            .reshape(nby, nbx, block, block)  # lane -> (y, x)
            .transpose(0, 2, 1, 3)  # (i, y, j, x)
            .reshape(hp, wp)
        )
        return img[:height, :width]

    return {
        # PLANAR (3, H, W) stacks: every downstream Pallas stage
        # (temporal, denoise) consumes per-channel planes, and XLA
        # materializes a planar concat as one contiguous write —
        # channels-last (H, W, 3) stacks forced a per-channel
        # slice-start copy (~0.4 ms each at 4K) at every kernel
        # boundary just to get the planes back.
        "color": jnp.stack([crop(cr), crop(cg), crop(cb)], axis=0),
        "normal": jnp.stack([crop(nx), crop(ny), crop(nz)], axis=0),
        "depth": crop(depth),
        "albedo": jnp.stack([crop(ar), crop(ag), crop(ab)], axis=0),
        "node": crop(node),
        # per-program counters at lane (0, 6*c + k) of the group-0
        # half-block, phase k = paired [b0, s0, b1, s1, b2, s2],
        # counter c: 0 outer iters, 1 meta serve rounds, 2 brick serve
        # rounds, 3 fine-resolve serve rounds, 4 live-lane integral,
        # 5-9 live-decay quantile crossings (knobs.decay_stats only),
        # 10 rays traced (exact mask sums, incl. padding lanes)
        "debug_iters": dbg[:: q_rows * tile_h, :].reshape(
            nby // q_rows, nbx // q, q * TILE_W
        )[..., :66].reshape(
            (nby // q_rows) * (nbx // q), -1
        ),
    }
