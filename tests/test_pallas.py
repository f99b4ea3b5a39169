"""Pallas trace kernel vs oracle, in interpreter mode on CPU.

The real-hardware run of the same comparison lives in the bench/verify
flow; this keeps kernel-logic regressions visible in the CPU suite.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from voxtracer.engine.camera import Camera
from voxtracer.engine.params import RenderParams
from voxtracer.ops import noise as noise_op
from voxtracer.ops import trace_pallas
from voxtracer.oracle import renderer as oracle
from voxtracer.scene import GridScene, VoxelList


def _compare(scene, cam, w=128, h=64, seed=7, tile_h=None, **trace_kw):
    params = RenderParams()
    right, up, forward = cam.axis_scaled(w, h)
    buf = noise_op.white_noise_buffer(seed=seed, count=32)
    planes = noise_op.noise_planes(buf, 1, h, w)

    o = oracle.render_sample(
        scene.values,
        scene.origin.astype(np.int64),
        np.asarray(cam.position),
        right,
        up,
        forward,
        params,
        planes,
        w,
        h,
    )

    t = scene.device_tables()
    cam_arr = np.stack([cam.position, right, up, forward]).astype(np.float32)
    pvec = trace_pallas.pack_params(cam_arr, params)
    nq = trace_pallas.noise_quads(
        jnp.asarray(buf), jnp.int32(1), tile_h=tile_h
    )
    x = trace_pallas.render_sample(
        jnp.asarray(t["packed_idx"]),
        jnp.asarray(t["meta_idx"]),
        jnp.asarray(t["brick_idx"]),
        jnp.asarray(t["palette"]),
        jnp.asarray(pvec),
        nq,
        dims=scene.values.shape,
        zw=t["zw"],
        origin=tuple(int(v) for v in scene.origin),
        n_rows=t["packed_idx"].shape[0],
        l3_dims=t["l3_dims"],
        m_rows=t["meta_idx"].shape[0],
        b_rows=t["brick_idx"].shape[1],
        height=h,
        width=w,
        interpret=True,
        **trace_kw,
    )
    from tests.conftest import gbuf_hwc

    x = gbuf_hwc(x)

    agree = o["node"] == x["node"]
    assert (o["depth"] >= 0).any(), "degenerate case: no hits at all"
    assert agree.mean() > 0.999, f"node agreement {agree.mean()}"
    hit = (o["depth"] >= 0) & agree
    np.testing.assert_allclose(
        x["depth"][hit], o["depth"][hit], rtol=1e-5, atol=1e-5
    )
    err = np.abs(x["color"] - o["color"]).max(axis=-1)
    assert (err[agree] < 1e-3).mean() > 0.995
    assert (o["normal"][agree] == x["normal"][agree]).mean() > 0.999
    return t


@pytest.mark.slow
def test_pallas_interpret_matches_oracle():
    """Kernel-vs-oracle parity at a reduced 64x32 (one pixel block: a
    single lane-queue entry, the smallest shape that still walks every
    phase's serve/queue machinery — ~34 s interpreted, so slow-tier;
    run it directly when iterating on the trace kernel).  Other slow
    cases re-cover full/odd shapes (full-tile 128x128, row rectangles,
    padded widths).  The dev tier keeps the kernel's building blocks
    exact (test_serve, temporal/denoise interpret parity) and the
    whole-frame math via the XLA twin (test_render_parity)."""
    vl = VoxelList(
        pos=np.array(
            [[0, 0, 0], [2, 1, 0], [1, 0, 3], [-2, 1, 1]], dtype=np.int16
        ),
        mrgb=np.array(
            [
                [0, 200, 100, 50],
                [0x40, 255, 10, 10],
                [0, 10, 255, 10],
                [0, 90, 90, 240],
            ],
            dtype=np.uint8,
        ),
    )
    scene = GridScene.from_voxels(vl)
    cam = Camera(position=np.array([0.3, 0.2, -1.5]))
    _compare(scene, cam, w=64, h=32)


@pytest.mark.slow
def test_ray_counters_exact():
    """The kernel's per-phase ray counters (debug c=10) are exact:
    b0 = all padded lanes, b1 = primary hit count, shadow phases are
    NEE-elided subsets — the Mrays/s numerator for the roofline."""
    from voxtracer.app.phasestats import phase_stats, render_one_sample
    from voxtracer.engine.camera import Camera
    from voxtracer.scene import default_scene

    scene = GridScene.from_voxels(default_scene(radius=4, seed=3))
    cam = Camera(
        position=np.array([0.0, 2.0, -8.0]),
        direction=np.array([0.0, -0.3, 1.0]),
    )
    h, w = 64, 128
    rows = {
        r["phase"]: r for r in phase_stats(scene, cam, h, w,
                                           interpret=True)
    }
    out = render_one_sample(scene, cam, h, w, interpret=True)
    hits0 = int((np.asarray(out["depth"]) >= 0).sum())
    assert rows["b0"]["rays"] == h * w  # no padding at this shape
    assert rows["b1"]["rays"] == hits0  # every primary hit bounces
    assert 0 < rows["s0"]["rays"] <= hits0  # NEE-elided subset
    assert rows["s1"]["rays"] <= rows["b1"]["rays"]
    assert rows["b2"]["rays"] <= rows["b1"]["rays"]


@pytest.mark.slow
def test_pallas_full_tile_matches_oracle():
    """The (128, 128) lane tile (the VOX_TILE_H=128 probe layout; one
    pixel block spans the whole noise quad, P == 1) must agree with
    the oracle exactly like the default (32, 128) tile."""
    vl = VoxelList(
        pos=np.array(
            [[0, 0, 0], [2, 1, 0], [1, 0, 3], [-2, 1, 1]], dtype=np.int16
        ),
        mrgb=np.array(
            [
                [0, 200, 100, 50],
                [0x40, 255, 10, 10],
                [0, 10, 255, 10],
                [0, 90, 90, 240],
            ],
            dtype=np.uint8,
        ),
    )
    scene = GridScene.from_voxels(vl)
    cam = Camera(position=np.array([0.3, 0.2, -1.5]))
    _compare(scene, cam, w=128, h=128, tile_h=128)


@pytest.mark.slow
def test_pallas_row_rectangle_matches_oracle():
    """Cross-row ray queues (q_rows > 1): each program owns a
    2 x c RECTANGLE of pixel blocks, queueing both block-rows' rays in
    one lane queue.  Must agree with the oracle exactly like the
    default one-row layout (covers the (block row % P) noise parity
    and the rectangular output writes).  Knobs are a static jit
    argument, so the 2-row layout gets its own cache entry — no
    clear_cache hacks."""
    vl = VoxelList(
        pos=np.array(
            [[0, 0, 0], [2, 1, 0], [1, 0, 3], [-2, 1, 1]], dtype=np.int16
        ),
        mrgb=np.array(
            [
                [0, 200, 100, 50],
                [0x40, 255, 10, 10],
                [0, 10, 255, 10],
                [0, 90, 90, 240],
            ],
            dtype=np.uint8,
        ),
    )
    scene = GridScene.from_voxels(vl)
    cam = Camera(position=np.array([0.3, 0.2, -1.5]))
    _compare(
        scene, cam, w=128, h=128,
        knobs=trace_pallas.DEFAULT_KNOBS.replace(q_rows=2),
    )


@pytest.mark.slow
def test_pallas_scramble_is_bit_exact():
    """The divergent-phase lane decorrelation (knobs.scramble — a
    static per-queue-entry sublane roll + lane XOR applied to the ray
    planes going into the march and inverted on the results) is a pure
    permutation: every output plane must be BIT-identical to the
    unscrambled kernel.  Width 256 gives a 4-deep queue so entries
    1-3 actually permute (entry 0 is the identity)."""
    vl = VoxelList(
        pos=np.array(
            [[0, 0, 0], [2, 1, 0], [1, 0, 3], [-2, 1, 1]], dtype=np.int16
        ),
        mrgb=np.array(
            [
                [0, 200, 100, 50],
                [0x40, 255, 10, 10],
                [0, 10, 255, 10],
                [0, 90, 90, 240],
            ],
            dtype=np.uint8,
        ),
    )
    scene = GridScene.from_voxels(vl)
    cam = Camera(position=np.array([0.3, 0.2, -1.5]))
    params = RenderParams()
    w, h = 256, 64
    right, up, forward = cam.axis_scaled(w, h)
    buf = noise_op.white_noise_buffer(seed=7, count=32)
    t = scene.device_tables()
    cam_arr = np.stack([cam.position, right, up, forward]).astype(np.float32)
    pvec = trace_pallas.pack_params(cam_arr, params)
    nq = trace_pallas.noise_quads(jnp.asarray(buf), jnp.int32(1))

    def run(knobs):
        out = trace_pallas.render_sample(
            jnp.asarray(t["packed_idx"]),
            jnp.asarray(t["meta_idx"]),
            jnp.asarray(t["brick_idx"]),
            jnp.asarray(t["palette"]),
            jnp.asarray(pvec),
            nq,
            dims=scene.values.shape,
            zw=t["zw"],
            origin=tuple(int(v) for v in scene.origin),
            n_rows=t["packed_idx"].shape[0],
            l3_dims=t["l3_dims"],
            m_rows=t["meta_idx"].shape[0],
            b_rows=t["brick_idx"].shape[1],
            height=h,
            width=w,
            interpret=True,
            knobs=knobs,
        )
        from tests.conftest import gbuf_hwc

        return gbuf_hwc(out)

    base = run(trace_pallas.DEFAULT_KNOBS.replace(scramble=0))
    for mode in (1, 3):
        scr = run(trace_pallas.DEFAULT_KNOBS.replace(scramble=mode))
        for k in ("color", "normal", "depth", "node", "albedo"):
            np.testing.assert_array_equal(
                scr[k], base[k], err_msg=f"scramble={mode} {k}"
            )


@pytest.mark.slow
def test_pallas_dualq_is_bit_exact():
    """Dual-queue-group software pipelining (knobs.dualq — the queue
    split into two interleaved groups with paired serve pre-passes,
    traverse_q2g) only changes instruction scheduling: the discrete
    planes (node/albedo) and the accumulated color/normal must be
    BIT-identical to the single-queue kernel.  Depth is allowed 1 ulp:
    restructuring the phase graphs changes XLA's FMA-contraction
    choices in the primary ray's t chain (measured: same 31/8192
    pixels at <=2.4e-7 relative on BOTH CPU-interpret and TPU — a
    whole-graph recompilation artifact, not a dual-scheduling value
    change; same caveat class as the scramble knob's hardware note).
    Width 256 gives a 4-deep queue, the smallest that activates the
    dual path (two entries per group, so the swap/bank machinery runs
    in both groups)."""
    vl = VoxelList(
        pos=np.array(
            [[0, 0, 0], [2, 1, 0], [1, 0, 3], [-2, 1, 1]], dtype=np.int16
        ),
        mrgb=np.array(
            [
                [0, 200, 100, 50],
                [0x40, 255, 10, 10],
                [0, 10, 255, 10],
                [0, 90, 90, 240],
            ],
            dtype=np.uint8,
        ),
    )
    scene = GridScene.from_voxels(vl)
    cam = Camera(position=np.array([0.3, 0.2, -1.5]))
    params = RenderParams()
    w, h = 256, 32
    right, up, forward = cam.axis_scaled(w, h)
    buf = noise_op.white_noise_buffer(seed=7, count=32)
    t = scene.device_tables()
    cam_arr = np.stack([cam.position, right, up, forward]).astype(np.float32)
    pvec = trace_pallas.pack_params(cam_arr, params)
    nq = trace_pallas.noise_quads(jnp.asarray(buf), jnp.int32(1))

    def run(knobs):
        out = trace_pallas.render_sample(
            jnp.asarray(t["packed_idx"]),
            jnp.asarray(t["meta_idx"]),
            jnp.asarray(t["brick_idx"]),
            jnp.asarray(t["palette"]),
            jnp.asarray(pvec),
            nq,
            dims=scene.values.shape,
            zw=t["zw"],
            origin=tuple(int(v) for v in scene.origin),
            n_rows=t["packed_idx"].shape[0],
            l3_dims=t["l3_dims"],
            m_rows=t["meta_idx"].shape[0],
            b_rows=t["brick_idx"].shape[1],
            height=h,
            width=w,
            interpret=True,
            knobs=knobs,
        )
        from tests.conftest import gbuf_hwc

        return gbuf_hwc(out)

    base = run(trace_pallas.DEFAULT_KNOBS.replace(dualq=0))
    dual = run(trace_pallas.DEFAULT_KNOBS.replace(dualq=1))
    for k in ("color", "normal", "node", "albedo"):
        np.testing.assert_array_equal(
            dual[k], base[k], err_msg=f"dualq {k}"
        )
    # depth: 1 ulp from graph-level FMA contraction (see docstring)
    np.testing.assert_allclose(
        dual["depth"], base["depth"], rtol=3e-7, atol=0,
        err_msg="dualq depth",
    )


@pytest.mark.slow
def test_pallas_legacy_brick_tables_match_oracle(monkeypatch):
    """Scenes with more unique (mask, slot) bricks than
    BRICK_DEDUP_MAX keep per-node (2, rows, 128) brick tables with the
    laddered cached serve; forcing the threshold to 0 must change
    nothing observable."""
    from voxtracer.scene import grid as grid_mod

    monkeypatch.setattr(grid_mod, "BRICK_DEDUP_MAX", 0)
    vl = VoxelList(
        pos=np.array(
            [[0, 0, 0], [2, 1, 0], [1, 0, 3], [-2, 1, 1]], dtype=np.int16
        ),
        mrgb=np.array(
            [
                [0, 200, 100, 50],
                [0x40, 255, 10, 10],
                [0, 10, 255, 10],
                [0, 90, 90, 240],
            ],
            dtype=np.uint8,
        ),
    )
    scene = GridScene.from_voxels(vl)
    t = _compare(scene, cam=Camera(position=np.array([0.3, 0.2, -1.5])))
    assert t["brick_idx"].shape[0] == 2  # per-node layout was exercised


@pytest.mark.slow
def test_pallas_hbm_fine_table_matches_oracle():
    """fine_in_hbm=True keeps the packed fine table out of VMEM and
    DMAs serve windows on demand (the no-cliff path for scenes beyond
    the VMEM budget, engine/pipeline.py); results must be identical.
    The multi-color single-node scene forces non-uniform hit resolves
    so the HBM serve loop actually runs."""
    vl = VoxelList(
        pos=np.array(
            [[0, 0, 0], [2, 1, 0], [1, 0, 3], [-2, 1, 1]], dtype=np.int16
        ),
        mrgb=np.array(
            [
                [0, 200, 100, 50],
                [0x40, 255, 10, 10],
                [0, 10, 255, 10],
                [0, 90, 90, 240],
            ],
            dtype=np.uint8,
        ),
    )
    scene = GridScene.from_voxels(vl)
    cam = Camera(position=np.array([0.3, 0.2, -1.5]))
    _compare(scene, cam, fine_in_hbm=True)


@pytest.mark.slow
def test_pallas_multi_program_pairing_geometry():
    """A 256-wide image spans TWO paired grid programs (4 pixel
    blocks): result placement across the block-pair unscramble must
    still match the oracle pixel-for-pixel."""
    rng = np.random.default_rng(21)
    n = 64
    pos = rng.integers(-20, 21, (n, 3)).astype(np.int16)
    mrgb = np.concatenate(
        [
            np.zeros((n, 1), np.uint8),
            rng.integers(30, 255, (n, 3)).astype(np.uint8),
        ],
        axis=1,
    )
    scene = GridScene.from_voxels(VoxelList(pos=pos, mrgb=mrgb))
    cam = Camera(
        position=np.array([1.0, 2.0, -30.0]),
        direction=np.array([-0.02, -0.05, 1.0]),
    )
    _compare(scene, cam, w=256, h=64, seed=13)


@pytest.mark.slow
def test_pallas_sparse_scene_distance_field_jumps():
    """Sparse 64^3-class scene: long empty runs force multi-block
    distance-field jumps (the old bitmap skipped one block at a time);
    hits must still match the oracle exactly."""
    rng = np.random.default_rng(11)
    n = 48
    pos = np.stack(
        [
            rng.integers(-30, 31, n),
            rng.integers(-30, 31, n),
            rng.integers(-30, 31, n),
        ],
        axis=1,
    ).astype(np.int16)
    mrgb = np.concatenate(
        [
            np.zeros((n, 1), np.uint8),
            rng.integers(30, 255, (n, 3)).astype(np.uint8),
        ],
        axis=1,
    )
    scene = GridScene.from_voxels(VoxelList(pos=pos, mrgb=mrgb))
    from voxtracer.scene.grid import DIST_CAP, _chebyshev_distance

    dist = _chebyshev_distance(scene.values != 0, cap=DIST_CAP)
    assert dist.max() >= 5, "scene must contain multi-cell jumps"
    cam = Camera(
        position=np.array([2.0, 3.0, -40.0]),
        direction=np.array([-0.05, -0.1, 1.0]),
    )
    _compare(scene, cam, seed=3)


@pytest.mark.slow
def test_pallas_qjump_short_init_chain_outside_camera():
    """Dead-entry jump chains + a short init chain must not strand
    queued live rays: with the camera far outside the scene AABB, a
    lane's leading queue entries can all be slab-misses (setup-dead
    while mask-live), so the pending-entry guard in the while cond is
    what keeps later live entries traced.  init_swaps=0 is the
    worst case (no pre-while advance at all); the image must still
    match the oracle exactly like the default chain does."""
    rng = np.random.default_rng(5)
    n = 40
    pos = np.stack(
        [
            rng.integers(-20, 21, n),
            rng.integers(-20, 21, n),
            rng.integers(-20, 21, n),
        ],
        axis=1,
    ).astype(np.int16)
    mrgb = np.concatenate(
        [
            np.zeros((n, 1), np.uint8),
            rng.integers(30, 255, (n, 3)).astype(np.uint8),
        ],
        axis=1,
    )
    scene = GridScene.from_voxels(VoxelList(pos=pos, mrgb=mrgb))
    cam = Camera(
        position=np.array([90.0, 75.0, -80.0]),
        direction=np.array([-0.55, -0.5, 1.0]),
    )
    _compare(
        scene,
        cam,
        seed=3,
        knobs=trace_pallas.DEFAULT_KNOBS.replace(init_swaps=0),
    )
