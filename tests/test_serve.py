"""Unit tests for the row-serve loops — the Pallas kernel's core
random-access primitive (trace_pallas module docstring).  Runs the
serve loops in interpreter mode against a direct numpy gather."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from voxtracer.ops import trace_pallas as tp

N_ROWS = 48


def _run_serve(table, waddr, need, win):
    def kernel(tab_ref, wa_ref, need_ref, out_ref, rounds_ref):
        wa = wa_ref[:]
        nd = need_ref[:] == 1
        zero = wa * 0
        word, cached, kf = tp._serve_loop(
            tab_ref, N_ROWS, wa, nd, zero, zero - 1, win=win
        )
        out_ref[:] = word
        rounds_ref[:] = zero + kf

    out, rounds = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((32, 128), jnp.int32),
            jax.ShapeDtypeStruct((32, 128), jnp.int32),
        ),
        interpret=True,
    )(
        jnp.asarray(table),
        jnp.asarray(waddr),
        jnp.asarray(need.astype(np.int32)),
    )
    return np.asarray(out), int(np.asarray(rounds)[0, 0])


def test_serve_loop_scattered_addresses_exact():
    rng = np.random.default_rng(0)
    table = rng.integers(0, 1 << 30, (N_ROWS, 128)).astype(np.int32)
    waddr = rng.integers(0, N_ROWS * 128, (32, 128)).astype(np.int32)
    need = rng.random((32, 128)) < 0.7
    out, rounds = _run_serve(table, waddr, need, win=16)
    ref = table.reshape(-1)[waddr]
    assert (out[need] == ref[need]).all()
    assert rounds <= -(-N_ROWS // 16) + 1

def test_serve_loop_coherent_addresses_zero_adaptive_rounds():
    """Coherent lanes (one shared row) must be fully served by the
    static ladder — zero adaptive straggler rounds — the property the
    whole serve-loop design banks on."""
    rng = np.random.default_rng(1)
    table = rng.integers(0, 1 << 30, (N_ROWS, 128)).astype(np.int32)
    row = 37
    waddr = (row * 128 + rng.integers(0, 128, (32, 128))).astype(np.int32)
    need = np.ones((32, 128), bool)
    out, rounds = _run_serve(table, waddr, need, win=16)
    ref = table.reshape(-1)[waddr]
    assert (out == ref).all()
    assert rounds == 0  # ladder window at r_min covers the shared row


def test_serve_dual_matches_two_single_serves():
    """The paired-prepass dual serve (_serve_dual — the dual-queue
    software-pipelining primitive) must return exactly what two
    independent _serve_loop calls return: the pairing changes WHEN
    the pre-pass reduces issue, never the served words."""
    rng = np.random.default_rng(3)
    table = rng.integers(0, 1 << 30, (N_ROWS, 128)).astype(np.int32)
    wa_a = rng.integers(0, N_ROWS * 128, (32, 128)).astype(np.int32)
    wa_b = rng.integers(0, N_ROWS * 128, (32, 128)).astype(np.int32)
    need_a = rng.random((32, 128)) < 0.6
    need_b = rng.random((32, 128)) < 0.4

    def kernel(tab_ref, wa_a_ref, wa_b_ref, na_ref, nb_ref,
               oa_ref, ob_ref, ra_ref, rb_ref):
        waa = wa_a_ref[:]
        wab = wa_b_ref[:]
        nda = na_ref[:] == 1
        ndb = nb_ref[:] == 1
        zero = waa * 0
        (wa, _, ka), (wb, _, kb) = tp._serve_dual(
            tab_ref, N_ROWS,
            (waa, nda, zero, zero - 1),
            (wab, ndb, zero, zero - 1),
            win=16,
        )
        oa_ref[:] = wa
        ob_ref[:] = wb
        ra_ref[:] = zero + ka
        rb_ref[:] = zero + kb

    oa, ob, ra, rb = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((32, 128), jnp.int32) for _ in range(4)
        ),
        interpret=True,
    )(
        jnp.asarray(table),
        jnp.asarray(wa_a),
        jnp.asarray(wa_b),
        jnp.asarray(need_a.astype(np.int32)),
        jnp.asarray(need_b.astype(np.int32)),
    )
    ref = table.reshape(-1)
    assert (np.asarray(oa)[need_a] == ref[wa_a][need_a]).all()
    assert (np.asarray(ob)[need_b] == ref[wa_b][need_b]).all()
    # round counts match what the single serve pays for each group
    _, rounds_a = _run_serve(table, wa_a, need_a, win=16)
    _, rounds_b = _run_serve(table, wa_b, need_b, win=16)
    assert int(np.asarray(ra)[0, 0]) == rounds_a
    assert int(np.asarray(rb)[0, 0]) == rounds_b


def test_serve_loop_pair_split_tables_exact():
    rng = np.random.default_rng(2)
    table2 = rng.integers(0, 1 << 30, (2, N_ROWS, 128)).astype(np.int32)
    waddr = rng.integers(0, N_ROWS * 128, (32, 128)).astype(np.int32)
    need = rng.random((32, 128)) < 0.5

    def kernel(tab_ref, wa_ref, need_ref, lo_ref, hi_ref):
        wa = wa_ref[:]
        nd = need_ref[:] == 1
        zero = wa * 0
        lo, hi, cached, kf = tp._serve_loop_pair(
            tab_ref, N_ROWS, wa, nd, zero, zero, zero - 1, win=16
        )
        lo_ref[:] = lo
        hi_ref[:] = hi

    lo, hi = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((32, 128), jnp.int32),
            jax.ShapeDtypeStruct((32, 128), jnp.int32),
        ),
        interpret=True,
    )(
        jnp.asarray(table2),
        jnp.asarray(waddr),
        jnp.asarray(need.astype(np.int32)),
    )
    lo, hi = np.asarray(lo), np.asarray(hi)
    ref_lo = table2[0].reshape(-1)[waddr]
    ref_hi = table2[1].reshape(-1)[waddr]
    assert (lo[need] == ref_lo[need]).all()
    assert (hi[need] == ref_hi[need]).all()
