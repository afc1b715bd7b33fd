"""Row-sweep engine parity vs the NumPy oracle: the one-pass Gotoh
cummax construction must reproduce the oracle's lazy-fixpoint DP
bit-for-bit — bus rows (H, F), chaining, height gating, best tracking,
and last-column outputs."""

import numpy as np
import pytest

from masa_tpu.models.scoring import border_cells
from masa_tpu.ops import oracle, rowsweep
from masa_tpu.ops import wavefront as wf
from masa_tpu.types import InitType, Recurrence, ScoreParams

P = ScoreParams()
NEG = -wf.INF

CODE = {InitType.WITH_ZEROES: 0, InitType.WITH_GAPS: 1,
        InitType.WITH_GAPS_OPENED: 2}


def run_sweep(s0, s1, rec, row_init, col_init, params=P,
              stop_after=None, track_best=False, want_lastcol=False):
    m, n = len(s0), len(s1)
    rh, _ = border_cells(n + 1, row_init, params)
    ch, _ = border_cells(m + 1, col_init, params)
    b_row = np.concatenate([[0], np.asarray(s1, np.int32)])
    row_f = np.full(n + 1, NEG, np.int64)
    import jax.numpy as jnp

    return rowsweep.sweep(
        jnp.asarray(np.asarray(s0, np.int32)),
        jnp.asarray(b_row),
        jnp.asarray(ch[1:].astype(np.int32)),
        jnp.full(m, NEG, jnp.int32),
        jnp.asarray(rh.astype(np.int64)),
        jnp.asarray(row_f),
        jnp.int32(stop_after if stop_after is not None else m),
        n1=n + 1, m_steps=m,
        sw=rec == Recurrence.SMITH_WATERMAN,
        go=params.gap_open, ge=params.gap_ext,
        match=params.match, mismatch=params.mismatch,
        track_best=track_best, want_lastcol=want_lastcol)


def canon(a):
    a = np.asarray(a, np.int64)
    return np.where(a <= -wf.INF // 2, -wf.INF, a)


@pytest.mark.parametrize("rec,row_init,col_init", [
    (Recurrence.SMITH_WATERMAN, InitType.WITH_ZEROES,
     InitType.WITH_ZEROES),
    (Recurrence.NEEDLEMAN_WUNSCH, InitType.WITH_GAPS,
     InitType.WITH_GAPS),
    (Recurrence.NEEDLEMAN_WUNSCH, InitType.WITH_GAPS_OPENED,
     InitType.WITH_GAPS),
    (Recurrence.NEEDLEMAN_WUNSCH, InitType.WITH_GAPS,
     InitType.WITH_GAPS_OPENED),
    (Recurrence.NEEDLEMAN_WUNSCH, InitType.WITH_ZEROES,
     InitType.WITH_ZEROES),
])
def test_last_row_parity(dna, homolog, rec, row_init, col_init):
    s0 = dna(173, seed=801)
    s1 = homolog(s0, seed=802)[:166]
    out = run_sweep(s0, s1, rec, row_init, col_init)
    ref = oracle.dp_rows(s0, s1, P, rec, row_init, col_init)
    np.testing.assert_array_equal(canon(out["h"]), canon(ref.last_h))
    np.testing.assert_array_equal(canon(out["f"]), canon(ref.last_f))


def test_nonuniform_params(dna, homolog):
    params = ScoreParams(match=3, mismatch=-2, gap_open=5, gap_ext=1)
    s0 = dna(90, seed=803)
    s1 = homolog(s0, seed=804)
    out = run_sweep(s0, s1, Recurrence.SMITH_WATERMAN,
                    InitType.WITH_ZEROES, InitType.WITH_ZEROES,
                    params=params)
    ref = oracle.dp_rows(s0, s1, params)
    np.testing.assert_array_equal(canon(out["h"]), canon(ref.last_h))
    np.testing.assert_array_equal(canon(out["f"]), canon(ref.last_f))


def test_stop_after_freezes(dna, homolog):
    """stop_after=k must return exactly the row-k bus."""
    s0 = dna(120, seed=805)
    s1 = homolog(s0, seed=806)
    out = run_sweep(s0, s1, Recurrence.NEEDLEMAN_WUNSCH,
                    InitType.WITH_GAPS, InitType.WITH_GAPS,
                    stop_after=70)
    ref = oracle.dp_rows(s0[:70], s1, P, Recurrence.NEEDLEMAN_WUNSCH,
                         InitType.WITH_GAPS, InitType.WITH_GAPS)
    np.testing.assert_array_equal(canon(out["h"]), canon(ref.last_h))
    np.testing.assert_array_equal(canon(out["f"]), canon(ref.last_f))


def test_chaining_equals_single(dna, homolog):
    """Two chained sweeps == one sweep (the bus contract)."""
    import jax.numpy as jnp

    s0 = dna(140, seed=807)
    s1 = homolog(s0, seed=808)
    m, n = len(s0), len(s1)
    whole = run_sweep(s0, s1, Recurrence.NEEDLEMAN_WUNSCH,
                      InitType.WITH_GAPS, InitType.WITH_GAPS)
    cut = 64
    first = run_sweep(s0[:cut], s1, Recurrence.NEEDLEMAN_WUNSCH,
                      InitType.WITH_GAPS, InitType.WITH_GAPS)
    ch, _ = border_cells(m + 1, InitType.WITH_GAPS, P)
    b_row = np.concatenate([[0], np.asarray(s1, np.int32)])
    second = rowsweep.sweep(
        jnp.asarray(np.asarray(s0[cut:], np.int32)),
        jnp.asarray(b_row),
        jnp.asarray(ch[cut + 1 :].astype(np.int32)),
        jnp.full(m - cut, NEG, jnp.int32),
        first["h"], first["f"],
        jnp.int32(m - cut),
        n1=n + 1, m_steps=m - cut, sw=False,
        go=P.gap_open, ge=P.gap_ext, match=P.match,
        mismatch=P.mismatch)
    np.testing.assert_array_equal(np.asarray(second["h"]),
                                  np.asarray(whole["h"]))
    np.testing.assert_array_equal(np.asarray(second["f"]),
                                  np.asarray(whole["f"]))


def test_best_and_lastcol(dna, homolog):
    s0 = dna(110, seed=809)
    s1 = homolog(s0, seed=810)
    out = run_sweep(s0, s1, Recurrence.SMITH_WATERMAN,
                    InitType.WITH_ZEROES, InitType.WITH_ZEROES,
                    track_best=True, want_lastcol=True)
    ref = oracle.dp_rows(s0, s1, P)
    v, i, j = (int(x) for x in np.asarray(out["best"]))
    assert (v, i, j) == (ref.best, ref.best_i, ref.best_j)
    np.testing.assert_array_equal(canon(out["lastcol_h"]),
                                  canon(ref.col_h[1:]))
    np.testing.assert_array_equal(canon(out["lastcol_e"]),
                                  canon(ref.col_e[1:]))


def test_batched_engine_mixed_heights(dna, homolog):
    """The vmapped device-view engine: per-element offsets and heights
    against dev-style padded sequences, exact vs the oracle."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    s0 = dna(600, seed=811)
    s1 = dna(500, seed=812)
    pad0 = np.full(800, wf.A_SENTINEL, np.int32)
    pad0[:600] = s0
    pad1 = np.full(700, wf.B_SENTINEL, np.int32)
    pad1[:500] = s1
    n1 = 129
    R = 96
    eng = rowsweep.batched_sweep_engine(
        n1, R, False, P.gap_open, P.gap_ext, P.match, P.mismatch)
    B = 4
    i0s = np.array([0, 50, 100, 13], np.int32)
    j0s = np.array([0, 64, 128, 7], np.int32)
    hs = np.array([96, 40, 0, 77], np.int32)
    codes = np.array([1, 1, 1, 2], np.int32)   # GAPS / GAPS_OPENED
    bus_h = np.zeros((B, n1 - 1), np.int32)
    bus_f = np.zeros((B, n1 - 1), np.int32)
    for k in range(B):
        rh, _ = border_cells(n1, InitType.WITH_GAPS, P)
        bus_h[k] = rh[1:]
        bus_f[k] = NEG
    got_h, got_f = eng(jnp.asarray(pad0), jnp.asarray(pad1),
                       jnp.asarray(i0s), jnp.asarray(j0s),
                       jnp.asarray(i0s * 0), jnp.asarray(codes),
                       jnp.asarray(bus_h), jnp.asarray(bus_f),
                       jnp.asarray(hs))
    got_h, got_f = np.asarray(got_h), np.asarray(got_f)
    for k in range(B):
        if hs[k] == 0:
            np.testing.assert_array_equal(got_h[k], bus_h[k])
            continue
        ci = (InitType.WITH_GAPS if codes[k] == 1
              else InitType.WITH_GAPS_OPENED)
        sub0 = np.asarray(pad0[i0s[k] : i0s[k] + hs[k]], np.uint8)
        sub1 = np.asarray(pad1[j0s[k] : j0s[k] + n1 - 1], np.uint8)
        # the entering bus was the synthesized GAPS row: equivalent to
        # row_init=WITH_GAPS
        ref = oracle.dp_rows(
            sub0, sub1, P, Recurrence.NEEDLEMAN_WUNSCH,
            InitType.WITH_GAPS, ci)
        np.testing.assert_array_equal(canon(got_h[k]),
                                      canon(ref.last_h[1:]))
        np.testing.assert_array_equal(canon(got_f[k]),
                                      canon(ref.last_f[1:]))
