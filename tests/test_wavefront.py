"""Wavefront kernel parity: lax.scan harness vs NumPy oracle, and Pallas
(interpret mode) vs the scan harness."""

import numpy as np
import pytest

from masa_tpu.ops import oracle, strips
from masa_tpu.ops.wavefront import WavefrontConfig
from masa_tpu.types import INF, InitType, Recurrence, ScoreParams

P = ScoreParams()
CFG = WavefrontConfig(alpha=4, rs=1, chunk=256, track_best=True,
                      store_lastcol=True)


def canon(a):
    a = np.asarray(a, dtype=np.int64)
    return np.where(a <= -INF // 2, -INF, a)


def check_partition(s0, s1, cfg, rec, init_r, init_c, backend="scan",
                    first_row=None, first_col=None, special_every=0):
    import dataclasses

    res = strips.run_partition(
        dataclasses.replace(cfg, recurrence=rec),
        s0, s1, P, init_r, init_c,
        first_row=first_row, first_col=first_col,
        backend=backend, special_every=special_every,
    )
    ref = oracle.dp_rows(
        s0, s1, P, rec, init_r, init_c,
        first_row=first_row, first_col=first_col,
        special_rows=tuple(res.specials.keys()),
    )
    assert np.array_equal(canon(res.last_h), canon(ref.last_h)), "last H"
    assert np.array_equal(canon(res.last_f), canon(ref.last_f)), "last F"
    if cfg.store_lastcol:
        assert np.array_equal(canon(res.col_h), canon(ref.col_h)), "col H"
        assert np.array_equal(canon(res.col_e), canon(ref.col_e)), "col E"
    if rec == Recurrence.SMITH_WATERMAN and cfg.track_best:
        assert res.best == ref.best
        assert (res.best_i, res.best_j) == (ref.best_i, ref.best_j)
    for r, (sh, sf) in res.specials.items():
        eh, ef = ref.specials[r]
        assert np.array_equal(canon(sh), canon(eh[1:])), f"special H {r}"
        assert np.array_equal(canon(sf), canon(ef[1:])), f"special F {r}"
    return res


class TestScanVsOracle:
    def test_sw_multi_strip_with_partial(self, dna, homolog):
        # R=512: two full strips + a partial strip of 176 rows
        s0 = dna(1200, seed=21)
        s1 = homolog(s0, seed=22)
        check_partition(s0, s1, CFG, Recurrence.SMITH_WATERMAN,
                        InitType.WITH_ZEROES, InitType.WITH_ZEROES,
                        special_every=512)

    def test_sw_single_partial_strip(self, dna, homolog):
        s0 = dna(300, seed=23)
        s1 = homolog(s0, seed=24)
        check_partition(s0, s1, CFG, Recurrence.SMITH_WATERMAN,
                        InitType.WITH_ZEROES, InitType.WITH_ZEROES)

    def test_nw_gaps_init(self, dna, homolog):
        s0 = dna(700, seed=25)
        s1 = homolog(s0, seed=26)
        check_partition(s0, s1, CFG, Recurrence.NEEDLEMAN_WUNSCH,
                        InitType.WITH_GAPS, InitType.WITH_GAPS)

    def test_nw_gaps_opened(self, dna, homolog):
        s0 = dna(520, seed=27)
        s1 = homolog(s0, seed=28)
        check_partition(s0, s1, CFG, Recurrence.NEEDLEMAN_WUNSCH,
                        InitType.WITH_GAPS_OPENED, InitType.WITH_GAPS)

    def test_narrow_matrix(self, dna, homolog):
        # nj < lanes exercises the rampdown-overlapping-rampup path
        s0 = dna(600, seed=29)
        s1 = dna(70, seed=30)
        check_partition(s0, s1, CFG, Recurrence.SMITH_WATERMAN,
                        InitType.WITH_ZEROES, InitType.WITH_ZEROES)

    def test_custom_borders_glue(self, dna, homolog):
        """Kernel-computed bottom band glued onto an oracle top band must
        equal the monolithic oracle (the stage/multichip contract)."""
        from masa_tpu.models.scoring import border_cells

        s0 = dna(900, seed=31)
        s1 = homolog(s0, seed=32)
        mi = 300
        m = len(s0)
        full = oracle.dp_rows(
            s0, s1, P, Recurrence.NEEDLEMAN_WUNSCH,
            InitType.WITH_GAPS, InitType.WITH_GAPS,
        )
        top = oracle.dp_rows(
            s0[:mi], s1, P, Recurrence.NEEDLEMAN_WUNSCH,
            InitType.WITH_GAPS, InitType.WITH_GAPS,
        )
        colh, cole = border_cells(m - mi + 1, InitType.WITH_GAPS, P,
                                  start=mi)
        res = check_partition(
            s0[mi:], s1, CFG, Recurrence.NEEDLEMAN_WUNSCH,
            InitType.CUSTOM, InitType.CUSTOM,
            first_row=(top.last_h, top.last_f),
            first_col=(colh, cole),
        )
        assert np.array_equal(canon(res.last_h), canon(full.last_h))


class TestPallasInterpret:
    @pytest.mark.slow
    def test_sw_parity(self, dna, homolog):
        s0 = dna(600, seed=41)
        s1 = homolog(s0, seed=42)
        cfg = WavefrontConfig(alpha=4, rs=1, chunk=256, track_best=True,
                              store_lastcol=True, interpret=True)
        check_partition(s0, s1, cfg, Recurrence.SMITH_WATERMAN,
                        InitType.WITH_ZEROES, InitType.WITH_ZEROES,
                        backend="pallas")

    @pytest.mark.slow
    def test_nw_parity(self, dna, homolog):
        s0 = dna(530, seed=43)
        s1 = homolog(s0, seed=44)
        cfg = WavefrontConfig(alpha=4, rs=1, chunk=256, track_best=False,
                              store_lastcol=True, interpret=True,
                              recurrence=Recurrence.NEEDLEMAN_WUNSCH)
        check_partition(s0, s1, cfg, Recurrence.NEEDLEMAN_WUNSCH,
                        InitType.WITH_GAPS, InitType.WITH_GAPS,
                        backend="pallas")
