"""Cross-checks between the two oracle implementations and hand-computed
alignments. These pin down the exactness contract every other component is
tested against."""

import numpy as np
import pytest

from masa_tpu.models.scoring import border_cells, encode_sequence, match_column
from masa_tpu.ops import oracle
from masa_tpu.types import (
    INF,
    InitType,
    MatchType,
    Recurrence,
    ScoreParams,
)

P = ScoreParams()


def canon(a):
    """Map 'effectively -inf' drift values to a single sentinel so the two
    oracle implementations can be compared exactly."""
    a = np.asarray(a, dtype=np.int64)
    return np.where(a <= -INF // 2, -INF, a)


def enc(s):
    return encode_sequence(s)


class TestEncoding:
    def test_uppercase(self):
        assert np.array_equal(enc("acgt"), enc("ACGT"))

    def test_n_matches_n(self):
        # raw byte compare: N == N scores as a match (CUDAligner.cu:280)
        r = oracle.dp_matrix(enc("N"), enc("N"), P)
        assert r.h[1, 1] == P.match


class TestBorders:
    def test_zeros(self):
        h, g = border_cells(5, InitType.WITH_ZEROES, P)
        assert list(h) == [0] * 5
        assert all(g == -INF)

    def test_gaps(self):
        h, _ = border_cells(5, InitType.WITH_GAPS, P)
        # H_0=0, H_k = -open - k*ext (IManager.hpp:124-127)
        assert list(h) == [0, -5, -7, -9, -11]

    def test_gaps_opened(self):
        h, _ = border_cells(5, InitType.WITH_GAPS_OPENED, P)
        assert list(h) == [0, -2, -4, -6, -8]

    def test_offset(self):
        h, _ = border_cells(3, InitType.WITH_GAPS, P, start=2)
        assert list(h) == [-7, -9, -11]


class TestHandScores:
    def test_perfect_match_nw(self):
        r = oracle.dp_matrix(
            enc("ACGT"), enc("ACGT"), P,
            Recurrence.NEEDLEMAN_WUNSCH,
            InitType.WITH_GAPS, InitType.WITH_GAPS,
        )
        assert r.h[4, 4] == 4

    def test_single_mismatch_nw(self):
        r = oracle.dp_matrix(
            enc("ACGT"), enc("AGGT"), P,
            Recurrence.NEEDLEMAN_WUNSCH,
            InitType.WITH_GAPS, InitType.WITH_GAPS,
        )
        assert r.h[4, 4] == 3 - 3

    def test_single_gap_nw(self):
        # ACGT vs ACT: one deletion, gap cost open+ext=5 -> 3*match-5 = -2
        r = oracle.dp_matrix(
            enc("ACGT"), enc("ACT"), P,
            Recurrence.NEEDLEMAN_WUNSCH,
            InitType.WITH_GAPS, InitType.WITH_GAPS,
        )
        assert r.h[4, 3] == -2

    def test_gap_run_affine(self):
        # gap of length 3 costs open + 3*ext = 9
        r = oracle.dp_matrix(
            enc("AAATTTAAA"), enc("AAAAAA"), P,
            Recurrence.NEEDLEMAN_WUNSCH,
            InitType.WITH_GAPS, InitType.WITH_GAPS,
        )
        assert r.h[9, 6] == 6 - 9

    def test_sw_local(self):
        r = oracle.dp_matrix(enc("TTTACGTTTT"), enc("GGACGTGG"), P)
        best, bi, bj = r.best()
        assert best == 4  # local ACGT
        assert (bi, bj) == (7, 6)

    def test_sw_nonnegative(self):
        r = oracle.dp_matrix(enc("AAAA"), enc("TTTT"), P)
        assert (r.h >= 0).all()


class TestRowsVsMatrix:
    @pytest.mark.parametrize("rec", [Recurrence.SMITH_WATERMAN,
                                     Recurrence.NEEDLEMAN_WUNSCH])
    @pytest.mark.parametrize("init", [InitType.WITH_ZEROES,
                                      InitType.WITH_GAPS,
                                      InitType.WITH_GAPS_OPENED])
    def test_parity(self, dna, homolog, rec, init):
        s0 = dna(97, seed=7)
        s1 = homolog(s0, seed=8)
        full = oracle.dp_matrix(s0, s1, P, rec, init, init)
        rows = oracle.dp_rows(
            s0, s1, P, rec, init, init, special_rows=(32, 64)
        )
        lh, lf = full.last_row
        assert np.array_equal(canon(rows.last_h), canon(lh))
        assert np.array_equal(canon(rows.last_f), canon(lf))
        ch, ce = full.last_col
        assert np.array_equal(canon(rows.col_h), canon(ch))
        assert np.array_equal(canon(rows.col_e), canon(ce))
        for r_idx, (sh, sf) in rows.specials.items():
            assert np.array_equal(canon(sh), canon(full.h[r_idx]))
            assert np.array_equal(canon(sf), canon(full.f[r_idx]))
        if rec == Recurrence.SMITH_WATERMAN:
            best, bi, bj = full.best()
            assert rows.best == best

    def test_custom_borders(self, dna, homolog):
        """Splitting the matrix into 4 quadrants glued by custom borders
        must reproduce the monolithic DP (the partition contract that all
        stages and the multi-chip slabs rely on)."""
        s0 = dna(80, seed=11)
        s1 = homolog(s0, seed=12)
        full = oracle.dp_matrix(
            s0, s1, P,
            Recurrence.NEEDLEMAN_WUNSCH,
            InitType.WITH_GAPS, InitType.WITH_GAPS,
        )
        mi, nj = 37, 41
        m, n = len(s0), len(s1)
        # top-left quadrant
        tl = oracle.dp_matrix(
            s0[:mi], s1[:nj], P, Recurrence.NEEDLEMAN_WUNSCH,
            InitType.WITH_GAPS, InitType.WITH_GAPS,
        )
        # top-right: first col = tl's last col (H,E), first row = gaps cont.
        tr = oracle.dp_matrix(
            s0[:mi], s1[nj:], P, Recurrence.NEEDLEMAN_WUNSCH,
            row_init=InitType.CUSTOM, col_init=InitType.CUSTOM,
            first_row=(full.h[0, nj:], full.f[0, nj:]),
            first_col=(tl.h[:, -1], tl.e[:, -1]),
        )
        # bottom-left
        bl = oracle.dp_matrix(
            s0[mi:], s1[:nj], P, Recurrence.NEEDLEMAN_WUNSCH,
            row_init=InitType.CUSTOM, col_init=InitType.CUSTOM,
            first_row=(tl.h[-1, :], tl.f[-1, :]),
            first_col=(full.h[mi:, 0], full.e[mi:, 0]),
        )
        # bottom-right
        br = oracle.dp_matrix(
            s0[mi:], s1[nj:], P, Recurrence.NEEDLEMAN_WUNSCH,
            row_init=InitType.CUSTOM, col_init=InitType.CUSTOM,
            first_row=(np.concatenate([[tl.h[-1, -1]], tr.h[-1, 1:]]),
                       np.concatenate([[tl.f[-1, -1]], tr.f[-1, 1:]])),
            first_col=(np.concatenate([[tl.h[-1, -1]], bl.h[1:, -1]]),
                       np.concatenate([[tl.e[-1, -1]], bl.e[1:, -1]])),
        )
        assert br.h[-1, -1] == full.h[m, n]
        assert np.array_equal(canon(br.h[-1]), canon(full.h[m, nj:]))


class TestMatchColumn:
    def test_aligned_match(self, dna, homolog):
        """fwd row r + rev pass must recover the NW score at the cut."""
        s0 = dna(60, seed=3)
        s1 = homolog(s0, seed=4)
        m, n = len(s0), len(s1)
        goal_full = oracle.dp_matrix(
            s0, s1, P, Recurrence.NEEDLEMAN_WUNSCH,
            InitType.WITH_GAPS, InitType.WITH_GAPS,
        )
        goal = int(goal_full.h[m, n])
        r = 25
        fwd = oracle.dp_rows(
            s0, s1, P, Recurrence.NEEDLEMAN_WUNSCH,
            InitType.WITH_GAPS, InitType.WITH_GAPS, special_rows=(r,),
        )
        fh, ff = fwd.specials[r]
        rev = oracle.dp_rows(
            s0[r:][::-1], s1[::-1], P, Recurrence.NEEDLEMAN_WUNSCH,
            InitType.WITH_GAPS, InitType.WITH_GAPS,
        )
        # rev last row over reversed columns; index k of the cut maps to
        # reversed index n-k.
        rh = rev.last_h[::-1]
        rf = rev.last_f[::-1]
        res = match_column(rh, rf, fh, ff, goal, P.gap_open)
        assert res.found
        if res.type == MatchType.ALIGNED:
            assert fh[res.k] + rh[res.k] == goal
        else:
            assert ff[res.k] + rf[res.k] + P.gap_open == goal
