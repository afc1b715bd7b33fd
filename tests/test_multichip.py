"""Multi-chip column-sharded wavefront on an 8-device virtual CPU mesh."""

import numpy as np
import pytest

from masa_tpu.ops import oracle
from masa_tpu.ops.wavefront import WavefrontConfig
from masa_tpu.parallel.mesh import make_mesh
from masa_tpu.parallel.sharded import sharded_stage1
from masa_tpu.types import INF, Recurrence, ScoreParams

P = ScoreParams()


def canon(a):
    a = np.asarray(a, dtype=np.int64)
    return np.where(a <= -INF // 2, -INF, a)


class TestShardedStage1:
    @pytest.mark.parametrize("ndev", [1, 2, 8])
    def test_best_score_parity(self, dna, homolog, ndev):
        s0 = dna(700, seed=71)
        s1 = homolog(s0, seed=72)
        mesh = make_mesh(ndev)
        cfg = WavefrontConfig(
            alpha=4, rs=1, chunk=512,
            recurrence=Recurrence.SMITH_WATERMAN,
            track_best=True, store_lastcol=True,
        )
        res = sharded_stage1(s0, s1, mesh, cfg, P)
        ref = oracle.dp_rows(s0, s1, P)
        assert res.best == ref.best

    def test_last_row_parity(self, dna, homolog):
        """The concatenated slab last rows must equal the monolithic DP
        last row — boundary columns crossed the mesh exactly."""
        s0 = dna(512, seed=73)  # exactly one strip per device round
        s1 = homolog(s0, seed=74)
        mesh = make_mesh(4)
        cfg = WavefrontConfig(
            alpha=4, rs=1, chunk=512,
            recurrence=Recurrence.SMITH_WATERMAN,
            track_best=True, store_lastcol=True,
        )
        res = sharded_stage1(s0, s1, mesh, cfg, P)
        ref = oracle.dp_rows(s0, s1, P)
        n = len(s1)
        assert np.array_equal(canon(res.last_h[:n]), canon(ref.last_h[1:]))
        assert np.array_equal(canon(res.last_f[:n]), canon(ref.last_f[1:]))
