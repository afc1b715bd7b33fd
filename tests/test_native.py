"""Native C++ helpers vs the pure Python implementations."""

import numpy as np
import pytest

from masa_tpu.native import bindings


needs_native = pytest.mark.skipif(
    not bindings.available(), reason="native library unavailable"
)


@needs_native
class TestNativeFasta:
    def test_matches_python(self, tmp_path):
        from masa_tpu.biology.sequence import parse_fasta

        p = tmp_path / "x.fa"
        p.write_bytes(b">desc here\nacgtACGT\nNNTT\n")
        d_py, s_py = parse_fasta(p.read_bytes())
        d_nat, s_nat = bindings.load_fasta(str(p))
        assert d_nat == d_py
        assert np.array_equal(s_nat, s_py)


@needs_native
class TestNativeTraceback:
    @pytest.mark.parametrize("ts,te", [(0, 0), (1, 0), (0, 2), (2, 1)])
    def test_matches_python(self, dna, homolog, ts, te):
        import os

        from masa_tpu.biology.alignment import Alignment
        from masa_tpu.ops import smallsw
        from masa_tpu.types import ScoreParams

        P = ScoreParams()
        s0 = dna(83, seed=91)
        s1 = homolog(s0, seed=92)
        a_nat = Alignment(sequences=[])
        seg_nat = smallsw._traceback_native(
            bindings, s0, s1, ts, te, P, a_nat,
            lambda k: 1 + k, lambda k: 1 + k,
        )
        os.environ["MASA_TPU_NO_NATIVE"] = "1"
        try:
            a_py = Alignment(sequences=[])
            seg_py = smallsw.traceback_segment(
                s0, s1, 0, 0, ts, te, P, a_py,
            )
        finally:
            del os.environ["MASA_TPU_NO_NATIVE"]
        assert seg_nat == seg_py
        assert a_nat.matches == a_py.matches
        assert a_nat.mismatches == a_py.mismatches
        assert a_nat.gap_opens == a_py.gap_opens
        assert a_nat.gap_extensions == a_py.gap_extensions
        assert [(g.pos, g.len) for g in a_nat.gaps[0]] == [
            (g.pos, g.len) for g in a_py.gaps[0]
        ]
        assert [(g.pos, g.len) for g in a_nat.gaps[1]] == [
            (g.pos, g.len) for g in a_py.gaps[1]
        ]


@needs_native
class TestNativeStage4:
    def test_reduce_partitions_matches_python(self):
        """The native stage-4 reduce must be bit-identical to the Python
        OPTIMIZED ladder (same windows, same descending-j match scan)."""
        from masa_tpu.ops import myers_miller as mm
        from masa_tpu.ops import oracle
        from masa_tpu.types import (
            Crosspoint,
            CrosspointType,
            InitType,
            Recurrence,
            ScoreParams,
        )

        rng = np.random.default_rng(17)
        bases = np.frombuffer(b"ACGT", np.uint8)
        m = 900
        s0 = rng.choice(bases, m).astype(np.uint8)
        s1 = s0.copy()
        idx = rng.random(m) < 0.12
        s1[idx] = rng.choice(bases, int(idx.sum())).astype(np.uint8)
        params = ScoreParams()
        ref = oracle.dp_rows(s0, s1, params, Recurrence.NEEDLEMAN_WUNSCH,
                             InitType.WITH_GAPS, InitType.WITH_GAPS)
        total = int(ref.last_h[-1])
        cps = [Crosspoint(0, 0, 0, CrosspointType.MATCH),
               Crosspoint(m, m, total, CrosspointType.MATCH)]
        for mps in (16, 64):
            py = mm.reduce_partitions(s0, s1, cps, params, mps,
                                      mm.SplitStrategy.OPTIMIZED)
            for nt in (1, 4):
                nat = bindings.reduce_partitions(s0, s1, cps, params, mps,
                                                 nthreads=nt)
                assert nat == py

    def test_reduce_partitions_gapped_pins(self):
        """Pairs whose endpoints sit inside gap runs (GAP_1/GAP_2 pins)
        exercise the opened-border init plumbing."""
        from masa_tpu.ops import myers_miller as mm
        from masa_tpu.types import Crosspoint, CrosspointType, ScoreParams

        rng = np.random.default_rng(3)
        bases = np.frombuffer(b"ACGT", np.uint8)
        s0 = rng.choice(bases, 300).astype(np.uint8)
        # build s1 = s0 with a 40-base deletion in the middle
        s1 = np.concatenate([s0[:130], s0[170:]])
        params = ScoreParams()
        from masa_tpu.ops import oracle
        from masa_tpu.types import InitType, Recurrence

        ref = oracle.dp_rows(s0, s1, params, Recurrence.NEEDLEMAN_WUNSCH,
                             InitType.WITH_GAPS, InitType.WITH_GAPS)
        total = int(ref.last_h[-1])
        cps = [Crosspoint(0, 0, 0, CrosspointType.MATCH),
               Crosspoint(len(s0), len(s1), total, CrosspointType.MATCH)]
        py = mm.reduce_partitions(s0, s1, cps, params, 8,
                                  mm.SplitStrategy.OPTIMIZED)
        nat = bindings.reduce_partitions(s0, s1, cps, params, 8)
        assert nat == py
        # some crosspoints should be pinned inside the deletion gap
        assert any(c.type != CrosspointType.MATCH for c in py)
