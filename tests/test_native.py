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
