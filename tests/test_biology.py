"""Sequence handling and CGFF binary format tests."""

import numpy as np

from masa_tpu.biology import alignment as A
from masa_tpu.biology.sequence import (
    Sequence,
    SequenceInfo,
    SequenceModifiers,
    parse_fasta,
)


class TestFasta:
    def test_parse(self, tmp_path):
        p = tmp_path / "x.fasta"
        p.write_bytes(b">chr test description\nacgt\nACGTNN\n\nTT\n")
        desc, data = parse_fasta(p.read_bytes())
        assert desc == "chr test description"
        assert data.tobytes() == b"ACGTACGTNNTT"

    def test_from_file(self, tmp_path):
        p = tmp_path / "y.fa"
        p.write_bytes(b">y\nACGT\n")
        s = Sequence.from_file(str(p))
        assert len(s) == 4
        assert s.info.description == "y"


class TestModifiers:
    def test_reverse_complement(self):
        s = Sequence(np.frombuffer(b"AACGT", np.uint8),
                     modifiers=SequenceModifiers(reverse=True,
                                                 complement=True))
        assert s.data().tobytes() == b"ACGTT"

    def test_trim(self):
        s = Sequence(np.frombuffer(b"AACGTT", np.uint8))
        t = s.trimmed_view(2, 5)
        assert t.data().tobytes() == b"ACGT"
        assert t.absolute_pos(1) == 2
        r = t.reversed_view()
        assert r.data().tobytes() == b"TGCA"
        assert r.absolute_pos(1) == 5

    def test_clear_n(self):
        s = Sequence(np.frombuffer(b"ANA", np.uint8),
                     modifiers=SequenceModifiers(clear_n=True))
        assert s.data()[1] == 0


class TestCGFF:
    def make_alignment(self):
        s0 = Sequence(np.frombuffer(b"ACGTACGT", np.uint8),
                      SequenceInfo(description="seq zero", size=8))
        s1 = Sequence(np.frombuffer(b"ACGGTACT", np.uint8),
                      SequenceInfo(description="seq one", size=8))
        aln = A.Alignment(sequences=[s0, s1], raw_score=42,
                          matches=7, mismatches=1, gap_opens=1,
                          gap_extensions=2)
        aln.start = [1, 1]
        aln.end = [8, 8]
        aln.add_gap(0, 4)
        aln.add_gap(0, 4)
        aln.add_gap(1, 7)
        return aln

    def test_roundtrip(self, tmp_path):
        aln = self.make_alignment()
        path = str(tmp_path / "a.cgff")
        A.write_cgff(path, aln)
        back = A.read_cgff(path)
        assert back.raw_score == 42
        assert back.matches == 7
        assert back.gap_opens == 1
        assert back.start == [1, 1]
        assert back.end == [8, 8]
        assert [(g.pos, g.len) for g in back.gaps[0]] == [(4, 2)]
        assert [(g.pos, g.len) for g in back.gaps[1]] == [(7, 1)]
        assert back.sequences[0].info.description == "seq zero"

    def test_magic(self, tmp_path):
        aln = self.make_alignment()
        path = str(tmp_path / "b.cgff")
        A.write_cgff(path, aln)
        raw = open(path, "rb").read()
        assert raw[:4] == b"CGFF"
        assert raw[4] == 0 and raw[5] == 1

    def test_varint(self):
        import io

        for v in [0, 1, 127, 128, 300, 1 << 20, (1 << 31) - 1]:
            buf = io.BytesIO()
            A._wv(buf, v)
            buf.seek(0)
            assert A._rv(buf) == v


class TestTopLevelAPI:
    def test_align_strings(self):
        import masa_tpu

        a = masa_tpu.align("ACGTACGTAGGCT", "ACGTACGTCGGCT")
        assert a.raw_score == 9 and a.matches == 12

    def test_align_arrays_and_modes(self, dna, homolog):
        import masa_tpu
        from masa_tpu.ops import oracle
        from masa_tpu.types import (
            InitType, Recurrence, ScoreParams,
        )

        s0 = dna(200, seed=171)
        s1 = homolog(s0, seed=172)
        a = masa_tpu.align(s0, s1)
        assert a.raw_score == oracle.dp_rows(s0, s1, ScoreParams()).best
        g = masa_tpu.align(s0, s1, alignment_start="!")
        ref = oracle.dp_rows(s0, s1, ScoreParams(),
                             Recurrence.NEEDLEMAN_WUNSCH,
                             InitType.WITH_GAPS, InitType.WITH_GAPS)
        assert g.raw_score == ref.last_h[-1]

    def test_align_fasta_paths(self, tmp_path, dna, homolog):
        import masa_tpu

        s0 = dna(150, seed=173)
        s1 = homolog(s0, seed=174)
        p0 = tmp_path / "a.fa"
        p1 = tmp_path / "b.fa"
        p0.write_text(">a\n" + bytes(s0).decode() + "\n")
        p1.write_text(">b\n" + bytes(s1).decode() + "\n")
        a = masa_tpu.align(str(p0), str(p1))
        b = masa_tpu.align(s0, s1)
        assert a.raw_score == b.raw_score

    def test_align_missing_path_raises(self, tmp_path):
        import pytest

        import masa_tpu

        with pytest.raises(FileNotFoundError):
            masa_tpu.align(str(tmp_path / "missing.fa"), "ACGT")
        with pytest.raises(FileNotFoundError):
            masa_tpu.align("data/chr1.seq", "ACGT")
