"""Stage 6: render the binary alignment (gap lists) to text/SVG and
re-derive the score independently (the reference re-checks the score while
printing and aborts on mismatch, stage6/sw_stage6.cpp:246-249)."""

from __future__ import annotations

import dataclasses

import numpy as np

from masa_tpu.biology.alignment import Alignment
from masa_tpu.types import ScoreParams

GAP = ord("-")


def expand_gapped(seq: np.ndarray, start: int, end: int, gaps) -> np.ndarray:
    """Materialize the gapped residue string of one side.

    seq: the full encoded sequence; start/end: 1-based inclusive alignment
    bounds; gaps: GapRun list (len gap chars before 1-based position pos).
    """
    runs = sorted(gaps, key=lambda g: g.pos)
    out = []
    p = start
    for g in runs:
        assert start <= g.pos <= end + 1, f"gap at {g.pos} outside bounds"
        out.append(seq[p - 1 : g.pos - 1])
        out.append(np.full(g.len, GAP, np.uint8))
        p = g.pos
    out.append(seq[p - 1 : end])
    return np.concatenate(out) if out else np.empty(0, np.uint8)


@dataclasses.dataclass
class RecheckResult:
    score: int
    matches: int
    mismatches: int
    gap_opens: int
    gap_extensions: int


def rescore(
    s0: np.ndarray, s1: np.ndarray, params: ScoreParams
) -> RecheckResult:
    """Score two equal-length gapped strings from scratch (affine gaps,
    runs counted on the expanded strings — fully independent of the DP)."""
    assert len(s0) == len(s1), "gapped strings must align"
    g0 = s0 == GAP
    g1 = s1 == GAP
    assert not (g0 & g1).any(), "gap aligned to gap"
    both = ~g0 & ~g1
    matches = int((both & (s0 == s1)).sum())
    mismatches = int(both.sum()) - matches
    gap_cols = int(g0.sum() + g1.sum())

    def runs(g):
        if not g.any():
            return 0
        d = np.diff(g.astype(np.int8))
        return int((d == 1).sum()) + int(g[0])

    opens = runs(g0) + runs(g1)
    score = (
        matches * params.match
        + mismatches * params.mismatch
        - opens * params.gap_open
        - gap_cols * params.gap_ext
    )
    return RecheckResult(score, matches, mismatches, opens, gap_cols)


def recheck(
    aln: Alignment, seq0: np.ndarray, seq1: np.ndarray,
    params: ScoreParams | None = None,
) -> RecheckResult:
    """Expand both sides and re-derive the score; raises on mismatch with
    the recorded raw score."""
    params = params or ScoreParams(
        aln.match, aln.mismatch, aln.gap_open, aln.gap_ext
    )
    s0 = expand_gapped(seq0, aln.start[0], aln.end[0], aln.gaps[0])
    s1 = expand_gapped(seq1, aln.start[1], aln.end[1], aln.gaps[1])
    res = rescore(s0, s1, params)
    if res.score != aln.raw_score:
        raise RuntimeError(
            f"stage6 score re-check failed: rendered {res.score}, "
            f"recorded {aln.raw_score}"
        )
    return res


def render_text(
    aln: Alignment, seq0: np.ndarray, seq1: np.ndarray,
    width: int = 60,
) -> str:
    """BLAST-like flat text rendering (stage6 printText,
    stage6/sw_stage6.cpp:60-260)."""
    s0 = expand_gapped(seq0, aln.start[0], aln.end[0], aln.gaps[0])
    s1 = expand_gapped(seq1, aln.start[1], aln.end[1], aln.gaps[1])
    lines = []
    p0, p1 = aln.start[0], aln.start[1]
    for off in range(0, len(s0), width):
        a = s0[off : off + width]
        b = s1[off : off + width]
        mid = bytes(
            b"|"[0] if (x == y and x != GAP) else b" "[0]
            for x, y in zip(a, b)
        )
        n0 = int((a != GAP).sum())
        n1 = int((b != GAP).sum())
        lines.append(
            f"Seq0: {p0:>10}  {a.tobytes().decode('ascii')}  "
            f"{p0 + n0 - 1}"
        )
        lines.append(f"{'':>16}  {mid.decode('ascii')}")
        lines.append(
            f"Seq1: {p1:>10}  {b.tobytes().decode('ascii')}  "
            f"{p1 + n1 - 1}"
        )
        lines.append("")
        p0 += n0
        p1 += n1
    stats = (
        f"Score: {aln.raw_score}  Matches: {aln.matches}  "
        f"Mismatches: {aln.mismatches}  GapOpens: {aln.gap_opens}  "
        f"GapExts: {aln.gap_extensions}"
    )
    return stats + "\n\n" + "\n".join(lines)
