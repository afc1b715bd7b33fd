"""SVG rendering of an alignment (the cairo plot of stage6,
stage6/sw_stage6.cpp:263-989, re-done as dependency-free SVG XML)."""

from __future__ import annotations

from masa_tpu.biology.alignment import Alignment


def _path_points(aln: Alignment, max_points: int = 2048):
    """Walk the gap lists to sample the alignment path in matrix coords."""
    g0 = sorted(aln.gaps[0], key=lambda g: g.pos)
    g1 = sorted(aln.gaps[1], key=lambda g: g.pos)
    pts = [(aln.start[0] - 1, aln.start[1] - 1)]
    i, j = aln.start[0] - 1, aln.start[1] - 1
    k0 = k1 = 0
    while i < aln.end[0] or j < aln.end[1]:
        # gap in seq0 (consume seq1) before seq0 position i+1
        if k0 < len(g0) and g0[k0].pos == i + 1:
            j += g0[k0].len
            k0 += 1
        elif k1 < len(g1) and g1[k1].pos == j + 1:
            i += g1[k1].len
            k1 += 1
        else:
            d = 1
            nd0 = g0[k0].pos - 1 - i if k0 < len(g0) else aln.end[0] - i
            nd1 = g1[k1].pos - 1 - j if k1 < len(g1) else aln.end[1] - j
            d = max(1, min(nd0, nd1))
            i += d
            j += d
        pts.append((i, j))
    if len(pts) > max_points:
        step = len(pts) // max_points + 1
        pts = pts[::step] + [pts[-1]]
    return pts


def render_svg(aln: Alignment, m: int, n: int, size: int = 800) -> str:
    scale = size / max(m, n, 1)
    w, h = n * scale, m * scale
    pts = _path_points(aln)
    poly = " ".join(f"{j*scale:.1f},{i*scale:.1f}" for i, j in pts)
    return f"""<?xml version="1.0" encoding="UTF-8"?>
<svg xmlns="http://www.w3.org/2000/svg" width="{w+80:.0f}" height="{h+60:.0f}">
  <g transform="translate(40,40)">
    <rect x="0" y="0" width="{w:.1f}" height="{h:.1f}"
          fill="white" stroke="black"/>
    <polyline points="{poly}" fill="none" stroke="crimson"
              stroke-width="1.5"/>
    <text x="0" y="-8" font-family="monospace" font-size="12">
      score={aln.raw_score} matches={aln.matches}
      mismatches={aln.mismatches} gaps={aln.gap_opens}/{aln.gap_extensions}
    </text>
    <text x="0" y="{h+16:.0f}" font-family="monospace"
          font-size="10">seq1: 1..{n}</text>
    <text x="-32" y="0" font-family="monospace" font-size="10"
          transform="rotate(-90 -32 0)">seq0: 1..{m}</text>
  </g>
</svg>
"""
