"""Golden acceptance tests: committed FASTA fixtures with frozen expected
results, driven through the real CLI.

The fixtures (tests/golden/*.fa) are fixed files; the expected scores and
alignment statistics below were computed by the NumPy oracle pipeline and
hand-frozen — any drift in FASTA parsing, scoring semantics, endpoint
selection, or any stage's algebra fails these exactly.  This is the
repo's analogue of the reference README's known-score table
(/root/reference/README.md:87-93), which served as its de-facto
acceptance suite.

pair1: 1500bp vs 1491bp homologs (8% subs, 4% indels).
pair2: homologous 800bp core with unrelated flanks on both sides, so
local / semi-global / global modes answer differently.
"""

import contextlib
import io
import os
import re

import pytest

from masa_tpu.cli import main

G = os.path.join(os.path.dirname(__file__), "golden")

# (pair, extra CLI flags, (score, matches, mismatches, gap_opens, gap_exts))
CASES = [
    ("pair1", [], (793, 1366, 77, 44, 105)),
    ("pair1", ["--alignment-start", "!"], (793, 1366, 77, 44, 105)),
    ("pair1", ["--alignment-start", "+"], (793, 1366, 77, 44, 105)),
    ("pair1", ["--alignment-start", "1"], (793, 1366, 77, 44, 105)),
    ("pair1", ["--alignment-start", "2"], (793, 1366, 77, 44, 105)),
    ("pair1", ["--alignment-start", "!", "--alignment-end", "+"],
     (793, 1366, 77, 44, 105)),
    # pinned start, free end: endpoint = the global NW maximum
    ("pair1", ["--alignment-start", "!", "--alignment-end", "*"],
     (793, 1366, 77, 44, 105)),
    ("pair2", ["--alignment-start", "!", "--alignment-end", "*"],
     (271, 826, 50, 39, 144)),
    # differential: the classic Myers-Miller strategy must agree
    ("pair1", ["--stage-4-strategy", "ORIGINAL_MM"],
     (793, 1366, 77, 44, 105)),
    # non-default scores (regression: kernel configs silently ran the
    # default scores in several paths); oracle-verified 2377
    ("pair1", ["--match", "2", "--mismatch", "-1", "--gap-open", "4",
               "--gap-ext", "1"],
     (2377, 1363, 80, 41, 105)),
    ("pair2", [], (548, 750, 25, 17, 38)),
    # global alignment across unrelated flanks: NEGATIVE optimal score
    # (regression: the best-score admission filter must not eat it)
    ("pair2", ["--alignment-start", "!"], (-41, 936, 87, 72, 250)),
    ("pair2", ["--alignment-start", "*", "--alignment-end", "2"],
     (362, 826, 59, 39, 85)),
]

_LINE = re.compile(
    r"alignment score: (-?\d+)\s+\(matches=(\d+) mismatches=(\d+) "
    r"gaps=(\d+)/(\d+)\)")


def run_cli(pair, flags, tmp_path):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([os.path.join(G, f"{pair}_a.fa"),
                   os.path.join(G, f"{pair}_b.fa"),
                   "--work-dir", str(tmp_path / "w"),
                   "--backend", "numpy", "--verbose", "0"] + flags)
    assert rc == 0
    m = _LINE.search(buf.getvalue())
    assert m, buf.getvalue()
    return tuple(int(x) for x in m.groups())


@pytest.mark.parametrize("pair,flags,expect", CASES,
                         ids=[f"{p}-{'_'.join(f) or 'local'}"
                              for p, f, _ in CASES])
def test_golden_cli(pair, flags, expect, tmp_path):
    assert run_cli(pair, flags, tmp_path) == expect


def test_golden_stage1_score_only(tmp_path):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([os.path.join(G, "pair1_a.fa"),
                   os.path.join(G, "pair1_b.fa"),
                   "--work-dir", str(tmp_path / "w"),
                   "--backend", "numpy", "--verbose", "0", "--stage-1"])
    assert rc == 0
    assert "best score: 793" in buf.getvalue()
