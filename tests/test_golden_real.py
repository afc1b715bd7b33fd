"""Realistic-genomic-content golden acceptance tests.

The environment has no network egress, so the reference README's NCBI
accession pairs cannot be fetched; `tools/make_golden_real.py` generates
committed fixtures reproducing the content classes real genomic sequence
brings — assembly-gap N runs, micro/minisatellites, SINE-like dispersed
repeats, poly-A/AT low-complexity stretches, GC isochores — where purely
random fixtures never stress gap placement or N-handling.  Scores below
were frozen from the NumPy oracle (the repo's ground truth); any drift
in N semantics, repeat-region gap placement, or any stage's algebra
fails exactly (the role of /root/reference/README.md:87-93's known-score
table).
"""

import contextlib
import io
import os
import re

import pytest

from masa_tpu.cli import main

G = os.path.join(os.path.dirname(__file__), "golden")

# frozen oracle results (tools/make_golden_real.py)
REAL1 = dict(score=11367, end=(16384, 15805))   # 16 KBP pair
REAL2 = dict(score=32466, end=(49152, 47717))   # 49 KBP pair


def run_cli(pair, *flags, tmp):
    args = [os.path.join(G, f"{pair}_a.fa"), os.path.join(G, f"{pair}_b.fa"),
            "--work-dir", str(tmp / "wd"), "--clear", *flags]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(args)
    assert rc == 0
    return buf.getvalue()

def extract(out):
    m = re.search(r"alignment score: (-?\d+)", out)
    return int(m.group(1)) if m else None


class TestReal16K:
    def test_local_full_pipeline(self, tmp_path):
        out = run_cli("real1", tmp=tmp_path)
        assert extract(out) == REAL1["score"]
        assert "verified" in out

    def test_global_matches_frozen(self, tmp_path):
        # the optimal path spans corner to corner here, so global ==
        # local score (frozen by the oracle NW corner value)
        out = run_cli("real1", "--alignment-start", "!", tmp=tmp_path)
        assert extract(out) == 11367

    def test_stage1_endpoint(self, tmp_path):
        out = run_cli("real1", "--stage-1", tmp=tmp_path)
        m = re.search(r"best score: (-?\d+) at \((\d+),(\d+)\)", out)
        assert (int(m.group(1)), (int(m.group(2)), int(m.group(3)))) == (
            REAL1["score"], REAL1["end"])


@pytest.mark.slow
class TestReal49K:
    def test_local_full_pipeline(self, tmp_path):
        out = run_cli("real2", tmp=tmp_path)
        assert extract(out) == REAL2["score"]
        assert "verified" in out

    def test_split_matches_monolithic(self, tmp_path):
        out = run_cli("real2", "--split", "4", tmp=tmp_path)
        assert extract(out) == REAL2["score"]

    def test_semiglobal_end_modes(self, tmp_path):
        out = run_cli("real2", "--alignment-start", "2", tmp=tmp_path)
        assert extract(out) is not None
