"""Real multi-process fork driver: one OS process + JAX runtime per slab,
localhost-socket boundary streams, AlignerPool choreography (score relay,
pipelined crosspoints with "Not me!" routing, stage-4 file splice).

The reference equivalent is fork_multi_process + the pool protocol
(libmasa.cpp:540-642, AlignerPool.cpp:152-215, sw_stage4.cpp:854-881).
"""

import json
import os

import numpy as np
import pytest

from masa_tpu.ops import oracle
from masa_tpu.parallel.fork import run_fork
from masa_tpu.types import ScoreParams

P = ScoreParams()


class TestForkProcesses:
    def test_three_processes_oracle_exact(self, dna, homolog, tmp_path):
        """3 actual worker processes; path spans all slabs; final
        alignment chain spliced at node 0 must be oracle-exact and pass
        the stage-5/6 invariants (the workers raise otherwise)."""
        s0 = dna(900, seed=121)
        s1 = homolog(s0, seed=122)
        ref = oracle.dp_rows(s0, s1, P)
        res = run_fork(s0, s1, [1.0, 1.0, 1.0], str(tmp_path / "fw"), P,
                       base_port=7511, platform="cpu")
        assert res["score"] == ref.best
        # the chain is the full spliced stage-4 output (one crosspoint
        # at most every max_partition cells plus the endpoints)
        cps = res["crosspoints"]
        assert len(cps) > 10
        assert cps[-1][2] == ref.best
        # the rendered alignment was written by node 0
        assert os.path.exists(tmp_path / "fw" / "shared" / "alignment.txt")

    def test_not_me_routing(self, dna, homolog, tmp_path):
        """Endpoint confined to the FIRST slab: the right workers must
        pass the crosspoint through untouched and contribute empty
        chains (sw_stage2.cpp:197-205)."""
        s0 = dna(300, seed=123)
        s1 = np.concatenate([homolog(s0, seed=124), dna(700, seed=125)])
        ref = oracle.dp_rows(s0, s1, P)
        res = run_fork(s0, s1, [1.0, 1.0], str(tmp_path / "fw2"), P,
                       base_port=7521, platform="cpu")
        assert res["score"] == ref.best
        # every crosspoint lies in the left half of seq1
        assert all(c[1] <= len(s1) // 2 + 64 for c in res["crosspoints"])

    def test_speculative_traceback_mode(self, dna, homolog, tmp_path):
        """Predicted-traceback mode (TPDS2016 across processes): workers
        speculate from their local bests before the pipeline reaches
        them; the result must still be oracle-exact."""
        s0 = dna(900, seed=128)
        s1 = homolog(s0, seed=129)
        ref = oracle.dp_rows(s0, s1, P)
        res = run_fork(s0, s1, [1.0, 1.0, 1.0], str(tmp_path / "fw4"), P,
                       base_port=7541, platform="cpu",
                       traceback="speculative")
        assert res["score"] == ref.best
        assert res["crosspoints"][-1][2] == ref.best

    def test_worker_failure_detected(self, dna, tmp_path):
        """The wait-reaper must surface a dead worker instead of hanging
        (libmasa.cpp:605-630)."""
        s0 = dna(200, seed=126)
        s1 = dna(200, seed=127)
        # corrupt config: point a worker at a missing sequence file
        with pytest.raises(RuntimeError, match="fork workers failed"):
            run_fork(s0, np.array([], np.uint8), [1.0, 1.0],
                     str(tmp_path / "fw3"), P, base_port=7531,
                     platform="cpu", timeout=120)
