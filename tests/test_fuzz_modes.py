"""Randomized differential soak: the full pipeline vs the dense oracle
across the alignment-start/end mode matrix with random score parameters
and random sequence shapes.

For every sampled configuration the expected endpoint score is derived
independently from oracle.dp_matrix (global max / last row / last col /
corner per the mode), and the pipeline must reproduce it exactly with
the stage-5 invariant and stage-6 re-check passing (they raise
otherwise).
"""

import numpy as np
import pytest

from masa_tpu.ops import oracle
from masa_tpu.stages import pipeline, stage6
from masa_tpu.types import (
    AlignmentStart,
    InitType,
    Recurrence,
    ScoreParams,
)

S = AlignmentStart


def _inits(start):
    return pipeline._mode_inits(start)


def _expected(ref, m, n, start, end, rec):
    """Endpoint score per mode, derived from the dense matrix alone."""
    h = ref.h
    if end is None:
        end = S.ANYWHERE if start == S.ANYWHERE else S.SEQUENCE_1_AND_2
    if end == S.ANYWHERE:
        if rec == Recurrence.SMITH_WATERMAN:
            return int(h.max())
        b, _, _ = ref.best()
        return int(b)
    if end == S.SEQUENCE_1_AND_2:
        return int(h[m, n])
    cands = []
    if end in (S.SEQUENCE_2, S.SEQUENCE_1_OR_2):
        cands.append(int(h[m, :].max()))
    if end in (S.SEQUENCE_1, S.SEQUENCE_1_OR_2):
        cands.append(int(h[:, n].max()))
    return max(cands)


STARTS = [S.ANYWHERE, S.SEQUENCE_1_AND_2, S.SEQUENCE_1, S.SEQUENCE_2,
          S.SEQUENCE_1_OR_2]
ENDS = [None, S.ANYWHERE, S.SEQUENCE_1_AND_2, S.SEQUENCE_1, S.SEQUENCE_2,
        S.SEQUENCE_1_OR_2]


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_pipeline_vs_oracle(seed):
    rng = np.random.default_rng(5000 + seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    m = int(rng.integers(40, 320))
    n = int(rng.integers(40, 320))
    s0 = rng.choice(bases, m).astype(np.uint8)
    if rng.random() < 0.6:
        # homologous core so paths are nontrivial
        s1 = s0[: n].copy() if n <= m else np.concatenate(
            [s0, rng.choice(bases, n - m)]).astype(np.uint8)
        idx = rng.random(len(s1)) < 0.1
        s1[idx] = rng.choice(bases, int(idx.sum())).astype(np.uint8)
    else:
        s1 = rng.choice(bases, n).astype(np.uint8)
    n = len(s1)
    params = ScoreParams(
        match=int(rng.integers(1, 4)),
        mismatch=-int(rng.integers(1, 5)),
        gap_open=int(rng.integers(1, 5)),
        gap_ext=int(rng.integers(1, 4)),
    )
    start = STARTS[rng.integers(len(STARTS))]
    end = ENDS[rng.integers(len(ENDS))]

    row_init, col_init = _inits(start)
    rec = pipeline._recurrence(start)
    ref = oracle.dp_matrix(s0, s1, params, rec, row_init, col_init)
    want = _expected(ref, m, n, start, end, rec)

    pcfg = pipeline.PipelineConfig(
        params=params, alignment_start=start, alignment_end=end,
        backend="numpy", max_cells_stage5=1 << 12,
        flush_interval=int(rng.integers(32, 128)),
    )
    aln = pipeline.align_pair(s0, s1, pcfg)
    # local alignments clamp at the empty alignment
    if start == S.ANYWHERE and (end is None or end == S.ANYWHERE):
        want = max(want, 0)
    assert aln.raw_score == want, (
        f"mode ({start.name}, {end and end.name}) params {params}: "
        f"pipeline {aln.raw_score} != oracle {want}")
    stage6.recheck(aln, s0, s1, params)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_sharded_vs_oracle(seed):
    """Randomized mesh width / slab count / flush stride / pruning for
    the full sharded alignment."""
    from masa_tpu.ops.wavefront import WavefrontConfig
    from masa_tpu.parallel.mesh import make_mesh
    from masa_tpu.parallel.sharded import sharded_align

    rng = np.random.default_rng(7000 + seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    m = int(rng.integers(80, 400))
    s0 = rng.choice(bases, m).astype(np.uint8)
    s1 = s0[: int(rng.integers(60, m + 60))].copy()
    if len(s1) > m:
        s1 = np.concatenate([s1[:m], rng.choice(
            bases, len(s1) - m)]).astype(np.uint8)
    idx = rng.random(len(s1)) < 0.12
    s1[idx] = rng.choice(bases, int(idx.sum())).astype(np.uint8)
    params = ScoreParams(
        match=int(rng.integers(1, 3)),
        mismatch=-int(rng.integers(1, 4)),
        gap_open=int(rng.integers(1, 4)),
        gap_ext=int(rng.integers(1, 3)),
    )
    D = int(rng.choice([2, 3, 5, 8]))
    # deliberately NO params in the cfg: the engine must bake the
    # caller's params in (regression for the default-scores bug)
    cfg = WavefrontConfig(alpha=4, rs=1, chunk=512, track_best=True,
                          store_lastcol=True)
    ref = oracle.dp_rows(s0, s1, params)
    if ref.best <= 0:
        return  # degenerate local alignment; nothing to trace
    best, aln = sharded_align(
        s0, s1, make_mesh(D), cfg, params,
        prune=bool(rng.integers(2)),
        flush_stride=int(rng.choice([1, 2, 4])),
        traceback=str(rng.choice(["pipelined", "speculative"])),
    )
    assert best == aln.raw_score == ref.best
    stage6.recheck(aln, s0, s1, params)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_stage4_strategies_differential(seed):
    """The three Myers-Miller strategies and the batched reducer must
    all satisfy the stage-5 invariant on the same random partitions
    (the reference's mutually-redundant-strategies idea as a fuzz)."""
    from masa_tpu.ops import batched_mm, myers_miller as mm

    rng = np.random.default_rng(8000 + seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    m = int(rng.integers(100, 300))
    s0 = rng.choice(bases, m).astype(np.uint8)
    s1 = s0.copy()
    idx = rng.random(m) < 0.15
    s1[idx] = rng.choice(bases, int(idx.sum())).astype(np.uint8)
    params = ScoreParams(
        match=int(rng.integers(1, 3)),
        mismatch=-int(rng.integers(1, 4)),
        gap_open=int(rng.integers(1, 4)),
        gap_ext=int(rng.integers(1, 3)),
    )
    pcfg = pipeline.PipelineConfig(params=params, backend="numpy",
                                   max_cells_stage5=1 << 18)
    res, ep = pipeline.stage1_pass(s0, s1, pcfg)
    cps = pipeline.stage2_march(s0, s1, pcfg, ep, res.specials)
    mps = int(rng.choice([8, 16, 32]))
    for strat in mm.SplitStrategy:
        out = mm.reduce_partitions(s0, s1, cps, params, mps, strat)
        aln = pipeline.stage5_emit(s0, s1, pcfg, out)
        assert aln.raw_score == ep.score, strat
    out = batched_mm.reduce_partitions_batched(s0, s1, cps, params, mps)
    aln = pipeline.stage5_emit(s0, s1, pcfg, out)
    assert aln.raw_score == ep.score


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_oversize_and_weighted_split(seed):
    """Chained column slabs (oversize path) with random widths and
    custom scores must match the dense oracle."""
    import tempfile

    from masa_tpu.parallel.split import align_oversize

    rng = np.random.default_rng(9000 + seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    m = int(rng.integers(150, 350))
    s0 = rng.choice(bases, m).astype(np.uint8)
    s1 = s0.copy()
    idx = rng.random(m) < 0.12
    s1[idx] = rng.choice(bases, int(idx.sum())).astype(np.uint8)
    params = ScoreParams(
        match=int(rng.integers(1, 3)),
        mismatch=-int(rng.integers(1, 4)),
        gap_open=int(rng.integers(1, 4)),
        gap_ext=int(rng.integers(1, 3)),
    )
    ref = oracle.dp_rows(s0, s1, params)
    if ref.best <= 0:
        return
    with tempfile.TemporaryDirectory() as td:
        best, aln = align_oversize(
            s0, s1, int(rng.integers(60, 140)), td, params,
            max_cells_stage5=1 << 12)
    assert best == aln.raw_score == ref.best


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_crash_resume_anywhere(seed, tmp_path):
    """Crash-monkey: kill the persistent runner after a random number of
    compute calls, re-run the same job, and require the final alignment
    to equal an uninterrupted run's (stage-level and mid-stage resume
    paths chosen at random by where the crash lands)."""
    from masa_tpu.core.job import Job, JobConfig
    from masa_tpu.stages import core as score, runner

    rng = np.random.default_rng(9500 + seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    m = int(rng.integers(200, 500))
    s0 = rng.choice(bases, m).astype(np.uint8)
    s1 = s0.copy()
    idx = rng.random(m) < 0.12
    s1[idx] = rng.choice(bases, int(idx.sum())).astype(np.uint8)
    params = ScoreParams(
        match=int(rng.integers(1, 3)),
        mismatch=-int(rng.integers(1, 4)),
        gap_open=int(rng.integers(1, 4)),
        gap_ext=int(rng.integers(1, 3)),
    )

    def cfg(tag):
        return JobConfig(work_dir=str(tmp_path / tag), params=params,
                         ram_limit=1 << 20, disk_limit=1 << 20,
                         stage4_max_partition=16, backend="numpy",
                         stage5_max_cells=1 << 12)

    clean = runner.align_job(Job(cfg("clean")), s0, s1,
                             log=lambda *a, **k: None)

    crash_after = int(rng.integers(1, 12))
    calls = {"n": 0}
    orig = score.reverse_pass_and_match

    def dying(*a, **k):
        calls["n"] += 1
        if calls["n"] == crash_after:
            raise KeyboardInterrupt("crash-monkey")
        return orig(*a, **k)

    score.reverse_pass_and_match = dying
    try:
        try:
            runner.align_job(Job(cfg("crashy")), s0, s1,
                             log=lambda *a, **k: None)
            crashed = False
        except KeyboardInterrupt:
            crashed = True
    finally:
        score.reverse_pass_and_match = orig

    resumed = runner.align_job(Job(cfg("crashy")), s0, s1,
                               log=lambda *a, **k: None)
    assert resumed.raw_score == clean.raw_score
    assert resumed.gaps == clean.gaps
    assert (resumed.start, resumed.end) == (clean.start, clean.end)
    # the crash must actually have happened for most seeds; if the run
    # finished first, the resume path above degraded to artifact reuse
    assert crashed or calls["n"] < crash_after
