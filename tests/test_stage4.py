"""Stage-4 Myers-Miller splitting: all three strategies agree and keep the
stage-5 invariants."""

import numpy as np
import pytest

from masa_tpu.ops import myers_miller as mm
from masa_tpu.ops import oracle
from masa_tpu.ops.wavefront import WavefrontConfig
from masa_tpu.stages import pipeline, stage6
from masa_tpu.types import AlignmentStart, ScoreParams

P = ScoreParams()
KCFG = WavefrontConfig(alpha=4, rs=1, chunk=512)


def march_to_cps(s0, s1, start=AlignmentStart.ANYWHERE):
    pcfg = pipeline.PipelineConfig(alignment_start=start, kernel_cfg=KCFG,
                                   flush_interval=128,
                                   max_cells_stage5=1 << 14)
    res, endpoint = pipeline.stage1_pass(s0, s1, pcfg)
    cps = pipeline.stage2_march(s0, s1, pcfg, endpoint, res.specials)
    cps = pipeline.stage3_densify(s0, s1, pcfg, cps)
    return pcfg, cps


class TestStage4:
    @pytest.mark.parametrize("strategy", list(mm.SplitStrategy))
    def test_strategies_agree_and_verify(self, dna, homolog, strategy):
        s0 = dna(500, seed=81)
        s1 = homolog(s0, seed=82)
        pcfg, cps = march_to_cps(s0, s1)
        reduced = mm.reduce_partitions(s0, s1, cps, P, max_partition=16,
                                       strategy=strategy)
        assert reduced[0] == cps[0] and reduced[-1] == cps[-1]
        for a, b in zip(reduced, reduced[1:]):
            assert max(b.i - a.i, b.j - a.j) <= 16 or b.i - a.i < 2
        # stage 5 over the reduced partitions must still verify
        aln = pipeline.stage5_emit(s0, s1, pcfg, reduced)
        stage6.recheck(aln, s0, s1, P)
        ref = oracle.dp_rows(s0, s1, P)
        assert aln.raw_score == ref.best

    def test_differential(self, dna, homolog):
        s0 = dna(400, seed=83)
        s1 = homolog(s0, seed=84, indel_rate=0.12)
        _, cps = march_to_cps(s0, s1)
        results = [
            mm.reduce_partitions(s0, s1, cps, P, 16, strat)
            for strat in mm.SplitStrategy
        ]
        assert results[0] == results[1] == results[2]

    def test_gap_heavy(self, dna):
        # long internal deletion forces gapped crosspoints through splits
        s0 = dna(400, seed=85)
        s1 = np.concatenate([s0[:150], s0[290:]])
        pcfg, cps = march_to_cps(s0, s1,
                                 AlignmentStart.SEQUENCE_1_AND_2)
        reduced = mm.reduce_partitions(s0, s1, cps, P, max_partition=16)
        aln = pipeline.stage5_emit(s0, s1, pcfg, reduced)
        stage6.recheck(aln, s0, s1, P)


def test_svg_blocks_heatmap():
    """--dump-blocks grid renders as a heatmap layer in the SVG
    (stage6 drawPruningArea analogue)."""
    import numpy as np

    from masa_tpu.biology.alignment import Alignment
    from masa_tpu.stages.svg import render_svg

    aln = Alignment(sequences=[])
    aln.start = (1, 1)
    aln.end = (10, 10)
    aln.raw_score = 10
    grid = np.zeros((4, 8), np.int32)
    grid[1, 2] = 50
    grid[2, :] = -999999999  # pruned row
    out = render_svg(aln, 10, 10, blocks=grid)
    assert out.count("<rect") >= 32  # 4x8 heatmap + frame
    assert "#d9d9d9" in out  # pruned cells gray


def test_stage6_histogram_format():
    """The format registry's histogram renderer: well-formed single-hue
    SVG with one bar per window and the score in the title."""
    import numpy as np

    from masa_tpu.ops import oracle
    from masa_tpu.stages import pipeline, stage6

    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    s0 = rng.choice(bases, 400).astype(np.uint8)
    s1 = s0.copy()
    s1[::7] = bases[(np.arange(len(s1[::7])) % 4)]
    aln = pipeline.align_pair(s0, s1)
    out, ext = stage6.FORMATS["histogram"](aln, s0, s1)
    assert ext == "svg"
    assert out.startswith("<svg") and out.rstrip().endswith("</svg>")
    assert out.count('rx="1.5"') == 64          # one bar per bin
    assert f"score {aln.raw_score}" in out
    assert set(stage6.FORMATS) == {"text", "svg", "histogram"}


def test_mosaic_tail_chains_beyond_sweep_rung(monkeypatch):
    """Sub-granularity tails taller than one row-sweep rung (_SWEEP_R =
    512 rows) must CHAIN through the engine: a single call silently
    truncates the DP at 512 rows (round-3 review finding).  Forcing
    gran = alpha*128 = 1024 > h = 700 makes the whole height a tail, so
    the path runs engine-only on CPU; the chained result must equal the
    _halves_sweep ground truth."""
    import dataclasses

    from masa_tpu.ops import batched_mm as bmm
    from masa_tpu.ops.wavefront import Recurrence

    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    s0 = rng.choice(bases, 900).astype(np.uint8)
    s1 = rng.choice(bases, 800).astype(np.uint8)

    def fake_cfg(h, njq, params, B=1, heights=None):
        return dataclasses.replace(
            WavefrontConfig(alpha=8, rs=32, chunk=8192),
            recurrence=Recurrence.NEEDLEMAN_WUNSCH,
            track_best=False, store_lastcol=False,
            match=params.match, mismatch=params.mismatch,
            gap_open=params.gap_open, gap_ext=params.gap_ext)

    monkeypatch.setattr(bmm, "_pallas_mm_cfg", fake_cfg)
    njq = 1024
    # pad1 covers the tail rung's padded slice (padded_len(_TAIL_CFG, njq))
    dev = bmm._DevSeqs(s0, s1, pad0=4096, pad1=njq + 16384)
    halves = [bmm._Half(0, 700, 0, 750, 1, 1),
              bmm._Half(100, 690, 30, 700, 0, 2)]
    mh, mf = bmm._halves_mosaic(dev, halves, False, P, njq)
    sh, sf = bmm._halves_sweep(dev, halves, False, P, njq)
    np.testing.assert_array_equal(np.asarray(mh), np.asarray(sh)[:, :njq])
    np.testing.assert_array_equal(np.asarray(mf), np.asarray(sf)[:, :njq])


def test_halves_strips_engine_parity():
    """The per-half strip engine (tall stage-4 halves at the strip
    kernel's rate) must return bus-exact results vs the row-sweep
    ground truth — including reverse halves, pinned-gap borders, a
    width-0 (pure-gap) half, and buses narrower than the level njq."""
    from masa_tpu.ops import batched_mm as bmm

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    s0 = rng.choice(bases, 900).astype(np.uint8)
    s1 = rng.choice(bases, 800).astype(np.uint8)
    njq = 1024
    dev = bmm._DevSeqs(s0, s1, pad0=4096, pad1=njq + 4096)
    halves = [bmm._Half(0, 300, 0, 750, 1, 1),
              bmm._Half(100, 290, 30, 700, 0, 2),
              bmm._Half(40, 128, 200, 64, 2, 0),
              bmm._Half(10, 64, 500, 0, 1, 2)]   # w = 0: pure-gap pair
    for rev in (False, True):
        th, tf = bmm._halves_strips(dev, halves, rev, P, njq)
        sh, sf = bmm._halves_sweep(dev, halves, rev, P, njq)
        for k, x in enumerate(halves):
            w = x.w
            np.testing.assert_array_equal(
                np.asarray(th)[k, :w], np.asarray(sh)[k, :w],
                err_msg=f"half {k} rev={rev} H")
            np.testing.assert_array_equal(
                np.asarray(tf)[k, :w], np.asarray(sf)[k, :w],
                err_msg=f"half {k} rev={rev} F")


def test_partition_config_rung_cost_model(monkeypatch):
    """The stage-2 hop rung chooser: full strips run fused Mosaic, the
    rows % R tail runs the slow scan twin — so arbitrary hop heights
    must pick the rung minimizing kernel+dispatch+tail cost, not just
    the tallest rung (a 32K-row scan tail costs seconds)."""
    import jax

    from masa_tpu.stages import core

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    # heights aligned to a rung take the cheapest covering rung; one
    # full big-rung strip beats several smaller strips' dispatches
    assert core.partition_config(262144, 1 << 20).rows == 131072
    assert core.partition_config(131072, 1 << 20).rows == 131072
    assert core.partition_config(65536, 1 << 20).rows == 32768

    # a tiny remainder over a full strip stays on the big rung (the
    # 300-row scan tail costs ~0.1 s, less than re-stripping); a rung
    # whose use would leave a BIG scan tail is priced out
    assert core.partition_config(131072 + 300, 1 << 20).rows == 131072
    cfg = core.partition_config(65536 + 300, 1 << 20)
    assert cfg.rows == 32768
    tail = (65536 + 300) % cfg.rows
    assert tail * (1 << 20) / core._SCAN_GCUPS < 2.0  # seconds, small

    # tiny hops: the smallest rung
    assert core.partition_config(700, 1 << 20) is core._TPU_LADDER[0]

    # off-TPU the chooser defers to the CPU ladder
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert core.partition_config(131072, 1 << 20) is core._CPU_LADDER[0]


def test_stage1_plan_traceback_aware(monkeypatch):
    """Stage-1 planning must minimize the WHOLE pipeline, not the forward
    GCUPS.  With the kernel's mid-strip flush the spacing decouples from
    the rung: 1M/5M-class runs take the TALLEST rung (R=131072, full
    kernel rate) with 32768-row spacing (stage-2 hop chains engage on
    the 32768 rung; stage 4 inherits 32768-tall partitions) — where the
    round-3 boundary-only kernel had to drop the whole stage 1 to the
    R=32768 rung (~90 GCUPS measured) to buy the same spacing."""
    import jax

    from masa_tpu.stages import core

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    m = n = 1 << 20
    cfg, spacing = core.stage1_plan(m, n, 17 << 30)
    assert cfg.rows == 131072
    assert spacing == 32768
    # the spacing must be kernel-flushable at this rung
    from masa_tpu.ops.strips import snap_special_interval

    assert snap_special_interval(spacing, cfg, "pallas") == spacing

    # 5M-class: same trade, same winner
    cfg, spacing = core.stage1_plan(5_000_000, 5_000_000, 17 << 30)
    assert (cfg.rows, spacing) == (131072, 32768)

    # when the SRA budget itself forces sparse rows (23M-class), the
    # spacing is budget-bound whatever the rung; the planner must still
    # return a ladder rung and respect the budget floor
    cfg, spacing = core.stage1_plan(23_000_000, 25_000_000, 17 << 30)
    iv = 23_000_000 * 25_000_000 * 8 // (17 << 30) + 1
    assert cfg in core._TPU_LADDER
    assert spacing >= iv
    assert spacing % (cfg.alpha * 128) == 0

    # off-TPU: the CPU ladder via adaptive_config, no spacing override
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    cfg, spacing = core.stage1_plan(m, n)
    assert cfg is core._CPU_LADDER[0] and spacing is None
