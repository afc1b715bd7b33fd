"""BlockAligner / Grid / BlockPruningGeneric / SafeAligner tests.

The block family (AbstractBlockAligner, AbstractBlockAligner.cpp:73-644)
must produce bit-identical results to the dense oracle under the same
manager contract as the diagonal family.
"""

import threading

import numpy as np
import pytest

from masa_tpu.core.block_aligner import BlockAligner, SafeAligner
from masa_tpu.core.grid import Grid, split_evenly
from masa_tpu.core.manager import AlignerManager
from masa_tpu.core.pruning import BlockPruningGeneric
from masa_tpu.ops import oracle
from masa_tpu.stages.core import SpecialRowStore
from masa_tpu.types import (
    InitType,
    Partition,
    Recurrence,
    ScoreParams,
)

BASES = np.frombuffer(b"ACGT", np.uint8)


def rand_seqs(m, n, seed):
    rng = np.random.default_rng(seed)
    return rng.choice(BASES, m).astype(np.uint8), rng.choice(
        BASES, n).astype(np.uint8)


def similar_seqs(m, seed, mut=0.1):
    rng = np.random.default_rng(seed)
    s0 = rng.choice(BASES, m).astype(np.uint8)
    s1 = s0.copy()
    idx = rng.random(m) < mut
    s1[idx] = rng.choice(BASES, int(idx.sum())).astype(np.uint8)
    return s0, s1


def test_split_evenly():
    sp = split_evenly(10, 3)
    assert sp == [0, 4, 8, 10] or sp == [0, 4, 7, 10]
    sizes = np.diff(sp)
    assert sizes.sum() == 10 and sizes.max() - sizes.min() <= 1
    assert split_evenly(2, 5) == [0, 1, 2]  # count clamped to total


def test_grid_blocks_cover_partition():
    p = Partition(5, 7, 105, 260)
    g = Grid.with_block_size(p, 33, 77)
    seen = np.zeros((p.height, p.width), bool)
    for bi in range(g.nbi):
        for bj in range(g.nbj):
            b = g.block(bi, bj)
            assert b.i0 >= p.i0 and b.j1 <= p.j1
            seen[b.i0 - p.i0:b.i1 - p.i0, b.j0 - p.j0:b.j1 - p.j0] = True
    assert seen.all()
    bi, bj = g.block_of(40, 100)
    b = g.block(bi, bj)
    assert b.i0 <= 40 < b.i1 and b.j0 <= 100 < b.j1


@pytest.mark.parametrize("rec", [Recurrence.SMITH_WATERMAN,
                                 Recurrence.NEEDLEMAN_WUNSCH])
@pytest.mark.parametrize("inits", [
    (InitType.WITH_ZEROES, InitType.WITH_ZEROES),
    (InitType.WITH_GAPS, InitType.WITH_GAPS),
])
def test_block_aligner_matches_oracle(rec, inits):
    m, n = 233, 181
    s0, s1 = rand_seqs(m, n, 3)
    params = ScoreParams()
    ref = oracle.dp_matrix(s0, s1, params, rec, inits[0], inits[1])

    al = BlockAligner(block_height=64, block_width=48)
    mgr = AlignerManager(al, params)
    mgr.set_recurrence_type(rec)
    mgr.set_first_row(inits[0])
    mgr.set_first_column(inits[1])
    mgr.last_column_wanted = True
    store = SpecialRowStore()
    mgr.set_special_rows_store(store)
    mgr.set_special_row_interval(64)
    al.set_sequences(s0, s1)
    mgr.align_partition(Partition(0, 0, m, n))

    row, lh, lf = mgr.last_row
    np.testing.assert_array_equal(lh, ref.h[-1])
    # element 0 carries the manager's synthesized border gap (the
    # stage-2 matching convention, DESIGN.md), not the dense matrix's
    # -INF placeholder
    np.testing.assert_array_equal(lf[1:], ref.f[-1][1:])
    col, ch, ce = mgr.last_column
    np.testing.assert_array_equal(ch, ref.h[:, -1])
    # E of the last column: row 0's E is unrepresentable (-INF convention)
    np.testing.assert_array_equal(ce[1:], ref.e[1:, -1])
    if rec == Recurrence.SMITH_WATERMAN:
        b, bi, bj = ref.best()
        got = mgr.best_scores.best
        assert (got.score, got.i, got.j) == (b, bi, bj)
    # special rows at block-row boundaries
    from masa_tpu.models.scoring import border_cells
    from masa_tpu.stages.core import border_gap_values

    col_h, _ = border_cells(m + 1, inits[1], params)
    syn = border_gap_values(col_h.astype(np.int64), params)
    for r in store.rows():
        np.testing.assert_array_equal(store.get(r)[0], ref.h[r])
        np.testing.assert_array_equal(store.get(r)[1][1:], ref.f[r][1:])
        assert store.get(r)[1][0] == syn[r]
    assert len(store) >= 2


def test_block_aligner_custom_borders_match_oracle():
    """A sub-rectangle computed with CUSTOM borders must equal the dense
    matrix's interior values (the stage-3 partition contract)."""
    m, n = 160, 140
    s0, s1 = similar_seqs(m, 11)[0], similar_seqs(n, 12)[0]
    params = ScoreParams()
    ref = oracle.dp_matrix(s0, s1, params, Recurrence.NEEDLEMAN_WUNSCH,
                           InitType.WITH_GAPS, InitType.WITH_GAPS)
    i0, j0 = 40, 30
    al = BlockAligner(block_height=37, block_width=29)
    mgr = AlignerManager(al, params)
    mgr.set_recurrence_type(Recurrence.NEEDLEMAN_WUNSCH)
    mgr.set_first_row(InitType.CUSTOM, (ref.h[i0, j0:], ref.f[i0, j0:]))
    mgr.set_first_column(InitType.CUSTOM, (ref.h[i0:, j0], ref.e[i0:, j0]))
    al.set_sequences(s0, s1)
    mgr.align_partition(Partition(i0, j0, m, n))
    _, lh, lf = mgr.last_row
    np.testing.assert_array_equal(lh, ref.h[-1, j0:])
    # Element 0 is the border column's F, which a partition cannot know
    # (its left border carries H/E only) — pass-through by convention,
    # same as dp_rows/CPUAligner.
    np.testing.assert_array_equal(lf[1:], ref.f[-1, j0 + 1:])


def test_block_pruning_generic_keeps_best_score():
    """Pruning may skip cells but must preserve the best score/location
    for similar sequences (where the best is found early)."""
    m = 700
    s0, s1 = similar_seqs(m, 5, mut=0.05)
    params = ScoreParams()
    ref = oracle.dp_rows(s0, s1, params, Recurrence.SMITH_WATERMAN)

    al = BlockAligner(block_height=96, block_width=96)
    mgr = AlignerManager(al, params)
    mgr.set_recurrence_type(Recurrence.SMITH_WATERMAN)
    mgr.set_block_pruning(True)
    al.set_sequences(s0, s1)
    mgr.align_partition(Partition(0, 0, m, m))
    got = mgr.best_scores.best
    assert (got.score, got.i, got.j) == (ref.best, ref.best_i, ref.best_j)
    assert al.stats.pruned_cells > 0


def test_block_pruning_generic_bound():
    pr = BlockPruningGeneric(1000, 1000, ScoreParams(), best=100)
    # 50 rows x 1000 cols left, entering 40 -> 40 + 50 <= 100: prunable
    assert pr.is_prunable(950, 0, 40)
    # entering 60 -> 60 + 50 > 100: not prunable
    assert not pr.is_prunable(950, 0, 60)
    # NW never prunes
    pr_nw = BlockPruningGeneric(1000, 1000, ScoreParams(),
                                Recurrence.NEEDLEMAN_WUNSCH, best=10**6)
    assert not pr_nw.is_prunable(999, 999, -10**9)


def test_safe_aligner_serializes_threads():
    m, n = 120, 130
    s0, s1 = rand_seqs(m, n, 8)
    params = ScoreParams()
    ref = oracle.dp_matrix(s0, s1, params)
    results = []

    def run():
        al = SafeAligner(BlockAligner(block_height=40, block_width=50))
        mgr = AlignerManager(al, params)
        al.set_sequences(s0, s1)
        mgr.align_partition(Partition(0, 0, m, n))
        results.append(mgr.best_scores.best.score)

    ts = [threading.Thread(target=run) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert results == [ref.best()[0]] * 4
