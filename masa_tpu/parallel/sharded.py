"""Column-sharded multi-chip wavefront (the reference's multi-GPU stage 1).

The DP matrix is column-partitioned across a 1-D device mesh: device d owns
a vertical slab of seq1 (split_sequences, libmasa.cpp:497-535).  Strips
pipeline diagonally: in round r, device d computes strip ``r - d``; the
strip's last column (H, E) flows to device d+1 via ``ppermute`` over ICI —
replacing the reference's socket cell streams
(io/SocketCellsReader.cpp:33-80) and Buffer2 double-buffering (the compiler
overlaps the collective with the next strip's compute).

Pipeline efficiency is n_strips / (n_strips + D - 1), matching the
reference's block-pipelined multi-GPU wavefront.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from masa_tpu.ops import wavefront as wf
from masa_tpu.types import INF, Recurrence, ScoreParams

NEG = -INF


@dataclasses.dataclass
class ShardedResult:
    best: int
    last_h: np.ndarray  # (n_pad,) final-row H across all slabs
    last_f: np.ndarray
    cells: int
    pruned_strips: np.ndarray | None = None  # per-device skip counts


def _strip_fn(cfg, W, backend):
    """Run one strip over a local slab given border state.  Returns
    (bus_h, bus_f, lastcol_h, lastcol_e, best_v, best_t)."""
    T = cfg.steps(W)
    blen = wf.padded_len(cfg, W) if backend == "pallas" else T

    def run(a_strip, b_ext, bus_h, bus_f, init_h_vec, init_e_vec, corner):
        a_lanes = wf.pack_lanes_jnp(cfg, a_strip)
        init_h = wf.pack_lanes_jnp(cfg, init_h_vec)
        init_e = wf.pack_lanes_jnp(cfg, init_e_vec)
        if backend == "pallas":
            out = wf.strip_pallas(
                cfg, a_lanes, b_ext, bus_h, bus_f, init_h, init_e,
                corner, W, cfg.rows,
            )
            bh = wf.slice_bus(cfg, out["bus_h"], W, cfg.rows)
            bf = wf.slice_bus(cfg, out["bus_f"], W, cfg.rows)
        else:
            out = wf.strip_scan(
                cfg, a_lanes, b_ext, bus_h, bus_f, init_h, init_e,
                corner, W, cfg.rows,
            )
            bh, bf = out["bus_h"], out["bus_f"]
        pad = blen - W
        bh = jnp.concatenate([bh, jnp.full(pad, NEG, jnp.int32)])
        bf = jnp.concatenate([bf, jnp.full(pad, NEG, jnp.int32)])
        return (bh, bf, out["lastcol_h"], out["lastcol_e"],
                out["best_v"], out["best_t"])

    return run, blen


def sharded_stage1(
    seq0: np.ndarray,
    seq1: np.ndarray,
    mesh: Mesh,
    cfg: wf.WavefrontConfig | None = None,
    params: ScoreParams = ScoreParams(),
    backend: str = "scan",
    prune: bool = False,
) -> ShardedResult:
    """Score-only SW forward pass, column-sharded over the mesh.

    Zeros borders (local alignment).  Returns the global best score and the
    final DP row (concatenated slabs).

    ``prune=True`` enables **score-share block pruning across shards** (the
    TPDS2021 distributed pruning the reference could not do over sockets —
    it disables pruning in multi-GPU runs, libmasa.cpp:1318-1323): the
    global best circulates through a scalar ``pmax`` every round, and a
    device skips a strip when
        max(entering H, 0) + min(rows_left, global cols_right) * match
    cannot beat it (AbstractBlockPruning::isBlockPrunable bound over the
    whole remaining matrix, not just the local slab).  Skipped strips write
    -INF buses/columns (clearPrunedBlocks semantics), which stays exact
    for SW because fresh alignments restart from 0 anywhere.
    """
    axis = mesh.axis_names[0]
    D = mesh.devices.size
    cfg = cfg or wf.WavefrontConfig(
        track_best=True, store_lastcol=True,
        recurrence=Recurrence.SMITH_WATERMAN,
        match=params.match, mismatch=params.mismatch,
        gap_open=params.gap_open, gap_ext=params.gap_ext,
    )
    cfg = dataclasses.replace(cfg, track_best=True, store_lastcol=True)
    R, L = cfg.rows, cfg.lanes
    m, n = len(seq0), len(seq1)
    n_strips = -(-m // R)
    m_pad = n_strips * R
    W = -(-n // D)
    n_pad = W * D
    rounds = n_strips + D - 1

    seq0_pad = np.full(m_pad, wf.A_SENTINEL, np.int32)
    seq0_pad[:m] = seq0
    b_pad = np.full(n_pad, wf.B_SENTINEL, np.int32)
    b_pad[:n] = seq1
    b_sharded = b_pad.reshape(D, W)

    run_strip, blen = _strip_fn(cfg, W, backend)

    def shard_fn(b_local, seq0_all):
        d = jax.lax.axis_index(axis)
        b_loc = b_local.reshape(W)
        b_ext = jnp.concatenate(
            [b_loc, jnp.full(blen - W, wf.B_SENTINEL, jnp.int32)]
        )
        zero_col = jnp.zeros(R, jnp.int32)       # SW zero borders
        neg_col = jnp.full(R, NEG, jnp.int32)

        bus_h0 = jnp.where(
            jnp.arange(blen) < W, 0, NEG
        ).astype(jnp.int32)                       # row-0 zeros border
        bus_f0 = jnp.full(blen, NEG, jnp.int32)

        neg_bus = jnp.full(blen, NEG, jnp.int32)

        def round_body(carry, r):
            (bus_h, bus_f, recv_h, recv_e, corner, best, npruned) = carry
            s = r - d
            active = jnp.logical_and(s >= 0, s < n_strips)
            s_c = jnp.clip(s, 0, n_strips - 1)
            a_strip = jax.lax.dynamic_slice(seq0_all, (s_c * R,), (R,))
            init_h = jnp.where(d == 0, zero_col, recv_h)
            init_e = jnp.where(d == 0, neg_col, recv_e)
            corner_eff = jnp.where(d == 0, 0, corner)

            if prune:
                # score-share pruning bound over the REMAINING GLOBAL
                # matrix from this strip's top-left corner
                entering = jnp.maximum(
                    jnp.maximum(jnp.max(bus_h), jnp.max(init_h)),
                    jnp.int32(0),
                )
                rows_left = jnp.int32(m) - s_c * R
                cols_left = jnp.int32(n) - d * W
                gain = jnp.minimum(rows_left, cols_left) * cfg.match
                prunable = entering + gain <= best
                run_it = jnp.logical_and(active, ~prunable)
                npruned = npruned + jnp.where(
                    jnp.logical_and(active, prunable), 1, 0
                )
            else:
                run_it = active

            def do(_):
                return run_strip(a_strip, b_ext, bus_h, bus_f,
                                 init_h, init_e, corner_eff)

            def skip(_):
                if prune:
                    # pruned strips clear their buses/columns to -INF
                    # (consumed downstream); inactive strips keep state
                    pr = jnp.logical_and(active, True)
                    bh_s = jnp.where(pr, neg_bus, bus_h)
                    bf_s = jnp.where(pr, neg_bus, bus_f)
                    lc = jnp.where(pr, jnp.full(R, NEG, jnp.int32),
                                   zero_col)
                else:
                    bh_s, bf_s, lc = bus_h, bus_f, zero_col
                return (
                    bh_s, bf_s, lc, neg_col,
                    jnp.zeros((cfg.alpha, L), jnp.int32),
                    jnp.zeros((cfg.alpha, L), jnp.int32),
                )

            bh, bf, lc_h, lc_e, bv, bt = jax.lax.cond(run_it, do, skip,
                                                      None)
            strip_best = jnp.where(run_it, jnp.max(bv), 0)
            best = jnp.maximum(best, strip_best)
            if prune:
                # circulate the global best every round (the score-share)
                best = jax.lax.pmax(best, axis)
            new_corner = recv_h[R - 1]
            # exchange: last column -> right neighbor
            perm = [(i, i + 1) for i in range(D - 1)]
            nrecv_h = jax.lax.ppermute(lc_h, axis, perm)
            nrecv_e = jax.lax.ppermute(lc_e, axis, perm)
            return (bh, bf, nrecv_h, nrecv_e, new_corner, best,
                    npruned), None

        init = (bus_h0, bus_f0, zero_col, neg_col,
                jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                jnp.asarray(0, jnp.int32))
        (bus_h, bus_f, _, _, _, best, npruned), _ = jax.lax.scan(
            round_body, init, jnp.arange(rounds, dtype=jnp.int32)
        )
        best = jax.lax.pmax(best, axis)
        return (
            best.reshape(1),
            bus_h[:W].reshape(1, W),
            bus_f[:W].reshape(1, W),
            npruned.reshape(1),
        )

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=(P(axis), P(axis, None), P(axis, None), P(axis)),
        check_vma=False,
    )
    best, last_h, last_f, npruned = jax.jit(fn)(
        jnp.asarray(b_sharded), jnp.asarray(seq0_pad)
    )
    return ShardedResult(
        best=int(np.asarray(best)[0]),
        last_h=np.asarray(last_h).reshape(n_pad),
        last_f=np.asarray(last_f).reshape(n_pad),
        cells=m_pad * n_pad,
        pruned_strips=np.asarray(npruned),
    )
