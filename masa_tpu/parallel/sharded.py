"""Column-sharded multi-chip wavefront (the reference's multi-GPU mode).

The DP matrix is column-partitioned across a 1-D device mesh: device d owns
a vertical slab of seq1 (split_sequences, libmasa.cpp:497-535).  Strips
pipeline diagonally: in round r, device d computes strip ``r - d``; the
strip's last column (H, E) flows to device d+1 via ``ppermute`` over ICI —
replacing the reference's socket cell streams
(io/SocketCellsReader.cpp:33-80) and Buffer2 double-buffering (the compiler
overlaps the collective with the next strip's compute).

Pipeline efficiency is n_strips / (n_strips + D - 1), matching the
reference's block-pipelined multi-GPU wavefront.

Two entry points:

* ``sharded_stage1`` — score-only (the round-1 path): global best + final
  row.
* ``sharded_stage1_full`` / ``sharded_align`` — the full multi-GPU
  pipeline (sw_stage1.cpp:168-196 + libmasa.cpp:659-757): every device
  additionally tracks its slab-local best *endpoint* (engine tie-break),
  accumulates slab-local special rows at a flush cadence, and captures the
  boundary column it received from its left neighbor.  Those per-device
  artifacts become ``PartResult``s and the existing pipelined /
  speculative slab traceback (parallel/split.py) plus stages 3-6 produce
  a full, doubly re-verified alignment.
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


@dataclasses.dataclass
class ShardedFullResult:
    best: int
    best_i: int
    best_j: int
    parts: list          # split.PartResult per non-empty slab
    cells: int
    pruned_strips: np.ndarray | None = None


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


def _sharded_run(
    seq0: np.ndarray,
    seq1: np.ndarray,
    mesh: Mesh,
    cfg: wf.WavefrontConfig | None,
    params: ScoreParams,
    backend: str,
    prune: bool,
    flush_stride: int,
    capture_cols: bool,
):
    """The shared shard_map scan.  flush_stride > 0 accumulates a special
    row every `flush_stride` strips into a carry buffer; capture_cols
    accumulates the received boundary column (the _CapturingReader
    analogue — the reference persists the loaded column through the SRA,
    sra/SpecialRowsPartition.cpp:468-487)."""
    axis = mesh.axis_names[0]
    D = mesh.devices.size
    cfg = cfg or wf.WavefrontConfig(
        recurrence=Recurrence.SMITH_WATERMAN,
    )
    # the kernels score from the config: ALWAYS bake the caller's params
    # in (a caller-supplied cfg with default scores must not silently
    # override non-default params)
    cfg = dataclasses.replace(
        cfg, track_best=True, store_lastcol=True,
        match=params.match, mismatch=params.mismatch,
        gap_open=params.gap_open, gap_ext=params.gap_ext,
    )
    R, L = cfg.rows, cfg.lanes
    m, n = len(seq0), len(seq1)
    n_strips = -(-m // R)
    m_pad = n_strips * R
    W = -(-n // D)
    n_pad = W * D
    rounds = n_strips + D - 1
    n_sp = n_strips // flush_stride if flush_stride else 0

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
            (bus_h, bus_f, recv_h, recv_e, corner, best3, gbest, npruned,
             sp_h, sp_f, fc_h, fc_e) = carry
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
                prunable = entering + gain <= gbest
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
            # slab-local best ENDPOINT with the engine tie-break (skipped
            # strips emit zero captures, which a strict > merge ignores)
            best3 = wf.merge_best_device(best3, bv, bt, s_c * R, 0)
            if prune:
                # circulate the global best every round (the score-share);
                # the bound scalar is separate — best3 stays slab-LOCAL so
                # the host can pick the endpoint's owning device
                gbest = jax.lax.pmax(jnp.maximum(gbest, best3[0]), axis)

            if flush_stride:
                # special row (s+1)*R lands in slot (s+1)/stride - 1
                do_fl = jnp.logical_and(
                    active, (s_c + 1) % flush_stride == 0)
                slot = jnp.clip((s_c + 1) // flush_stride - 1, 0,
                                max(n_sp - 1, 0))
                cur_h = jax.lax.dynamic_slice(sp_h, (slot, 0), (1, W))
                cur_f = jax.lax.dynamic_slice(sp_f, (slot, 0), (1, W))
                sp_h = jax.lax.dynamic_update_slice(
                    sp_h, jnp.where(do_fl, bh[:W][None, :], cur_h),
                    (slot, 0))
                sp_f = jax.lax.dynamic_update_slice(
                    sp_f, jnp.where(do_fl, bf[:W][None, :], cur_f),
                    (slot, 0))
            if capture_cols:
                # the column entering THIS strip covers boundary rows
                # s*R+1 .. (s+1)*R
                cur_h = jax.lax.dynamic_slice(fc_h, (s_c * R,), (R,))
                cur_e = jax.lax.dynamic_slice(fc_e, (s_c * R,), (R,))
                fc_h = jax.lax.dynamic_update_slice(
                    fc_h, jnp.where(active, init_h, cur_h), (s_c * R,))
                fc_e = jax.lax.dynamic_update_slice(
                    fc_e, jnp.where(active, init_e, cur_e), (s_c * R,))

            new_corner = recv_h[R - 1]
            # exchange: last column -> right neighbor
            perm = [(i, i + 1) for i in range(D - 1)]
            nrecv_h = jax.lax.ppermute(lc_h, axis, perm)
            nrecv_e = jax.lax.ppermute(lc_e, axis, perm)
            return (bh, bf, nrecv_h, nrecv_e, new_corner, best3, gbest,
                    npruned, sp_h, sp_f, fc_h, fc_e), None

        z = jnp.asarray(0, jnp.int32)
        best0 = (z, z, z)
        sp0 = jnp.zeros((max(n_sp, 1), W), jnp.int32)
        fc_len = m_pad if capture_cols else 1
        fc0 = jnp.zeros(fc_len, jnp.int32)
        init = (bus_h0, bus_f0, zero_col, neg_col, z, best0, z, z,
                sp0, sp0, fc0, fc0)
        (bus_h, bus_f, _, _, _, best3, _, npruned, sp_h, sp_f, fc_h,
         fc_e), _ = jax.lax.scan(
            round_body, init, jnp.arange(rounds, dtype=jnp.int32)
        )
        return (
            jnp.stack(best3).reshape(1, 3),
            bus_h[:W].reshape(1, W),
            bus_f[:W].reshape(1, W),
            npruned.reshape(1),
            sp_h.reshape(1, max(n_sp, 1), W),
            sp_f.reshape(1, max(n_sp, 1), W),
            fc_h.reshape(1, fc_len),
            fc_e.reshape(1, fc_len),
        )

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis),
                   P(axis, None, None), P(axis, None, None),
                   P(axis, None), P(axis, None)),
        check_vma=False,
    )
    out = jax.jit(fn)(jnp.asarray(b_sharded), jnp.asarray(seq0_pad))
    names = ("best3", "last_h", "last_f", "npruned", "sp_h", "sp_f",
             "fc_h", "fc_e")
    host = {k: np.asarray(v) for k, v in zip(names, out)}
    host.update(m=m, n=n, W=W, D=D, R=R, n_strips=n_strips, n_sp=n_sp,
                m_pad=m_pad, n_pad=n_pad, flush_stride=flush_stride)
    return host


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
    h = _sharded_run(seq0, seq1, mesh, cfg, params, backend, prune,
                     flush_stride=0, capture_cols=False)
    return ShardedResult(
        best=int(h["best3"][:, 0].max()),
        last_h=h["last_h"].reshape(h["n_pad"]),
        last_f=h["last_f"].reshape(h["n_pad"]),
        cells=h["m_pad"] * h["n_pad"],
        pruned_strips=h["npruned"],
    )


def sharded_stage1_full(
    seq0: np.ndarray,
    seq1: np.ndarray,
    mesh: Mesh,
    cfg: wf.WavefrontConfig | None = None,
    params: ScoreParams = ScoreParams(),
    backend: str = "scan",
    prune: bool = False,
    flush_stride: int = 1,
) -> ShardedFullResult:
    """Stage 1 with everything traceback needs, per device: the slab-local
    best endpoint, special rows every ``flush_stride`` strips, and the
    received boundary column — the multi-GPU stage 1 of
    sw_stage1.cpp:168-196 with ppermute in place of sockets.  The returned
    ``parts`` feed ``pipelined_traceback`` / ``speculative_traceback``
    directly (libmasa.cpp:659-757)."""
    from masa_tpu.stages.core import SpecialRowStore
    from masa_tpu.parallel.split import PartResult

    h = _sharded_run(seq0, seq1, mesh, cfg, params, backend, prune,
                     flush_stride=max(flush_stride, 1), capture_cols=True)
    m, n, W, D, R = h["m"], h["n"], h["W"], h["D"], h["R"]
    stride = h["flush_stride"]

    parts: list[PartResult] = []
    for d in range(D):
        j0 = d * W
        if j0 >= n:
            break
        j1 = min(j0 + W, n)
        w_d = j1 - j0
        # boundary column (H, E) for rows 0..m at global column j0
        if d > 0:
            fch = np.empty(m + 1, np.int64)
            fce = np.empty(m + 1, np.int64)
            fch[0] = 0          # SW row-0 border
            fce[0] = NEG
            fch[1:] = h["fc_h"][d][:m]
            fce[1:] = h["fc_e"][d][:m]
            first_col = (fch, fce)
        else:
            first_col = None
        store = SpecialRowStore()
        for slot in range(h["n_sp"]):
            r = (slot + 1) * stride * R
            if r > m:
                break
            h_full = np.empty(w_d + 1, np.int64)
            f_full = np.empty(w_d + 1, np.int64)
            h_full[0] = first_col[0][r] if first_col is not None else 0
            f_full[0] = NEG
            h_full[1:] = h["sp_h"][d][slot][:w_d]
            f_full[1:] = h["sp_f"][d][slot][:w_d]
            store.put(r, h_full, f_full)
        bv, bi, bj = (int(x) for x in h["best3"][d])
        parts.append(PartResult(
            best=bv, best_i=bi, best_j=j0 + bj,
            last_h=h["last_h"][d][:w_d].astype(np.int64),
            last_f=h["last_f"][d][:w_d].astype(np.int64),
            cells=h["m_pad"] * w_d,
            specials=store, first_col=first_col, j0=j0, j1=j1,
        ))

    # global endpoint: max score, then smallest i, then smallest j
    gbest = max(((p.best, -p.best_i, -p.best_j, k)
                 for k, p in enumerate(parts)))
    k = gbest[3]
    return ShardedFullResult(
        best=parts[k].best, best_i=parts[k].best_i,
        best_j=parts[k].best_j, parts=parts,
        cells=h["m_pad"] * h["n_pad"], pruned_strips=h["npruned"],
    )


def sharded_align(
    seq0: np.ndarray,
    seq1: np.ndarray,
    mesh: Mesh,
    cfg: wf.WavefrontConfig | None = None,
    params: ScoreParams = ScoreParams(),
    backend: str = "scan",
    prune: bool = False,
    flush_stride: int = 1,
    traceback: str = "pipelined",
    max_cells_stage5: int = 1 << 18,
):
    """The full multi-chip alignment: sharded stage 1 over the mesh, then
    pipelined or speculative slab traceback (stage 2), densification
    (stage 3), exact per-partition traceback with the score invariant
    (stage 5) and the independent stage-6 re-check.

    Returns (best_score, Alignment).  The reference equivalent is the
    whole multi-GPU claim: executeTracebackPipelined / Predicted,
    libmasa.cpp:659-757."""
    from masa_tpu.parallel.split import (
        pipelined_traceback, speculative_traceback,
    )
    from masa_tpu.stages import pipeline, stage6

    full = sharded_stage1_full(seq0, seq1, mesh, cfg, params, backend,
                               prune, flush_stride)
    if traceback == "speculative":
        cps, _reused = speculative_traceback(seq0, seq1, full.parts,
                                             params)
    else:
        cps = pipelined_traceback(seq0, seq1, full.parts, params)
    pcfg = pipeline.PipelineConfig(
        params=params, max_cells_stage5=max_cells_stage5,
    )
    cps = pipeline.stage3_densify(seq0, seq1, pcfg, cps)
    aln = pipeline.stage5_emit(seq0, seq1, pcfg, cps)
    stage6.recheck(aln, seq0, seq1, params)
    if aln.raw_score != full.best:
        raise RuntimeError(
            f"sharded alignment score {aln.raw_score} != stage-1 best "
            f"{full.best}")
    return full.best, aln
