"""Stage 4 on the TPU: level-batched Myers-Miller splitting.

The reference runs stage 4 on 4 CPU pthreads (stage4/sw_stage4.cpp:806)
because its GPUs are busy elsewhere; on a single-host TPU system the
accelerator is the fast resource and the host may have ONE core.  This
module re-designs the stage TPU-first:

  * Every adjacent crosspoint pair at a split level needs one forward and
    one reverse NW half-pass.  ALL pairs of a level run as ONE
    ``jax.vmap``-ed wavefront call per direction (per chained strip):
    widths AND heights are traced scalars of the dynamic kernel
    (``wf.strip_scan_dyn``), so a level is ~2-4 device dispatches and the
    only compile key is (config, scan length) — a handful of compiles for
    the whole stage, persisted by the compilation cache.
  * Widths pad to a pow2 bucket with sentinel columns (exact: DP
    dependencies never flow leftward, so padded columns cannot change
    real-region values).  Heights chain over fixed-size strips; elements
    that finished earlier keep their bus through a traced mask.
  * Total work is ~4x the input area spread over log2(h/mps) levels —
    seconds of TPU time where a scalar CPU path needs minutes.

The split row is ANY interior row; snapping the top half to an
8-per-octave bucket keeps the level hierarchy on few distinct heights —
every distinct (config, width, height) of the per-pair Pallas path is a
separate remote Mosaic compile.  (Crosspoints therefore may differ
legally from the Python h//2 splitter; every result satisfies the
stage-5 score-invariant contract.)
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from masa_tpu.models.scoring import border_cells, match_column
from masa_tpu.ops import wavefront as wf
from masa_tpu.stages import core as score
from masa_tpu.types import (
    INF,
    Crosspoint,
    CrosspointType,
    MatchType,
    Recurrence,
    ScoreParams,
)

NEG = -INF


# The dyn kernel is pure XLA (lax.scan), so tiny vector shapes are legal
# (no Mosaic restrictions): deep levels with short partitions must not
# run a 32768-row lane grid.
_MM_LADDER = (
    wf.WavefrontConfig(alpha=4, rs=1, chunk=512),    # R = 512
    wf.WavefrontConfig(alpha=4, rs=8, chunk=4096),   # R = 4096
    wf.WavefrontConfig(alpha=8, rs=32, chunk=8192),  # R = 32768
)


def _mm_cfg(h_max: int) -> wf.WavefrontConfig:
    """Smallest ladder config whose strip covers h_max (chaining above
    the largest).  Compile keys are (config, scan length) only."""
    base = _MM_LADDER[-1]
    for cfg in _MM_LADDER:
        if cfg.rows >= h_max:
            base = cfg
            break
    return dataclasses.replace(
        base, recurrence=Recurrence.NEEDLEMAN_WUNSCH,
        track_best=False, store_lastcol=False)


@functools.lru_cache(maxsize=32)
def _batched_strip(cfg: wf.WavefrontConfig, T: int):
    """jit(vmap) of one chained strip of the dynamic kernel.  Per element:
    h_rem (traced) is the element's remaining rows at this chain step;
    finished elements (h_rem <= 0) pass their buses through unchanged.
    Buses are returned LOGICALLY aligned (column j at index j)."""
    R = cfg.rows
    a = cfg.alpha

    def one(a_lanes, b, bus_h, bus_f, init_h, init_e, corner, h_rem):
        hs = jnp.clip(h_rem, 1, R)
        ph, pf = wf.strip_scan_dyn(cfg, a_lanes, b, bus_h, bus_f, init_h,
                                   init_e, corner, 0, hs, T=T)
        lane = (hs - 1) // a
        idx = jnp.arange(T, dtype=jnp.int32) + lane
        safe = jnp.clip(idx, 0, T - 1)
        lh = jnp.where(idx < T, ph[safe], NEG)
        lf = jnp.where(idx < T, pf[safe], NEG)
        keep = h_rem > 0
        return (jnp.where(keep, lh, bus_h),
                jnp.where(keep, lf, bus_f))

    return jax.jit(jax.vmap(one))


def _split_height(h: int) -> int:
    """Top-half height: ~h/2 rounded DOWN to an 8-per-octave bucket (in
    [1, h-1])."""
    t = h // 2
    if t <= 128:
        return max(t, 1)
    q = 1 << max(t.bit_length() - 4, 0)
    return (t // q) * q


@dataclasses.dataclass
class _Half:
    """One half-pass request: NW last row of sub0 x sub1 with pinned
    borders."""

    sub0: np.ndarray
    sub1: np.ndarray
    row_init: int
    col_init: int


# Measured constants of this environment (see CLAUDE.md): the batched
# XLA scan costs ~22 us per (row-step x batch element); a per-pair Pallas
# call costs ~0.35 s of dispatch+compute.  Choose per level by cost.
_SCAN_S_PER_ROWSTEP = 22e-6
_PALLAS_S_PER_CALL = 0.35
# HBM bound for one batched-kernel call: B * plen * 4B * ~6 arrays
_PALLAS_MAX_BYTES = 1 << 30


def _pallas_mm_cfg(h: int):
    from masa_tpu.stages.core import _TPU_LADDER

    base = _TPU_LADDER[-1]
    for c in _TPU_LADDER:
        if c.rows >= h:
            base = c
            break
    return dataclasses.replace(
        base, recurrence=Recurrence.NEEDLEMAN_WUNSCH,
        track_best=False, store_lastcol=False)


@functools.lru_cache(maxsize=64)
def _pallas_group_fn(cfg, njq: int, hk: int, B: int):
    """One chained-strip step for a HEIGHT GROUP: the batched Mosaic
    kernel + logical realignment, one dispatch for all B elements."""
    import jax.numpy as jnp

    plen = wf.padded_len(cfg, njq)
    lane = (hk - 1) // cfg.alpha

    def go(a_all, b_all, bh_all, bf_all, ih_all, ie_all, corners):
        ph, pf = wf.batched_strip_pallas(
            cfg, a_all, b_all, bh_all, bf_all, ih_all, ie_all, corners,
            nj=njq, h_true=hk, B=B)
        fill = jnp.full((B, lane), NEG, jnp.int32)
        lh = jnp.concatenate([ph[:, lane:], fill], axis=1)
        lf = jnp.concatenate([pf[:, lane:], fill], axis=1)
        return lh, lf

    return jax.jit(go)


def _run_halves_per_pair(halves, params):
    """Equal-height halves, one fused Pallas dispatch per (pair, chained
    strip).  Independent pairs pipeline through async dispatch, which
    measured FASTER than the grouped batched kernel below."""
    import jax.numpy as jnp

    h = len(halves[0].sub0)
    cfg = _pallas_mm_cfg(h)
    R = cfg.rows
    out = []
    for hf in halves:
        w = len(hf.sub1)
        njq = max(cfg.chunk, 1 << (max(w, 1) - 1).bit_length())
        plen = wf.padded_len(cfg, njq)
        b = np.full(plen, wf.B_SENTINEL, np.int32)
        b[:w] = np.asarray(hf.sub1, np.int32)
        rh, _ = border_cells(w + 1, hf.row_init, params)
        bh = np.full(plen, NEG, np.int32)
        bf = np.full(plen, NEG, np.int32)
        bh[:w] = rh[1:]
        bh_d, bf_d = jnp.asarray(bh), jnp.asarray(bf)
        b_d = jnp.asarray(b)
        carry = (jnp.int32(0),) * 3
        for s0r in range(0, h, R):
            hk = min(R, h - s0r)
            a_lanes = jnp.asarray(wf.pack_strip_rows(
                cfg, np.asarray(hf.sub0[s0r : s0r + hk], np.int32)))
            ch, ce = border_cells(hk, hf.col_init, params, start=s0r + 1)
            ihp, iep = wf.pack_border_cols(cfg, ch, ce)
            ch0, _ = border_cells(1, hf.col_init, params, start=s0r)
            bh_d, bf_d, carry = wf.strip_step(
                cfg, a_lanes, jnp.asarray(ihp), jnp.asarray(iep),
                int(ch0[0]), b_d, bh_d, bf_d, carry, 0, njq, False,
                h_true=hk,
            )
        lh = np.empty(w + 1, np.int64)
        lf = np.empty(w + 1, np.int64)
        chb, _ = border_cells(h + 1, hf.col_init, params)
        lh[0] = chb[h]
        lf[0] = score._border_f_value(hf.col_init, h, params)
        lh[1:] = np.asarray(bh_d[:w])
        lf[1:] = np.asarray(bf_d[:w])
        out.append((lh, lf))
    return out


def _run_halves_pallas(halves, params):
    """Equal-height halves through the BATCHED Mosaic kernel: one
    dispatch per chained strip for the whole group.  Measured slower than
    _run_halves_per_pair on the tunneled chip (async dispatch pipelines
    pairs; the (B, chunks) grid serializes them) — kept as an available
    engine."""
    import jax.numpy as jnp

    h = len(halves[0].sub0)
    assert all(len(x.sub0) == h for x in halves)
    cfg = _pallas_mm_cfg(h)
    R = cfg.rows
    B = len(halves)
    w_max = max(len(x.sub1) for x in halves)
    njq = max(cfg.chunk, 1 << (max(w_max, 1) - 1).bit_length())
    plen = wf.padded_len(cfg, njq)

    b_cap = max(1, _PALLAS_MAX_BYTES // (plen * 24))
    if B > b_cap:
        out = []
        for o in range(0, B, b_cap):
            out.extend(_run_halves_pallas(halves[o : o + b_cap], params))
        return out

    b_all = np.full((B, plen), wf.B_SENTINEL, np.int32)
    bh = np.full((B, plen), NEG, np.int32)
    bf = np.full((B, plen), NEG, np.int32)
    for k, hf in enumerate(halves):
        w = len(hf.sub1)
        b_all[k, :w] = np.asarray(hf.sub1, np.int32)
        rh, _ = border_cells(w + 1, hf.row_init, params)
        bh[k, :w] = rh[1:]
    b_d = jnp.asarray(b_all)
    bh_d, bf_d = jnp.asarray(bh), jnp.asarray(bf)

    for s0r in range(0, h, R):
        hk = min(R, h - s0r)
        a_all = np.empty((B, cfg.alpha, cfg.rs, 128), np.int32)
        ih_all = np.empty_like(a_all)
        ie_all = np.empty_like(a_all)
        corners = np.zeros(B, np.int32)
        for k, hf in enumerate(halves):
            a_all[k] = wf.pack_strip_rows(
                cfg, np.asarray(hf.sub0[s0r : s0r + hk], np.int32))
            ch, ce = border_cells(hk, hf.col_init, params, start=s0r + 1)
            ihp, iep = wf.pack_border_cols(cfg, ch, ce)
            ih_all[k], ie_all[k] = ihp, iep
            ch0, _ = border_cells(1, hf.col_init, params, start=s0r)
            corners[k] = ch0[0]
        fn = _pallas_group_fn(cfg, njq, hk, B)
        bh_d, bf_d = fn(jnp.asarray(a_all), b_d, bh_d, bf_d,
                        jnp.asarray(ih_all), jnp.asarray(ie_all),
                        jnp.asarray(corners))

    bh = np.asarray(bh_d)
    bf = np.asarray(bf_d)
    out = []
    for k, hf in enumerate(halves):
        w = len(hf.sub1)
        lh = np.empty(w + 1, np.int64)
        lf = np.empty(w + 1, np.int64)
        chb, _ = border_cells(h + 1, hf.col_init, params)
        lh[0] = chb[h]
        lf[0] = score._border_f_value(hf.col_init, h, params)
        lh[1:] = bh[k, :w]
        lf[1:] = bf[k, :w]
        out.append((lh, lf))
    return out


# One device call must stay well under the remote service's execution
# watchdog (a single vmapped scan of B x T row-steps that runs for
# minutes gets the worker killed: "TPU worker process crashed").
_MAX_ROWSTEPS_PER_CALL = 3_000_000


def _run_halves(halves: list[_Half], params: ScoreParams
                ) -> list[tuple[np.ndarray, np.ndarray]]:
    """Run a batch of half-passes (arbitrary heights/widths) in
    ceil(max_h / R) device calls.  Returns per half the (w+1,) last-row
    (H, F) with the synthesized border gap value at k=0."""
    B = len(halves)
    h_max = max(len(x.sub0) for x in halves)
    import jax as _jax

    cfg0 = _mm_cfg(h_max)
    w_max0 = max(len(x.sub1) for x in halves)
    njq0 = max(128, 1 << (max(w_max0, 1) - 1).bit_length())
    chains = -(-h_max // cfg0.rows)
    per_elem = cfg0.steps(njq0) * chains
    if _jax.default_backend() == "tpu":
        # Per-pair Pallas when the batched scan would be slower.  (A
        # grouped batched Mosaic kernel — wf.batched_strip_pallas — was
        # measured SLOWER end-to-end than per-pair calls here: async
        # dispatch pipelines independent pairs, while the (B, chunks)
        # grid serializes them; the primitive is kept for future use.)
        est_batched = B * per_elem * _SCAN_S_PER_ROWSTEP
        est_pallas = B * max(1, -(-h_max // 131072)) * _PALLAS_S_PER_CALL
        if est_pallas < est_batched:
            by_h: dict[int, list[int]] = {}
            for i, hf in enumerate(halves):
                by_h.setdefault(len(hf.sub0), []).append(i)
            rows: list = [None] * B
            for hgrp, idxs in by_h.items():
                grp = [halves[i] for i in idxs]
                for i, row in zip(idxs,
                                  _run_halves_per_pair(grp, params)):
                    rows[i] = row
            return rows

    # bound the duration of a single vmapped call
    b_cap = max(1, _MAX_ROWSTEPS_PER_CALL // max(per_elem, 1))
    if B > b_cap:
        out = []
        for o in range(0, B, b_cap):
            out.extend(_run_halves(halves[o : o + b_cap], params))
        return out
    cfg = cfg0
    R = cfg.rows
    # pow2 width bucket: the scan length is the only shape compile key
    njq = njq0
    T = cfg.steps(njq)

    b_all = np.full((B, T), wf.B_SENTINEL, np.int32)
    bh = np.full((B, T), NEG, np.int32)
    bf = np.full((B, T), NEG, np.int32)
    for k, hf in enumerate(halves):
        w = len(hf.sub1)
        rh, _ = border_cells(w + 1, hf.row_init, params)
        b_all[k, :w] = np.asarray(hf.sub1, np.int32)
        bh[k, :w] = rh[1:]

    heights = np.array([len(x.sub0) for x in halves], np.int32)
    fn = _batched_strip(cfg, T)
    for s0r in range(0, h_max, R):
        a_all = np.empty((B, cfg.alpha, cfg.rs, 128), np.int32)
        ih_all = np.empty_like(a_all)
        ie_all = np.empty_like(a_all)
        corners = np.zeros(B, np.int32)
        for k, hf in enumerate(halves):
            hk = min(max(len(hf.sub0) - s0r, 0), R)
            a_all[k] = wf.pack_strip_rows(
                cfg, np.asarray(hf.sub0[s0r : s0r + hk], np.int32))
            ch, ce = border_cells(max(hk, 1), hf.col_init, params,
                                  start=s0r + 1)
            ihp, iep = wf.pack_border_cols(cfg, ch, ce)
            ih_all[k], ie_all[k] = ihp, iep
            ch0, _ = border_cells(1, hf.col_init, params, start=s0r)
            corners[k] = ch0[0]
        bh, bf = fn(a_all, b_all, bh, bf, ih_all, ie_all, corners,
                    heights - s0r)
    bh = np.asarray(bh)
    bf = np.asarray(bf)

    out = []
    for k, hf in enumerate(halves):
        h = len(hf.sub0)
        w = len(hf.sub1)
        lh = np.empty(w + 1, np.int64)
        lf = np.empty(w + 1, np.int64)
        ch, _ = border_cells(h + 1, hf.col_init, params)
        lh[0] = ch[h]
        lf[0] = score._border_f_value(hf.col_init, h, params)
        lh[1:] = bh[k, :w]
        lf[1:] = bf[k, :w]
        out.append((lh, lf))
    return out


def reduce_partitions_batched(
    seq0: np.ndarray,
    seq1: np.ndarray,
    cps: list[Crosspoint],
    params: ScoreParams,
    max_partition: int = 16,
    log=None,
    batch_cap: int = 1024,
) -> list[Crosspoint]:
    """Split every adjacent pair until max(height, width) <= max_partition,
    batching all half-passes of a level into a few device calls.
    `batch_cap` bounds device memory ((B, T) int32 buffers)."""
    seq0 = np.asarray(seq0, np.uint8)
    seq1 = np.asarray(seq1, np.uint8)

    done: list[tuple[Crosspoint, Crosspoint]] = []
    work = list(zip(cps, cps[1:]))
    level = 0
    while True:
        pending = []
        for c0, c1 in work:
            h, w = c1.i - c0.i, c1.j - c0.j
            if max(h, w) <= max_partition or h < 2:
                done.append((c0, c1))
            else:
                pending.append((c0, c1))
        if not pending:
            break
        level += 1

        meta = []
        fwd_halves = []
        rev_halves = []
        for c0, c1 in pending:
            h = c1.i - c0.i
            rm = c0.i + _split_height(h)
            meta.append((c0, c1, rm))
            ri, ci = score.init_types_for(c0.type)
            fwd_halves.append(_Half(
                np.ascontiguousarray(seq0[c0.i : rm]),
                np.ascontiguousarray(seq1[c0.j : c1.j]), ri, ci))
            ri, ci = score.init_types_for(c1.type)
            rev_halves.append(_Half(
                np.ascontiguousarray(seq0[rm : c1.i][::-1]),
                np.ascontiguousarray(seq1[c0.j : c1.j][::-1]), ri, ci))

        def run_capped(halves):
            rows = []
            for o in range(0, len(halves), batch_cap):
                rows.extend(_run_halves(halves[o : o + batch_cap],
                                        params))
            return rows

        fwd_rows = run_capped(fwd_halves)
        rev_rows = run_capped(rev_halves)

        next_work = []
        for (c0, c1, rm), (fh, ff), (rh, rf) in zip(meta, fwd_rows,
                                                    rev_rows):
            goal = c1.score - c0.score + (
                params.gap_open if c1.type != CrosspointType.MATCH else 0
            )
            # descending-j scan (same as myers_miller.split_partition:
            # rev rows indexed by c1.j - j are already descending in j)
            mres = match_column(
                rh, rf, fh[::-1], ff[::-1],
                goal, params.gap_open,
            )
            if not mres.found:
                raise RuntimeError(
                    f"batched Myers-Miller lost the path in {c0}->{c1}"
                )
            j_star = c1.j - mres.k
            t = (CrosspointType.MATCH if mres.type == MatchType.ALIGNED
                 else CrosspointType.GAP_2)
            cm = Crosspoint(rm, j_star, c0.score + int(mres.score), t)
            next_work.append((c0, cm))
            next_work.append((cm, c1))
        if log:
            log(f"stage4[batched]: level {level}: {len(pending)} pairs")
        work = next_work

    # reassemble in path order: emit c1 of every pair sorted by position
    done.sort(key=lambda p: (p[0].i, p[0].j))
    out = [cps[0]] + [c1 for _, c1 in done]
    return out
