"""Stage 4 on the TPU: level-batched, device-resident Myers-Miller.

The reference runs stage 4 on 4 CPU pthreads (stage4/sw_stage4.cpp:806)
because its GPUs are busy elsewhere; on a single-host TPU system the
accelerator is the fast resource and the host may have ONE core.  This
module re-designs the stage TPU-first:

  * Every adjacent crosspoint pair at a split level needs one forward and
    one reverse NW half-pass.  All pairs of a level run batched: wide
    levels through the dynamic-height Mosaic kernel
    (wf.batched_strip_pallas_dyn, one compile key per (cfg, width,
    tile)), deep/narrow levels through the XLA row-sweep engine
    (ops/rowsweep, measured ~9x faster there) — chosen by a measured
    cost model.
  * **Device-resident data plane**: the four sequence views (seq0, seq1,
    and their reverses) upload ONCE; every half-pass slices its strip
    rows and column window on-device (`lax.dynamic_slice`), synthesizes
    its pinned borders on-device from init-type codes, and the
    Myers-Miller column matching runs on-device too — the only per-pair
    traffic is a handful of scalars.  (The previous design uploaded
    ~1-2 MB of packed strips/borders per half and pulled whole last rows;
    at the tunnel's ~0.4 s/MB that dwarfed the compute.)
  * Widths pad to a shared pow2 bucket per level with sentinel columns
    (exact: DP dependencies never flow leftward, so padded columns cannot
    change real-region values; rows below a half's height likewise only
    read upward).  Heights chain over fixed-size strips.
  * The split row snaps to lane-granularity buckets so most halves are
    tail-free; the 1-2 odd-height chains (endpoint/start partitions)
    finish through a subset row-sweep.  Crosspoints may differ legally
    from the Python h//2 splitter; every result satisfies the stage-5
    score invariant.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from masa_tpu.models.scoring import border_cells
from masa_tpu.ops import wavefront as wf
from masa_tpu.stages import core as score
from masa_tpu.types import (
    INF,
    Crosspoint,
    CrosspointType,
    InitType,
    Recurrence,
    ScoreParams,
)

NEG = -INF

_CODE = {
    InitType.WITH_ZEROES: 0,
    InitType.WITH_GAPS: 1,
    InitType.WITH_GAPS_OPENED: 2,
}


# traced border synthesis lives in the kernel module (one copy of the
# border semantics next to the kernels that consume it)
_border_h_dev = wf.border_h_traced


def _split_height(h: int) -> int:
    """Top-half height: ~h/2 rounded DOWN to a lane-granularity multiple
    (in [1, h-1]).  The dynamic-height Mosaic kernel handles any
    multiple of alpha*128 with ONE compile key; bucketing the split to
    1024 (legal for both rungs) makes most halves tail-free, and the
    sub-granularity tails chain through the XLA dyn engine."""
    t = h // 2
    if t >= 2048:
        return (t // 1024) * 1024
    if t >= 512:
        return (t // 512) * 512
    return max(t, 1)


@dataclasses.dataclass
class _Half:
    """One half-pass request against the device-resident sequence views:
    rows [i0, i0+h) x columns [j0, j0+w) of (seq0d, seq1d) — for reverse
    halves the offsets index the REVERSED views."""

    i0: int
    h: int
    j0: int
    w: int
    row_code: int
    col_code: int


class _DevSeqs:
    """The four device-resident sequence views, sentinel-padded so any
    (offset, static-size) slice is in bounds.  Views come from the
    shared wf.dev_seq cache: the forward arrays are usually already on
    device from stage 1 (pad-flexible hit) and the reversed views are
    built by on-device flips — warm stage 4 uploads nothing."""

    def __init__(self, seq0: np.ndarray, seq1: np.ndarray,
                 pad0: int, pad1: int):
        self.m, self.n = len(seq0), len(seq1)
        self.s0f = wf.dev_seq(seq0, wf.A_SENTINEL, pad0)
        self.s0r = wf.dev_seq(seq0, wf.A_SENTINEL, pad0, reverse=True)
        self.s1f = wf.dev_seq(seq1, wf.B_SENTINEL, pad1)
        self.s1r = wf.dev_seq(seq1, wf.B_SENTINEL, pad1, reverse=True)
        # host twins (zero-copy views) for the per-half strip engine,
        # which drives strips.run_partition per half
        self._h0 = (seq0, seq0[::-1])
        self._h1 = (seq1, seq1[::-1])

    def views(self, rev: bool):
        return (self.s0r, self.s1r) if rev else (self.s0f, self.s1f)

    def host_views(self, rev: bool):
        return (self._h0[rev], self._h1[rev])


# ---------------------------------------------------------------------------
# engines: both slice on-device and return LOGICAL (B, njq) last-row buses
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _dyn_bus_init(T: int, go: int, ge: int):
    def one(row_code):
        j = jnp.arange(T, dtype=jnp.int32) + 1
        return (_border_h_dev(row_code, j, go, ge),
                jnp.full(T, NEG, jnp.int32))

    return jax.jit(jax.vmap(one))


# the row-sweep chain rung: ONE compiled key per (width, params); small
# enough that deep mixed-height levels chain in a couple of calls
_SWEEP_R = 512


def _halves_sweep(dev: _DevSeqs, halves: list[_Half], rev: bool,
                  params: ScoreParams, njq: int):
    """All halves through the vmapped row-sweep engine
    (ops/rowsweep.batched_sweep_engine): a (B,) x R-row scan per chained
    rung — measured ~9x faster than the Mosaic path at deep-level shapes
    (0.05 s vs 0.4 s per tile call) with NO Mosaic compile keys.
    Returns device (B, njq) logical last-row buses."""
    from masa_tpu.ops import rowsweep

    B = len(halves)
    h_max = max(x.h for x in halves)
    go, ge = params.gap_open, params.gap_ext
    s0d, s1d = dev.views(rev)
    # fixed batch bucket on TPU (ONE compiled (njq, R, B) key across all
    # levels; height-0 pads are masked out), tight pow2 on CPU
    if jax.default_backend() == "tpu":
        if B > _B_TILE:
            outs = [_halves_sweep(dev, halves[o : o + _B_TILE], rev,
                                  params, njq)
                    for o in range(0, B, _B_TILE)]
            return (jnp.concatenate([o[0] for o in outs]),
                    jnp.concatenate([o[1] for o in outs]))
        Bb = _B_TILE
    else:
        Bb = 1 << (B - 1).bit_length()
    grp = list(halves) + [
        dataclasses.replace(halves[0], h=0)] * (Bb - B)
    i0s = jnp.asarray([x.i0 for x in grp], jnp.int32)
    j0s = jnp.asarray([x.j0 for x in grp], jnp.int32)
    ccodes = jnp.asarray([x.col_code for x in grp], jnp.int32)
    rcodes = jnp.asarray([x.row_code for x in grp], jnp.int32)
    heights = jnp.asarray([x.h for x in grp], jnp.int32)
    bh, bf = _dyn_bus_init(njq, go, ge)(rcodes)
    eng = rowsweep.batched_sweep_engine(
        njq + 1, _SWEEP_R, False, go, ge, params.match, params.mismatch)
    for s0r in range(0, h_max, _SWEEP_R):
        bh, bf = eng(s0d, s1d, i0s, j0s,
                     jnp.full(Bb, s0r, jnp.int32), ccodes, bh, bf,
                     heights - s0r)
    return bh[:B], bf[:B]


def _pallas_mm_cfg(h: int, njq: int, params: ScoreParams, B: int = 1,
                   heights: tuple | None = None):
    """Cost-aware ladder choice.  The dynamic-height kernel masks out
    FINISHED elements per chained step (hvs = 0 skips every chunk), so
    an element only pays ceil(h_e / R) chains — not the tile's worst
    case.  Cost = true per-element chains x (R * njq / 150 GCUPS) of
    compute plus ~20 ms dispatch per chained step; a tall rung with a
    near-multiple height mix beats a short rung's long dispatch chain
    (measured: a 66K-row B=8 group ran 5x faster at R=32768 than the
    R=4096 chain the B-blind model picked)."""
    from masa_tpu.stages.core import _DISPATCH_S as _disp
    from masa_tpu.stages.core import _TPU_LADDER, _rung_rate

    hs = heights if heights else (h,) * max(B, 1)
    best, best_cost = None, None
    for c in _TPU_LADDER:
        el_chains = sum(-(-he // c.rows) for he in hs if he > 0)
        dispatches = -(-h // c.rows)
        cost = (el_chains * c.rows * njq / _rung_rate(c)
                + dispatches * _disp)
        if best_cost is None or cost < best_cost:
            best, best_cost = c, cost
    return dataclasses.replace(
        best, recurrence=Recurrence.NEEDLEMAN_WUNSCH,
        track_best=False, store_lastcol=False,
        match=params.match, mismatch=params.mismatch,
        gap_open=params.gap_open, gap_ext=params.gap_ext)


@functools.lru_cache(maxsize=32)
def _mosaic_dyn_step(cfg: wf.WavefrontConfig, njq: int, B: int, go: int,
                     ge: int):
    """One chained-strip step for a whole batch with PER-ELEMENT heights
    as ONE fused call: on-device prep (strip chars, border synthesis,
    lane packing), the dynamic-height Mosaic kernel, and per-element
    logical bus realignment.  Compile keys: (cfg, njq, B) only — every
    stage-4 level reuses the same compiled step whatever its heights."""
    plen = wf.padded_len(cfg, njq)
    R = cfg.rows
    a = cfg.alpha

    C = cfg.chunk
    ng = wf._num_chunks(cfg, njq)

    @functools.partial(jax.jit, donate_argnums=(8, 9))
    def step(s0d, s1d, i0s, j0s, r0s, ccodes, hvs, ws, bh, bf):
        def prep_one(i0, j0, r0, col_code):
            a_vec = jax.lax.dynamic_slice(s0d, (i0 + r0,), (R,))
            a_lanes = wf.pack_lanes_jnp(cfg, a_vec)
            kk = jnp.arange(R, dtype=jnp.int32) + r0 + 1
            ih = wf.pack_lanes_jnp(cfg,
                                   _border_h_dev(col_code, kk, go, ge))
            ie = wf.pack_lanes_jnp(cfg, jnp.full(R, NEG, jnp.int32))
            corner = _border_h_dev(col_code, r0, go, ge)
            b = jax.lax.dynamic_slice(s1d, (j0,), (plen,))
            return a_lanes, ih, ie, corner, b

        a_all, ih_all, ie_all, corners, b_all = jax.vmap(prep_one)(
            i0s, j0s, r0s, ccodes)
        lanes = jnp.clip((hvs - 1) // a, 0, cfg.lanes - 1)
        frs = lanes // 128
        # per-element effective chunk count: element k's last needed
        # physical bus index is (w_k - 1) + flush_lane_k; finished or
        # sentinel elements (height 0) skip every chunk
        ngs = jnp.where(hvs > 0, (ws + lanes + C - 1) // C, 0)
        ngs = jnp.minimum(ngs, ng)
        ph, pf = wf.batched_strip_pallas_dyn(
            cfg, a_all, b_all, bh, bf, ih_all, ie_all, corners, frs,
            ngs, nj=njq, B=B)
        fill = jnp.full(plen, NEG, jnp.int32)

        def realign(p, lane):
            return jax.lax.dynamic_slice(
                jnp.concatenate([p, fill]), (lane,), (plen,))

        lh = jax.vmap(realign)(ph, lanes)
        lf = jax.vmap(realign)(pf, lanes)
        keep = (hvs > 0)[:, None]
        return jnp.where(keep, lh, bh), jnp.where(keep, lf, bf)

    return step


import os as _os
import time as _time

_TRACE = bool(_os.environ.get("MASA_TPU_STAGE4_TRACE"))


# The tail rung: alpha=1 gives the finest dynamic-height granularity the
# dyn kernel can express (alpha*128 = 128 rows), and R = 4096 covers any
# main-rung tail (< alpha*128 <= 4096) in ONE chained call.  rs stays 32
# (full-width (32,128) vectors; rs=1 shapes are Mosaic-rejected).
_TAIL_CFG = wf.WavefrontConfig(alpha=1, rs=32, chunk=8192)
# sub-128-row residues: one short sweep call (128 scan steps, not 512)
_RESID_R = 128


def _run_tails(dev: _DevSeqs, rev: bool, params: ScoreParams, njq: int,
               plen: int, Bb: int, i0s, j0s, ccodes, ws_a, bodies_a,
               tails: list[int], bh, bf):
    """Sub-granularity height tails after the main-rung body passes.

    Round 3 chained every tail through the 512-row sweep engine — up to
    8 sequential dispatches of a 512-step lax.scan each, whose per-step
    overhead (~0.5 ms at wide njq) made the tails cost ~4x the batched
    body steps (records/round3_batch.log: level 1 steps=1.68 tail=6.57).
    Now the 128-row-granular part of every tail runs as ONE batched
    alpha=1 dyn-kernel dispatch (all elements at once, per-element
    heights as data), and only the < 128-row residue takes ONE short
    sweep call.  Matches the tail handling of the reference's stage-4
    splitter (stage4/sw_stage4.cpp:926-945) at the kernel's rate."""
    from masa_tpu.ops import rowsweep

    go, ge = params.gap_open, params.gap_ext
    s0d, s1d = dev.views(rev)
    tb = [(t // 128) * 128 for t in tails]
    tb_a = jnp.asarray(tb, jnp.int32)
    if max(tb) > 0:
        cfg_t = dataclasses.replace(
            _TAIL_CFG, recurrence=Recurrence.NEEDLEMAN_WUNSCH,
            track_best=False, store_lastcol=False,
            match=params.match, mismatch=params.mismatch,
            gap_open=go, gap_ext=ge,
            interpret=(jax.default_backend() != "tpu"))
        plen_t = wf.padded_len(cfg_t, njq)
        step_t = _mosaic_dyn_step(cfg_t, njq, Bb, go, ge)
        # logical-bus content lives in [0, njq); re-pad to the tail
        # rung's physical length and back (NEG filler either way)
        if plen_t <= plen:
            bh_t, bf_t = bh[:, :plen_t], bf[:, :plen_t]
        else:
            fill = jnp.full((Bb, plen_t - plen), NEG, jnp.int32)
            bh_t = jnp.concatenate([bh, fill], axis=1)
            bf_t = jnp.concatenate([bf, fill], axis=1)
        bh_t, bf_t = step_t(s0d, s1d, i0s, j0s, bodies_a, ccodes, tb_a,
                            ws_a, bh_t, bf_t)
        if plen_t >= plen:
            bh, bf = bh_t[:, :plen], bf_t[:, :plen]
        else:
            fill = jnp.full((Bb, plen - plen_t), NEG, jnp.int32)
            bh = jnp.concatenate([bh_t, fill], axis=1)
            bf = jnp.concatenate([bf_t, fill], axis=1)
    resid = [t - b for t, b in zip(tails, tb)]
    if max(resid) > 0:
        # typically the 1-2 odd-height chains from the endpoint/start
        # partitions: one short sweep over ONLY the residue-bearing
        # elements (residues < 128 <= _RESID_R, so never chained)
        idxs = [k for k, t in enumerate(resid) if t > 0]
        pad_to = 1 << (len(idxs) - 1).bit_length()
        sel = idxs + [idxs[0]] * (pad_to - len(idxs))
        sel_a = jnp.asarray(sel, jnp.int32)
        eng = rowsweep.batched_sweep_engine(
            njq + 1, _RESID_R, False, go, ge,
            params.match, params.mismatch)
        resid_sel = jnp.asarray([resid[k] for k in sel], jnp.int32)
        th, tf = eng(
            s0d, s1d, i0s[sel_a], j0s[sel_a],
            bodies_a[sel_a] + tb_a[sel_a], ccodes[sel_a],
            bh[sel_a, :njq], bf[sel_a, :njq], resid_sel)
        fillw = jnp.full((pad_to, plen - njq), NEG, jnp.int32)
        th = jnp.concatenate([th, fillw], axis=1)
        tf = jnp.concatenate([tf, fillw], axis=1)
        bh = bh.at[sel_a[: len(idxs)]].set(th[: len(idxs)])
        bf = bf.at[sel_a[: len(idxs)]].set(tf[: len(idxs)])
    return bh, bf


def _halves_mosaic(dev: _DevSeqs, halves: list[_Half], rev: bool,
                   params: ScoreParams, njq: int):
    """A tile of halves (ANY mix of heights) through the dynamic-height
    batched Mosaic kernel: one dispatch per chained strip for the whole
    tile, whatever the heights.  Each element's height splits into a
    lane-granularity BODY (multiples of alpha*128, through the kernel)
    and a sub-granularity TAIL (through the chained row-sweep engine) —
    so the Mosaic compile-key set is (cfg, njq, B) and never grows with
    the height mix.  B pads to the next pow2 (padded elements are
    height-0 and masked); only njq > 8192 levels route here (narrower
    ones merge to njq = 8192 and take the row-sweep engine)."""
    B = len(halves)
    h_max = max(x.h for x in halves)
    cfg = _pallas_mm_cfg(h_max, njq, params, B,
                         heights=tuple(x.h for x in halves))
    gran = cfg.alpha * 128
    R = cfg.rows
    go, ge = params.gap_open, params.gap_ext
    plen = wf.padded_len(cfg, njq)
    Bb = 1 << (B - 1).bit_length()
    grp = list(halves) + [
        dataclasses.replace(halves[0], h=0)] * (Bb - B)
    bodies = [(x.h // gran) * gran for x in grp]
    tails = [x.h - b for x, b in zip(grp, bodies)]
    s0d, s1d = dev.views(rev)
    t0 = _time.time()
    i0s = jnp.asarray([x.i0 for x in grp], jnp.int32)
    j0s = jnp.asarray([x.j0 for x in grp], jnp.int32)
    ccodes = jnp.asarray([x.col_code for x in grp], jnp.int32)
    rcodes = jnp.asarray([x.row_code for x in grp], jnp.int32)
    bodies_a = jnp.asarray(bodies, jnp.int32)
    ws_a = jnp.asarray([x.w for x in grp], jnp.int32)
    bh, bf = _dyn_bus_init(plen, go, ge)(rcodes)
    step = _mosaic_dyn_step(cfg, njq, Bb, go, ge)
    t1 = _time.time()
    ts = 0.0
    for s0r in range(0, max(bodies), R):
        ta = _time.time()
        hvs = jnp.clip(bodies_a - s0r, 0, R)
        bh, bf = step(s0d, s1d, i0s, j0s,
                      jnp.full(Bb, s0r, jnp.int32), ccodes, hvs,
                      ws_a, bh, bf)
        if _TRACE:
            jax.block_until_ready(bh)
            np.asarray(bh[0, :1])
        ts += _time.time() - ta

    tt = 0.0
    if max(tails) > 0:
        ta = _time.time()
        bh, bf = _run_tails(dev, rev, params, njq, plen, Bb, i0s, j0s,
                            ccodes, ws_a, bodies_a, tails, bh, bf)
        if _TRACE:
            jax.block_until_ready(bh)
            np.asarray(bh[0, :1])
        tt = _time.time() - ta
    if _TRACE:
        hs = sorted({x.h for x in halves})
        print(f"    [mosaic-dyn B={B}->{Bb} h={hs[0]}..{hs[-1]} R={R} "
              f"njq={njq} init={t1-t0:.2f} steps={ts:.2f} "
              f"tail={tt:.2f}", flush=True)
    return bh[:B, :njq], bf[:B, :njq]


# Engine choice, measured on the tunneled v5e (warm, forced completion):
# the batched Mosaic kernel sustains ~0.3-0.6 s per level call across
# every level shape from (B=8, h=65536) to (B=512, h=1024); the vmapped
# dyn scan only wins for the tiniest levels (sub-strip heights, huge B),
# and per-pair dispatches tie Mosaic at B<=8 without beating it.
_DYN_H_MAX = 256

# Merged narrow levels (njq == _MOSAIC_NJQ_MIN) run the row-sweep
# engine up to this half height: the round-5 engine table
# (records/round5_batch.log) measured sweep >= mosaic-dyn at EVERY
# merged shape — (B=64, h=4096) 10.1 vs 8.3 GCUPS, (B=256, h=2048) 3.1
# vs 2.9, (B=512, h=512) 0.4 vs 0.3, (B=64, h=5000 odd) 10.6 vs 4.2 —
# because the dyn kernel computes a full R-row chain for any h <= R
# while the sweep pays only the true rows.  Above this height (or any
# njq > 8192 level) the dyn kernel/strip chains win outright
# ((B=32, h=16384): 32.5 vs 1.3).
_SWEEP_H_MAX = int(_os.environ.get("MASA_TPU_SWEEP_H_MAX", "8192"))

# minimum logical width for the Mosaic engine; narrower levels merge to
# exactly this width and take the row-sweep engine.  Module global so
# measurement tools can force the Mosaic path (tools/round2_measure.py).
_MOSAIC_NJQ_MIN = 8192


# Per-half strip chains: a TALL half is the same workload as a stage-1
# partition, and the fused strip kernel sustains ~10x the batched dyn
# kernel's rate on it (the (B, chunks)-grid serializes elements; async
# per-half dispatches pipeline — the round-2 measurement that killed
# the grouped grid for stage-1 strips, see SNIPPETS/memory notes).
# Halves below one full mid-rung strip never route here (they would
# chain several small-rung dispatches each); above it, a modeled
# dispatch-vs-rate comparison decides per level.
_STRIPS_H_MIN = 32768
# calibrated by tools/calibrate.py (round 5): per-half chains run the
# mid rung's rate class; the dyn kernel's warm batched rate; the
# tunnel's per-dispatch charge
_STRIPS_GCUPS = float(_os.environ.get("MASA_TPU_STRIPS_GCUPS", "119e9"))
_MOSAIC_GCUPS = float(_os.environ.get("MASA_TPU_MM_GCUPS", "7.85e9"))
_DISPATCH_S = float(_os.environ.get("MASA_TPU_DISPATCH_S", "0.073"))


def _strips_beats_mosaic(halves: list[_Half]) -> bool:
    vol = sum(x.h * max(x.w, 1) for x in halves)
    n_disp = sum(-(-x.h // _STRIPS_H_MIN) for x in halves)
    strips_cost = n_disp * _DISPATCH_S + vol / _STRIPS_GCUPS
    h_max = max(x.h for x in halves)
    mosaic_cost = (vol / _MOSAIC_GCUPS
                   + -(-h_max // _STRIPS_H_MIN) * _DISPATCH_S)
    return strips_cost < mosaic_cost


def _halves_strips(dev: _DevSeqs, halves: list[_Half], rev: bool,
                   params: ScoreParams, njq: int, backend: str = "pallas"):
    """Each half through strips.run_partition on the device-resident
    sequence views (stage-1's data path: on-device slicing, synthesized
    borders, zero per-strip host traffic).  All halves dispatch
    asynchronously; nothing here syncs — the level's single pull stays
    in _run_match.  Returns device (B, njq) logical last-row buses."""
    from masa_tpu.stages.core import partition_config
    from masa_tpu.ops import strips as _strips

    s0d, s1d = dev.views(rev)
    s0h, s1h = dev.host_views(rev)
    on_tpu = jax.default_backend() == "tpu"
    outs_h, outs_f = [], []
    t0 = _time.time()
    for x in halves:
        w1 = max(x.w, 1)    # w == 0 (pure-gap pair): one sentinel-masked
        #                     column; every k >= 1 is masked in the match
        base = (partition_config(x.h, w1) if on_tpu
                else wf.WavefrontConfig(alpha=4, rs=1, chunk=512))
        cfg = dataclasses.replace(
            base, recurrence=Recurrence.NEEDLEMAN_WUNSCH,
            track_best=False, store_lastcol=False,
            match=params.match, mismatch=params.mismatch,
            gap_open=params.gap_open, gap_ext=params.gap_ext)
        res = _strips.run_partition(
            cfg, s0h[x.i0 : x.i0 + x.h], s1h[x.j0 : x.j0 + w1], params,
            _code_inv(x.row_code), _code_inv(x.col_code),
            backend=backend if on_tpu else "scan",
            want_last_row=False, want_dev_last=True,
            dev_slices=(s0d, x.i0, s1d, x.j0),
        )
        bh, bf = res.dev_last
        if bh.shape[0] < njq:
            fill = jnp.full(njq - bh.shape[0], NEG, jnp.int32)
            bh = jnp.concatenate([bh, fill])
            bf = jnp.concatenate([bf, fill])
        outs_h.append(bh[:njq])
        outs_f.append(bf[:njq])
    if _TRACE:
        hs = sorted({x.h for x in halves})
        print(f"    [strips B={len(halves)} h={hs[0]}..{hs[-1]} "
              f"njq={njq} dispatch={_time.time()-t0:.2f}", flush=True)
    return jnp.stack(outs_h), jnp.stack(outs_f)


# Fixed batch tile: every Mosaic/prep/match dispatch pads to at most
# this many elements, so the compile-key set (and the per-level XLA
# retrace variety) stays CONSTANT across levels instead of growing with
# the pow2 of each level's pair count.
_B_TILE = 128


def _run_level(dev, halves: list[_Half], rev: bool, params: ScoreParams,
               njq: int):
    """One level's halves -> device (B, njq) logical last-row buses.
    TPU: the batched Mosaic engine tiled to _B_TILE, except tiny levels
    (h <= 256) where the vmapped dynamic scan's single XLA dispatch
    wins.  CPU: dyn."""
    B = len(halves)
    h_max = max(x.h for x in halves)
    if (jax.default_backend() == "tpu" and h_max >= _STRIPS_H_MIN
            and njq > _MOSAIC_NJQ_MIN and _strips_beats_mosaic(halves)):
        # tall halves: per-half fused strip chains at the strip
        # kernel's rate (~10x the batched dyn kernel on these shapes)
        return _halves_strips(dev, halves, rev, params, njq)
    if (jax.default_backend() == "tpu" and h_max > _DYN_H_MAX
            and (njq > _MOSAIC_NJQ_MIN or h_max > _SWEEP_H_MAX)):
        # wide or tall levels: the dynamic-height Mosaic kernel takes a
        # tile's height MIX directly — no per-height compile keys.
        # Merged narrow levels (njq == 8192) go to the row-sweep branch
        # below instead: the round-5 engine table measured sweep >=
        # mosaic at every merged shape (see _SWEEP_H_MAX) — the round-4
        # reroute of those levels to the dyn kernel was calibrated
        # against a degraded-window sweep measurement (the 5M r4
        # record's 21 s level) that the fixed _B_TILE tiling and warm
        # caches no longer reproduce.
        outs = []
        for off in range(0, B, _B_TILE):
            outs.append(_halves_mosaic(
                dev, halves[off : off + _B_TILE], rev, params, njq))
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))
    # tiny levels (h <= 256) and every CPU run: the row-sweep engine —
    # a single XLA dispatch of <= 256 scan steps beats any kernel launch
    return _halves_sweep(dev, halves, rev, params, njq)


# ---------------------------------------------------------------------------
# on-device Myers-Miller matching (AlignerUtils::matchColumn, vmapped)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _match_engine(njq: int, go: int):
    """Per pair: match the reverse half's last row against the forward
    half's (reversed), exactly reproducing models.scoring.match_column
    over k = 0..w.  Returns int32 (found, k, score, type) with type in
    {0 aligned, 1 gapped, 2 err-sum-match, 3 err-sum-gap}."""
    W1 = njq + 1

    def one(fh, ff, rh, rf, fwd0, rev0, w, goal):
        k = jnp.arange(W1, dtype=jnp.int32)
        # full rev row: k=0 is the rev border element (lh0, lf0)
        rhs = jnp.concatenate([rev0[0:1], rh]).astype(jnp.int32)
        rfs = jnp.concatenate([rev0[1:2], rf]).astype(jnp.int32)
        # full fwd row, then reversed so index k reads fwd[w - k]:
        # pad the flipped row with NEG and take a (W1,) window at njq - w
        fhs = jnp.concatenate([fwd0[0:1], fh]).astype(jnp.int32)
        ffs = jnp.concatenate([fwd0[1:2], ff]).astype(jnp.int32)
        pad = jnp.full(W1, NEG, jnp.int32)
        fh_r = jax.lax.dynamic_slice(
            jnp.concatenate([jnp.flip(fhs), pad]), (W1 - 1 - w,), (W1,))
        ff_r = jax.lax.dynamic_slice(
            jnp.concatenate([jnp.flip(ffs), pad]), (W1 - 1 - w,), (W1,))
        valid = k <= w
        sum_m = fh_r + rhs
        sum_g = ff_r + rfs + go
        hit = ((sum_m == goal) | (sum_g == goal)) & valid
        over = ((sum_m > goal) | (sum_g > goal)) & valid
        stop = hit | over
        big = jnp.int32(W1)
        idx = jnp.where(stop, k, big).min()
        found = idx < big
        idx_c = jnp.clip(idx, 0, W1 - 1)
        m_at = sum_m[idx_c] == goal
        g_at = sum_g[idx_c] == goal
        is_hit = found & (m_at | g_at)
        typ = jnp.where(
            is_hit,
            jnp.where(m_at, 0, 1),
            jnp.where(sum_m[idx_c] > goal, 2, 3),
        )
        scr = jnp.where(m_at, fh_r[idx_c], ff_r[idx_c])
        return (is_hit.astype(jnp.int32), idx_c, scr, typ)

    return jax.jit(jax.vmap(one))


def _run_match(fh, ff, rh, rf, fwd0, rev0, ws, goals, njq: int, go: int
               ) -> np.ndarray:
    """The vmapped match engine, tiled to _B_TILE (one XLA trace per
    njq instead of one per level batch size).  All tiles dispatch
    asynchronously; ONE host pull at the end (a per-tile pull costs a
    full tunnel round trip — ~1.5 s across an 8-tile level for work
    that computes in microseconds).  Returns (4, B) host."""
    B = fh.shape[0]
    eng = _match_engine(njq, go)
    outs = []
    for off in range(0, B, _B_TILE):
        end = min(off + _B_TILE, B)
        n = end - off
        # ALWAYS pad to the fixed tile: one XLA trace per njq (a short
        # tile would retrace per distinct level batch size; the padded
        # elements are a few wasted VPU scans, the retrace is a remote
        # compile)
        pad = _B_TILE - n
        if pad:
            sl = lambda a: jnp.concatenate(
                [a[off:end], jnp.repeat(a[end - 1 : end], pad, axis=0)])
            npad = lambda a: np.concatenate(
                [a[off:end], np.repeat(a[end - 1 : end], pad, axis=0)])
            out = jnp.stack(eng(
                sl(fh), sl(ff), sl(rh), sl(rf),
                jnp.asarray(npad(fwd0)), jnp.asarray(npad(rev0)),
                jnp.asarray(npad(ws)), jnp.asarray(npad(goals))))[:, :n]
        else:
            out = jnp.stack(eng(
                fh[off:end], ff[off:end], rh[off:end], rf[off:end],
                jnp.asarray(fwd0[off:end]), jnp.asarray(rev0[off:end]),
                jnp.asarray(ws[off:end]), jnp.asarray(goals[off:end])))
        outs.append(out)
    return np.asarray(outs[0] if len(outs) == 1
                      else jnp.concatenate(outs, axis=1))


# ---------------------------------------------------------------------------
# the reduce loop
# ---------------------------------------------------------------------------


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
    batching all half-passes of a level into a few device dispatches with
    a device-resident data plane.  `batch_cap` bounds device memory."""
    seq0 = np.asarray(seq0, np.uint8)
    seq1 = np.asarray(seq1, np.uint8)
    go, ge = params.gap_open, params.gap_ext

    w_max0 = max((c1.j - c0.j for c0, c1 in zip(cps, cps[1:])), default=1)
    njq_max = max(128, 1 << (max(w_max0, 1) - 1).bit_length())
    # any engine's slice is j0 + padded_len(cfg, njq<=njq_max) with
    # j0 <= n; 64K covers every ladder's chunk/lane padding
    dev = _DevSeqs(seq0, seq1, pad0=131072 + 8, pad1=njq_max + 65536)

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

        m, n = dev.m, dev.n
        meta = []
        fwd_halves = []
        rev_halves = []
        for c0, c1 in pending:
            h = c1.i - c0.i
            w = c1.j - c0.j
            rm = c0.i + _split_height(h)
            meta.append((c0, c1, rm))
            ri, ci = score.init_types_for(c0.type)
            fwd_halves.append(_Half(c0.i, rm - c0.i, c0.j, w,
                                    _CODE[ri], _CODE[ci]))
            ri, ci = score.init_types_for(c1.type)
            rev_halves.append(_Half(m - c1.i, c1.i - rm, n - c1.j, w,
                                    _CODE[ri], _CODE[ci]))

        njq = max(128, 1 << (max(x.w for x in fwd_halves) - 1)
                  .bit_length())
        lvl_h = max(max(x.h for x in fwd_halves),
                    max(x.h for x in rev_halves))
        if jax.default_backend() == "tpu" and lvl_h > _DYN_H_MAX:
            # merge the deep Mosaic levels onto one width bucket: each
            # distinct Mosaic (njq, hk) is a compile/cache-load key
            # (~15 s per key in a fresh process) and the padded compute
            # is nearly free; dyn levels keep tight widths (scan steps
            # scale with njq)
            njq = max(njq, 8192)

        next_work = []
        for off in range(0, len(pending), batch_cap):
            sl = slice(off, off + batch_cap)
            t_f0 = _time.time()
            fh, ff = _run_level(dev, fwd_halves[sl], False, params, njq)
            rh, rf = _run_level(dev, rev_halves[sl], True, params, njq)
            t_f1 = _time.time()

            mm_meta = meta[sl]
            fwd0 = np.empty((len(mm_meta), 2), np.int32)
            rev0 = np.empty((len(mm_meta), 2), np.int32)
            ws = np.empty(len(mm_meta), np.int32)
            goals = np.empty(len(mm_meta), np.int32)
            for r, ((c0, c1, rm), hf, hr) in enumerate(
                    zip(mm_meta, fwd_halves[sl], rev_halves[sl])):
                cif = InitType(_code_inv(hf.col_code))
                cir = InitType(_code_inv(hr.col_code))
                chf, _ = border_cells(1, cif, params, start=hf.h)
                chr_, _ = border_cells(1, cir, params, start=hr.h)
                fwd0[r] = (chf[0],
                           score._border_f_value(cif, hf.h, params))
                rev0[r] = (chr_[0],
                           score._border_f_value(cir, hr.h, params))
                ws[r] = hf.w
                goals[r] = c1.score - c0.score + (
                    go if c1.type != CrosspointType.MATCH else 0)

            t_m0 = _time.time()
            res = _run_match(fh, ff, rh, rf, fwd0, rev0, ws, goals,
                             njq, go)
            if _TRACE:
                print(f"    [level {level}] halves={t_f1-t_f0:.2f} "
                      f"meta={t_m0-t_f1:.2f} match={_time.time()-t_m0:.2f}",
                      flush=True)
            found, idxs, scrs, typs = (res[0], res[1], res[2], res[3])
            for r, (c0, c1, rm) in enumerate(mm_meta):
                if not found[r]:
                    raise RuntimeError(
                        f"batched Myers-Miller lost the path in "
                        f"{c0}->{c1} (err type {int(typs[r])})"
                    )
                j_star = c1.j - int(idxs[r])
                t = (CrosspointType.MATCH if int(typs[r]) == 0
                     else CrosspointType.GAP_2)
                cm = Crosspoint(rm, j_star, c0.score + int(scrs[r]), t)
                next_work.append((c0, cm))
                next_work.append((cm, c1))
        if log:
            log(f"stage4[batched]: level {level}: {len(pending)} pairs")
        work = next_work

    # reassemble in path order: emit c1 of every pair sorted by position
    done.sort(key=lambda p: (p[0].i, p[0].j))
    out = [cps[0]] + [c1 for _, c1 in done]
    return out


def _code_inv(code: int) -> InitType:
    for k, v in _CODE.items():
        if v == code:
            return k
    raise ValueError(code)
