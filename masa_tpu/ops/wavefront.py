"""The anti-diagonal wavefront strip kernel — the engine's hot 99%.

TPU-first re-design of the reference's CUDA wavefront
(src/CUDAligner.cu:638-1007), NOT a translation:

  * A strip of ``R = ALPHA * L`` rows is one kernel invocation;
    ``L = RS*128`` lanes live in an ``(RS, 128)`` int32 VPU vector.  Lane
    ``l`` owns rows ``[ALPHA*l, ALPHA*l+ALPHA)`` and at wavefront step ``t``
    computes column ``j = t - l`` for all its ALPHA rows.  The intra-lane
    vertical chain of ALPHA cells is purely element-wise, so ALPHA cells
    cost one step (this plays the role of CUDAlign's ALPHA=4 rows/thread,
    CUDAligner.hpp:62).
  * Cross-lane dependencies (row ``ALPHA*l - 1`` values from lane ``l-1`` at
    steps ``t-1``/``t-2``) are *lane shifts*: a lane roll plus a sublane
    carry — the TPU equivalent of CUDAlign's shared-memory diagonal
    exchange (kernel_load/kernel_flush, CUDAligner.cu:441-540).
  * The H/F row bus lives in HBM and streams through VMEM in column chunks
    via the Pallas grid.  Bus writes trail bus reads by exactly ``L-1``
    steps, so the output array stores column ``j`` at physical index
    ``j + L - 1 == t`` — reads and writes are both indexed by ``t`` and
    stay block-aligned.
  * Strip boundaries are the special rows (the SRA persists the bus at the
    flush cadence).

Index conventions (kernel frame vs DP frame):
  kernel column ``j`` in [0, nj)  <->  DP column ``j+1`` (consumes seq1[j])
  kernel row    ``i`` in [0, R)   <->  DP row ``i0+i+1`` (consumes strip char i)
  ``bus[j]``   = DP (H, F) at (strip_top-1, j+1);  the DP border element
                 (column 0) is supplied separately via ``corner``.
  ``init_h/e`` = DP (H, E) of the left border at rows i0+1 .. i0+R.

The same step math runs in two harnesses: ``strip_scan`` (lax.scan, any
backend — the differential twin for tests/fallback) and ``strip_pallas``
(the TPU kernel).  Both are checked against ops.oracle in tests.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from masa_tpu.types import INF, Recurrence

NEG = -INF
A_SENTINEL = -2  # padded strip rows: never equal to any real byte or B_SENTINEL
B_SENTINEL = -1  # padded columns


@dataclasses.dataclass(frozen=True)
class WavefrontConfig:
    """Static kernel template axes (the analogue of the 16 precompiled CUDA
    variants, CUDAligner.cu:1261-1332)."""

    alpha: int = 4
    rs: int = 8               # sublane rows; lanes L = rs*128
    chunk: int = 16384        # columns (steps) per grid step; must be >= L
    recurrence: Recurrence = Recurrence.SMITH_WATERMAN
    match: int = 1
    mismatch: int = -3
    gap_open: int = 3
    gap_ext: int = 2
    track_best: bool = True
    # track_pos=False: per-slot MAX only (1 op/cell instead of 3); the
    # best's position is recovered by re-running the winning strip with
    # full tracking (two-phase scheme, see strips.run_partition)
    track_pos: bool = True
    store_lastcol: bool = False
    interpret: bool = False   # Pallas interpreter mode (CPU tests)
    unroll: int = 8           # inner wavefront loop unroll factor
    # Mid-strip special-row flush: emit every flush_every-th row of the
    # strip as an extra output bus, decoupling special-row spacing from
    # the strip height (the reference's kernel flushes any row at the
    # manager's cadence, CUDAligner.cu:502-540; boundary-only flushes
    # forced our stage-1 rung choice to trade kernel rate for traceback
    # density — see stages.core.stage1_plan).  Must be a multiple of
    # alpha*128 (so every flushed row sits at sub-row alpha-1, lane
    # column 127 — only the SUBLANE varies) and divide rows; full-height
    # strips only.  0 = strip-boundary flushes only.
    flush_every: int = 0

    @property
    def lanes(self) -> int:
        return self.rs * 128

    @property
    def rows(self) -> int:
        return self.alpha * self.lanes

    def steps(self, nj: int) -> int:
        return nj + self.lanes - 1


def _lane_iota(rs: int) -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (rs, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rs, 128), 1)
    return r * 128 + c


def _shift(x: jnp.ndarray, insert) -> jnp.ndarray:
    """Flat down-shift by one lane over an (RS,128) vector: out[l] = x[l-1],
    out[0] = insert.  One lane roll + a sublane carry fix, expressed with
    rolls and masked selects only (Mosaic has no scatter; everything stays
    2-D)."""
    rs = x.shape[0]
    rolled = jnp.roll(x, 1, axis=1)
    carry = jnp.roll(x[:, -1:], 1, axis=0)  # (RS, 1): carry[r] = x[r-1, -1]
    row0 = jax.lax.broadcasted_iota(jnp.int32, (rs, 1), 0) == 0
    carry = jnp.where(row0, insert, carry)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (rs, 128), 1) == 0
    return jnp.where(col0, carry, rolled)


def _flush_pos(cfg: WavefrontConfig, h_true: int) -> tuple[int, int, int, int]:
    """(lane, sub-row, sublane, lane-col) of the strip's flush (bus) row."""
    r = h_true - 1
    lane, k = r // cfg.alpha, r % cfg.alpha
    return lane, k, lane // 128, lane % 128


def _flush_interior(cfg: WavefrontConfig) -> tuple[int, int]:
    """(n_int, stride): interior flush-row count per strip and their
    sublane stride.  Interior row q (0-based) is strip row
    (q+1)*flush_every - 1: sub-row alpha-1, lane column 127, sublane
    (q+1)*stride - 1 — the strip's LAST row is sublane rs-1 of the SAME
    per-step capture, so flush mode replaces the dedicated bus select."""
    if not cfg.flush_every:
        return 0, 0
    grain = cfg.alpha * 128
    assert cfg.flush_every % grain == 0, \
        "flush_every must be a multiple of alpha*128"
    assert cfg.rows % cfg.flush_every == 0 and cfg.flush_every < cfg.rows, \
        "flush_every must divide the strip height"
    stride = cfg.flush_every // grain
    return cfg.rows // cfg.flush_every - 1, stride


def _interior_lane(cfg: WavefrontConfig, q: int) -> int:
    """Flush lane of interior row q: its bus column j lands at physical
    step t = j + lane (the same realignment as the boundary bus)."""
    return (q + 1) * cfg.flush_every // cfg.alpha - 1


def _make_step(cfg: WavefrontConfig, nj: int, h_true: int, fast: bool):
    """Build the per-step update.

    The state is a flat tuple (scan-friendly):
      hh[0..A-1], ee[0..A-1], r3h1, r3h2, r3f, rb, bus_h_prev,
      [best_v[0..A-1], best_t[0..A-1]], [lc_h[0..A-1], lc_e[0..A-1]]

    Returns step(state, t, b_t, bus_h_t, bus_f_t) ->
      (state', h_flush_vec, f_flush_vec)

    ``fast=True`` omits border/tail masking — valid only for steps with
    L-1 <= t < nj on a full strip.  a_lanes/init_h/init_e are closed over.
    """
    go, ge = cfg.gap_open, cfg.gap_ext
    sw = cfg.recurrence == Recurrence.SMITH_WATERMAN
    a = cfg.alpha
    full = h_true == cfg.rows
    _, k_flush, _, _ = _flush_pos(cfg, h_true)

    def make(a_lanes, init_h, init_e):
        def step(st, t, b_t, bus_h_t, bus_f_t):
            (hh, ee, r3h1, r3h2, r3f, rb0, bus_h_prev,
             best_v, best_t, lc_h, lc_e) = st
            up_h = _shift(r3h1, bus_h_t)
            up_f = _shift(r3f, bus_f_t)
            dg_h = _shift(r3h2, bus_h_prev)
            rb = _shift(rb0, b_t)

            if not fast:
                li = _lane_iota(cfg.rs)
                j_vec = t - li
                at_border = j_vec == -1
                valid_j = jnp.logical_and(j_vec >= 0, j_vec < nj)
                at_lastcol = j_vec == (nj - 1)

            hs, es, fs = [], [], []
            new_bv, new_bt = list(best_v), list(best_t)
            new_lh, new_le = list(lc_h), list(lc_e)
            for k in range(a):
                e_k = jnp.maximum(hh[k] - go, ee[k]) - ge
                uh = up_h if k == 0 else hs[k - 1]
                uf = up_f if k == 0 else fs[k - 1]
                f_k = jnp.maximum(uh - go, uf) - ge
                dg = dg_h if k == 0 else hh[k - 1]
                sub = jnp.where(a_lanes[k] == rb, cfg.match, cfg.mismatch)
                h_k = jnp.maximum(jnp.maximum(dg + sub, e_k), f_k)
                if sw:
                    h_k = jnp.maximum(h_k, 0)
                if not fast:
                    h_k = jnp.where(at_border, init_h[k], h_k)
                    e_k = jnp.where(at_border, init_e[k], e_k)
                hs.append(h_k)
                es.append(e_k)
                fs.append(f_k)
                if cfg.track_best:
                    if not cfg.track_pos:
                        # max-only: 1 op in fast steps; position comes
                        # from a phase-2 rerun of the winning strip
                        if fast:
                            new_bv[k] = jnp.maximum(best_v[k], h_k)
                        else:
                            row_ok = valid_j if full else jnp.logical_and(
                                valid_j, (li * a + k) < h_true
                            )
                            new_bv[k] = jnp.where(
                                jnp.logical_and(h_k > best_v[k], row_ok),
                                h_k, best_v[k])
                    else:
                        if fast:
                            upd = h_k > best_v[k]
                        else:
                            row_ok = valid_j if full else jnp.logical_and(
                                valid_j, (li * a + k) < h_true
                            )
                            upd = jnp.logical_and(h_k > best_v[k], row_ok)
                        new_bv[k] = jnp.where(upd, h_k, best_v[k])
                        new_bt[k] = jnp.where(upd, t, best_t[k])
                if cfg.store_lastcol and not fast:
                    new_lh[k] = jnp.where(at_lastcol, h_k, lc_h[k])
                    new_le[k] = jnp.where(at_lastcol, e_k, lc_e[k])

            nbt = new_bt if (cfg.track_best and cfg.track_pos) else ()
            st2 = (tuple(hs), tuple(es), hs[a - 1], r3h1, fs[a - 1], rb,
                   jnp.asarray(bus_h_t, jnp.int32).reshape(1, 1),
                   tuple(new_bv), tuple(nbt),
                   tuple(new_lh), tuple(new_le))
            return st2, hs[k_flush], fs[k_flush]

        return step

    return make


def _init_state(cfg: WavefrontConfig, corner, init_h, init_e):
    """Initial scan state.  hh/ee are seeded with the LEFT BORDER values:
    every lane l >= 1 receives its border at its at_border step (t = l-1),
    but lane 0 has no step -1 — its "previous column" IS the border, so
    the initial state must carry init_h/init_e for the in-lane diagonal
    (hh[k-1]) and E chain at kernel column 0 to be correct for rows
    k >= 1.  (Other lanes' seeded values are overwritten at their
    at_border step before first use.)"""
    z = jnp.full((cfg.rs, 128), NEG, jnp.int32)
    zz = jnp.full((cfg.rs, 128), -3, jnp.int32)  # never equals chars/sentinels
    t0 = jnp.zeros((cfg.rs, 128), jnp.int32)
    a = cfg.alpha
    nb = a if cfg.track_best else 0
    nbt = a if (cfg.track_best and cfg.track_pos) else 0
    nl = a if cfg.store_lastcol else 0
    # r3h1 seeds the bottom-row chain: at t=1, lane 1's diagonal reads
    # r3h2 (= this initial r3h1), which must hold lane 0's bottom-row
    # BORDER value (lanes >= 2 get theirs from lane l-1's at_border step).
    return (
        tuple(init_h[k] for k in range(a)),
        tuple(init_e[k] for k in range(a)),
        init_h[a - 1], z, z, zz,
        jnp.asarray(corner, jnp.int32).reshape(1, 1),
        (z,) * nb, (t0,) * nbt, (z,) * nl, (z,) * nl,
    )


def _resolve_outputs(cfg, h_true, bus_h, bus_f, st):
    """Reshape best/lastcol captures to row-major engine outputs."""
    out = {"bus_h": bus_h, "bus_f": bus_f}
    lanes = cfg.lanes
    best_v, best_t, lc_h, lc_e = st[7], st[8], st[9], st[10]
    if cfg.track_best:
        out["best_v"] = jnp.stack([v.reshape(lanes) for v in best_v])
        if cfg.track_pos:
            out["best_t"] = jnp.stack([v.reshape(lanes) for v in best_t])
    if cfg.store_lastcol:
        lh = jnp.stack([v.reshape(lanes) for v in lc_h])  # (A, L)
        le = jnp.stack([v.reshape(lanes) for v in lc_e])
        out["lastcol_h"] = lh.T.reshape(cfg.rows)[:h_true]
        out["lastcol_e"] = le.T.reshape(cfg.rows)[:h_true]
    return out


@jax.jit
def merge_best_device(carry, best_v, best_t, i0, off):
    """Device-side equivalent of resolve_best + running-max merge: reduce
    the per-slot captures (A, L) to DP-frame (score, i, j) scalars and
    fold into the running carry — no host transfer per strip (the host
    round-trip per strip costs more than the strip itself over a tunneled
    chip).  Tie-break matches resolve_best: smallest i, then smallest j;
    across strips the earlier strip wins ties (strict > merge), which is
    the same order because strips advance in i."""
    s, bi, bj = carry
    a, lanes = best_v.shape
    ks = jnp.arange(a, dtype=jnp.int32)[:, None]
    ls = jnp.arange(lanes, dtype=jnp.int32)[None, :]
    i = ls * a + ks
    j = best_t - ls
    big = jnp.int32(INF)
    # three-stage lexicographic argmin (int32-safe; x64 is disabled):
    # max score, then min i among maxima, then min j among those
    smax = best_v.max()
    at_max = best_v == smax
    imin = jnp.where(at_max, i, big).min()
    jmin = jnp.where(at_max & (i == imin), j, big).min()
    ni = imin + i0 + 1
    nj_ = jmin + off + 1
    upd = smax > s
    return (jnp.where(upd, smax, s),
            jnp.where(upd, ni, bi),
            jnp.where(upd, nj_, bj))


@jax.jit
def merge_max_device(carry, best_v, strip_id):
    """Phase-1 reduction of max-only captures: carry = (smax, strip_id of
    the EARLIEST strip achieving it) — earliest strip = smallest i, the
    engine-wide tie-break."""
    s, sid = carry
    m = best_v.max()
    upd = m > s
    return (jnp.where(upd, m, s),
            jnp.where(upd, jnp.int32(strip_id), sid))


def resolve_best(best_v, best_t):
    """Reduce per-(sub-row, lane) best captures (A, L) to (score, i, j) in
    kernel coordinates.  Ties break to smallest i, then smallest j (each
    slot's in-kernel strict `>` update already keeps its smallest j)."""
    bv = np.asarray(best_v)
    bt = np.asarray(best_t)
    a, lanes = bv.shape
    ks, ls = np.meshgrid(np.arange(a), np.arange(lanes), indexing="ij")
    i = ls * a + ks
    j = bt - ls
    score = int(bv.max())
    mask = bv == score
    ii, jj = i[mask], j[mask]
    order = np.lexsort((jj, ii))
    return score, int(ii[order[0]]), int(jj[order[0]])


def pack_lanes_jnp(cfg: WavefrontConfig, vec) -> jnp.ndarray:
    """Traced variant of the lane packing: (R,) -> (A, RS, 128)."""
    return (
        jnp.asarray(vec, jnp.int32)
        .reshape(cfg.lanes, cfg.alpha)
        .T.reshape(cfg.alpha, cfg.rs, 128)
    )


def pack_strip_rows(cfg: WavefrontConfig, chars: np.ndarray) -> np.ndarray:
    """Rearrange R strip chars (row-major) into the (A, RS, 128) lane layout,
    padding with A_SENTINEL."""
    r = cfg.rows
    out = np.full(r, A_SENTINEL, dtype=np.int32)
    out[: len(chars)] = np.asarray(chars, dtype=np.int32)
    return np.ascontiguousarray(
        out.reshape(cfg.lanes, cfg.alpha).T.reshape(cfg.alpha, cfg.rs, 128)
    )


def pack_border_cols(cfg: WavefrontConfig, h, e) -> tuple[np.ndarray, np.ndarray]:
    """Rearrange left-border (H, E) vectors (length <= R) into (A, RS, 128)."""

    def pack(v):
        out = np.full(cfg.rows, NEG, dtype=np.int32)
        out[: len(v)] = np.asarray(v, dtype=np.int32)
        return np.ascontiguousarray(
            out.reshape(cfg.lanes, cfg.alpha).T.reshape(cfg.alpha, cfg.rs, 128)
        )

    return pack(h), pack(e)


# ---------------------------------------------------------------------------
# lax.scan harness (any backend; the kernel's differential twin)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "nj", "h_true"))
def strip_scan(cfg: WavefrontConfig, a_lanes, b, bus_h, bus_f, init_h,
               init_e, corner, nj: int, h_true: int):
    """Run one strip with lax.scan.

    a_lanes/init_h/init_e: (A,RS,128) int32; b/bus_h/bus_f: (>=T,) int32
    (logical index t, padded beyond nj); corner: scalar int32.
    Returns dict with bus_h/bus_f (nj,), best captures, last column.
    """
    T = cfg.steps(nj)
    step = _make_step(cfg, nj, h_true, fast=False)(a_lanes, init_h, init_e)
    lane, _, fr, fc = _flush_pos(cfg, h_true)
    n_int, stride = _flush_interior(cfg)
    if n_int:
        assert h_true == cfg.rows, "mid-strip flush needs a full strip"

    def body(carry, xs):
        t, b_t, bh_t, bf_t = xs
        st, h_fl, f_fl = step(carry, t, b_t, bh_t, bf_t)
        ys = (h_fl[fr, fc], f_fl[fr, fc])
        if n_int:
            ys += (jnp.stack([h_fl[(q + 1) * stride - 1, 127]
                              for q in range(n_int)]),
                   jnp.stack([f_fl[(q + 1) * stride - 1, 127]
                              for q in range(n_int)]))
        return st, ys

    ts = jnp.arange(T, dtype=jnp.int32)
    st, ys = jax.lax.scan(
        body,
        _init_state(cfg, corner,
                    [init_h[k] for k in range(cfg.alpha)],
                    [init_e[k] for k in range(cfg.alpha)]),
        (ts, b[:T], bus_h[:T], bus_f[:T]),
    )
    bus_h_out = jax.lax.dynamic_slice(ys[0], (lane,), (nj,))
    bus_f_out = jax.lax.dynamic_slice(ys[1], (lane,), (nj,))
    out = _resolve_outputs(cfg, h_true, bus_h_out, bus_f_out, st)
    if n_int:
        rh = ys[2].T  # (n_int, T) physical
        rf = ys[3].T
        out["rows_h"] = jnp.stack([
            jax.lax.dynamic_slice(rh[q], (_interior_lane(cfg, q),), (nj,))
            for q in range(n_int)])
        out["rows_f"] = jnp.stack([
            jax.lax.dynamic_slice(rf[q], (_interior_lane(cfg, q),), (nj,))
            for q in range(n_int)])
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "T"))
def strip_scan_dyn(cfg: WavefrontConfig, a_lanes, b, bus_h, bus_f,
                   init_h, init_e, corner, nj, h_true, T: int):
    """Dynamic-shape scan twin: ``nj`` and ``h_true`` are TRACED scalars;
    only the scan length ``T`` (>= steps(nj)) is a compile key.  Built for
    level-batched traceback stages, where partition widths/heights vary
    per call and a static-shape kernel would compile once per shape (a
    remote TPU compile costs 10-90 s).  NW, no best/lastcol tracking.

    Returns the PHYSICAL flush-row buses of length T: logical column j
    of the strip's last row sits at index j + (h_true-1)//alpha (the
    flush lane), which the (host) caller slices off.
    """
    a = cfg.alpha
    go, ge = cfg.gap_open, cfg.gap_ext
    rs = cfg.rs

    a_lanes_l = [a_lanes[k] for k in range(a)]
    init_h_l = [init_h[k] for k in range(a)]
    init_e_l = [init_e[k] for k in range(a)]
    li = _lane_iota(rs)
    k_flush = (h_true - 1) % a
    fl_lane = (h_true - 1) // a
    fr, fc = fl_lane // 128, fl_lane % 128

    def step(st, xs):
        t, b_t, bus_h_t, bus_f_t = xs
        (hh, ee, r3h1, r3h2, r3f, rb0, bus_h_prev) = st
        up_h = _shift(r3h1, bus_h_t)
        up_f = _shift(r3f, bus_f_t)
        dg_h = _shift(r3h2, bus_h_prev)
        rb = _shift(rb0, b_t)
        j_vec = t - li
        at_border = j_vec == -1

        hs, es, fs = [], [], []
        for k in range(a):
            e_k = jnp.maximum(hh[k] - go, ee[k]) - ge
            uh = up_h if k == 0 else hs[k - 1]
            uf = up_f if k == 0 else fs[k - 1]
            f_k = jnp.maximum(uh - go, uf) - ge
            dg = dg_h if k == 0 else hh[k - 1]
            sub = jnp.where(a_lanes_l[k] == rb, cfg.match, cfg.mismatch)
            h_k = jnp.maximum(jnp.maximum(dg + sub, e_k), f_k)
            h_k = jnp.where(at_border, init_h_l[k], h_k)
            e_k = jnp.where(at_border, init_e_l[k], e_k)
            hs.append(h_k)
            es.append(e_k)
            fs.append(f_k)

        st2 = (tuple(hs), tuple(es), hs[a - 1], r3h1, fs[a - 1], rb,
               jnp.asarray(bus_h_t, jnp.int32).reshape(1, 1))
        # traced flush-row select: stack the a candidates, pick k_flush,
        # then the (fr, fc) element
        h_all = jnp.stack(hs)  # (a, rs, 128)
        f_all = jnp.stack(fs)
        h_fl = jax.lax.dynamic_slice(
            h_all, (k_flush, fr, fc), (1, 1, 1)).reshape(())
        f_fl = jax.lax.dynamic_slice(
            f_all, (k_flush, fr, fc), (1, 1, 1)).reshape(())
        return st2, (h_fl, f_fl)

    z = jnp.full((rs, 128), NEG, jnp.int32)
    zz = jnp.full((rs, 128), -3, jnp.int32)
    st0 = (tuple(init_h_l), tuple(init_e_l), init_h_l[a - 1], z, z, zz,
           jnp.asarray(corner, jnp.int32).reshape(1, 1))
    ts = jnp.arange(T, dtype=jnp.int32)
    _, ys = jax.lax.scan(step, st0, (ts, b[:T], bus_h[:T], bus_f[:T]))
    return ys[0], ys[1]


# ---------------------------------------------------------------------------
# Pallas harness (the TPU kernel)
# ---------------------------------------------------------------------------


def _num_chunks(cfg: WavefrontConfig, nj: int) -> int:
    return pl.cdiv(cfg.steps(nj), cfg.chunk)


def padded_len(cfg: WavefrontConfig, nj: int) -> int:
    return _num_chunks(cfg, nj) * cfg.chunk


@functools.partial(jax.jit, static_argnames=("cfg", "nj", "h_true"))
def strip_pallas(cfg: WavefrontConfig, a_lanes, b, bus_h, bus_f, init_h,
                 init_e, corner, nj: int, h_true: int):
    """Run one strip as a Pallas kernel, grid over column chunks.

    b/bus_h/bus_f must have length padded_len(cfg, nj) (logical index t).
    Returned bus_h/bus_f are physical (offset L-1) arrays of that length;
    use ``slice_bus`` to extract the logical (nj,) bus.
    """
    assert cfg.chunk >= cfg.lanes, "chunk must cover the lane ramp"
    assert cfg.chunk % 128 == 0, "chunk must be lane-aligned"
    C = cfg.chunk
    ng = _num_chunks(cfg, nj)
    T = cfg.steps(nj)
    a = cfg.alpha
    nb = a if cfg.track_best else 0
    nbt = a if (cfg.track_best and cfg.track_pos) else 0
    nl = a if cfg.store_lastcol else 0
    lane, k_fl, fr, fc = _flush_pos(cfg, h_true)
    n_int, stride = _flush_interior(cfg)
    if n_int:
        assert h_true == cfg.rows, "mid-strip flush needs a full strip"
    make_fast = _make_step(cfg, nj, h_true, fast=True)
    make_edge = _make_step(cfg, nj, h_true, fast=False)

    vec = (cfg.rs, 128)
    n_state = 2 * a + 5 + nb + nbt + 2 * nl

    def kernel(corner_ref, a_ref, ih_ref, ie_ref, b_ref, bh_ref, bf_ref,
               bho_ref, bfo_ref, bv_ref, bt_ref, lch_ref, lce_ref,
               *rest):
        if n_int:
            rh_ref, rf_ref, state_ref = rest
        else:
            (state_ref,) = rest
        g = pl.program_id(0)
        a_lanes_v = [a_ref[k] for k in range(a)]
        init_h_v = [ih_ref[k] for k in range(a)]
        init_e_v = [ie_ref[k] for k in range(a)]
        step_fast = make_fast(a_lanes_v, init_h_v, init_e_v)
        step_edge = make_edge(a_lanes_v, init_h_v, init_e_v)

        def load_state():
            flat = [state_ref[i] for i in range(n_state)]
            it = iter(flat)
            take = lambda n: tuple(next(it) for _ in range(n))
            hh, ee = take(a), take(a)
            r3h1, r3h2, r3f, rb = take(4)
            bhp = next(it)[0:1, 0:1]
            bv, bt = take(nb), take(nbt)
            lh, le = take(nl), take(nl)
            return (hh, ee, r3h1, r3h2, r3f, rb, bhp, bv, bt, lh, le)

        def pack_state(st):
            (hh, ee, r3h1, r3h2, r3f, rb, bhp, bv, bt, lh, le) = st
            flat = (list(hh) + list(ee) + [r3h1, r3h2, r3f, rb, None]
                    + list(bv) + list(bt) + list(lh) + list(le))
            for i, v in enumerate(flat):
                if v is None:  # the (1,1) bus_h_prev scalar slot
                    state_ref[i, 0:1, :] = jnp.broadcast_to(bhp, (1, 128))
                else:
                    state_ref[i] = v

        st0 = jax.lax.cond(
            g == 0,
            lambda: _init_state(cfg, corner_ref[0], init_h_v, init_e_v),
            load_state,
        )

        is_edge = jnp.logical_or(g == 0, (g + 1) * C > nj - 1)

        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def run(step_fn, st_in):
            # Mosaic has no scalar VMEM access: inputs are consumed as
            # (1,128) register rows rolled one lane per step, and bus
            # outputs accumulate into a register row flushed as one
            # vector store per 128 steps.  With mid-strip flush the
            # accumulator widens to (RS,128): one masked select captures
            # column 127 of EVERY sublane (all flush candidates at once),
            # and the boundary bus becomes sublane RS-1 of the same
            # buffer — no extra per-step select per interior row.
            nblk = C // 128

            def outer(bi, st):
                b_row0 = b_ref[pl.ds(bi, 1), :]
                bh_row0 = bh_ref[pl.ds(bi, 1), :]
                bf_row0 = bf_ref[pl.ds(bi, 1), :]
                zrow = jnp.zeros(
                    (cfg.rs if n_int else 1, 128), jnp.int32)

                U = cfg.unroll
                assert 128 % U == 0

                def inner(kb, carry):
                    st, b_row, bh_row, bf_row, bufh, buff = carry
                    for u in range(U):  # manual unroll
                        k = kb * U + u
                        t = g * C + bi * 128 + k
                        st, h_fl, f_fl = step_fn(
                            st, t,
                            b_row[0:1, 0:1],
                            bh_row[0:1, 0:1],
                            bf_row[0:1, 0:1],
                        )
                        sel = lane128 == k
                        if n_int:
                            bufh = jnp.where(sel, h_fl[:, 127:128], bufh)
                            buff = jnp.where(sel, f_fl[:, 127:128], buff)
                        else:
                            bufh = jnp.where(
                                sel, h_fl[fr : fr + 1, fc : fc + 1], bufh
                            )
                            buff = jnp.where(
                                sel, f_fl[fr : fr + 1, fc : fc + 1], buff
                            )
                        b_row = jnp.roll(b_row, -1, axis=1)
                        bh_row = jnp.roll(bh_row, -1, axis=1)
                        bf_row = jnp.roll(bf_row, -1, axis=1)
                    return (st, b_row, bh_row, bf_row, bufh, buff)

                st2, _, _, _, bufh, buff = jax.lax.fori_loop(
                    0, 128 // U, inner,
                    (st, b_row0, bh_row0, bf_row0, zrow, zrow),
                )
                if n_int:
                    bho_ref[pl.ds(bi, 1), :] = bufh[cfg.rs - 1:cfg.rs, :]
                    bfo_ref[pl.ds(bi, 1), :] = buff[cfg.rs - 1:cfg.rs, :]
                    for q in range(n_int):
                        sq = (q + 1) * stride - 1
                        rh_ref[q, pl.ds(bi, 1), :] = bufh[sq:sq + 1, :]
                        rf_ref[q, pl.ds(bi, 1), :] = buff[sq:sq + 1, :]
                else:
                    bho_ref[pl.ds(bi, 1), :] = bufh
                    bfo_ref[pl.ds(bi, 1), :] = buff
                return st2

            return jax.lax.fori_loop(0, nblk, outer, st_in)

        st = jax.lax.cond(
            is_edge, lambda s: run(step_edge, s), lambda s: run(step_fast, s),
            st0,
        )
        pack_state(st)

        @pl.when(g == ng - 1)
        def _():
            (hh, ee, r3h1, r3h2, r3f, rb, bhp, bv, bt, lh, le) = st
            for k in range(nb):
                bv_ref[k] = bv[k]
            for k in range(nbt):
                bt_ref[k] = bt[k]
            for k in range(nl):
                lch_ref[k] = lh[k]
                lce_ref[k] = le[k]

    corner_arr = jnp.asarray(corner, jnp.int32).reshape(1)
    full_vec = pl.BlockSpec((a, cfg.rs, 128), lambda g, c: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    chunk2d_spec = pl.BlockSpec((C // 128, 128), lambda g, c: (g, 0),
                                memory_space=pltpu.VMEM)
    best_spec = pl.BlockSpec((max(nb, 1), cfg.rs, 128),
                             lambda g, c: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    bt_spec = pl.BlockSpec((max(nbt, 1), cfg.rs, 128),
                           lambda g, c: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    lc_spec = pl.BlockSpec((max(nl, 1), cfg.rs, 128),
                           lambda g, c: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_specs = [chunk2d_spec, chunk2d_spec, best_spec, bt_spec,
                 lc_spec, lc_spec]
    out_shape = [
        jax.ShapeDtypeStruct((ng * C // 128, 128), jnp.int32),
        jax.ShapeDtypeStruct((ng * C // 128, 128), jnp.int32),
        jax.ShapeDtypeStruct((max(nb, 1), cfg.rs, 128), jnp.int32),
        jax.ShapeDtypeStruct((max(nbt, 1), cfg.rs, 128), jnp.int32),
        jax.ShapeDtypeStruct((max(nl, 1), cfg.rs, 128), jnp.int32),
        jax.ShapeDtypeStruct((max(nl, 1), cfg.rs, 128), jnp.int32),
    ]
    if n_int:
        rows_spec = pl.BlockSpec((n_int, C // 128, 128),
                                 lambda g, c: (0, g, 0),
                                 memory_space=pltpu.VMEM)
        out_specs += [rows_spec, rows_spec]
        out_shape += [
            jax.ShapeDtypeStruct((n_int, ng * C // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_int, ng * C // 128, 128), jnp.int32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[full_vec, full_vec, full_vec,
                  chunk2d_spec, chunk2d_spec, chunk2d_spec],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((n_state, cfg.rs, 128), jnp.int32)],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=cfg.interpret,
    )(corner_arr, a_lanes, init_h, init_e,
      b.reshape(ng * C // 128, 128),
      bus_h.reshape(ng * C // 128, 128),
      bus_f.reshape(ng * C // 128, 128))
    bho, bfo, bv, bt, lch, lce = outs[:6]
    bho = bho.reshape(ng * C)
    bfo = bfo.reshape(ng * C)

    st_like = (None,) * 7 + (
        tuple(bv[k] for k in range(nb)),
        tuple(bt[k] for k in range(nbt)),
        tuple(lch[k] for k in range(nl)),
        tuple(lce[k] for k in range(nl)),
    )
    out = _resolve_outputs(cfg, h_true, bho, bfo, st_like)
    if n_int:
        rh = outs[6].reshape(n_int, ng * C)
        rf = outs[7].reshape(n_int, ng * C)
        out["rows_h"] = jnp.stack([
            jax.lax.dynamic_slice(rh[q], (_interior_lane(cfg, q),), (nj,))
            for q in range(n_int)])
        out["rows_f"] = jnp.stack([
            jax.lax.dynamic_slice(rf[q], (_interior_lane(cfg, q),), (nj,))
            for q in range(n_int)])
    return out


def _strip_step_body(cfg, a, ih, ie, corner, b, bus_h, bus_f,
                     best_carry, i0, nj, track, h_true=None):
    h_true = cfg.rows if h_true is None else h_true
    lane = (h_true - 1) // cfg.alpha
    plen = padded_len(cfg, nj)
    pad = jnp.full(plen - nj, NEG, jnp.int32)
    out = strip_pallas(cfg, a, b, bus_h, bus_f, ih, ie, corner,
                       nj=nj, h_true=h_true)
    bh2 = jnp.concatenate(
        [jax.lax.dynamic_slice(out["bus_h"], (lane,), (nj,)), pad])
    bf2 = jnp.concatenate(
        [jax.lax.dynamic_slice(out["bus_f"], (lane,), (nj,)), pad])
    if track:
        best_carry = merge_best_device(best_carry, out["best_v"],
                                       out["best_t"], i0, 0)
    if cfg.flush_every:
        return bh2, bf2, best_carry, out["rows_h"], out["rows_f"]
    return bh2, bf2, best_carry


@functools.partial(jax.jit, static_argnames=("cfg", "nj"))
def strip_step_max(cfg: WavefrontConfig, a, ih, ie, corner, b, bus_h,
                   bus_f, max_carry, strip_id, nj: int):
    """Phase-1 step: max-only tracking, NO donation (the input buses are
    the phase-2 replay checkpoints).  cfg must have track_pos=False."""
    out = strip_pallas(cfg, a, b, bus_h, bus_f, ih, ie, corner,
                       nj=nj, h_true=cfg.rows)
    lane = (cfg.rows - 1) // cfg.alpha
    plen = padded_len(cfg, nj)
    pad = jnp.full(plen - nj, NEG, jnp.int32)
    bh2 = jnp.concatenate(
        [jax.lax.dynamic_slice(out["bus_h"], (lane,), (nj,)), pad])
    bf2 = jnp.concatenate(
        [jax.lax.dynamic_slice(out["bus_f"], (lane,), (nj,)), pad])
    max_carry = merge_max_device(max_carry, out["best_v"], strip_id)
    if cfg.flush_every:
        return bh2, bf2, max_carry, out["rows_h"], out["rows_f"]
    return bh2, bf2, max_carry


@functools.partial(jax.jit,
                   static_argnames=("cfg", "nj", "track", "h_true"),
                   donate_argnums=(6, 7))
def strip_step(cfg: WavefrontConfig, a, ih, ie, corner, b, bus_h, bus_f,
               best_carry, i0, nj: int, track: bool,
               h_true: int | None = None):
    """One full-height strip as a SINGLE dispatch: kernel + bus realign +
    on-device best merge fused into one jitted call.  Over a tunneled
    chip every op dispatch is a host round-trip, so the unfused loop
    (kernel, two slices, two updates, merge = ~6 dispatches per strip)
    pays seconds of pure latency on a chromosome-scale run.  Buses are
    donated (no copy).

    b/bus_h/bus_f: (padded_len,) logical-index arrays.  Returns
    (bus_h', bus_f', best_carry') with buses in logical indexing.
    (A lax.scan over strips was tried and is ~2x slower end-to-end: XLA
    schedules the scanned Pallas call poorly; the host loop with one
    fused dispatch per strip wins.)
    """
    return _strip_step_body(cfg, a, ih, ie, corner, b, bus_h, bus_f,
                            best_carry, i0, nj, track, h_true)


def border_h_traced(code, k, go: int, ge: int):
    """Traced border-H synthesis (models.scoring.border_cells semantics):
    code 0 = WITH_ZEROES, 1 = WITH_GAPS, 2 = WITH_GAPS_OPENED; k may be
    an array of border positions."""
    k = jnp.asarray(k, jnp.int32)
    gaps = jnp.where(k == 0, 0, -go - k * ge)
    return jnp.where(code == 0, 0,
                     jnp.where(code == 1, gaps, -k * ge)).astype(jnp.int32)


# --- device-resident sequence cache ---------------------------------------
# Key: (host pointer, length, sentinel, reversed, pad) + a sampled
# fingerprint (catches pointer reuse after free).  Bounded LRU; entries
# are sentinel-padded so any (offset, static-size) slice stays in bounds.

_DEV_SEQ_CACHE: "OrderedDict[tuple, object]" = None


def _dev_seq_key(arr: np.ndarray, sentinel: int, reverse: bool, pad: int):
    a = np.asarray(arr)
    n = len(a)
    step = max(n // 16, 1)
    fp = bytes(a[::step][:32].tobytes())
    return (a.__array_interface__["data"][0], n, sentinel, reverse, pad,
            fp)


def dev_seq_peek(arr: np.ndarray, sentinel: int, pad: int,
                 reverse: bool = False):
    """A device view of `arr` in the REQUESTED direction if one can be
    produced without a host upload, else None.  A cached same-direction
    entry with enough pad serves directly; a cached opposite-direction
    twin is flipped on device through dev_seq (one fused device op, no
    transfer) — never returned un-flipped."""
    if _DEV_SEQ_CACHE is None:
        return None
    a = np.asarray(arr)
    hit = _dev_seq_find(a, sentinel, reverse, pad)[1]
    if hit is not None:
        return hit
    twin = _dev_seq_find(a, sentinel, not reverse, 0)[1]
    if twin is not None and len(twin) >= len(a):
        return dev_seq(arr, sentinel, pad, reverse)
    return None


@functools.partial(jax.jit, static_argnames=("n", "total", "sentinel",
                                             "flip"))
def _repad_device(fwd, n: int, total: int, sentinel: int, flip: bool):
    body = fwd[:n]
    if flip:
        body = jnp.flip(body)
    return jnp.concatenate(
        [body, jnp.full(total - n, jnp.int32(sentinel))])


def _dev_seq_find(a: np.ndarray, sentinel: int, reverse: bool,
                  min_pad: int):
    """A cached entry for this array/direction with pad >= min_pad
    (callers only need length >= offset + slice; a larger pad serves).
    Returns (key, dev) or (None, None)."""
    if _DEV_SEQ_CACHE is None:
        return None, None
    probe = _dev_seq_key(a, sentinel, reverse, 0)
    for key, dev in _DEV_SEQ_CACHE.items():
        if (key[0], key[1], key[2], key[3], key[5]) == (
                probe[0], probe[1], probe[2], probe[3], probe[5]) \
                and key[4] >= min_pad:
            return key, dev
    return None, None


def dev_seq(arr: np.ndarray, sentinel: int, pad: int,
            reverse: bool = False):
    """Upload (once) a sentinel-padded int32 copy of `arr` (optionally
    reversed) and cache it.  Callers slice it with lax.dynamic_slice at
    per-partition offsets instead of shipping packed strips per call.

    Transfer avoidance: an existing entry with a LARGER pad serves
    directly, and a reversed view builds ON DEVICE by flipping the
    cached forward copy (uploading a multi-MB reversed twin over the
    tunnel costs seconds; the flip is one fused device op)."""
    global _DEV_SEQ_CACHE
    from collections import OrderedDict

    if _DEV_SEQ_CACHE is None:
        _DEV_SEQ_CACHE = OrderedDict()
    a = np.asarray(arr)
    n = len(a)
    key = _dev_seq_key(a, sentinel, reverse, pad)
    hitk, hit = _dev_seq_find(a, sentinel, reverse, pad)
    if hit is not None:
        _DEV_SEQ_CACHE.move_to_end(hitk)
        return hit
    _, fwd = _dev_seq_find(a, sentinel, not reverse, 0)
    if fwd is not None and len(fwd) >= n:
        dev = _repad_device(fwd, n, n + pad, sentinel, True)
    else:
        buf = np.full(n + pad, sentinel, np.int32)
        buf[:n] = a[::-1] if reverse else a
        dev = jnp.asarray(buf)
    _DEV_SEQ_CACHE[key] = dev
    # bounded by entries AND bytes (chromosome-scale views are ~4B/char)
    while len(_DEV_SEQ_CACHE) > 10 or sum(
            4 * (k[1] + k[4]) for k in _DEV_SEQ_CACHE) > (2 << 30):
        _DEV_SEQ_CACHE.popitem(last=False)
    return dev


def dev_seq_seed_reversed(fwd_host: np.ndarray, rev_host: np.ndarray,
                          sentinel: int, pad: int) -> None:
    """Seed the cache entry for `rev_host` (a pre-reversed host copy of
    `fwd_host`) by flipping the cached forward device array on device —
    so a consumer that passes the reversed HOST array (stage 2's
    reverse march) hits the cache instead of re-uploading multi-MB."""
    global _DEV_SEQ_CACHE
    from collections import OrderedDict

    if _DEV_SEQ_CACHE is None:
        _DEV_SEQ_CACHE = OrderedDict()
    rev = np.asarray(rev_host)
    n = len(rev)
    if _dev_seq_find(rev, sentinel, False, pad)[1] is not None:
        return
    _, fwd = _dev_seq_find(np.asarray(fwd_host), sentinel, False, 0)
    if fwd is None or len(fwd) < n:
        return
    key = _dev_seq_key(rev, sentinel, False, pad)
    _DEV_SEQ_CACHE[key] = _repad_device(fwd, n, n + pad, sentinel, True)


def _sliced_prep(cfg, seq0x, seq1x, i0_abs, j0_abs, r_local, col_code,
                 nj: int, nj_real):
    """On-device strip preparation: slice the strip chars and the column
    window, synthesize the pinned column border from its init code, and
    sentinel-mask columns beyond the real width (padded-bucket columns
    must decay, or fast-step best tracking could see phantom scores)."""
    R = cfg.rows
    go, ge = cfg.gap_open, cfg.gap_ext
    a_vec = jax.lax.dynamic_slice(seq0x, (i0_abs,), (R,))
    a = pack_lanes_jnp(cfg, a_vec)
    kk = jnp.arange(R, dtype=jnp.int32) + r_local + 1
    ih = pack_lanes_jnp(cfg, border_h_traced(col_code, kk, go, ge))
    ie = pack_lanes_jnp(cfg, jnp.full(R, NEG, jnp.int32))
    corner = border_h_traced(col_code, r_local, go, ge)
    plen = padded_len(cfg, nj)
    b_raw = jax.lax.dynamic_slice(seq1x, (j0_abs,), (plen,))
    jj = jax.lax.iota(jnp.int32, plen)
    b = jnp.where(jj < nj_real, b_raw, jnp.int32(B_SENTINEL))
    return a, ih, ie, corner, b


@functools.partial(jax.jit,
                   static_argnames=("cfg", "nj", "track"),
                   donate_argnums=(8, 9))
def strip_step_sliced(cfg: WavefrontConfig, seq0x, seq1x, i0_abs, j0_abs,
                      r_local, col_code, nj_real, bus_h, bus_f,
                      best_carry, i0_dp, nj: int, track: bool):
    """strip_step with the device-resident data plane: strip chars and
    the column window slice from resident sequences, borders synthesize
    from the init code — the only per-strip host->device traffic is a
    handful of scalars (a packed strip upload costs ~0.2 s over the
    tunnel; eight strips of a 1M run paid ~1.6 s)."""
    a, ih, ie, corner, b = _sliced_prep(
        cfg, seq0x, seq1x, i0_abs, j0_abs, r_local, col_code, nj, nj_real)
    return _strip_step_body(cfg, a, ih, ie, corner, b, bus_h, bus_f,
                            best_carry, i0_dp, nj, track)


@functools.partial(jax.jit, static_argnames=("cfg", "nj"))
def strip_step_max_sliced(cfg: WavefrontConfig, seq0x, seq1x, i0_abs,
                          j0_abs, r_local, col_code, nj_real, bus_h,
                          bus_f, max_carry, strip_id, nj: int):
    """strip_step_max (phase-1 max-only tracking) with the
    device-resident data plane.  cfg must have track_pos=False.  NOT
    donated: the two-phase replay keeps checkpoint references to the
    input buses."""
    a, ih, ie, corner, b = _sliced_prep(
        cfg, seq0x, seq1x, i0_abs, j0_abs, r_local, col_code, nj, nj_real)
    out = strip_pallas(cfg, a, b, bus_h, bus_f, ih, ie, corner,
                       nj=nj, h_true=cfg.rows)
    lane = (cfg.rows - 1) // cfg.alpha
    plen = padded_len(cfg, nj)
    pad = jnp.full(plen - nj, NEG, jnp.int32)
    bh2 = jnp.concatenate(
        [jax.lax.dynamic_slice(out["bus_h"], (lane,), (nj,)), pad])
    bf2 = jnp.concatenate(
        [jax.lax.dynamic_slice(out["bus_f"], (lane,), (nj,)), pad])
    max_carry = merge_max_device(max_carry, out["best_v"], strip_id)
    if cfg.flush_every:
        return bh2, bf2, max_carry, out["rows_h"], out["rows_f"]
    return bh2, bf2, max_carry


@functools.partial(jax.jit, static_argnames=("cfg", "plen"))
def init_bus_synth(cfg: WavefrontConfig, row_code, nj_real, plen: int):
    """Device-synthesized row-border bus (the host path builds and
    uploads it — ~0.4 s/MB over the tunnel)."""
    j = jax.lax.iota(jnp.int32, plen) + 1
    bh = jnp.where(j <= nj_real,
                   border_h_traced(row_code, j, cfg.gap_open, cfg.gap_ext),
                   jnp.int32(NEG))
    bf = jnp.full(plen, NEG, jnp.int32)
    return bh, bf


@functools.partial(jax.jit, static_argnames=("nj_real", "plen", "go",
                                             "ge"))
def hop_bus_init(row_code, nj_real: int, plen: int, go: int, ge: int):
    """Standalone-jitted init_bus_synth for host-orchestrated hop chains
    (the arbitrary-height endpoint hop builds its entering bus in one
    dispatch, then chains already-jitted strip steps)."""
    j = jax.lax.iota(jnp.int32, plen) + 1
    bh = jnp.where(j <= nj_real, border_h_traced(row_code, j, go, ge),
                   jnp.int32(NEG))
    bf = jnp.full(plen, NEG, jnp.int32)
    return bh, bf


@functools.partial(jax.jit, static_argnames=("plen",))
def bus_repad(bh, bf, plen: int):
    """Re-pad a logical last-row bus to another engine's physical length
    (content lives in [0, nj); filler is NEG either way)."""
    cur = bh.shape[0]
    if cur >= plen:
        return bh[:plen], bf[:plen]
    fill = jnp.full(plen - cur, NEG, jnp.int32)
    return (jnp.concatenate([bh, fill]), jnp.concatenate([bf, fill]))


@functools.partial(jax.jit, static_argnames=("nj",))
def delta_pack_device(v, nj: int):
    """Delta-encode the first nj elements to NIBBLES on DEVICE (two
    deltas per byte; -8 escapes out-of-range).  A DP row's deltas lie in
    [-(open+ext), match] (see io/rowcodec.py), so 4 bits almost always
    suffice — an 8x smaller pull (the pull, not the compute, dominates
    special-row flushes: PCIe on real hardware, ~0.4 s/MB over a
    tunneled chip).  Escaped positions are re-fetched at full width by
    the host."""
    x = v[:nj].astype(jnp.int32)
    dh = jnp.concatenate([x[:1], x[1:] - x[:-1]])
    small = jnp.logical_and(dh >= -7, dh <= 7)
    nib = jnp.where(small, dh, -8) & 0xF
    if nj % 2:
        nib = jnp.concatenate([nib, jnp.zeros(1, jnp.int32)])
    return (nib[0::2] | (nib[1::2] << 4)).astype(jnp.int8)


@jax.jit
def gather_device(v, idx):
    return jnp.take(v, idx)


@functools.partial(jax.jit, static_argnames=("ng", "chunk"))
def chunk_max_device(bus, ng: int, chunk: int):
    """Per-chunk maxima of the bus, reduced ON DEVICE: the pruning window
    needs ng ints, not the 4 MB bus (core/pruning.chunk_maxima's input)."""
    return jnp.max(bus[: ng * chunk].reshape(ng, chunk), axis=1)


def _decode_delta(packed, bus, nj: int) -> np.ndarray:
    u = np.asarray(packed).view(np.uint8)
    lo = (u & 0xF).astype(np.int64)
    hi = (u >> 4).astype(np.int64)
    lo[lo > 7] -= 16
    hi[hi > 7] -= 16
    dh = np.empty(2 * len(u), np.int64)
    dh[0::2] = lo
    dh[1::2] = hi
    b = dh[:nj]
    out = np.cumsum(b)
    mark = np.nonzero(b == -8)[0]
    if len(mark):
        exact = np.asarray(
            gather_device(bus, jnp.asarray(mark, jnp.int32))
        ).astype(np.int64)
        corr = exact - out[mark]
        add = np.zeros(nj, np.int64)
        add[mark] = np.diff(np.concatenate([[0], corr]))
        out += np.cumsum(add)
    return out


def pull_row_delta(bus, nj: int) -> np.ndarray:
    """Host side of delta_pack_device: pull ceil(nj/2) bytes, reconstruct
    int64 exactly (escaped positions are re-fetched at full width)."""
    return _decode_delta(delta_pack_device(bus, nj), bus, nj)


@jax.jit
def _device_copy(x):
    return x + 0


def pull_row_delta_start(bus, nj: int):
    """Begin an ASYNC delta-packed pull: the packed bytes start copying
    to the host while the caller keeps computing (the next strip's
    compute hides the transfer).  A device-side snapshot of the bus is
    kept so escape re-fetches stay valid even after the caller donates
    the live bus away."""
    packed = delta_pack_device(bus, nj)
    snap = _device_copy(bus)
    try:
        packed.copy_to_host_async()
    except AttributeError:       # interpret mode / older backends
        pass
    return (packed, snap, nj)


def pull_row_delta_finish(handle) -> np.ndarray:
    packed, snap, nj = handle
    return _decode_delta(packed, snap, nj)


def packed_row_host(handle):
    """Self-contained packed form of a pulled row: (packed_u8, esc_idx,
    esc_val).  The escape VALUES are materialized from the device
    snapshot now, so the result reconstructs the row with no device at
    all (decode_packed_row) — the persistable twin of
    pull_row_delta_finish (the SRA writes this form to disk ~16x
    smaller than the int64 pair, with no host re-encode)."""
    packed, snap, nj = handle
    u = np.asarray(packed).view(np.uint8)
    lo = (u & 0xF).astype(np.int64)
    hi = (u >> 4).astype(np.int64)
    lo[lo > 7] -= 16
    hi[hi > 7] -= 16
    dh = np.empty(2 * len(u), np.int64)
    dh[0::2] = lo
    dh[1::2] = hi
    mark = np.nonzero(dh[:nj] == -8)[0]
    if len(mark):
        exact = np.asarray(
            gather_device(snap, jnp.asarray(mark, jnp.int32))
        ).astype(np.int64)
    else:
        exact = np.empty(0, np.int64)
    return u, mark.astype(np.int64), exact


def decode_packed_row(u: np.ndarray, mark: np.ndarray, exact: np.ndarray,
                      nj: int) -> np.ndarray:
    """Host-only inverse of packed_row_host (no device access)."""
    u = np.asarray(u, np.uint8)
    lo = (u & 0xF).astype(np.int64)
    hi = (u >> 4).astype(np.int64)
    lo[lo > 7] -= 16
    hi[hi > 7] -= 16
    dh = np.empty(2 * len(u), np.int64)
    dh[0::2] = lo
    dh[1::2] = hi
    b = dh[:nj]
    out = np.cumsum(b)
    if len(mark):
        corr = np.asarray(exact, np.int64) - out[mark]
        add = np.zeros(nj, np.int64)
        add[mark] = np.diff(np.concatenate([[0], corr]))
        out += np.cumsum(add)
    return out


@functools.partial(jax.jit, static_argnames=("W1", "go"))
def goal_match_device(cut_h, cut_f, rev_h, rev_f, cj, goal, rev0h, rev0f,
                      W1: int, go: int):
    """AlignerUtils::matchColumn ON DEVICE against a device-resident
    stage-1 special row — the hot stage-2 matching without pulling either
    row to the host (the reference's findGoalCell,
    common/AlignerManager.cpp:625-656, chunked through host memory).

    cut_h/cut_f: the stored forward cut, logical index j-1 -> value at
    column j (a retained bus snapshot).  rev_h/rev_f: the reverse pass's
    last-row bus, logical index k-1 -> value at reverse column k.  Match
    index k = 0..W1-1 maps to column j = cj - k; requires
    j_low = cj - (W1-1) >= 1 (the j=0 border case goes via the host
    path).  Returns int32 (status, k, score) with status 0=aligned,
    1=gapped, 2=err-sum-match, 3=err-sum-gap, 4=no-stop — exactly
    models.scoring.match_column's outcome set."""
    W = W1 - 1
    # fwd_k[k] must read H(column cj - k) = cut[(cj - k) - 1]: the flip
    # of the W1-wide window STARTING AT cj - W1 (bus index j-1!)
    fwd_h = jnp.flip(jax.lax.dynamic_slice(cut_h, (cj - W1,), (W1,)))
    fwd_f = jnp.flip(jax.lax.dynamic_slice(cut_f, (cj - W1,), (W1,)))
    rh = jnp.concatenate([rev0h.reshape(1), rev_h[:W]]).astype(jnp.int32)
    rf = jnp.concatenate([rev0f.reshape(1), rev_f[:W]]).astype(jnp.int32)
    sum_m = fwd_h.astype(jnp.int32) + rh
    sum_g = fwd_f.astype(jnp.int32) + rf + jnp.int32(go)
    hit = (sum_m == goal) | (sum_g == goal)
    over = (sum_m > goal) | (sum_g > goal)
    stop = hit | over
    k = jnp.arange(W1, dtype=jnp.int32)
    idx = jnp.where(stop, k, jnp.int32(W1)).min()
    idx_c = jnp.clip(idx, 0, W1 - 1)
    m_at = sum_m[idx_c] == goal
    g_at = sum_g[idx_c] == goal
    is_hit = (idx < W1) & (m_at | g_at)
    status = jnp.where(
        idx >= W1, 4,
        jnp.where(is_hit,
                  jnp.where(m_at, 0, 1),
                  jnp.where(sum_m[idx_c] > goal, 2, 3)))
    score = jnp.where(m_at, fwd_h[idx_c], fwd_f[idx_c]).astype(jnp.int32)
    kout = jnp.where(idx >= W1, -1, idx_c)
    return jnp.stack([status, kout,
                      jnp.where(is_hit, score, 0)]).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg", "W", "sw"))
def hop_step_device(cfg: WavefrontConfig, s0r, s1r, cut_h, cut_f,
                    m_minus_ci, n, cj, score, typ, ok, W: int,
                    sw: bool = False):
    """One STEADY stage-2 hop fully on device: the reverse strip (one
    full cfg.rows-tall strip over a fixed W-wide window of the reversed
    sequence views), the pinned-state border synthesis from the
    crosspoint type, and the goal match against the device-resident cut
    — chained hops pass (cj, score, typ) as device scalars, so a whole
    segment of the stage-2 march runs with ONE verdict pull instead of
    one per hop (the reference's per-row findGoalCell loop,
    stage2/sw_stage2.cpp:237, is a host loop; over a remote chip each
    hop's scalar pull is a full round trip).

    Exact-equivalence contract with stages.core.reverse_pass_and_match:
    callers may chain only hops where the host path would pick this
    exact window — hb == cfg.rows, width == W == min(cp.j,
    max(4096, 2*hb)) pow2-quantized, j_low = cj - W >= 1, dev cut
    available, goal_anywhere false (see reverse_march's segment
    bounds).  On any non-match (window miss or overshoot), `ok` drops
    to 0 and the pulled segment is replayed from the failure by the
    host path, which owns widening/error semantics.

    cj/score/typ/ok: int32 scalars (typ = CrosspointType).  Returns
    (cj', score', typ', ok').  When ok' == 0 the outputs carry the
    inputs through unchanged.
    """
    go, ge = cfg.gap_open, cfg.gap_ext
    hb = cfg.rows
    # per-hop eligibility ON DEVICE (the host path's conditions with the
    # live cj/score): the window must sit fully right of column 0 with
    # the host's exact width (j_low = cj - W >= 1), and under SW the
    # hop must not be goal-reachable (the host would then run a dense
    # start-search instead of this cut match).  An ineligible hop drops
    # ok and the host replays the segment from there.
    ok = ok & (cj >= W + 1).astype(jnp.int32)
    if sw:
        reach = score <= jnp.minimum(jnp.int32(hb), cj) * cfg.match
        ok = ok & (~reach).astype(jnp.int32)
    # pinned-state borders (stages.core.init_types_for): row GAPS_OPENED
    # only for GAP_1, col GAPS_OPENED only for GAP_2, GAPS otherwise
    row_code = jnp.where(typ == 1, jnp.int32(2), jnp.int32(1))
    col_code = jnp.where(typ == 2, jnp.int32(2), jnp.int32(1))
    goal = score + jnp.where(typ != 0, jnp.int32(go), jnp.int32(0))

    plen = padded_len(cfg, W)
    bh0, bf0 = init_bus_synth(cfg, row_code, jnp.int32(W), plen)
    i0_abs = m_minus_ci
    j0_abs = n - cj
    a, ih, ie, corner, b = _sliced_prep(
        cfg, s0r, s1r, i0_abs, j0_abs, jnp.int32(0), col_code, W,
        jnp.int32(W))
    bh, bf, _ = _strip_step_body(
        cfg, a, ih, ie, corner, b, bh0, bf0,
        (jnp.int32(0), jnp.int32(0), jnp.int32(0)), 0, W, False)

    rev0h = border_h_traced(col_code, jnp.int32(hb), go, ge)
    rev0f = jnp.where(col_code == 2, jnp.int32(-hb * ge),
                      jnp.int32(-go - hb * ge))
    res = goal_match_device(cut_h, cut_f, bh, bf, cj, goal, rev0h,
                            rev0f, W1=W + 1, go=go)
    status, k, mscore = res[0], res[1], res[2]
    found = (status == 0) | (status == 1)
    ok2 = ok & found.astype(jnp.int32)
    live = ok2 == 1
    cj2 = jnp.where(live, cj - k, cj)
    score2 = jnp.where(live, mscore, score)
    typ2 = jnp.where(live, jnp.where(status == 0, jnp.int32(0),
                                     jnp.int32(2)), typ)
    return (cj2.astype(jnp.int32), score2.astype(jnp.int32),
            typ2.astype(jnp.int32), ok2.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg", "nj", "h_true", "B"))
def batched_strip_pallas(cfg: WavefrontConfig, a_all, b_all, bus_h_all,
                         bus_f_all, ih_all, ie_all, corners,
                         nj: int, h_true: int, B: int):
    """A BATCH of equal-shape strips in ONE Mosaic kernel: grid
    (batch, chunks), row-major, so each element's chunks run in order and
    the VMEM state scratch resets at its chunk 0.  Built for the
    level-batched stage 4, where a per-pair dispatch costs ~0.35 s on a
    remote chip — one batched call replaces B of them.

    a/ih/ie: (B, A, RS, 128); b/bus: (B, plen); corners: (B,).  NW
    score-only (no best/lastcol tracking).  Returns physical buses
    (B, plen) — logical column j of element k sits at [k, j + flush_lane].
    """
    assert not cfg.track_best and not cfg.store_lastcol
    assert cfg.chunk >= cfg.lanes and cfg.chunk % 128 == 0
    C = cfg.chunk
    ng = _num_chunks(cfg, nj)
    a = cfg.alpha
    _, k_fl, fr, fc = _flush_pos(cfg, h_true)
    make_fast = _make_step(cfg, nj, h_true, fast=True)
    make_edge = _make_step(cfg, nj, h_true, fast=False)
    n_state = 2 * a + 5

    def kernel(cr_ref, a_ref, ih_ref, ie_ref, b_ref, bh_ref, bf_ref,
               bho_ref, bfo_ref, state_ref):
        bb = pl.program_id(0)
        g = pl.program_id(1)
        a_lanes_v = [a_ref[0, k] for k in range(a)]
        init_h_v = [ih_ref[0, k] for k in range(a)]
        init_e_v = [ie_ref[0, k] for k in range(a)]
        step_fast = make_fast(a_lanes_v, init_h_v, init_e_v)
        step_edge = make_edge(a_lanes_v, init_h_v, init_e_v)

        def load_state():
            flat = [state_ref[i] for i in range(n_state)]
            it = iter(flat)
            take = lambda n: tuple(next(it) for _ in range(n))
            hh, ee = take(a), take(a)
            r3h1, r3h2, r3f, rb = take(4)
            bhp = next(it)[0:1, 0:1]
            return (hh, ee, r3h1, r3h2, r3f, rb, bhp, (), (), (), ())

        def pack_state(st):
            (hh, ee, r3h1, r3h2, r3f, rb, bhp, _bv, _bt, _lh, _le) = st
            flat = (list(hh) + list(ee) + [r3h1, r3h2, r3f, rb, None])
            for i, v in enumerate(flat):
                if v is None:
                    state_ref[i, 0:1, :] = jnp.broadcast_to(bhp, (1, 128))
                else:
                    state_ref[i] = v

        st0 = jax.lax.cond(
            g == 0,
            lambda: _init_state(cfg, cr_ref[bb], init_h_v, init_e_v),
            load_state,
        )
        is_edge = jnp.logical_or(g == 0, (g + 1) * C > nj - 1)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def run(step_fn, st_in):
            nblk = C // 128

            def outer(bi, st):
                b_row0 = b_ref[0, pl.ds(bi, 1), :]
                bh_row0 = bh_ref[0, pl.ds(bi, 1), :]
                bf_row0 = bf_ref[0, pl.ds(bi, 1), :]
                zrow = jnp.zeros((1, 128), jnp.int32)
                U = cfg.unroll
                assert 128 % U == 0

                def inner(kb, carry):
                    st, b_row, bh_row, bf_row, bufh, buff = carry
                    for u in range(U):
                        k = kb * U + u
                        t = g * C + bi * 128 + k
                        st, h_fl, f_fl = step_fn(
                            st, t,
                            b_row[0:1, 0:1],
                            bh_row[0:1, 0:1],
                            bf_row[0:1, 0:1],
                        )
                        sel = lane128 == k
                        bufh = jnp.where(
                            sel, h_fl[fr : fr + 1, fc : fc + 1], bufh)
                        buff = jnp.where(
                            sel, f_fl[fr : fr + 1, fc : fc + 1], buff)
                        b_row = jnp.roll(b_row, -1, axis=1)
                        bh_row = jnp.roll(bh_row, -1, axis=1)
                        bf_row = jnp.roll(bf_row, -1, axis=1)
                    return (st, b_row, bh_row, bf_row, bufh, buff)

                st2, _, _, _, bufh, buff = jax.lax.fori_loop(
                    0, 128 // U, inner,
                    (st, b_row0, bh_row0, bf_row0, zrow, zrow),
                )
                bho_ref[0, pl.ds(bi, 1), :] = bufh
                bfo_ref[0, pl.ds(bi, 1), :] = buff
                return st2

            return jax.lax.fori_loop(0, nblk, outer, st_in)

        st = jax.lax.cond(
            is_edge, lambda s: run(step_edge, s),
            lambda s: run(step_fast, s), st0,
        )
        pack_state(st)

    vec_spec = pl.BlockSpec((1, a, cfg.rs, 128),
                            lambda bb, g, *_: (bb, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    chunk_spec = pl.BlockSpec((1, C // 128, 128),
                              lambda bb, g, *_: (bb, g, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, ng),
        in_specs=[vec_spec, vec_spec, vec_spec,
                  chunk_spec, chunk_spec, chunk_spec],
        out_specs=[chunk_spec, chunk_spec],
        scratch_shapes=[pltpu.VMEM((n_state, cfg.rs, 128), jnp.int32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, ng * C // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, ng * C // 128, 128), jnp.int32),
        ],
        interpret=cfg.interpret,
    )(corners.astype(jnp.int32).reshape(B),
      a_all, ih_all, ie_all,
      b_all.reshape(B, ng * C // 128, 128),
      bus_h_all.reshape(B, ng * C // 128, 128),
      bus_f_all.reshape(B, ng * C // 128, 128))
    return (out[0].reshape(B, ng * C), out[1].reshape(B, ng * C))


@functools.partial(jax.jit, static_argnames=("cfg", "nj", "B"))
def batched_strip_pallas_dyn(cfg: WavefrontConfig, a_all, b_all,
                             bus_h_all, bus_f_all, ih_all, ie_all,
                             corners, frs, ngs, nj: int, B: int):
    """The batched NW strip kernel with PER-ELEMENT strip heights.

    The static kernel bakes the flush position (which row of the strip
    feeds the output bus) into the compile — so every distinct height in
    a stage-4 level was its own Mosaic compile key (~15 s cache load per
    key per process, minutes to compile cold).  Here the element height
    enters as data: heights are restricted to multiples of
    ``alpha * 128`` (the lane granularity), which pins the flush
    SUB-ROW to ``alpha - 1`` and the flush lane column to 127 statically
    — only the flush SUBLANE varies, prefetched per element as ``frs``
    and applied with a one-hot sublane max (a few extra VPU ops per
    step).  Sub-granularity height tails chain through the XLA dyn
    engine outside.  Compile keys collapse to (cfg, nj, B).

    a/ih/ie: (B, A, RS, 128); b/bus: (B, plen); corners, frs, ngs: (B,).
    ``ngs`` is the per-element EFFECTIVE chunk count: levels merge onto
    one width bucket (few compile keys), but an element whose true
    width ends at chunk ngs[k] skips the VPU work of the chunks past it
    (exact — DP dependencies never flow leftward, and everything right
    of an element's true width is masked downstream).  Elements with
    height 0 still compute (sentinel rows); callers mask their outputs.
    Returns physical buses (B, plen): element k's logical column j sits
    at [k, j + lane_k], lane_k = frs[k]*128+127.
    """
    assert not cfg.track_best and not cfg.store_lastcol
    assert cfg.chunk >= cfg.lanes and cfg.chunk % 128 == 0
    C = cfg.chunk
    ng = _num_chunks(cfg, nj)
    a = cfg.alpha
    # static flush template: heights are multiples of alpha*128, so the
    # flush sub-row is always alpha-1 (h_true=cfg.rows makes _make_step
    # return hs[alpha-1]) and the lane column is always 127
    make_fast = _make_step(cfg, nj, cfg.rows, fast=True)
    make_edge = _make_step(cfg, nj, cfg.rows, fast=False)
    n_state = 2 * a + 5

    def kernel(cr_ref, fr_ref, ng_ref, a_ref, ih_ref, ie_ref, b_ref,
               bh_ref, bf_ref, bho_ref, bfo_ref, state_ref):
        bb = pl.program_id(0)
        g = pl.program_id(1)

        # chunks at or past this element's effective width do no VPU
        # work (their output blocks stay garbage; callers mask columns
        # past the true width, and DP dependencies never flow leftward)
        @pl.when(g < ng_ref[bb])
        def _active():
            _kernel_body(bb, g, cr_ref, fr_ref, a_ref, ih_ref, ie_ref,
                         b_ref, bh_ref, bf_ref, bho_ref, bfo_ref,
                         state_ref)

    def _kernel_body(bb, g, cr_ref, fr_ref, a_ref, ih_ref, ie_ref,
                     b_ref, bh_ref, bf_ref, bho_ref, bfo_ref, state_ref):
        a_lanes_v = [a_ref[0, k] for k in range(a)]
        init_h_v = [ih_ref[0, k] for k in range(a)]
        init_e_v = [ie_ref[0, k] for k in range(a)]
        step_fast = make_fast(a_lanes_v, init_h_v, init_e_v)
        step_edge = make_edge(a_lanes_v, init_h_v, init_e_v)

        # one-hot sublane mask for this element's flush row (invariant
        # across the whole grid step)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (cfg.rs, 128), 0)
        sel_fr = row_iota == fr_ref[bb]

        def load_state():
            flat = [state_ref[i] for i in range(n_state)]
            it = iter(flat)
            take = lambda n: tuple(next(it) for _ in range(n))
            hh, ee = take(a), take(a)
            r3h1, r3h2, r3f, rb = take(4)
            bhp = next(it)[0:1, 0:1]
            return (hh, ee, r3h1, r3h2, r3f, rb, bhp, (), (), (), ())

        def pack_state(st):
            (hh, ee, r3h1, r3h2, r3f, rb, bhp, _bv, _bt, _lh, _le) = st
            flat = (list(hh) + list(ee) + [r3h1, r3h2, r3f, rb, None])
            for i, v in enumerate(flat):
                if v is None:
                    state_ref[i, 0:1, :] = jnp.broadcast_to(bhp, (1, 128))
                else:
                    state_ref[i] = v

        st0 = jax.lax.cond(
            g == 0,
            lambda: _init_state(cfg, cr_ref[bb], init_h_v, init_e_v),
            load_state,
        )
        is_edge = jnp.logical_or(g == 0, (g + 1) * C > nj - 1)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def run(step_fn, st_in):
            nblk = C // 128

            def outer(bi, st):
                b_row0 = b_ref[0, pl.ds(bi, 1), :]
                bh_row0 = bh_ref[0, pl.ds(bi, 1), :]
                bf_row0 = bf_ref[0, pl.ds(bi, 1), :]
                zrow = jnp.zeros((1, 128), jnp.int32)
                U = cfg.unroll
                assert 128 % U == 0

                def inner(kb, carry):
                    st, b_row, bh_row, bf_row, bufh, buff = carry
                    for u in range(U):
                        k = kb * U + u
                        t = g * C + bi * 128 + k
                        st, h_fl, f_fl = step_fn(
                            st, t,
                            b_row[0:1, 0:1],
                            bh_row[0:1, 0:1],
                            bf_row[0:1, 0:1],
                        )
                        # dynamic sublane extraction: one-hot max over
                        # sublanes, then the static lane column 127
                        vh = jnp.max(jnp.where(sel_fr, h_fl, -INF),
                                     axis=0, keepdims=True)
                        vf = jnp.max(jnp.where(sel_fr, f_fl, -INF),
                                     axis=0, keepdims=True)
                        sel = lane128 == k
                        bufh = jnp.where(sel, vh[0:1, 127:128], bufh)
                        buff = jnp.where(sel, vf[0:1, 127:128], buff)
                        b_row = jnp.roll(b_row, -1, axis=1)
                        bh_row = jnp.roll(bh_row, -1, axis=1)
                        bf_row = jnp.roll(bf_row, -1, axis=1)
                    return (st, b_row, bh_row, bf_row, bufh, buff)

                st2, _, _, _, bufh, buff = jax.lax.fori_loop(
                    0, 128 // U, inner,
                    (st, b_row0, bh_row0, bf_row0, zrow, zrow),
                )
                bho_ref[0, pl.ds(bi, 1), :] = bufh
                bfo_ref[0, pl.ds(bi, 1), :] = buff
                return st2

            return jax.lax.fori_loop(0, nblk, outer, st_in)

        st = jax.lax.cond(
            is_edge, lambda s: run(step_edge, s),
            lambda s: run(step_fast, s), st0,
        )
        pack_state(st)

    vec_spec = pl.BlockSpec((1, a, cfg.rs, 128),
                            lambda bb, g, *_: (bb, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    chunk_spec = pl.BlockSpec((1, C // 128, 128),
                              lambda bb, g, *_: (bb, g, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, ng),
        in_specs=[vec_spec, vec_spec, vec_spec,
                  chunk_spec, chunk_spec, chunk_spec],
        out_specs=[chunk_spec, chunk_spec],
        scratch_shapes=[pltpu.VMEM((n_state, cfg.rs, 128), jnp.int32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, ng * C // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, ng * C // 128, 128), jnp.int32),
        ],
        interpret=cfg.interpret,
    )(corners.astype(jnp.int32).reshape(B),
      frs.astype(jnp.int32).reshape(B),
      jnp.clip(ngs.astype(jnp.int32).reshape(B), 0, ng),
      a_all, ih_all, ie_all,
      b_all.reshape(B, ng * C // 128, 128),
      bus_h_all.reshape(B, ng * C // 128, 128),
      bus_f_all.reshape(B, ng * C // 128, 128))
    return (out[0].reshape(B, ng * C), out[1].reshape(B, ng * C))


def slice_bus(cfg: WavefrontConfig, bus_phys, nj: int, h_true: int):
    """Extract the logical (nj,) bus from a physical array: the flush row's
    column j is emitted at step t = j + flush_lane."""
    lane, _, _, _ = _flush_pos(cfg, h_true)
    return jax.lax.dynamic_slice(bus_phys, (lane,), (nj,))
