"""Strip chaining: run a whole partition through the wavefront kernel,
strip by strip, managing buses, borders, best scores and special rows.

This is the compute core under the aligner (the role of
AbstractDiagonalAligner::alignPartition + processNextIteration,
libs/masa-core/src/libmasa/aligners/AbstractDiagonalAligner.cpp:59-159):
the ``on_special_row`` callback is the dispatch funnel the manager hooks
into.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from masa_tpu.core import pruning
from masa_tpu.models.scoring import border_cells
from masa_tpu.ops import wavefront as wf
from masa_tpu.types import INF, InitType, Recurrence, ScoreParams


import os as _osm

# Per-strip cost of the unfused windowed path above the fused rate.
# calibrate.py measures the pure dispatch delta at ~0.22 s/strip warm,
# but the round-5 same-window 5M ON/OFF pair
# (records/big_run_5M_r5_pruneON_final.log vs _warmpair.log) measured
# the EFFECTIVE cost at ~2-3 s/strip: per-group busmax syncs, sub-strip
# flush gaps on windowed strips (boundary-only rows -> taller stage-4
# partitions: 40 s -> 98 s at 5M), and ~15 s/process cache load per
# window-width shape.  A 5%-pruned 5M run lost ~150 s net under a
# 0.5 s gate.  2.0 keeps 1M/5M-class strips (~1-4 s) fused unless the
# window genuinely collapses, while 23M-class strips (~21 s, spacing ==
# rung so no flush gaps) go windowed from ~10% narrowing.
_WINDOWED_OVERHEAD_S = float(
    _osm.environ.get("MASA_TPU_WINDOWED_OVERHEAD_S", "2.0"))
_WINDOWED_RATE = float(_osm.environ.get("MASA_TPU_WINDOWED_RATE", "167e9"))

# Window-width floor as a fraction of the full chunk count: every pow2
# width bucket is a distinct Mosaic kernel shape costing ~15 s of
# kernel-cache LOAD per process (measured round 5,
# records/big_run_5M_r5_warmpair.log: a warm pruned 5M rerun still paid
# ~170 s of loads), so the bucket set is capped at {ng/2, ng/4, ng/8}
# — three windowed shapes per run.  Windows narrower than ng/8 compute
# a few extra (already-small) chunks instead of buying a fourth shape.
_WINDOW_MIN_FRAC = int(_osm.environ.get("MASA_TPU_WINDOW_MIN_FRAC", "8"))


def pl_cdiv(a: int, b: int) -> int:
    return -(-a // b)


def quantize_cols(nj: int, quantum: int = 128) -> int:
    """Round nj up to one of ~8 buckets per octave (lane-aligned).  The
    kernel is compiled per column count; unquantized traceback partitions
    (arbitrary widths) trigger a remote compile EACH — tens of seconds per
    shape — while padded sentinel columns cost <= 12.5% extra compute and
    cannot change any real-region value (DP dependencies only flow
    rightward; sentinel chars never match, so padded-region scores only
    decay and can never win a strict-> best update)."""
    if nj <= quantum:
        return quantum
    q = max(quantum, 1 << max(nj.bit_length() - 4, 0))
    return -(-nj // q) * q


def snap_special_interval(iv: int, cfg: "wf.WavefrontConfig",
                          backend: str) -> int:
    """Smallest kernel-flushable special-row cadence >= iv.

    With the mid-strip flush (wf._flush_interior) the pallas kernel can
    emit rows every k*alpha*128 for any power-of-two k < rs, so the
    cadence no longer rounds up to the strip height — the decoupling that
    lets stage 1 run the tallest rung at full rate with dense special
    rows (the reference's any-cadence flush,
    AbstractDiagonalAligner.cpp:466-478).  Other backends keep the
    strip-boundary rounding."""
    import os

    R = cfg.rows
    grain = cfg.alpha * 128
    if (backend == "pallas" and iv < R
            and (not cfg.interpret
                 or os.environ.get("MASA_TPU_FORCE_FUSED"))):
        k = -(-iv // grain)
        k = 1 << (k - 1).bit_length()   # pow2 -> divides rs
        if k < cfg.rs:
            return k * grain
    return max(((iv + R - 1) // R) * R, R)


class RowPull:
    """Deferred host materialization of one special row.

    In lazy mode stage 1 emits THIS instead of pulling the row through
    the tunnel: the buses stay as device snapshots (shared with the
    DevRowCache that stage 2 matches against) and the host transfer
    happens only if/when a consumer actually needs host bytes — the SRA
    for a disk checkpoint (start() overlaps the transfer with later
    strips), or a stage-2 host-fallback read (rows()).  RAM-destined
    rows never cross the tunnel at all."""

    def __init__(self, dev_h, dev_f, nj: int):
        self.dev_h = dev_h
        self.dev_f = dev_f
        self.nj = nj
        self._hh = self._hf = None

    def start(self) -> "RowPull":
        """Begin the async packed transfer (idempotent)."""
        if self._hh is None:
            self._hh = wf.pull_row_delta_start(self.dev_h, self.nj)
            self._hf = wf.pull_row_delta_start(self.dev_f, self.nj)
        return self

    def ready(self) -> bool:
        if self._hh is None:
            return False
        try:
            return self._hh[0].is_ready() and self._hf[0].is_ready()
        except AttributeError:
            return True

    def rows(self) -> tuple[np.ndarray, np.ndarray]:
        """(h, f) int64 host arrays of length nj (no border element)."""
        self.start()
        return (wf.pull_row_delta_finish(self._hh),
                wf.pull_row_delta_finish(self._hf))

    def packed(self):
        """((u, esc_idx, esc_val) for h, same for f): the disk-
        persistable packed form (wf.decode_packed_row reconstructs)."""
        self.start()
        return wf.packed_row_host(self._hh), wf.packed_row_host(self._hf)

    def anchors(self, stride: int):
        """(anc_h, anc_f) int64 absolute values at bus positions
        0, stride, 2*stride, ... < nj, gathered ON DEVICE (a few hundred
        scalars) — the random-access index that lets stage 2 decode just
        a match window out of a disk row instead of all O(n) of it."""
        idx = jnp.asarray(np.arange(0, self.nj, stride, np.int32))
        ah = np.asarray(wf.gather_device(self.dev_h, idx)).astype(np.int64)
        af = np.asarray(wf.gather_device(self.dev_f, idx)).astype(np.int64)
        return ah, af


@dataclasses.dataclass
class PartitionResult:
    last_h: np.ndarray          # (n+1,) DP last row H (index 0 = border)
    last_f: np.ndarray          # (n+1,)
    best: int
    best_i: int                 # DP coordinates
    best_j: int
    col_h: np.ndarray | None    # (m+1,) DP last column H if store_lastcol
    col_e: np.ndarray | None
    specials: dict[int, tuple[np.ndarray, np.ndarray]]
    cells: int = 0
    pruned_cells: int = 0
    dev_last: tuple | None = None  # device (bus_h, bus_f), want_dev_last


def _border_vec(init, params, length, start, custom):
    """(H, gap) border values for DP indices start .. start+length-1."""
    if init == InitType.CUSTOM:
        h, g = custom
        return (
            np.asarray(h[start : start + length], np.int32),
            np.asarray(g[start : start + length], np.int32),
        )
    h, g = border_cells(length, init, params, start=start)
    return h, g


def run_partition(
    cfg: wf.WavefrontConfig,
    seq0: np.ndarray,
    seq1: np.ndarray,
    params: ScoreParams = ScoreParams(),
    row_init: InitType = InitType.WITH_ZEROES,
    col_init: InitType = InitType.WITH_ZEROES,
    first_row: tuple[np.ndarray, np.ndarray] | None = None,
    first_col: tuple[np.ndarray, np.ndarray] | None = None,
    backend: str = "scan",
    special_every: int = 0,
    on_special_row: Callable | None = None,
    stop_check: Callable | None = None,
    prune: bool = False,
    first_col_reader=None,
    lastcol_writer=None,
    pad_rows: bool = False,
    blocks_sink: Callable | None = None,
    want_last_row: bool = True,
    dev_slices: tuple | None = None,
    on_special_row_dev: Callable | None = None,
    want_dev_last: bool = False,
    on_special_row_lazy: Callable | None = None,
) -> PartitionResult:
    """Align one partition.  first_row=(H,F) and first_col=(H,E) are DP
    border vectors of length n+1 / m+1 when the init type is CUSTOM.

    ``special_every`` must be a multiple of the strip height (or 0);
    ``on_special_row(dp_row_index, bus_h, bus_f)`` fires at that cadence.
    ``blocks_sink(rows_done, chunk_maxima)`` receives the per-chunk bus
    maxima after every strip (--dump-blocks support; forces the per-strip
    host path).  ``stop_check(strip_result_dict, rows_done, strip_rows, col_off)``
    may return True to halt early (goal-score support); the strip covered
    DP rows (rows_done - strip_rows, rows_done] and its best captures are
    relative to kernel column offset col_off (pruning windows).  ``prune`` enables block pruning (SW with
    best tracking only): strips run on a power-of-2-quantized chunk window
    computed from the previous bus; pruned columns carry -INF buses.

    ``dev_slices = (seq0x, i0_off, seq1x, j0_off)``: device-resident
    sentinel-padded sequence arrays (wf.dev_seq) with this partition's
    origin offsets.  When given (and the borders are synthesizable, not
    CUSTOM), full strips slice their chars/windows ON DEVICE and borders
    synthesize from init codes — per-strip host->device traffic drops to
    scalars.  Falls back to the host data path otherwise.
    """
    import os as _os

    m, nj = len(seq0), len(seq1)
    assert nj >= 1
    nj_out = nj  # the real width; every output/pull is sliced to it
    # the fused single-dispatch strip path normally skips interpret mode
    # (Mosaic-in-interpreter is slow); MASA_TPU_FORCE_FUSED exercises it
    # in CPU tests (the mid-strip flush path lives only there)
    force_fused = bool(_os.environ.get("MASA_TPU_FORCE_FUSED"))
    fused_ok = not cfg.interpret or force_fused
    if (backend == "pallas" and not cfg.interpret
            and not cfg.store_lastcol and lastcol_writer is None):
        nj = quantize_cols(nj)
    R = cfg.rows
    # pad_rows: iterate whole strips only (sentinel rows in the tail
    # strip); every strip then hits the one full-height compile.  Sentinel
    # rows never match and only lose score, so SW bests and all specials
    # at rows <= m are exact; the final-row output becomes meaningless.
    m_iter = ((m + R - 1) // R) * R if pad_rows else m
    assert not (pad_rows and first_col_reader), \
        "streamed borders need exact strip heights"
    L = cfg.lanes
    C = cfg.chunk
    sub_strip = False
    n_int = 0
    cfg_flush = cfg
    if special_every and special_every % R != 0:
        # sub-strip cadence: the kernel emits interior rows mid-strip
        # (wf._flush_interior geometry).  Only the fused pallas path
        # carries the extra outputs; windowed/partial strips fall back
        # to boundary-only flushes (consumers tolerate gaps — stage 2's
        # next_below takes whatever row exists below).
        grain = cfg.alpha * 128
        assert backend == "pallas" and fused_ok, \
            "sub-strip flush cadence needs the fused pallas kernel"
        assert special_every % grain == 0 and R % special_every == 0, \
            "sub-strip cadence must be alpha*128-aligned and divide R"
        sub_strip = True
        n_int = R // special_every - 1
        cfg_flush = dataclasses.replace(cfg, flush_every=special_every)

    T = cfg.steps(nj)
    ng = pl_cdiv(T, C)
    # one extra chunk of padding so pruning windows can slice freely
    # (jax.lax.dynamic_slice CLAMPS out-of-range starts — the buffers must
    # cover the largest window slice exactly)
    blen = (ng + 1) * C
    prune = prune and cfg.track_best and (
        cfg.recurrence == Recurrence.SMITH_WATERMAN
    ) and not cfg.store_lastcol

    # device-resident slicing applies to full strips with synthesizable
    # (non-CUSTOM) column borders; bounds are checked so callers can
    # always pass their arrays and let unsupported cases fall back
    use_sliced = False
    if dev_slices is not None and backend == "pallas" \
            and not cfg.interpret and first_col is None \
            and first_col_reader is None \
            and col_init != InitType.CUSTOM:
        seq0x, i0_off, seq1x, j0_off = dev_slices
        use_sliced = (len(seq0x) >= i0_off + (m_iter // R) * R
                      and len(seq1x) >= j0_off + wf.padded_len(cfg, nj))

    b = None

    def get_b():
        nonlocal b
        if b is None:
            ba = np.full(blen, wf.B_SENTINEL, dtype=np.int32)
            ba[:nj_out] = np.asarray(seq1, np.int32)
            b = jnp.asarray(ba)
        return b

    row_h, row_f = _border_vec(
        row_init, params, nj_out + 1, 0, first_row
    )
    if use_sliced and first_row is None and row_init != InitType.CUSTOM:
        # synthesized on device (blen-long, masked beyond nj_out)
        bus_h, bus_f = wf.init_bus_synth(cfg, jnp.int32(int(row_init)),
                                         jnp.int32(nj_out), blen)
    else:
        bus_ha = np.full(blen, -INF, dtype=np.int32)
        bus_fa = np.full(blen, -INF, dtype=np.int32)
        bus_ha[:nj_out] = row_h[1:]
        bus_fa[:nj_out] = row_f[1:]
        bus_h, bus_f = jnp.asarray(bus_ha), jnp.asarray(bus_fa)

    best, best_i, best_j = -INF, 0, 0
    sw = cfg.recurrence == Recurrence.SMITH_WATERMAN
    if cfg.track_best:
        # border cells are part of the matrix and must seed the best
        # for NW too (nw_best endpoint selection): the in-kernel
        # tracking covers interior cells only
        best = int(row_h.max())
        best_j = int(np.argmax(row_h))
        best_i = 0
        if first_col_reader is None:
            ch0, _ = _border_vec(col_init, params, m + 1, 0, first_col)
            if int(ch0.max()) > best:
                best = int(ch0.max())
                best_i, best_j = int(np.argmax(ch0)), 0

    col_h = np.empty(m + 1, np.int64) if cfg.store_lastcol else None
    col_e = np.empty(m + 1, np.int64) if cfg.store_lastcol else None
    if cfg.store_lastcol:
        rh, rf = row_h, row_f
        col_h[0] = rh[nj_out]
        col_e[0] = -INF

    specials: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    cells = 0
    pruned_cells = 0
    prune_skip = 0   # groups left to run unwindowed without a re-check
    neg_pack = None
    dev_best = None  # on-device (score, i, j) accumulator
    # Two-phase best tracking: phase 1 tracks per-slot MAX only (~14%
    # cheaper per strip); phase 2 replays from the nearest bus checkpoint
    # and re-runs the winning strip with full tracking to recover (i, j).
    # Pays off once the replay cost amortizes (>= 16 strips); checkpoint
    # stride bounds HBM to <= 64 retained bus pairs.
    n_strips_full = m_iter // R
    two_phase = (backend == "pallas" and cfg.track_best
                 and stop_check is None and not prune
                 and not cfg.interpret and not cfg.store_lastcol
                 and first_col_reader is None
                 and n_strips_full >= 16)
    ck_stride = max(1, -(-n_strips_full // 64)) if two_phase else 1
    dev_max = None   # (smax, strip_id) accumulator (phase 1)
    ckpts: dict[int, tuple] = {}  # strip_id -> input buses (phase 2)
    stream_corner = int(row_h[0])  # H(i0, 0) carried between strip reads
    plen = wf.padded_len(cfg, nj)

    # delta-packed pulls only pay off when the pull crosses PCIe/tunnel
    # (MASA_TPU_FORCE_PACKED_PULL exercises the path in CPU tests)
    import jax as _jax
    packed_pull = (_jax.default_backend() != "cpu"
                   or bool(_os.environ.get("MASA_TPU_FORCE_PACKED_PULL")))

    def pull(bus):
        return wf.pull_row_delta(bus, nj_out) if packed_pull \
            else np.asarray(bus[:nj_out]).astype(np.int64)

    # Deferred special-row delivery: the packed bytes copy to the host
    # asynchronously while later strips compute.  Completed transfers
    # drain opportunistically (is_ready polling, never blocking the
    # strip loop); the in-flight count stays small so delivery work
    # interleaves with compute instead of piling into a serial drain at
    # loop end (measured: end-loading 7 rows cost ~2 s/row on the
    # tunnel), and an HBM byte cap bounds the retained bus snapshots at
    # chromosome scale.
    deferred = []

    def deliver_one():
        r0_, hh, hf = deferred.pop(0)
        bh = wf.pull_row_delta_finish(hh)
        bf = wf.pull_row_delta_finish(hf)
        if on_special_row:
            on_special_row(r0_, bh, bf)
        else:
            specials[r0_] = (bh, bf)

    def drain_ready():
        while deferred:
            _, hh, hf = deferred[0]
            try:
                ready = hh[0].is_ready() and hf[0].is_ready()
            except AttributeError:
                break
            if not ready:
                break
            deliver_one()

    def deliver_deferred():
        while deferred:
            deliver_one()

    inflight_cap = int(_os.environ.get("MASA_TPU_SPECIAL_INFLIGHT", "2"))
    # each deferred row retains two bus snapshots in HBM; cap the queue
    # by bytes so chromosome-scale runs stay well inside device memory
    defer_cap = max(1, min(inflight_cap,
                           (2 << 30) // max(blen * 8, 1)))

    def emit_special(r, bus_h, bus_f):
        if on_special_row_lazy is not None:
            # lazy mode: no host transfer here — snapshots go to the
            # device cache and a RowPull lets the store pull on demand
            snap_h = wf._device_copy(bus_h)
            snap_f = wf._device_copy(bus_f)
            if on_special_row_dev is not None:
                on_special_row_dev(r, snap_h, snap_f)
            on_special_row_lazy(r, RowPull(snap_h, snap_f, nj_out))
            return
        if packed_pull:
            drain_ready()
            while len(deferred) >= defer_cap:
                deliver_one()
            handle_h = wf.pull_row_delta_start(bus_h, nj_out)
            handle_f = wf.pull_row_delta_start(bus_f, nj_out)
            if on_special_row_dev is not None:
                # the packed pull already retains device snapshots for
                # escape re-fetches — share them with the device cache
                on_special_row_dev(r, handle_h[1], handle_f[1])
            deferred.append((r, handle_h, handle_f))
        else:
            if on_special_row_dev is not None:
                on_special_row_dev(r, wf._device_copy(bus_h),
                                   wf._device_copy(bus_f))
            bh, bf = pull(bus_h), pull(bus_f)
            if on_special_row:
                on_special_row(r, bh, bf)
            else:
                specials[r] = (bh, bf)
    i0 = 0
    while i0 < m_iter:
        hs = min(R, m_iter - i0)

        # ---- grouped fast path: scan N full strips in ONE dispatch ----
        # (no per-strip host consumer; the tunnel charges ~10-30 ms per
        # op dispatch, so chaining strips host-side wastes seconds).
        # Under pruning, the fused path still runs while the window
        # covers >= 3/4 of the chunks — slicing a near-full window buys
        # nothing and costs per-strip syncs + per-window-bucket kernel
        # compiles; the windowed path below takes over once the window
        # genuinely narrows.
        wide = True
        if (prune and backend == "pallas" and hs == R
                and first_col_reader is None and not cfg.store_lastcol
                and stop_check is None and blocks_sink is None
                and fused_ok):
            # the busmax pull is a blocking sync (it drains the queued
            # groups); while the window stays essentially full, skipping
            # a few checks is exact-safe (a skipped check just means no
            # pruning for that group) and keeps the pipeline deep
            if prune_skip > 0:
                prune_skip -= 1
            else:
                if dev_best is not None:
                    best = int(dev_best[0])
                busmax0 = np.asarray(wf.chunk_max_device(bus_h, ng, C))
                ich0, _ = _border_vec(col_init, params, 1, i0 + 1,
                                      first_col)
                wl0, wr0 = pruning.pruning_window(
                    busmax0, best, i0, m, nj_out, C, params,
                    border_max=int(ich0.max()),
                )
                # Cost-based narrowing: the unfused windowed path costs
                # ~2-3 s of dispatch/sync per strip on the tunnel, so it
                # pays only when the PRUNED CELLS buy that back at the
                # kernel's rate.  At 1M a full strip is ~0.9 s, so even a
                # half-empty window stays fused (measured round 3: a
                # 6.7%-pruned 1M run was 24 s SLOWER windowed); at 23M a
                # strip is ~22 s and a 40% window saves ~9 s/strip —
                # the first 23M run pruned ZERO cells under the old
                # fixed 1/8-of-chunks gate.
                # gate on the EFFECTIVE window (pow2-quantized and
                # floored at ng/_WINDOW_MIN_FRAC like the slicer below)
                w_eff = max(wr0 - wl0, 0,
                            -(-ng // _WINDOW_MIN_FRAC))
                saved_s = (ng - min(w_eff, ng)) * C * hs / _WINDOWED_RATE
                wide = wl0 < wr0 and saved_s < _WINDOWED_OVERHEAD_S
                if wide and (wr0 - wl0) * 8 >= ng * 7:
                    prune_skip = 3
        if (backend == "pallas" and hs == R and (not prune or wide)
                and first_col_reader is None and not cfg.store_lastcol
                and stop_check is None and blocks_sink is None
                and fused_ok):
            g = (min(m_iter, m) - i0) // R
            if special_every and not sub_strip:
                nb = ((i0 // special_every) + 1) * special_every
                g = min(g, (nb - i0) // R)
            if prune:
                # bound the fused group so the window gets reconsidered;
                # with prune_skip the re-check can lag up to 4 groups
                # (32 strips) while the window stays essentially full
                g = min(g, 8)
            if g >= 1:
                if cfg.track_best and not two_phase and dev_best is None:
                    dev_best = (jnp.int32(best), jnp.int32(best_i),
                                jnp.int32(best_j))
                carry = dev_best if (cfg.track_best and not two_phase) \
                    else (jnp.int32(0), jnp.int32(0), jnp.int32(0))
                # One fused dispatch per strip (kernel + realign + merge);
                # loop-invariant borders hoisted.  (Both a lax.scan over
                # strips and on-device strip indexing measured SLOWER than
                # this on the tunneled chip — see strip_step's docstring.)
                const_border = col_init == InitType.WITH_ZEROES
                bh_p, bf_p = bus_h[:plen], bus_f[:plen]
                b_p = None if use_sliced else get_b()[:plen]
                ih_c = ie_c = None
                if two_phase and dev_max is None:
                    dev_max = (jnp.int32(best), jnp.int32(-1))
                cfg_run = dataclasses.replace(cfg_flush, track_pos=False) \
                    if two_phase else cfg_flush

                def emit_strip(s0k, rows):
                    # interior rows (logical (n_int, nj) device arrays)
                    # then the strip-boundary row from the fresh bus
                    if rows is not None:
                        for qi in range(n_int):
                            r_abs = s0k + (qi + 1) * special_every
                            if r_abs < m:
                                emit_special(r_abs, rows[0][qi],
                                             rows[1][qi])
                    if sub_strip and s0k + R < m:
                        emit_special(s0k + R, bh_p, bf_p)

                for k in range(g):
                    s0k = i0 + k * R
                    rows = None
                    if use_sliced:
                        if two_phase:
                            if (s0k // R) % ck_stride == 0:
                                ckpts[s0k // R] = (bh_p, bf_p)
                            bh_p, bf_p, dev_max, *rows = \
                                wf.strip_step_max_sliced(
                                    cfg_run, seq0x, seq1x,
                                    jnp.int32(i0_off + s0k),
                                    jnp.int32(j0_off),
                                    jnp.int32(s0k),
                                    jnp.int32(int(col_init)),
                                    jnp.int32(nj_out), bh_p, bf_p,
                                    dev_max, s0k // R, nj,
                                )
                        else:
                            bh_p, bf_p, carry, *rows = \
                                wf.strip_step_sliced(
                                    cfg_flush, seq0x, seq1x,
                                    jnp.int32(i0_off + s0k),
                                    jnp.int32(j0_off),
                                    jnp.int32(s0k),
                                    jnp.int32(int(col_init)),
                                    jnp.int32(nj_out), bh_p, bf_p, carry,
                                    s0k, nj, cfg.track_best,
                                )
                        emit_strip(s0k, rows or None)
                        continue
                    a_lanes = jnp.asarray(
                        np.ascontiguousarray(seq0[s0k : s0k + R],
                                             np.int32)
                        .reshape(L, cfg.alpha).T
                        .reshape(cfg.alpha, cfg.rs, 128))
                    if ih_c is None or not const_border:
                        ich, ice = _border_vec(col_init, params, R,
                                               s0k + 1, first_col)
                        ihk, iek = wf.pack_border_cols(cfg, ich, ice)
                        ih_c, ie_c = jnp.asarray(ihk), jnp.asarray(iek)
                    corner = int(_border_vec(col_init, params, 1, s0k,
                                             first_col)[0][0])
                    if two_phase:
                        if (s0k // R) % ck_stride == 0:
                            ckpts[s0k // R] = (bh_p, bf_p)
                        bh_p, bf_p, dev_max, *rows = wf.strip_step_max(
                            cfg_run, a_lanes, ih_c, ie_c, corner, b_p,
                            bh_p, bf_p, dev_max, s0k // R, nj,
                        )
                    else:
                        bh_p, bf_p, carry, *rows = wf.strip_step(
                            cfg_flush, a_lanes, ih_c, ie_c, corner, b_p,
                            bh_p, bf_p, carry, s0k, nj, cfg.track_best,
                        )
                    emit_strip(s0k, rows or None)
                fill = jnp.full(blen - plen, -INF, jnp.int32)
                bus_h = jnp.concatenate([bh_p, fill])
                bus_f = jnp.concatenate([bf_p, fill])
                if cfg.track_best and not two_phase:
                    dev_best = carry
                cells += g * R * nj_out
                i0 += g * R
                if (special_every and not sub_strip
                        and i0 % special_every == 0 and i0 < m):
                    # streamed to the caller's store (keeping copies here
                    # would hold O(m*n/interval) host RAM); the pull is
                    # asynchronous — it lands while the next group runs
                    emit_special(i0, bus_h, bus_f)
                continue
        a_lanes = jnp.asarray(wf.pack_strip_rows(cfg, seq0[i0 : i0 + hs]))
        if first_col_reader is not None:
            # streamed left border (multi-process column split): one
            # strip's worth of neighbor last-column cells per read
            ich, ice = first_col_reader.read(hs)
            corner = stream_corner
            stream_corner = int(ich[-1])
        else:
            ich, ice = _border_vec(
                col_init, params, min(hs, m - i0) if pad_rows else hs,
                i0 + 1, first_col,
            )
            corner_h, _ = _border_vec(col_init, params, 1, min(i0, m),
                                      first_col)
            corner = int(corner_h[0])
        init_h, init_e = wf.pack_border_cols(cfg, ich, ice)
        init_h, init_e = jnp.asarray(init_h), jnp.asarray(init_e)

        # --- block pruning window (SW): [wa, wa+wn) chunks ------------
        wa, wn, off = 0, ng, 0
        skip_strip = False
        if prune:
            busmax = np.asarray(wf.chunk_max_device(bus_h, ng, C))
            wl, wr = pruning.pruning_window(
                busmax, best, i0, m, nj_out, C, params,
                border_max=int(ich.max()),
            )
            if wl == wr:
                skip_strip = True
                pruned_cells += hs * nj_out
                bus_h = jnp.full(blen, -INF, jnp.int32)
                bus_f = jnp.full(blen, -INF, jnp.int32)
                out = None
            else:
                wn = 1 << (wr - wl - 1).bit_length()
                # floor at ng/_WINDOW_MIN_FRAC (pow2): bounds the set of
                # compiled window shapes at 3 per run (~15 s of kernel
                # cache load per shape per process)
                floor_wn = 1 << (max(-(-ng // _WINDOW_MIN_FRAC), 1)
                                 - 1).bit_length()
                wn = min(max(wn, floor_wn), ng)
                wa = max(0, min(wl, ng - wn))

        if not skip_strip:
            windowed = prune and (wa > 0 or wn < ng)
            if windowed:
                nj_w = wn * C
                off = wa * C
                b_w = jax.lax.dynamic_slice(get_b(), (off,), (nj_w + C,))
                bh_w = jax.lax.dynamic_slice(bus_h, (off,), (nj_w + C,))
                bf_w = jax.lax.dynamic_slice(bus_f, (off,), (nj_w + C,))
                if wa > 0:
                    # -INF wall at the window's left edge
                    # (clearPrunedBlocks semantics)
                    if neg_pack is None:
                        nh, ne = wf.pack_border_cols(
                            cfg, np.full(R, -INF), np.full(R, -INF)
                        )
                        neg_pack = (jnp.asarray(nh), jnp.asarray(ne))
                    ih_w, ie_w = neg_pack
                    corner_w = -INF
                else:
                    ih_w, ie_w, corner_w = init_h, init_e, corner
                pruned_cells += max(0, hs * (nj_out - nj_w))
            else:
                nj_w, off = nj, 0
                b_w, bh_w, bf_w = get_b(), bus_h, bus_f
                ih_w, ie_w, corner_w = init_h, init_e, corner

            # Partial strips (a one-off shape per partition) run through
            # the scan twin: an XLA while-loop compiles in seconds where
            # the unrolled Mosaic kernel takes a minute.
            strip_backend = backend
            if (backend == "pallas" and hs < R and not cfg.interpret):
                strip_backend = "scan"
            if strip_backend == "pallas":
                plen = wf.padded_len(cfg, nj_w)
                out = wf.strip_pallas(
                    cfg, a_lanes, b_w[:plen], bh_w[:plen], bf_w[:plen],
                    ih_w, ie_w, corner_w, nj_w, hs,
                )
                new_bh = wf.slice_bus(cfg, out["bus_h"], nj_w, hs)
                new_bf = wf.slice_bus(cfg, out["bus_f"], nj_w, hs)
            else:
                out = wf.strip_scan(
                    cfg, a_lanes, b_w, bh_w, bf_w,
                    ih_w, ie_w, corner_w, nj_w, hs,
                )
                new_bh, new_bf = out["bus_h"], out["bus_f"]

            neg_full = jnp.full(blen, -INF, jnp.int32)
            bus_h = jax.lax.dynamic_update_slice(neg_full, new_bh, (off,))
            bus_f = jax.lax.dynamic_update_slice(neg_full, new_bf, (off,))
            cells += hs * min(nj_w, nj_out)

            if cfg.track_best:
                if stop_check is None and not two_phase:
                    # No per-strip host consumer: fold the best on-device
                    # (a 1 MB capture pull per strip costs ~0.4 s over a
                    # tunneled chip).  The pruning window only needs the
                    # SCALAR best, pulled per strip below.
                    if dev_best is None:
                        dev_best = (jnp.int32(best), jnp.int32(best_i),
                                    jnp.int32(best_j))
                    dev_best = wf.merge_best_device(
                        dev_best, out["best_v"], out["best_t"], i0, off
                    )
                    if prune:
                        best = int(dev_best[0])
                else:
                    s, bi, bj = wf.resolve_best(out["best_v"],
                                                out["best_t"])
                    if s > best:
                        best, best_i, best_j = s, i0 + bi + 1, off + bj + 1
            if cfg.store_lastcol:
                lch = np.asarray(out["lastcol_h"])
                lce = np.asarray(out["lastcol_e"])
                col_h[i0 + 1 : i0 + 1 + hs] = lch
                col_e[i0 + 1 : i0 + 1 + hs] = lce
                if lastcol_writer is not None:
                    lastcol_writer.write(lch.astype(np.int32),
                                         lce.astype(np.int32))

        i0 += hs
        if blocks_sink is not None:
            blocks_sink(i0, pruning.chunk_maxima(
                np.asarray(bus_h[: ng * C]), ng, C))
        is_special = special_every and i0 % special_every == 0 and i0 < m
        if is_special:
            emit_special(i0, bus_h, bus_f)
        if stop_check and out is not None and stop_check(out, i0, hs, off):
            break

    deliver_deferred()
    if dev_best is not None:
        # the device carry was seeded with the initial host best (border
        # candidates) and tie-breaks on-device — it IS the final answer
        best, best_i, best_j = (int(v) for v in jax.device_get(dev_best))
    if dev_max is not None:
        smax, sidx = (int(v) for v in jax.device_get(dev_max))
        # >= : on a tie with the (later, larger-i) tail strip the phase-1
        # strip wins, preserving the engine-wide smallest-i tie-break
        if smax >= best and sidx >= 0:
            # phase 2: replay max-only from the nearest checkpoint, then
            # re-run the winning strip with full tracking for (i, j)
            k0 = sidx - sidx % ck_stride
            bh_ck, bf_ck = ckpts[k0]

            def strip_inputs(k):
                s0k = k * R
                a_l = jnp.asarray(
                    np.ascontiguousarray(seq0[s0k : s0k + R], np.int32)
                    .reshape(L, cfg.alpha).T
                    .reshape(cfg.alpha, cfg.rs, 128))
                ich, ice = _border_vec(col_init, params, R, s0k + 1,
                                       first_col)
                ihk, iek = wf.pack_border_cols(cfg, ich, ice)
                cch = int(_border_vec(col_init, params, 1, s0k,
                                      first_col)[0][0])
                return a_l, jnp.asarray(ihk), jnp.asarray(iek), cch

            cfg_max = dataclasses.replace(cfg, track_pos=False)
            dummy = (jnp.int32(-INF), jnp.int32(-1))
            for k in range(k0, sidx):
                a_l, ihk, iek, cch = strip_inputs(k)
                bh_ck, bf_ck, dummy = wf.strip_step_max(
                    cfg_max, a_l, ihk, iek, cch, get_b()[:plen],
                    bh_ck, bf_ck, dummy, k, nj,
                )
            a_l, ihk, iek, cch = strip_inputs(sidx)
            seed = (jnp.int32(-INF), jnp.int32(0), jnp.int32(0))
            _, _, carry2 = wf.strip_step(
                cfg, a_l, ihk, iek, cch, get_b()[:plen],
                bh_ck, bf_ck, seed, sidx * R, nj, True,
            )
            best, best_i, best_j = (int(v) for v in
                                    jax.device_get(carry2))
            assert best == smax, (best, smax)
    if want_last_row:
        last_h = np.empty(nj_out + 1, np.int64)
        last_f = np.empty(nj_out + 1, np.int64)
        if first_col_reader is not None:
            last_h[0] = stream_corner
        else:
            ch, ce = _border_vec(col_init, params, 1, i0, first_col)
            last_h[0] = ch[0]
        last_f[0] = -INF
        last_h[1:] = pull(bus_h)
        last_f[1:] = pull(bus_f)
    else:
        # score-only callers (the SW stage-1 hot loop) skip the final
        # 2 x O(n) device->host pull
        last_h = last_f = None

    dev_last = (bus_h, bus_f) if want_dev_last else None

    return PartitionResult(
        last_h=last_h,
        last_f=last_f,
        best=best,
        best_i=best_i,
        best_j=best_j,
        col_h=col_h,
        col_e=col_e,
        specials=specials,
        cells=cells,
        pruned_cells=pruned_cells,
        dev_last=dev_last,
    )
