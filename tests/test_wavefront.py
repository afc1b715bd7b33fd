"""Wavefront kernel parity: lax.scan harness vs NumPy oracle, and Pallas
(interpret mode) vs the scan harness."""

import numpy as np
import pytest

from masa_tpu.ops import oracle, strips
from masa_tpu.ops.wavefront import WavefrontConfig
from masa_tpu.types import INF, InitType, Recurrence, ScoreParams

P = ScoreParams()
CFG = WavefrontConfig(alpha=4, rs=1, chunk=256, track_best=True,
                      store_lastcol=True)


def canon(a):
    a = np.asarray(a, dtype=np.int64)
    return np.where(a <= -INF // 2, -INF, a)


def check_partition(s0, s1, cfg, rec, init_r, init_c, backend="scan",
                    first_row=None, first_col=None, special_every=0):
    import dataclasses

    res = strips.run_partition(
        dataclasses.replace(cfg, recurrence=rec),
        s0, s1, P, init_r, init_c,
        first_row=first_row, first_col=first_col,
        backend=backend, special_every=special_every,
    )
    ref = oracle.dp_rows(
        s0, s1, P, rec, init_r, init_c,
        first_row=first_row, first_col=first_col,
        special_rows=tuple(res.specials.keys()),
    )
    assert np.array_equal(canon(res.last_h), canon(ref.last_h)), "last H"
    assert np.array_equal(canon(res.last_f), canon(ref.last_f)), "last F"
    if cfg.store_lastcol:
        assert np.array_equal(canon(res.col_h), canon(ref.col_h)), "col H"
        assert np.array_equal(canon(res.col_e), canon(ref.col_e)), "col E"
    if rec == Recurrence.SMITH_WATERMAN and cfg.track_best:
        assert res.best == ref.best
        assert (res.best_i, res.best_j) == (ref.best_i, ref.best_j)
    for r, (sh, sf) in res.specials.items():
        eh, ef = ref.specials[r]
        assert np.array_equal(canon(sh), canon(eh[1:])), f"special H {r}"
        assert np.array_equal(canon(sf), canon(ef[1:])), f"special F {r}"
    return res


class TestScanVsOracle:
    def test_sw_multi_strip_with_partial(self, dna, homolog):
        # R=512: two full strips + a partial strip of 176 rows
        s0 = dna(1200, seed=21)
        s1 = homolog(s0, seed=22)
        check_partition(s0, s1, CFG, Recurrence.SMITH_WATERMAN,
                        InitType.WITH_ZEROES, InitType.WITH_ZEROES,
                        special_every=512)

    def test_sw_single_partial_strip(self, dna, homolog):
        s0 = dna(300, seed=23)
        s1 = homolog(s0, seed=24)
        check_partition(s0, s1, CFG, Recurrence.SMITH_WATERMAN,
                        InitType.WITH_ZEROES, InitType.WITH_ZEROES)

    def test_nw_gaps_init(self, dna, homolog):
        s0 = dna(700, seed=25)
        s1 = homolog(s0, seed=26)
        check_partition(s0, s1, CFG, Recurrence.NEEDLEMAN_WUNSCH,
                        InitType.WITH_GAPS, InitType.WITH_GAPS)

    def test_nw_gaps_opened(self, dna, homolog):
        s0 = dna(520, seed=27)
        s1 = homolog(s0, seed=28)
        check_partition(s0, s1, CFG, Recurrence.NEEDLEMAN_WUNSCH,
                        InitType.WITH_GAPS_OPENED, InitType.WITH_GAPS)

    def test_narrow_matrix(self, dna, homolog):
        # nj < lanes exercises the rampdown-overlapping-rampup path
        s0 = dna(600, seed=29)
        s1 = dna(70, seed=30)
        check_partition(s0, s1, CFG, Recurrence.SMITH_WATERMAN,
                        InitType.WITH_ZEROES, InitType.WITH_ZEROES)

    def test_mid_rung_shape_parity(self, dna, homolog):
        """The production TPU mid rung's (alpha=8, rs=32) lane packing
        through the scan twin: stage1_config now routes 1M/5M-class
        stage-1 runs to this rung, so its packing/shift math gets a
        direct oracle check (the Mosaic body is the same _make_step)."""
        import dataclasses

        s0 = dna(800, seed=61)
        s1 = homolog(s0, seed=62)
        cfg = dataclasses.replace(
            WavefrontConfig(alpha=8, rs=32, chunk=8192),
            track_best=True, store_lastcol=False)
        check_partition(s0, s1, cfg, Recurrence.SMITH_WATERMAN,
                        InitType.WITH_ZEROES, InitType.WITH_ZEROES)
        check_partition(s0, s1, cfg, Recurrence.NEEDLEMAN_WUNSCH,
                        InitType.WITH_GAPS, InitType.WITH_GAPS)

    def test_custom_borders_glue(self, dna, homolog):
        """Kernel-computed bottom band glued onto an oracle top band must
        equal the monolithic oracle (the stage/multichip contract)."""
        from masa_tpu.models.scoring import border_cells

        s0 = dna(900, seed=31)
        s1 = homolog(s0, seed=32)
        mi = 300
        m = len(s0)
        full = oracle.dp_rows(
            s0, s1, P, Recurrence.NEEDLEMAN_WUNSCH,
            InitType.WITH_GAPS, InitType.WITH_GAPS,
        )
        top = oracle.dp_rows(
            s0[:mi], s1, P, Recurrence.NEEDLEMAN_WUNSCH,
            InitType.WITH_GAPS, InitType.WITH_GAPS,
        )
        colh, cole = border_cells(m - mi + 1, InitType.WITH_GAPS, P,
                                  start=mi)
        res = check_partition(
            s0[mi:], s1, CFG, Recurrence.NEEDLEMAN_WUNSCH,
            InitType.CUSTOM, InitType.CUSTOM,
            first_row=(top.last_h, top.last_f),
            first_col=(colh, cole),
        )
        assert np.array_equal(canon(res.last_h), canon(full.last_h))


class TestPallasInterpret:
    @pytest.mark.slow
    def test_sw_parity(self, dna, homolog):
        s0 = dna(600, seed=41)
        s1 = homolog(s0, seed=42)
        cfg = WavefrontConfig(alpha=4, rs=1, chunk=256, track_best=True,
                              store_lastcol=True, interpret=True)
        check_partition(s0, s1, cfg, Recurrence.SMITH_WATERMAN,
                        InitType.WITH_ZEROES, InitType.WITH_ZEROES,
                        backend="pallas")

    @pytest.mark.slow
    def test_max_only_tracking_parity(self, dna, homolog):
        """track_pos=False (two-phase phase 1): per-slot maxima must
        reduce to the oracle best score; the kernel's state packing
        without the best_t slots must stay consistent."""
        import numpy as np

        from masa_tpu.ops import oracle, wavefront as wf
        from masa_tpu.types import ScoreParams

        P = ScoreParams()
        s0 = dna(600, seed=45)
        s1 = homolog(s0, seed=46)
        cfg = WavefrontConfig(alpha=4, rs=1, chunk=256, track_best=True,
                              track_pos=False, store_lastcol=False,
                              interpret=True)
        from masa_tpu.models.scoring import border_cells

        n = len(s1)
        plen = wf.padded_len(cfg, n)
        b = np.full(plen, wf.B_SENTINEL, np.int32)
        b[:n] = s1
        bus_h = np.zeros(plen, np.int32)
        bus_f = np.full(plen, -wf.INF, np.int32)
        rows = min(cfg.rows, len(s0))
        a = wf.pack_strip_rows(cfg, s0[:rows].astype(np.int32))
        ih, ie = wf.pack_border_cols(
            cfg, np.zeros(rows, np.int32),
            np.full(rows, -wf.INF, np.int32))
        out = wf.strip_pallas(cfg, a, b, bus_h, bus_f, ih, ie, 0,
                              nj=n, h_true=rows)
        ref = oracle.dp_rows(s0[:rows], s1, P)
        assert int(np.asarray(out["best_v"]).max()) == ref.best
        assert "best_t" not in out

    @pytest.mark.slow
    def test_nw_parity(self, dna, homolog):
        s0 = dna(530, seed=43)
        s1 = homolog(s0, seed=44)
        cfg = WavefrontConfig(alpha=4, rs=1, chunk=256, track_best=False,
                              store_lastcol=True, interpret=True,
                              recurrence=Recurrence.NEEDLEMAN_WUNSCH)
        check_partition(s0, s1, cfg, Recurrence.NEEDLEMAN_WUNSCH,
                        InitType.WITH_GAPS, InitType.WITH_GAPS,
                        backend="pallas")


def test_quantize_cols_buckets():
    """Column quantization: lane-aligned, monotone, <= 12.5% overhead,
    few buckets per octave (bounds the kernel compile count)."""
    from masa_tpu.ops.strips import quantize_cols

    seen = set()
    prev = 0
    for nj in range(1, 300000, 997):
        q = quantize_cols(nj)
        assert q >= nj and q % 128 == 0
        assert q <= max(nj * 1.125 + 128, 128)
        assert q >= prev
        prev = q
        seen.add(q)
    # ~8 buckets per octave over ~11 octaves
    assert len(seen) < 100


class TestBorderDiagonalSeed:
    """Regression: each strip's rows 2..alpha at DP column 1 read the left
    border through the scan state seed (lane 0 has no at_border step, and
    lane 1's first diagonal reads the seeded bottom-row chain).  The
    minimal reproducer is TG x GC under NW zeros borders: H(2,1) must be
    +1 (diag from border H(1,0)=0), not a gap path."""

    def test_minimal_tg_gc(self):
        import numpy as np

        from masa_tpu.ops import oracle, strips
        from masa_tpu.ops.wavefront import WavefrontConfig
        from masa_tpu.types import Recurrence, ScoreParams

        s0 = np.frombuffer(b"TG", np.uint8).copy()
        s1 = np.frombuffer(b"GC", np.uint8).copy()
        P = ScoreParams()
        for rec in (Recurrence.SMITH_WATERMAN,
                    Recurrence.NEEDLEMAN_WUNSCH):
            cfg = WavefrontConfig(
                alpha=4, rs=1, chunk=512, recurrence=rec,
                track_best=rec == Recurrence.SMITH_WATERMAN)
            ref = oracle.dp_rows(s0, s1, P, rec)
            got = strips.run_partition(cfg, s0, s1, P, backend="scan")
            np.testing.assert_array_equal(got.last_h, ref.last_h)
            if rec == Recurrence.SMITH_WATERMAN:
                assert got.best == ref.best == 1

    def test_all_init_combos_small(self):
        import numpy as np

        from masa_tpu.ops import oracle, strips
        from masa_tpu.ops.wavefront import WavefrontConfig
        from masa_tpu.types import InitType, Recurrence, ScoreParams

        P = ScoreParams()
        bases = np.frombuffer(b"ACGT", np.uint8)
        for rec in (Recurrence.SMITH_WATERMAN,
                    Recurrence.NEEDLEMAN_WUNSCH):
            for ri in (0, 1, 2):
                for ci in (0, 1, 2):
                    rng = np.random.default_rng(ri * 3 + ci)
                    m = int(rng.integers(2, 40))
                    n = int(rng.integers(2, 40))
                    s0 = rng.choice(bases, m).astype(np.uint8)
                    s1 = rng.choice(bases, n).astype(np.uint8)
                    cfg = WavefrontConfig(
                        alpha=4, rs=1, chunk=512, recurrence=rec,
                        track_best=rec == Recurrence.SMITH_WATERMAN)
                    ref = oracle.dp_rows(s0, s1, P, rec, InitType(ri),
                                         InitType(ci))
                    got = strips.run_partition(
                        cfg, s0, s1, P, InitType(ri), InitType(ci),
                        backend="scan")
                    np.testing.assert_array_equal(got.last_h, ref.last_h)


def test_strip_scan_dyn_matches_static():
    """The dynamic-shape kernel (traced nj/h_true) must agree with the
    static scan twin for arbitrary widths/heights under every init."""
    import numpy as np

    from masa_tpu.ops import oracle
    from masa_tpu.ops import wavefront as wf
    from masa_tpu.types import InitType, Recurrence, ScoreParams

    P = ScoreParams()
    bases = np.frombuffer(b"ACGT", np.uint8)
    cfg = wf.WavefrontConfig(alpha=4, rs=1, chunk=512,
                             recurrence=Recurrence.NEEDLEMAN_WUNSCH,
                             track_best=False, store_lastcol=False)
    from masa_tpu.models.scoring import border_cells

    for seed, (ri, ci) in enumerate([(1, 1), (2, 1), (1, 2)]):
        rng = np.random.default_rng(seed)
        m = int(rng.integers(2, cfg.rows))
        n = int(rng.integers(2, 300))
        s0 = rng.choice(bases, m).astype(np.uint8)
        s1 = rng.choice(bases, n).astype(np.uint8)
        ref = oracle.dp_rows(s0, s1, P, Recurrence.NEEDLEMAN_WUNSCH,
                             InitType(ri), InitType(ci))
        T = cfg.steps(512)
        b = np.full(T, wf.B_SENTINEL, np.int32)
        b[:n] = s1
        rh, _ = border_cells(n + 1, InitType(ri), P)
        bus_h = np.full(T, -wf.INF, np.int32)
        bus_f = np.full(T, -wf.INF, np.int32)
        bus_h[:n] = rh[1:]
        a = wf.pack_strip_rows(cfg, s0.astype(np.int32))
        ch, ce = border_cells(m, InitType(ci), P, start=1)
        ih, ie = wf.pack_border_cols(cfg, ch, ce)
        ph, pf = wf.strip_scan_dyn(cfg, a, b, bus_h, bus_f, ih, ie,
                                   int(rh[0]), 0, m, T=T)
        lane = (m - 1) // cfg.alpha
        got_h = np.asarray(ph)[lane : lane + n]
        got_f = np.asarray(pf)[lane : lane + n]
        np.testing.assert_array_equal(got_h, ref.last_h[1:])
        np.testing.assert_array_equal(got_f, ref.last_f[1:])


@pytest.mark.slow
def test_batched_strip_pallas_interpret_parity():
    """The batched (B, chunks)-grid Mosaic kernel: per-element state
    resets at chunk 0; mixed widths pad with sentinels; every element's
    flush row must equal the oracle's last row."""
    import numpy as np

    from masa_tpu.models.scoring import border_cells
    from masa_tpu.ops import oracle
    from masa_tpu.ops import wavefront as wf
    from masa_tpu.types import InitType, Recurrence, ScoreParams

    P = ScoreParams()
    cfg = WavefrontConfig(alpha=4, rs=1, chunk=256,
                          recurrence=Recurrence.NEEDLEMAN_WUNSCH,
                          track_best=False, store_lastcol=False,
                          interpret=True)
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    B, h, nj = 3, 300, 256
    plen = wf.padded_len(cfg, nj)
    a_all = np.empty((B, cfg.alpha, cfg.rs, 128), np.int32)
    ih_all = np.empty_like(a_all)
    ie_all = np.empty_like(a_all)
    b_all = np.full((B, plen), wf.B_SENTINEL, np.int32)
    bh_all = np.full((B, plen), -wf.INF, np.int32)
    bf_all = np.full((B, plen), -wf.INF, np.int32)
    corners = np.zeros(B, np.int32)
    refs = []
    for k in range(B):
        s0 = rng.choice(bases, h).astype(np.uint8)
        w = [200, 256, 130][k]
        s1 = rng.choice(bases, w).astype(np.uint8)
        rh, _ = border_cells(w + 1, InitType.WITH_GAPS, P)
        a_all[k] = wf.pack_strip_rows(cfg, s0.astype(np.int32))
        b_all[k, :w] = s1
        bh_all[k, :w] = rh[1:]
        ch, ce = border_cells(h, InitType.WITH_GAPS, P, start=1)
        ihp, iep = wf.pack_border_cols(cfg, ch, ce)
        ih_all[k], ie_all[k] = ihp, iep
        corners[k] = rh[0]
        refs.append((s0, s1, w))
    bh, bf = wf.batched_strip_pallas(
        cfg, a_all, b_all, bh_all, bf_all, ih_all, ie_all, corners,
        nj=nj, h_true=h, B=B)
    bh = np.asarray(bh)
    bf = np.asarray(bf)
    lane = (h - 1) // cfg.alpha
    for k, (s0, s1, w) in enumerate(refs):
        ref = oracle.dp_rows(s0, s1, P, Recurrence.NEEDLEMAN_WUNSCH,
                             InitType.WITH_GAPS, InitType.WITH_GAPS)
        np.testing.assert_array_equal(bh[k, lane : lane + w],
                                      ref.last_h[1:])
        np.testing.assert_array_equal(bf[k, lane : lane + w],
                                      ref.last_f[1:])


def test_batched_strip_pallas_dyn_mixed_heights():
    """The dynamic-height batched kernel: one call, PER-ELEMENT strip
    heights (multiples of alpha*128), every element's flush row exact
    against the oracle — the property that collapses stage 4's Mosaic
    compile keys to (cfg, njq, B)."""
    import numpy as np

    from masa_tpu.models.scoring import border_cells
    from masa_tpu.ops import oracle
    from masa_tpu.ops import wavefront as wf
    from masa_tpu.types import InitType, Recurrence, ScoreParams

    P = ScoreParams()
    cfg = WavefrontConfig(alpha=2, rs=2, chunk=256,
                          recurrence=Recurrence.NEEDLEMAN_WUNSCH,
                          track_best=False, store_lastcol=False,
                          interpret=True)
    gran = cfg.alpha * 128          # 256; R = 512 -> a real height MIX
    R = cfg.rows
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    B, nj = 3, 512                  # nj far wider than any element: the
    heights = [R, gran, R]          # 512, 256, 512; per-element ngs skip
    plen = wf.padded_len(cfg, nj)
    a_all = np.empty((B, cfg.alpha, cfg.rs, 128), np.int32)
    ih_all = np.empty_like(a_all)
    ie_all = np.empty_like(a_all)
    b_all = np.full((B, plen), wf.B_SENTINEL, np.int32)
    bh_all = np.full((B, plen), -wf.INF, np.int32)
    bf_all = np.full((B, plen), -wf.INF, np.int32)
    corners = np.zeros(B, np.int32)
    frs = np.zeros(B, np.int32)
    refs = []
    for k in range(B):
        h = heights[k]
        s0 = rng.choice(bases, R).astype(np.uint8)   # padded to R rows
        w = [200, 256, 130][k]
        s1 = rng.choice(bases, w).astype(np.uint8)
        rh, _ = border_cells(w + 1, InitType.WITH_GAPS, P)
        a_all[k] = wf.pack_strip_rows(cfg, s0.astype(np.int32))
        b_all[k, :w] = s1
        bh_all[k, :w] = rh[1:]
        ch, ce = border_cells(R, InitType.WITH_GAPS, P, start=1)
        ihp, iep = wf.pack_border_cols(cfg, ch, ce)
        ih_all[k], ie_all[k] = ihp, iep
        corners[k] = rh[0]
        frs[k] = ((h - 1) // cfg.alpha) // 128
        refs.append((s0[:h], s1, w, h))
    ngs = np.asarray(
        [(w + (h - 1) // cfg.alpha + cfg.chunk - 1) // cfg.chunk
         for h, w in zip(heights, [200, 256, 130])], np.int32)
    assert ngs.max() < wf._num_chunks(cfg, nj)  # skipping is real
    bh, bf = wf.batched_strip_pallas_dyn(
        cfg, a_all, b_all, bh_all, bf_all, ih_all, ie_all,
        corners, frs, ngs, nj=nj, B=B)
    bh = np.asarray(bh)
    bf = np.asarray(bf)
    for k, (s0, s1, w, h) in enumerate(refs):
        ref = oracle.dp_rows(s0, s1, P, Recurrence.NEEDLEMAN_WUNSCH,
                             InitType.WITH_GAPS, InitType.WITH_GAPS)
        lane = (h - 1) // cfg.alpha
        np.testing.assert_array_equal(bh[k, lane : lane + w],
                                      ref.last_h[1:])
        np.testing.assert_array_equal(bf[k, lane : lane + w],
                                      ref.last_f[1:])


def test_async_packed_special_pulls(dna, homolog, monkeypatch):
    """The deferred delta-packed special-row pulls must deliver exactly
    the rows the synchronous path produces (values, order, and the final
    row after the deferred queue drains)."""
    import numpy as np

    from masa_tpu.ops import oracle, strips
    from masa_tpu.ops.wavefront import WavefrontConfig
    from masa_tpu.types import InitType, ScoreParams

    P = ScoreParams()
    cfg = WavefrontConfig(alpha=4, rs=1, chunk=512, track_best=True,
                          store_lastcol=False)
    R = cfg.rows
    s0 = dna(4 * R + 100, seed=151)
    s1 = homolog(s0, seed=152)

    rows_async = []
    monkeypatch.setenv("MASA_TPU_FORCE_PACKED_PULL", "1")
    res = strips.run_partition(
        cfg, s0, s1, P, InitType.WITH_ZEROES, InitType.WITH_ZEROES,
        backend="scan", special_every=R,
        on_special_row=lambda r, h, f: rows_async.append((r, h, f)),
    )
    monkeypatch.delenv("MASA_TPU_FORCE_PACKED_PULL")

    ref = oracle.dp_rows(s0, s1, P,
                         special_rows=tuple(r for r, _, _ in rows_async))
    assert [r for r, _, _ in rows_async] == sorted(ref.specials)
    for r, h, f in rows_async:
        np.testing.assert_array_equal(h, ref.specials[r][0][1:])
        np.testing.assert_array_equal(f, ref.specials[r][1][1:])
    assert res.best == ref.best


class TestMidStripFlush:
    """cfg.flush_every: interior special rows emitted from inside one
    strip (the decoupling of special-row spacing from strip height —
    the reference's any-cadence flush, CUDAligner.cu:502-540)."""

    def _inputs(self, dna, homolog, cfg, m, nj, rec, seed=71):
        from masa_tpu.models.scoring import border_cells
        from masa_tpu.ops import wavefront as wf

        s0 = dna(m, seed=seed)
        s1 = homolog(s0, seed=seed + 1)[:nj]
        nj = len(s1)
        plen = wf.padded_len(cfg, nj)
        b = np.full(plen, wf.B_SENTINEL, np.int32)
        b[:nj] = s1
        init = (InitType.WITH_ZEROES
                if rec == Recurrence.SMITH_WATERMAN
                else InitType.WITH_GAPS)
        rh, rf = border_cells(nj + 1, init, P)
        bus_h = np.full(plen, -INF, np.int32)
        bus_f = np.full(plen, -INF, np.int32)
        bus_h[:nj] = rh[1:]
        bus_f[:nj] = rf[1:]
        ch, ce = border_cells(cfg.rows, init, P, start=1)
        a = wf.pack_strip_rows(cfg, s0.astype(np.int32))
        ih, ie = wf.pack_border_cols(cfg, ch, ce)
        corner = int(border_cells(1, init, P)[0][0])
        ref = oracle.dp_rows(
            s0, s1, P, rec, init, init,
            special_rows=tuple(range(cfg.flush_every, cfg.rows,
                                     cfg.flush_every)))
        return s0, s1, nj, a, b, bus_h, bus_f, ih, ie, corner, ref

    def _check(self, out, ref, nj, cfg):
        rows_h = np.asarray(out["rows_h"])
        rows_f = np.asarray(out["rows_f"])
        n_int = cfg.rows // cfg.flush_every - 1
        assert rows_h.shape == (n_int, nj)
        for q in range(n_int):
            r = (q + 1) * cfg.flush_every
            np.testing.assert_array_equal(
                canon(rows_h[q]), canon(ref.specials[r][0][1:]),
                err_msg=f"interior H row {r}")
            np.testing.assert_array_equal(
                canon(rows_f[q]), canon(ref.specials[r][1][1:]),
                err_msg=f"interior F row {r}")
        # the boundary bus must be untouched by the capture rework
        from masa_tpu.ops import wavefront as wf

        bh = np.asarray(wf.slice_bus(cfg, out["bus_h"], nj, cfg.rows))
        np.testing.assert_array_equal(canon(bh), canon(ref.last_h[1:]))

    def test_scan_interior_rows_vs_oracle(self, dna, homolog):
        from masa_tpu.ops import wavefront as wf

        cfg = WavefrontConfig(alpha=4, rs=8, chunk=1024, track_best=True,
                              flush_every=1024)
        (s0, s1, nj, a, b, bus_h, bus_f, ih, ie, corner,
         ref) = self._inputs(dna, homolog, cfg, cfg.rows, 1500,
                             Recurrence.SMITH_WATERMAN)
        out = wf.strip_scan(cfg, a, b, bus_h, bus_f, ih, ie, corner,
                            nj=nj, h_true=cfg.rows)
        self._check(out, ref, nj, cfg)
        assert ref.best == int(np.asarray(out["best_v"]).max())

    def test_scan_interior_rows_nw(self, dna, homolog):
        from masa_tpu.ops import wavefront as wf

        cfg = WavefrontConfig(
            alpha=4, rs=8, chunk=1024, track_best=False,
            recurrence=Recurrence.NEEDLEMAN_WUNSCH, flush_every=512)
        (s0, s1, nj, a, b, bus_h, bus_f, ih, ie, corner,
         ref) = self._inputs(dna, homolog, cfg, cfg.rows, 1100,
                             Recurrence.NEEDLEMAN_WUNSCH, seed=73)
        out = wf.strip_scan(cfg, a, b, bus_h, bus_f, ih, ie, corner,
                            nj=nj, h_true=cfg.rows)
        self._check(out, ref, nj, cfg)

    @pytest.mark.slow
    def test_pallas_interior_rows_vs_oracle(self, dna, homolog):
        from masa_tpu.ops import wavefront as wf

        cfg = WavefrontConfig(alpha=4, rs=8, chunk=1024, track_best=True,
                              flush_every=1024, interpret=True)
        (s0, s1, nj, a, b, bus_h, bus_f, ih, ie, corner,
         ref) = self._inputs(dna, homolog, cfg, cfg.rows, 1500,
                             Recurrence.SMITH_WATERMAN)
        out = wf.strip_pallas(cfg, a, b, bus_h, bus_f, ih, ie, corner,
                              nj=nj, h_true=cfg.rows)
        self._check(out, ref, nj, cfg)
        assert ref.best == int(np.asarray(out["best_v"]).max())


def test_snap_special_interval():
    from masa_tpu.ops.strips import snap_special_interval

    cfg = WavefrontConfig(alpha=32, rs=32, chunk=8192)  # R=131072
    # sub-strip: pow2 multiples of alpha*128 below R
    assert snap_special_interval(482, cfg, "pallas") == 4096
    assert snap_special_interval(4097, cfg, "pallas") == 8192
    assert snap_special_interval(32768, cfg, "pallas") == 32768
    # k >= rs rounds to strips
    assert snap_special_interval(65537, cfg, "pallas") == 131072
    assert snap_special_interval(131073, cfg, "pallas") == 262144
    # non-pallas backends keep the strip rounding
    assert snap_special_interval(482, cfg, "scan") == 131072
    # interpret mode only honors sub-strip under the test override
    icfg = WavefrontConfig(alpha=32, rs=32, chunk=8192, interpret=True)
    assert snap_special_interval(482, icfg, "pallas") == 131072


@pytest.mark.slow
def test_run_partition_sub_strip_cadence(dna, homolog, monkeypatch):
    """End-to-end sub-strip special rows through run_partition's fused
    path: interior + boundary rows from two full strips must match the
    oracle, with the tail partial strip contributing boundary rows only
    (consumers tolerate gaps)."""
    import dataclasses

    monkeypatch.setenv("MASA_TPU_FORCE_FUSED", "1")
    cfg = WavefrontConfig(alpha=4, rs=8, chunk=1024, track_best=True,
                          interpret=True)
    R = cfg.rows  # 4096
    se = 1024
    s0 = dna(2 * R + 500, seed=81)
    s1 = homolog(s0, seed=82)[:1500]
    res = strips.run_partition(
        cfg, s0, s1, P, InitType.WITH_ZEROES, InitType.WITH_ZEROES,
        backend="pallas", special_every=se,
    )
    # all sub-strip rows of the two fused strips must be present
    fused_rows = [r for r in range(se, 2 * R + 1, se)]
    assert all(r in res.specials for r in fused_rows), \
        sorted(res.specials)
    ref = oracle.dp_rows(s0, s1, P,
                         special_rows=tuple(sorted(res.specials)))
    for r, (sh, sf) in sorted(res.specials.items()):
        np.testing.assert_array_equal(canon(sh),
                                      canon(ref.specials[r][0][1:]),
                                      err_msg=f"row {r} H")
        np.testing.assert_array_equal(canon(sf),
                                      canon(ref.specials[r][1][1:]),
                                      err_msg=f"row {r} F")
    assert res.best == ref.best
    assert (res.best_i, res.best_j) == (ref.best_i, ref.best_j)
