#!/usr/bin/env python
"""Real-chip spot check of the mid-strip flush kernel: the production
shape (alpha=32, rs=32, flush_every=32768) through Mosaic, interior rows
+ boundary bus + best captures compared against the scan twin.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/spotcheck_flush.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from masa_tpu.utils.devices import enable_persistent_compile_cache

enable_persistent_compile_cache()

import jax.numpy as jnp

from masa_tpu.models.scoring import border_cells
from masa_tpu.ops import wavefront as wf
from masa_tpu.ops.wavefront import WavefrontConfig
from masa_tpu.types import InitType, ScoreParams


def main():
    P = ScoreParams()
    cfg = WavefrontConfig(alpha=32, rs=32, chunk=8192, track_best=True,
                          flush_every=32768)
    R = cfg.rows
    nj = 16384
    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", np.uint8)
    s0 = rng.choice(bases, R).astype(np.int32)
    s1 = rng.choice(bases, nj).astype(np.int32)
    plen = wf.padded_len(cfg, nj)
    b = np.full(plen, wf.B_SENTINEL, np.int32)
    b[:nj] = s1
    bus_h = np.zeros(plen, np.int32)
    bus_f = np.full(plen, -wf.INF, np.int32)
    a = wf.pack_strip_rows(cfg, s0)
    ih, ie = wf.pack_border_cols(
        cfg, *border_cells(R, InitType.WITH_ZEROES, P, start=1))

    t0 = time.time()
    out = wf.strip_pallas(cfg, jnp.asarray(a), jnp.asarray(b),
                          jnp.asarray(bus_h), jnp.asarray(bus_f),
                          jnp.asarray(ih), jnp.asarray(ie), 0,
                          nj=nj, h_true=R)
    rows_h = np.asarray(out["rows_h"])
    print(f"[mosaic] ok in {time.time()-t0:.1f}s "
          f"rows_h shape={rows_h.shape}", flush=True)

    t0 = time.time()
    ref = wf.strip_scan(cfg, jnp.asarray(a), jnp.asarray(b),
                        jnp.asarray(bus_h), jnp.asarray(bus_f),
                        jnp.asarray(ih), jnp.asarray(ie), 0,
                        nj=nj, h_true=R)
    print(f"[scan] ok in {time.time()-t0:.1f}s", flush=True)

    n_int = R // cfg.flush_every - 1
    for q in range(n_int):
        np.testing.assert_array_equal(rows_h[q],
                                      np.asarray(ref["rows_h"][q]),
                                      err_msg=f"rows_h[{q}]")
        np.testing.assert_array_equal(np.asarray(out["rows_f"][q]),
                                      np.asarray(ref["rows_f"][q]),
                                      err_msg=f"rows_f[{q}]")
    bh_k = np.asarray(wf.slice_bus(cfg, out["bus_h"], nj, R))
    bh_s = np.asarray(ref["bus_h"])
    np.testing.assert_array_equal(bh_k, bh_s, err_msg="bus_h")
    bf_k = np.asarray(wf.slice_bus(cfg, out["bus_f"], nj, R))
    np.testing.assert_array_equal(bf_k, np.asarray(ref["bus_f"]),
                                  err_msg="bus_f")
    bv_k = np.asarray(out["best_v"]).max()
    bv_s = np.asarray(ref["best_v"]).max()
    assert bv_k == bv_s, (bv_k, bv_s)
    print("SPOTCHECK PASS: interior rows, bus, best all match", flush=True)

    # quick rate probe of the flush-mode kernel at production width
    nj2 = 1 << 20
    plen2 = wf.padded_len(cfg, nj2)
    b2 = np.full(plen2, wf.B_SENTINEL, np.int32)
    b2[:nj2] = rng.choice(bases, nj2).astype(np.int32)
    bh2 = np.zeros(plen2, np.int32)
    bf2 = np.full(plen2, -wf.INF, np.int32)
    args = (jnp.asarray(a), jnp.asarray(b2), jnp.asarray(bh2),
            jnp.asarray(bf2), jnp.asarray(ih), jnp.asarray(ie))
    out2 = wf.strip_pallas(cfg, *args[:1], *args[1:4], *args[4:6], 0,
                           nj=nj2, h_true=R)
    np.asarray(out2["bus_h"][:1])  # force completion
    best = None
    for _ in range(2):
        t0 = time.time()
        out2 = wf.strip_pallas(cfg, args[0], args[1], args[2], args[3],
                               args[4], args[5], 0, nj=nj2, h_true=R)
        np.asarray(out2["bus_h"][:1])
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"[rate] flush-mode strip {R}x{nj2}: {best:.3f}s "
          f"= {R*nj2/best/1e9:.1f} GCUPS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
