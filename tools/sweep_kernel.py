#!/usr/bin/env python
"""Sweep WavefrontConfig shapes on the real chip and print per-config
steady-state GCUPS (one strip over n columns, best of `reps` timed runs).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_kernel.py
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from masa_tpu.ops import wavefront as wf
    from masa_tpu.types import ScoreParams

    n = 1 << 20
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    s1 = rng.choice(bases, size=n).astype(np.uint8)
    params = ScoreParams()

    configs = []
    for alpha, rs, chunk, unroll in [
        (16, 64, 16384, 8),    # current production config
        (32, 32, 16384, 8),
        (16, 64, 32768, 8),
        (16, 64, 16384, 4),
        (16, 32, 16384, 8),
        (32, 16, 16384, 8),
        (8, 64, 16384, 8),
        (16, 64, 8192, 8),
        (24, 48, 16384, 8),
        (32, 32, 8192, 8),
    ]:
        configs.append(wf.WavefrontConfig(
            alpha=alpha, rs=rs, chunk=chunk, unroll=unroll,
            track_best=True, store_lastcol=False,
        ))

    results = []
    for cfg in configs:
        rows = cfg.rows
        tag = (f"a{cfg.alpha}_rs{cfg.rs}_c{cfg.chunk}_u{cfg.unroll}"
               f"_R{rows}")
        try:
            s0 = rng.choice(bases, size=rows).astype(np.uint8)
            a_lanes = wf.pack_strip_rows(cfg, s0.astype(np.int32))
            ih, ie = wf.pack_border_cols(
                cfg, np.zeros(rows, np.int32),
                np.full(rows, -wf.INF, np.int32))
            plen = wf.padded_len(cfg, n)
            b = np.full(plen, wf.B_SENTINEL, np.int32)
            b[: n] = s1
            bus_h = np.zeros(plen, np.int32)
            bus_f = np.full(plen, -wf.INF, np.int32)
            args = (cfg, jax.device_put(a_lanes), jax.device_put(b),
                    jax.device_put(bus_h), jax.device_put(bus_f),
                    jax.device_put(ih), jax.device_put(ie), 0)
            t0 = time.perf_counter()
            out = wf.strip_pallas(*args, nj=n, h_true=rows)
            np.asarray(out["bus_h"])  # force execution + transfer
            compile_s = time.perf_counter() - t0
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                out = wf.strip_pallas(*args, nj=n, h_true=rows)
                np.asarray(out["bus_h"])
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            gcups = rows * n / best / 1e9
            results.append((gcups, tag))
            print(json.dumps({"cfg": tag, "gcups": round(gcups, 2),
                              "secs": round(best, 3),
                              "compile_s": round(compile_s, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            print(json.dumps({"cfg": tag, "error": str(e)[:200]}),
                  flush=True)
    results.sort(reverse=True)
    print("BEST:", results[0] if results else None)


if __name__ == "__main__":
    main()
