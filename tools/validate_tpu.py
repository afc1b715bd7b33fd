#!/usr/bin/env python
"""Real-chip exactness check: run_partition (pallas backend, grouped
multi-strip fast path) vs the NumPy oracle on a multi-strip matrix.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/validate_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from masa_tpu.ops import oracle, strips
    from masa_tpu.ops.wavefront import WavefrontConfig
    from masa_tpu.types import InitType, Recurrence, ScoreParams

    cfg = WavefrontConfig(alpha=4, rs=8, chunk=2048, track_best=True,
                          store_lastcol=False)
    R = cfg.rows  # 4096
    m, n = 6 * R, 7777  # odd width: exercises column quantization padding
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    s0 = rng.choice(bases, m).astype(np.uint8)
    s1 = rng.choice(bases, n).astype(np.uint8)
    # plant a strong alignment so best is unique and off-origin
    s1[3000:3400] = s0[5 * R + 100 : 5 * R + 500]
    params = ScoreParams()

    specials = {}
    res = strips.run_partition(
        cfg, s0, s1, params,
        InitType.WITH_ZEROES, InitType.WITH_ZEROES,
        backend="pallas",
        special_every=2 * R,
        on_special_row=lambda r, h, f: specials.__setitem__(r, (h, f)),
    )
    ref = oracle.dp_rows(s0, s1, params,
                         special_rows=tuple(specials.keys()))
    ok = True
    if (res.best, res.best_i, res.best_j) != (ref.best, ref.best_i,
                                              ref.best_j):
        ok = False
        print("BEST MISMATCH:", (res.best, res.best_i, res.best_j),
              (ref.best, ref.best_i, ref.best_j))
    if not np.array_equal(res.last_h, ref.last_h):
        ok = False
        print("LAST H MISMATCH")
    for r, (h, f) in specials.items():
        rh, rf = ref.specials[r]
        if not (np.array_equal(h, rh[1:]) and np.array_equal(f, rf[1:])):
            ok = False
            print("SPECIAL ROW MISMATCH at", r)
    print("grouped-path TPU validation:", "PASS" if ok else "FAIL",
          f"(best={res.best} at ({res.best_i},{res.best_j}), "
          f"{len(specials)} special rows)")

    # two-phase best tracking (>= 16 strips): exact position via the
    # phase-2 checkpoint replay
    m2 = 20 * R
    s0b = rng.choice(bases, m2).astype(np.uint8)
    s1b = rng.choice(bases, 4096).astype(np.uint8)
    s1b[1000:1400] = s0b[17 * R + 50 : 17 * R + 450]
    res2 = strips.run_partition(cfg, s0b, s1b, params, backend="pallas")
    ref2 = oracle.dp_rows(s0b, s1b, params)
    ok2 = (res2.best, res2.best_i, res2.best_j) == (
        ref2.best, ref2.best_i, ref2.best_j)
    print("two-phase tracking validation:", "PASS" if ok2 else "FAIL",
          f"(best={res2.best} at ({res2.best_i},{res2.best_j}) vs oracle "
          f"{ref2.best} at ({ref2.best_i},{ref2.best_j}))")

    # tail-strip case: m NOT a multiple of R, best planted in the
    # partial tail strip (two-phase must not lose it)
    m3 = 20 * R + 777
    s0c = rng.choice(bases, m3).astype(np.uint8)
    s1c = rng.choice(bases, 4096).astype(np.uint8)
    s1c[2000:2300] = s0c[20 * R + 300 : 20 * R + 600]
    res3 = strips.run_partition(cfg, s0c, s1c, params, backend="pallas")
    ref3 = oracle.dp_rows(s0c, s1c, params)
    ok3 = (res3.best, res3.best_i, res3.best_j) == (
        ref3.best, ref3.best_i, ref3.best_j)
    print("tail-strip two-phase validation:", "PASS" if ok3 else "FAIL",
          f"(best={res3.best} at ({res3.best_i},{res3.best_j}) vs oracle "
          f"{ref3.best} at ({ref3.best_i},{ref3.best_j}))")
    sys.exit(0 if (ok and ok2 and ok3) else 1)


if __name__ == "__main__":
    main()
