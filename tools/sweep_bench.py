#!/usr/bin/env python
"""On-chip row-sweep microbenchmark: is lax.cummax-based row DP
competitive where it matters (stage-4 halves/tails, stage-2 hops)?

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from masa_tpu.utils.devices import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    import jax
    import jax.numpy as jnp

    from masa_tpu.ops import rowsweep
    from masa_tpu.types import ScoreParams

    P = ScoreParams()
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)

    cases = [
        # (label, B, n1, R)  — stage-4 deep level / tail / early level /
        # stage-2 hop shapes
        ("deep  B128 w8k   R512 ", 128, 8193, 512),
        ("tail  B16  w256k R512 ", 16, 262145, 512),
        ("early B16  w256k R32k ", 16, 262145, 32768),
        ("hop   B1   w256k R128k", 1, 262145, 131072),
    ]
    for label, B, n1, R in cases:
        eng = rowsweep.batched_sweep_engine(
            n1, R, False, P.gap_open, P.gap_ext, P.match, P.mismatch)
        s0d = jnp.asarray(rng.choice(bases, 1 << 21).astype(np.int32))
        s1d = jnp.asarray(rng.choice(bases, 1 << 21).astype(np.int32))
        i0s = jnp.asarray(rng.integers(0, 1 << 20, B), jnp.int32)
        j0s = jnp.asarray(rng.integers(0, 1 << 20, B), jnp.int32)
        r0s = jnp.zeros(B, jnp.int32)
        codes = jnp.ones(B, jnp.int32)
        bus_h = jnp.zeros((B, n1 - 1), jnp.int32)
        bus_f = jnp.full((B, n1 - 1), -999999999, jnp.int32)
        hs = jnp.full(B, R, jnp.int32)

        def run():
            h, f = eng(s0d, s1d, i0s, j0s, r0s, codes, bus_h, bus_f, hs)
            np.asarray(h[0, :1])   # force completion over the tunnel
            return h

        t0 = time.time()
        run()
        compile_s = time.time() - t0
        best = None
        for _ in range(3):
            t0 = time.time()
            run()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        cells = B * R * (n1 - 1)
        print(f"{label}: compile {compile_s:6.1f}s  exec {best:7.3f}s  "
              f"{cells/best/1e9:8.2f} GCUPS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
