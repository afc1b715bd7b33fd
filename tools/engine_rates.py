#!/usr/bin/env python
"""On-chip engine rate probe: the same stage-4 level workload through
each engine, printing effective GCUPS.  Answers where the batched
dynamic-height Mosaic kernel's measured ~13 GCUPS (vs the static strip
kernel's ~150) actually goes, and whether mid levels should reroute to
per-half strip chains.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/engine_rates.py

Shapes mirror a 1M run's stage-4 top level at the round-3 spacing
(32768-row pairs -> 16384-row halves) and a 23M-class level
(131072-row halves).
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

    from masa_tpu.ops import batched_mm as bmm
    from masa_tpu.ops import strips, wavefront as wf
    from masa_tpu.types import InitType, ScoreParams

    params = ScoreParams()
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    m = n = 1 << 20
    s0 = rng.choice(bases, m).astype(np.uint8)
    s1 = rng.choice(bases, n).astype(np.uint8)

    def force(x):
        np.asarray(x[0] if isinstance(x, tuple) else x).ravel()[:1]

    # health probe
    cfg1 = wf.WavefrontConfig(alpha=32, rs=32, chunk=8192, track_best=True)
    t0 = time.time()
    strips.run_partition(cfg1, s0[: 2 * cfg1.rows], s1, params,
                         InitType.WITH_ZEROES, InitType.WITH_ZEROES,
                         backend="pallas", want_last_row=False)
    g = 2 * cfg1.rows * n / (time.time() - t0) / 1e9
    print(f"[probe] {g:.1f} GCUPS (stage-1 rung, cold-ish)", flush=True)

    cases = [
        # (label, B, h, w)  — per-direction level shapes
        ("1M-top level (B=32, h=16384, w=32768)", 32, 16384, 32768),
        ("mid level    (B=64, h=4096,  w=8192)", 64, 4096, 8192),
        # the 5M run's level-4 class (records/big_run_5M_r4.log: 21 s in
        # the row-sweep engine) — the round-4 reroute's justification
        ("deep level   (B=256, h=2048, w=4096)", 256, 2048, 4096),
        ("deep level   (B=512, h=512,  w=1024)", 512, 512, 1024),
        # odd heights: exercises the batched dyn tail + residue path
        ("odd level    (B=64, h=5000,  w=8192)", 64, 5000, 8192),
        ("23M-top level (B=8, h=131072, w=262144)", 8, 131072, 262144),
    ]
    for label, B, h, w in cases:
        njq = max(128, 1 << (w - 1).bit_length())
        if h > 256:
            njq = max(njq, 8192)  # production's deep-level width merge
        halves = []
        step_i = (m - h) // max(B, 1)
        step_j = (n - w) // max(B, 1)
        for k in range(B):
            halves.append(bmm._Half(k * step_i, h, k * step_j, w, 0, 0))
        cells = B * h * w
        dev = bmm._DevSeqs(s0, s1, pad0=131072 + 8, pad1=njq + 65536)
        print(f"--- {label}: {cells/1e9:.1f} Gcells/direction ---",
              flush=True)
        for name, fn in [
            ("mosaic-dyn", lambda: bmm._halves_mosaic(
                dev, halves, False, params, njq)),
            ("strips    ", lambda: bmm._halves_strips(
                dev, halves, False, params, njq)),
            ("row-sweep ", lambda: bmm._halves_sweep(
                dev, halves, False, params, njq)),
        ]:
            if name.startswith("row") and h > 16384:
                continue  # hours at that height; skip
            try:
                out = fn()
                force(out)  # compile + first run
                t0 = time.time()
                out = fn()
                force(out)
                dt = time.time() - t0
                print(f"  {name}: {dt:7.2f} s  = {cells/dt/1e9:7.1f} "
                      f"GCUPS", flush=True)
            except Exception as e:  # noqa: BLE001 — probe must continue
                print(f"  {name}: FAILED {e!r}"[:300], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
