#!/usr/bin/env python
"""Focused stage-4 sub-phase trace on the real chip: runs stages 1-2 once
on the 1M bench pair, then stage 4 twice (second = warm) with
MASA_TPU_STAGE4_TRACE sub-timers.

Usage: MASA_TPU_STAGE4_TRACE=1 PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/stage4_trace.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MASA_TPU_STAGE4_TRACE", "1")

import numpy as np


def main():
    from masa_tpu.utils.devices import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    from bench import homolog
    from masa_tpu.ops import strips
    from masa_tpu.ops.batched_mm import reduce_partitions_batched
    from masa_tpu.ops.wavefront import WavefrontConfig
    from masa_tpu.stages import core, pipeline
    from masa_tpu.types import InitType, ScoreParams

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    m = 1 << 20
    s0 = rng.choice(bases, size=m).astype(np.uint8)
    h1 = homolog(np.random.default_rng(1), s0)
    params = ScoreParams()
    cfg = WavefrontConfig(alpha=32, rs=32, chunk=8192, track_best=True,
                          store_lastcol=False)
    R = cfg.rows

    sub = s0[:2 * R]
    t0 = time.time()
    strips.run_partition(cfg, sub, h1, params, InitType.WITH_ZEROES,
                         InitType.WITH_ZEROES, backend="pallas",
                         want_last_row=False)
    t0 = time.time()
    strips.run_partition(cfg, sub, h1, params, InitType.WITH_ZEROES,
                         InitType.WITH_ZEROES, backend="pallas",
                         want_last_row=False)
    g = 2 * R * len(h1) / (time.time() - t0) / 1e9
    print(f"[probe] {g:.1f} GCUPS", flush=True)
    if g < 100:
        print("chip degraded; numbers not comparable", flush=True)

    pcfg = pipeline.PipelineConfig(params=params)
    t0 = time.time()
    res, ep = pipeline.stage1_pass(s0, h1, pcfg)
    print(f"stage1 {time.time()-t0:.1f}s best={ep.score}", flush=True)
    t0 = time.time()
    cps2 = pipeline.stage2_march(s0, h1, pcfg, ep, res.specials)
    print(f"stage2 {time.time()-t0:.1f}s cps={len(cps2)}", flush=True)

    import math
    mps = max(16, int(math.isqrt(1 << 18)))
    for run in (1, 2):
        t0 = time.time()
        out = reduce_partitions_batched(s0, h1, cps2, params, mps,
                                        log=lambda *a: print(*a,
                                                             flush=True))
        print(f"STAGE4 RUN{run}: {time.time()-t0:.2f}s "
              f"cps={len(out)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
