#!/usr/bin/env python
"""Round-2 consolidated on-chip validation + measurement batch.

Waits for a healthy chip window (2-strip probe > 100 GCUPS), then:
  1. mosaic stage-4 engine exactness (vs the dyn engine / stage-5
     invariant)
  2. stage-1 specials timing, pruned and unpruned (async pulls)
  3. full 1M six-stage alignment wall clock
  4. tools/roofline.py microbenchmarks
  5. bench.py

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/round2_measure.py
"""

import os
import subprocess
import sys
import tempfile
import time
import shutil

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from masa_tpu.utils.devices import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    from bench import homolog
    from masa_tpu.ops import strips
    from masa_tpu.ops.wavefront import WavefrontConfig
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

    def probe():
        sub = s0[:2 * R]
        t0 = time.time()
        strips.run_partition(cfg, sub, h1, params, InitType.WITH_ZEROES,
                             InitType.WITH_ZEROES, backend="pallas",
                             want_last_row=False)
        return 2 * R * len(h1) / (time.time() - t0) / 1e9

    probe()
    for _ in range(40):
        g = probe()
        print(f"[probe] {g:.1f} GCUPS", flush=True)
        if g > 100:
            break
        time.sleep(290)
    else:
        print("chip never recovered", flush=True)
        return 1

    # ---- 1. mosaic engine exactness ------------------------------------
    import masa_tpu.ops.batched_mm as bmm
    from masa_tpu.stages import pipeline

    ss = rng.choice(bases, 3000).astype(np.uint8)
    st = ss.copy()
    idx = rng.random(3000) < 0.08
    st[idx] = rng.choice(bases, int(idx.sum())).astype(np.uint8)
    pcfg = pipeline.PipelineConfig(params=params)
    res, ep = pipeline.stage1_pass(ss, st, pcfg)
    cps2 = pipeline.stage2_march(ss, st, pcfg, ep, res.specials)
    saved = (bmm._DYN_H_MAX, bmm._MOSAIC_NJQ_MIN)
    try:
        # force the Mosaic engine on every level: h_max > 0 beats the
        # height threshold AND njq > 0 beats the width floor (narrow
        # levels merge to exactly njq=8192, which the production
        # `njq > _MOSAIC_NJQ_MIN` routes to the row-sweep engine)
        bmm._DYN_H_MAX = 0
        bmm._MOSAIC_NJQ_MIN = 0
        t0 = time.time()
        out = bmm.reduce_partitions_batched(ss, st, cps2, params, 16)
        aln = pipeline.stage5_emit(ss, st, pcfg, out)
        assert aln.raw_score == ep.score
        print(f"mosaic-engine: {len(out)} cps exact in "
              f"{time.time()-t0:.1f}s", flush=True)
    finally:
        bmm._DYN_H_MAX, bmm._MOSAIC_NJQ_MIN = saved

    # ---- 2. stage-1 timings -------------------------------------------
    store = {}
    for prune in (False, True):
        t0 = time.time()
        r2 = strips.run_partition(
            cfg, s0, h1, params, InitType.WITH_ZEROES, InitType.WITH_ZEROES,
            backend="pallas", prune=prune, special_every=R,
            on_special_row=lambda r_, h_, f_: store.__setitem__(r_, h_[5]),
            want_last_row=False)
        print(f"stage1 specials prune={prune}: {time.time()-t0:.2f}s "
              f"best={r2.best} pruned={r2.pruned_cells/1e9:.1f}G",
              flush=True)
        assert r2.best == 796634

    # ---- 3. full pipeline ----------------------------------------------
    from masa_tpu.core.job import Job, JobConfig
    from masa_tpu.stages import runner

    wd = tempfile.mkdtemp(prefix="masa_r2m_")
    try:
        job = Job(JobConfig(work_dir=wd))
        t0 = time.time()

        def log(*a, **k):
            if "flushed row" not in str(a):
                print(f"[{time.time()-t0:8.2f}s]", *a, flush=True)

        aln = runner.align_job(job, s0, h1, log=log)
        print("FULL TOTAL", round(time.time() - t0, 2), "score",
              aln.raw_score, flush=True)
        assert aln.raw_score == 796634
    finally:
        shutil.rmtree(wd, ignore_errors=True)

    # ---- 4/5. roofline + bench ----------------------------------------
    here = os.path.dirname(os.path.abspath(__file__))
    for script in (os.path.join(here, "roofline.py"),
                   os.path.join(here, "..", "bench.py")):
        r = subprocess.run([sys.executable, script], capture_output=True,
                           text=True, timeout=3000, env=dict(os.environ))
        print(f"--- {os.path.basename(script)} ---", flush=True)
        print(r.stdout.strip(), flush=True)
        if r.returncode:
            print(r.stderr[-2000:], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
