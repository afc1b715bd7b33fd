#!/usr/bin/env python
"""Round-3 consolidated on-chip batch: waits (hours if needed) for a
healthy window, then in ONE window runs:

  1. full 1M six-stage pipeline x2 with per-stage breakdown and the new
     device-resident stage-2 matching + stage-4 B-tiling (exactness
     asserted: score 796634)
  2. stage-4 sub-phase trace (MASA_TPU_STAGE4_TRACE)
  3. tools/roofline.py incl. the int16 (m16) probe
  4. bench.py (the driver's metric)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/round3_batch.py
"""

import os
import subprocess
import sys
import tempfile
import time
import shutil

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MASA_TPU_STAGE4_TRACE", "1")

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
    for i in range(48):
        g = probe()
        print(f"[probe {i}] {g:.1f} GCUPS", flush=True)
        if g > 100:
            break
        time.sleep(270)
    else:
        print("chip never recovered; aborting", flush=True)
        return 1

    # ---- 1+2: full pipeline with breakdown + stage-4 trace -------------
    from masa_tpu.core.job import Job, JobConfig
    from masa_tpu.stages import runner

    for run in (1, 2):
        wd = tempfile.mkdtemp(prefix="masa_r3b_")
        try:
            job = Job(JobConfig(work_dir=wd))
            t0 = time.time()

            def log(*a, **k):
                msg = " ".join(str(x) for x in a)
                if "flushed row" in msg:
                    return
                print(f"[{time.time()-t0:8.2f}s]", msg, flush=True)

            aln = runner.align_job(job, s0, h1, log=log)
            print(f"RUN{run} TOTAL {time.time()-t0:.2f}s "
                  f"score={aln.raw_score}", flush=True)
            assert aln.raw_score == 796634, aln.raw_score
        finally:
            shutil.rmtree(wd, ignore_errors=True)

    # ---- 3+4: roofline + bench ------------------------------------------
    here = os.path.dirname(os.path.abspath(__file__))
    for script in (os.path.join(here, "roofline.py"),
                   os.path.join(here, "..", "bench.py")):
        r = subprocess.run([sys.executable, script], capture_output=True,
                           text=True, timeout=3000, env=dict(os.environ))
        print(f"--- {os.path.basename(script)} ---", flush=True)
        print(r.stdout.strip(), flush=True)
        if r.returncode:
            print(r.stderr[-3000:], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
