#!/usr/bin/env python
"""Profile the stage-2 HOST-hop cost at chromosome row widths.

The 23M x 25M record spent 4744 s in stage 2 (~32 s/hop for the ~146
hops whose cut rows had been evicted from the 8 GB DevRowCache), vs
15.7 s TOTAL at 5M where every row stayed device-resident.  This tool
reproduces the 23M regime — 131072-row special spacing over ~24M-column
rows — at a small m (8 hops) and times stage 2 twice:

  pass A (same process as stage 1): DevRowCache hot -> hop chains
  pass B (fresh Job object, stage-2 artifacts cleared): cache cold ->
         every hop pays the host path, phase-profiled per hop
         (get= SRA row fetch, align= kernel window) via
         MASA_TPU_STAGE2_TRACE

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/hop_prof.py
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["MASA_TPU_STAGE2_TRACE"] = "1"

import numpy as np


def main():
    from masa_tpu.utils.devices import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    from bench import homolog
    from masa_tpu.ops import strips
    from masa_tpu.ops.wavefront import WavefrontConfig
    from masa_tpu.types import InitType, ScoreParams

    params = ScoreParams()
    cfg = WavefrontConfig(alpha=32, rs=32, chunk=8192, track_best=True,
                          store_lastcol=False)
    R = cfg.rows

    m = 8 * 131072            # 8 hops
    n_target = 23 << 20       # 23M-class row width
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    s0 = rng.choice(bases, size=m).astype(np.uint8)
    h1 = homolog(np.random.default_rng(1), s0, indel_every=1 << 16)
    extra = np.random.default_rng(2).choice(
        bases, size=n_target - len(h1)).astype(np.uint8)
    h1 = np.concatenate([h1, extra])
    print(f"[gen] m={m} n={len(h1)}", flush=True)

    def probe():
        sub = s0[:2 * R]
        t0 = time.time()
        strips.run_partition(cfg, sub, h1[:1 << 20], params,
                             InitType.WITH_ZEROES, InitType.WITH_ZEROES,
                             backend="pallas", want_last_row=False)
        return 2 * R * (1 << 20) / (time.time() - t0) / 1e9

    probe()
    for i in range(24):
        g = probe()
        print(f"[probe {i}] {g:.1f} GCUPS", flush=True)
        if g > 100:
            break
        time.sleep(270)
    else:
        print("chip never recovered; aborting", flush=True)
        return 1

    from masa_tpu.core.job import Job, JobConfig
    from masa_tpu.stages import runner

    wd = os.path.expanduser("~/masa_hopprof.work")
    # budgets sized so stage1_plan lands on the 23M run's 131072 spacing
    # (iv_min ~= 96k); a tiny RAM share forces every row to disk in the
    # device's packed form — the 23M run's majority regime
    jcfg = JobConfig(work_dir=wd, ram_limit=64 << 20,
                     disk_limit=(2 << 30) - (64 << 20))

    def log(*a, **k):
        msg = " ".join(str(x) for x in a)
        if "flushed row" in msg:
            return
        print(f"[{time.time()-t0:8.2f}s]", msg, flush=True)

    import shutil

    def clear_traceback():
        for f in glob.glob(os.path.join(wd, "crosspoints",
                                        "crosspoint_0[2-6]*")):
            os.remove(f)

    sra_dir = os.path.join(wd, "special_rows")
    sra_bak = os.path.join(wd, "special_rows.bak")

    if os.path.isdir(sra_bak):
        # re-run: restore the untruncated ladder before anything reads it
        shutil.rmtree(sra_dir, ignore_errors=True)
        shutil.copytree(sra_bak, sra_dir)

    # ---- pass A: stage 1 + hot-cache stage 2 ---------------------------
    # (on a re-run stage 1 resumes instantly and pass A is cold too;
    # pass B is the measurement either way)
    job = Job(jcfg)
    t0 = time.time()
    runner.stage1(job, s0, h1, log=log)
    clear_traceback()
    if not os.path.isdir(sra_bak):
        # the march TRUNCATES rows behind each crosspoint; keep a copy so
        # pass B (and re-runs) still have the full ladder
        shutil.copytree(sra_dir, sra_bak)
    ta = time.time()
    runner.stage2(job, s0, h1, log=log)
    a_s = time.time() - ta
    print(f"PASS A (hot cache) stage2: {a_s:.2f}s", flush=True)

    # ---- pass B: cold-cache stage 2 (the 23M eviction regime) ----------
    clear_traceback()
    shutil.rmtree(sra_dir)
    shutil.copytree(sra_bak, sra_dir)
    job2 = Job(jcfg)          # no runtime_dev_rows -> host path every hop
    tb = time.time()
    runner.stage2(job2, s0, h1, log=log)
    b_s = time.time() - tb
    print(f"PASS B (cold cache) stage2: {b_s:.2f}s", flush=True)
    print(json.dumps({"metric": "hop_prof", "m": m, "n": len(h1),
                      "stage2_hot_s": round(a_s, 2),
                      "stage2_cold_s": round(b_s, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
