#!/usr/bin/env python
"""Round-3 consolidated on-chip batch: waits (hours if needed) for a
healthy window, then in ONE window runs, in order of record value:

  1. bench.py (the driver's metric: stage-1 GCUPS + warm full 1M
     six-stage wall clock) — UNTRACED (the stage-4 trace forces
     per-step syncs and inflates the measured time)
  2. tools/big_run.py 5M (reference score-only target: 558 s)
  3. full 1M pipeline x1 with stage-4 trace (diagnostic breakdown)
  4. tools/roofline.py

Every phase is independently guarded: a timeout or crash in one phase
does not stop the later ones.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/round3_batch.py
"""

import os
import subprocess
import sys
import tempfile
import time
import shutil

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("MASA_TPU_STAGE4_TRACE", None)

import numpy as np


def _sub(label, argv, timeout, env_extra=None):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    print(f"--- {label} ---", flush=True)
    try:
        r = subprocess.run(argv, capture_output=True, text=True,
                           timeout=timeout, env=env)
        print(r.stdout.strip(), flush=True)
        if r.returncode:
            print(r.stderr[-3000:], flush=True)
    except subprocess.TimeoutExpired as e:
        print(f"{label} TIMED OUT after {timeout}s", flush=True)
        if e.stdout:
            print(str(e.stdout)[-2000:], flush=True)


def main():
    import os as _os

    if _os.path.exists("/tmp/masa_stop_chains"):
        # kill switch: the driver's round-end bench must own the chip;
        # exiting 0 ends the retry wrapper cleanly
        print("stop sentinel present; exiting", flush=True)
        return 0
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
        # prefer a healthy window; after ~2 h of waiting accept a
        # mediocre one (a degraded-window record beats no record)
        bar = 100 if i < 24 else 40
        print(f"[probe {i}] {g:.1f} GCUPS (bar {bar})", flush=True)
        if g > bar:
            break
        time.sleep(270)
    else:
        print("chip never recovered; aborting", flush=True)
        return 1

    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.join(here, "..")

    # ---- 1: bench (the driver metric), untraced ------------------------
    _sub("bench.py", [sys.executable, os.path.join(root, "bench.py")],
         timeout=1800)

    # ---- 2: 5M full run (vs the reference's 558 s score-only) ----------
    _sub("big_run 5M",
         [sys.executable, os.path.join(here, "big_run.py"), "5M"],
         timeout=2400)

    # ---- 3: diagnostic traced 1M pipeline ------------------------------
    from masa_tpu.core.job import Job, JobConfig
    from masa_tpu.stages import runner

    os.environ["MASA_TPU_STAGE4_TRACE"] = "1"
    os.environ["MASA_TPU_STAGE2_TRACE"] = "1"
    import masa_tpu.ops.batched_mm as bmm
    bmm._TRACE = True
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
        print(f"TRACED TOTAL {time.time()-t0:.2f}s "
              f"score={aln.raw_score}", flush=True)
        assert aln.raw_score == 796634, aln.raw_score
    except Exception as e:  # noqa: BLE001 — diagnostics must not kill 4
        print(f"traced pipeline failed: {e!r}", flush=True)
    finally:
        shutil.rmtree(wd, ignore_errors=True)

    # ---- 4: roofline ----------------------------------------------------
    _sub("roofline.py", [sys.executable, os.path.join(here, "roofline.py")],
         timeout=1800, env_extra={"MASA_TPU_STAGE4_TRACE": ""})

    # ---- 5: stage-4 engine rates ----------------------------------------
    _sub("engine_rates.py",
         [sys.executable, os.path.join(here, "engine_rates.py")],
         timeout=1800, env_extra={"MASA_TPU_STAGE4_TRACE": ""})
    return 0


if __name__ == "__main__":
    sys.exit(main())
