#!/usr/bin/env python
"""Round-5 consolidated on-chip batch (VERDICT r4 items 2/3/4/5/9):
waits for a healthy window, then runs in order of record value:

  1. tools/calibrate.py — re-measure every planner constant (item 9)
  2. warm 1M six-stage pipeline x2 (frozen score 796634), best-of-2
     untraced — the README 1M row (item 2)
  3. traced 1M x1 (per-level stage-4 + per-hop stage-2 breakdown) —
     attributes the r4 stage-4 regression (item 3)
  4. 5M pruning ON vs OFF, both fresh (item 4): pruned-cell fraction
     and net seconds on silicon
  5. tools/split1_record.py — the sharded Pallas path on silicon
     (item 5)
  6. tools/engine_rates.py (healthy-window engine table)
  7. tools/roofline.py (re-validate the mix bound)

The 23M re-record (item 1) runs SEPARATELY after this batch so a crash
there cannot take the batch artifacts with it.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/round5_batch.py \
      2>&1 | tee records/round5_batch.log
"""

import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("MASA_TPU_STAGE4_TRACE", None)
os.environ.pop("MASA_TPU_STAGE2_TRACE", None)

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
    if os.path.exists("/tmp/masa_stop_chains"):
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
    for i in range(60):
        g = probe()
        bar = 100 if i < 36 else 40
        print(f"[probe {i}] {g:.1f} GCUPS (bar {bar})", flush=True)
        if g > bar:
            break
        time.sleep(270)
    else:
        print("chip never recovered; aborting", flush=True)
        return 1

    here = os.path.dirname(os.path.abspath(__file__))

    # ---- 1: calibration (item 9) ----------------------------------------
    _sub("calibrate.py",
         [sys.executable, os.path.join(here, "calibrate.py")],
         timeout=2400)

    # ---- 2: warm 1M pipeline x2 (item 2) ---------------------------------
    from masa_tpu.core.job import Job, JobConfig
    from masa_tpu.stages import runner

    ok_1m = False
    best = None
    for k in range(2):
        wd = tempfile.mkdtemp(prefix="masa_r5b_")
        try:
            job = Job(JobConfig(work_dir=wd))
            t0 = time.time()
            marks = {}

            def log(*a, **k_):
                msg = " ".join(str(x) for x in a)
                if "flushed row" in msg:
                    return
                if msg.startswith("stage"):
                    marks[msg.split(":")[0]] = round(time.time() - t0, 2)

            aln = runner.align_job(job, s0, h1, log=log)
            dt = time.time() - t0
            assert aln.raw_score == 796634, aln.raw_score
            ok_1m = True
            print(f"[1M run {k}] {dt:.2f}s score={aln.raw_score} "
                  f"marks={marks}", flush=True)
            if best is None or dt < best:
                best = dt
        except Exception as e:  # noqa: BLE001
            print(f"[1M run {k}] FAILED {e!r}", flush=True)
        finally:
            shutil.rmtree(wd, ignore_errors=True)
    if best is not None:
        print(f"1M BEST-OF-2: {best:.2f}s", flush=True)

    # ---- 3: diagnostic traced 1M (item 3) --------------------------------
    os.environ["MASA_TPU_STAGE4_TRACE"] = "1"
    os.environ["MASA_TPU_STAGE2_TRACE"] = "1"
    import masa_tpu.ops.batched_mm as bmm
    bmm._TRACE = True
    wd = tempfile.mkdtemp(prefix="masa_r5b_")
    try:
        job = Job(JobConfig(work_dir=wd))
        t0 = time.time()

        def log(*a, **k_):
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
    os.environ.pop("MASA_TPU_STAGE4_TRACE", None)
    os.environ.pop("MASA_TPU_STAGE2_TRACE", None)
    bmm._TRACE = False

    # ---- 4: 5M pruning ON vs OFF, both fresh (item 4) --------------------
    if ok_1m:
        _sub("big_run 5M (pruning ON)",
             [sys.executable, os.path.join(here, "big_run.py"), "5M",
              "--fresh"], timeout=3600)
        _sub("big_run 5M (pruning OFF)",
             [sys.executable, os.path.join(here, "big_run.py"), "5M",
              "--fresh", "--no-prune"], timeout=3600)
    else:
        print("SKIPPING 5M: the 1M validation failed", flush=True)

    # ---- 5: the sharded path on real silicon (item 5) --------------------
    _sub("split1_record.py",
         [sys.executable, os.path.join(here, "split1_record.py")],
         timeout=3600)

    # ---- 6: engine rates ---------------------------------------------------
    _sub("engine_rates.py",
         [sys.executable, os.path.join(here, "engine_rates.py")],
         timeout=1800)

    # ---- 7: roofline --------------------------------------------------------
    _sub("roofline.py", [sys.executable, os.path.join(here, "roofline.py")],
         timeout=1800)
    return 0


if __name__ == "__main__":
    sys.exit(main())
