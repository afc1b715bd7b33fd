#!/usr/bin/env python
"""Round-5 final on-chip batch, run AFTER the 23M re-record:

  1. warm 1M six-stage pipeline x2 (frozen score 796634), best-of-2 —
     the README 1M row measured on the CURRENT engine (the stage-4
     row-sweep reroute and calibrated gates landed after the earlier
     round5_batch warm runs)
  2. traced 1M x1 — per-level stage-4 + per-hop stage-2 attribution for
     the same engine (VERDICT r4 item 3's done-criterion: stage 4 <= 4 s
     warm in a committed trace)
  3. tools/split1_record.py with phase tracing (MASA_SHARDED_TRACE) and
     MASA_SPLIT1_RUNS=1 — diagnose where the earlier 1500 s sharded-on-
     silicon run spent its time (VERDICT r4 item 5)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/round5_final.py \
      2>&1 | tee records/round5_final.log
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
    for i in range(48):
        g = probe()
        bar = 100 if i < 24 else 40
        print(f"[probe {i}] {g:.1f} GCUPS (bar {bar})", flush=True)
        if g > bar:
            break
        time.sleep(270)
    else:
        print("chip never recovered; aborting", flush=True)
        return 1

    here = os.path.dirname(os.path.abspath(__file__))

    # ---- 1: warm 1M pipeline x2 ------------------------------------------
    from masa_tpu.core.job import Job, JobConfig
    from masa_tpu.stages import runner

    best = None
    for k in range(2):
        wd = tempfile.mkdtemp(prefix="masa_r5f_")
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

    # ---- 2: diagnostic traced 1M ------------------------------------------
    os.environ["MASA_TPU_STAGE4_TRACE"] = "1"
    os.environ["MASA_TPU_STAGE2_TRACE"] = "1"
    import masa_tpu.ops.batched_mm as bmm
    bmm._TRACE = True
    wd = tempfile.mkdtemp(prefix="masa_r5f_")
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
    except Exception as e:  # noqa: BLE001
        print(f"traced pipeline failed: {e!r}", flush=True)
    finally:
        shutil.rmtree(wd, ignore_errors=True)
    os.environ.pop("MASA_TPU_STAGE4_TRACE", None)
    os.environ.pop("MASA_TPU_STAGE2_TRACE", None)
    bmm._TRACE = False

    # ---- 3: the sharded path on silicon, traced -----------------------------
    env = dict(os.environ)
    env["MASA_SHARDED_TRACE"] = "1"
    env["MASA_SPLIT1_RUNS"] = "1"
    print("--- split1_record.py (traced, 1 run/path) ---", flush=True)
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(here, "split1_record.py")],
            capture_output=True, text=True, timeout=2700, env=env)
        print(r.stdout.strip(), flush=True)
        if r.returncode:
            print(r.stderr[-3000:], flush=True)
    except subprocess.TimeoutExpired as e:
        print("split1_record.py TIMED OUT after 2700s", flush=True)
        if e.stdout:
            print(str(e.stdout)[-4000:], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
