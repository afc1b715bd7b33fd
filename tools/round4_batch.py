#!/usr/bin/env python
"""Round-4 consolidated on-chip batch: waits (hours if needed) for a
healthy window, then in ONE window runs, in order of record value:

  1. warm 1M six-stage pipeline x2 (validates the round-4 stage-2 arb
     hop + stage-4 dyn tails end-to-end on silicon; frozen score
     796634) — best-of-2, untraced
  2. traced 1M x1 (per-level stage-4 + per-hop stage-2 breakdown)
  3. tools/big_run.py 23M — THE missing record (reference: 5h29m full,
     28.59 GCUPS, README.md:91); big_run re-probes + is crash-resumable
  4. tools/engine_rates.py (healthy-window engine table)
  5. tools/split1_record.py (sharded path on real silicon)
  6. tools/roofline.py (re-validate the mix bound)

Every phase is independently guarded: a timeout or crash in one phase
does not stop the later ones.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/round4_batch.py
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
    root = os.path.join(here, "..")

    # ---- 1: warm 1M pipeline x2 (validation + timing, untraced) --------
    from masa_tpu.core.job import Job, JobConfig
    from masa_tpu.stages import runner

    ok_1m = False
    best = None
    for k in range(2):
        wd = tempfile.mkdtemp(prefix="masa_r4b_")
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

    # ---- 2: diagnostic traced 1M ----------------------------------------
    os.environ["MASA_TPU_STAGE4_TRACE"] = "1"
    os.environ["MASA_TPU_STAGE2_TRACE"] = "1"
    import masa_tpu.ops.batched_mm as bmm
    bmm._TRACE = True
    wd = tempfile.mkdtemp(prefix="masa_r4b_")
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
    except Exception as e:  # noqa: BLE001 — diagnostics must not kill 3
        print(f"traced pipeline failed: {e!r}", flush=True)
    finally:
        shutil.rmtree(wd, ignore_errors=True)
    os.environ.pop("MASA_TPU_STAGE4_TRACE", None)
    os.environ.pop("MASA_TPU_STAGE2_TRACE", None)

    # ---- 3: the 23M x 25M record (only on a validated engine) ----------
    if ok_1m:
        _sub("big_run 23M",
             [sys.executable, os.path.join(here, "big_run.py"), "23M"],
             timeout=6 * 3600)
    else:
        print("SKIPPING 23M: the 1M validation failed", flush=True)

    # ---- 4: engine rates -------------------------------------------------
    _sub("engine_rates.py",
         [sys.executable, os.path.join(here, "engine_rates.py")],
         timeout=1800)

    # ---- 5: the sharded path on real silicon -----------------------------
    _sub("split1_record.py",
         [sys.executable, os.path.join(here, "split1_record.py")],
         timeout=3600)

    # ---- 6: roofline ------------------------------------------------------
    _sub("roofline.py", [sys.executable, os.path.join(here, "roofline.py")],
         timeout=1800)
    return 0


if __name__ == "__main__":
    sys.exit(main())
