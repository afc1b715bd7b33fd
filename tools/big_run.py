#!/usr/bin/env python
"""Large-scale on-chip full-alignment run with a persistent work dir
(crash-resumable: rerun the same command to continue).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/big_run.py 5M
    PYTHONPATH=/root/repo:/root/.axon_site python tools/big_run.py 23M

Targets (reference GTX 560 Ti, TPDS2013 / BASELINE.md):
    5M  (AE016879.1 x AE017225.1 class)  : 558 s score-only, 48.98 GCUPS
    23M (NT_033779.4 x NT_037436.3 class): 5h29m full, 28.59 GCUPS

Probe-gated; prints one JSON line at the end.

Honest-timing contract: a `big_run_meta.json` in the work dir records
the wall time of every attempt, so a crash-resumed run reports the SUM
over attempts as full_alignment_s — and a work dir NOT created by this
script (or one whose run already finished) is cleared instead of
silently replayed (a stage-5/6-only replay of a stale dir once
masqueraded as a 15 s "5M record").  `--fresh` forces a clean start.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SIZES = {"1M": 1 << 20, "3M": 3 << 20, "5M": 5 << 20, "8M": 1 << 23,
         "23M": 23 << 20}


def main():
    import os as _os

    if _os.path.exists("/tmp/masa_stop_chains"):
        # kill switch: the driver's round-end bench must own the chip;
        # exiting 0 ends the retry wrapper cleanly
        print("stop sentinel present; exiting", flush=True)
        return 0
    argv = [a for a in sys.argv[1:] if not a.startswith("-")]
    fresh = "--fresh" in sys.argv
    no_prune = "--no-prune" in sys.argv
    size = argv[0] if argv else "5M"
    m = SIZES[size]
    n_target = (25 << 20) if size == "23M" else m  # 23M pairs with 25M

    wd = os.path.expanduser(
        f"~/masa_big_{size}{'_noprune' if no_prune else ''}.work")
    meta_path = os.path.join(wd, "big_run_meta.json")
    meta = None
    if os.path.isdir(wd):
        if os.path.exists(meta_path):
            try:
                with open(meta_path) as f:
                    meta = json.load(f)
            except Exception:
                meta = None
        if fresh or meta is None or meta.get("done"):
            why = ("--fresh" if fresh
                   else "no meta (stale dir from an older run)"
                   if meta is None else "previous run already finished")
            print(f"[clear] removing work dir {wd} ({why})", flush=True)
            shutil.rmtree(wd)
            meta = None
    prev_elapsed = float(meta["elapsed_s"]) if meta else 0.0
    attempts = int(meta["attempts"]) if meta else 0
    resumed = meta is not None
    if resumed:
        print(f"[resume] attempt {attempts + 1}, "
              f"{prev_elapsed:.1f}s accumulated", flush=True)

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

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    print(f"[gen] {size}: m={m} n~{n_target}", flush=True)
    s0 = rng.choice(bases, size=m).astype(np.uint8)
    h1 = homolog(np.random.default_rng(1), s0, indel_every=1 << 16)
    if n_target > m:  # asymmetric pair: extend with unrelated sequence
        extra = np.random.default_rng(2).choice(
            bases, size=n_target - len(h1)).astype(np.uint8)
        h1 = np.concatenate([h1, extra])

    def probe():
        sub = s0[:2 * R]
        t0 = time.time()
        strips.run_partition(cfg, sub, h1[:1 << 20], params,
                             InitType.WITH_ZEROES, InitType.WITH_ZEROES,
                             backend="pallas", want_last_row=False)
        return 2 * R * (1 << 20) / (time.time() - t0) / 1e9

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

    from masa_tpu.core.job import Job, JobConfig
    from masa_tpu.stages import runner

    # this host has 125 GB RAM / ~118 GB free disk: the library defaults
    # (1+16 GB, sized for the reference's 2011 hardware) would force
    # 262144-row spacing at 23M and sit exactly at the drop margin
    # (87 rows x 200 MB); a real budget lands the spacing on a ladder
    # rung (131072 -> the stage-2 hop chain engages) with headroom
    # RAM stays at the 1 GB default on purpose: lazy RAM rows pin their
    # device snapshots for the whole run, and proportional placement
    # bounds those pins by the RAM budget — 1 GB of pins keeps the run
    # inside HBM while nearly every row streams device-packed to disk
    # (no host decode/encode).  The disk budget is what buys the denser
    # 131072 spacing (the hop-chain rung).
    jcfg = (JobConfig(work_dir=wd, disk_limit=64 << 30)
            if size == "23M" else JobConfig(work_dir=wd))
    jcfg.block_pruning = not no_prune
    job = Job(jcfg)
    # split kernel cold-start (compiles + persistent-cache loads, ~15 s
    # per distinct Mosaic shape on first touch) out of the record so
    # steady-state numbers are comparable run-to-run
    from masa_tpu.utils.devices import compile_time_tracker

    cold = compile_time_tracker()
    cold0 = cold()
    t0 = time.time()
    marks = {}
    cold_marks = {}

    def save_meta(done=False):
        with open(meta_path + ".tmp", "w") as f:
            json.dump({"size": size,
                       "elapsed_s": prev_elapsed + time.time() - t0,
                       "attempts": attempts + 1, "done": done,
                       "marks": marks}, f)
        os.replace(meta_path + ".tmp", meta_path)

    save_meta()
    last_meta = [time.time()]

    pruned = [0.0]

    def log(*a, **k):
        msg = " ".join(str(x) for x in a)
        if "pruned=" in msg:
            try:
                pruned[0] = float(
                    msg.split("pruned=")[1].split(" ")[0]) * 1e6
            except (IndexError, ValueError):
                pass
        if time.time() - last_meta[0] > 60:
            save_meta()
            last_meta[0] = time.time()
        if "flushed row" in msg:
            if int(time.time()) % 60 < 2:
                print(f"[{time.time()-t0:9.2f}s]", msg, flush=True)
            return
        if msg.startswith("stage"):
            marks[msg.split(":")[0]] = round(time.time() - t0, 2)
            cold_marks[msg.split(":")[0]] = round(cold() - cold0, 2)
        print(f"[{time.time()-t0:9.2f}s]", msg, flush=True)

    aln = runner.align_job(job, s0, h1, log=log)
    dt = time.time() - t0
    total = prev_elapsed + dt
    save_meta(done=True)
    cells = m * len(h1)
    cold_s = round(cold() - cold0, 2)
    warm = max(total - cold_s, 1e-9)
    print(json.dumps({
        "size": size, "m": m, "n": len(h1),
        "full_alignment_s": round(total, 2),
        "full_gcups": round(cells / total / 1e9, 2),
        "cold_load_s": cold_s,
        "steady_s": round(warm, 2),
        "steady_gcups": round(cells / warm / 1e9, 2),
        "cold_by_stage_s": cold_marks,
        "pruning": not no_prune,
        "pruned_cells": int(pruned[0]),
        "score": int(aln.raw_score),
        "attempts": attempts + 1,
        "resumed": resumed,
        "this_attempt_s": round(dt, 2),
        "stage_end_marks_s": marks,
        "work_dir": wd,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
