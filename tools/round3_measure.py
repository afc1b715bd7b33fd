#!/usr/bin/env python
"""Round-3 on-chip breakdown: WHERE does the full-run time go.

Waits for a healthy window (2-strip probe > 100 GCUPS), then runs the
full 1M six-stage pipeline twice (cold-cache process effects stay in run
1; run 2 is steady state) with fine-grained instrumentation:

  * per-stage wall clock (stage1..6)
  * stage 1: kernel-only vs with-specials delta
  * stage 2: per-hop breakdown (align dispatch, last-row pull, match)
  * stage 4: per-level wall clock + engine/compile-key trace

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/round3_measure.py
"""

import os
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

    # ---- stage-1 variants ----------------------------------------------
    for label, kw in (
        ("kernel-only            ", dict(want_last_row=False)),
        ("prune                  ", dict(want_last_row=False, prune=True)),
        ("prune+specials         ", dict(want_last_row=False, prune=True,
                                         special_every=R)),
        ("prune+specials+lastrow ", dict(prune=True, special_every=R)),
    ):
        best = None
        for _ in range(2):
            t0 = time.time()
            r = strips.run_partition(
                cfg, s0, h1, params, InitType.WITH_ZEROES,
                InitType.WITH_ZEROES, backend="pallas", **kw)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"stage1 {label}: {best:6.2f}s best={r.best} "
              f"pruned={r.pruned_cells/1e9:.1f}G", flush=True)

    # ---- instrumented full pipeline ------------------------------------
    from masa_tpu.core.job import Job, JobConfig
    from masa_tpu.stages import core as score, runner
    import masa_tpu.ops.batched_mm as bmm

    hop_times = []
    orig_rpm = score.reverse_pass_and_match

    def timed_rpm(*a, **k):
        t0 = time.time()
        out = orig_rpm(*a, **k)
        hop_times.append((time.time() - t0, a[3].i - a[4],
                          a[3].j - a[6] if isinstance(a[6], int) else -1))
        return out

    score.reverse_pass_and_match = timed_rpm

    lvl_times = []
    orig_rl = bmm._run_level

    def timed_rl(dev, halves, rev, p, njq):
        t0 = time.time()
        out = orig_rl(dev, halves, rev, p, njq)
        import jax
        jax.block_until_ready(out)
        np.asarray(out[0][0][:1])     # force over the tunnel
        lvl_times.append((time.time() - t0, len(halves),
                          max(x.h for x in halves), njq, rev))
        return out

    bmm._run_level = timed_rl

    for run in (1, 2):
        hop_times.clear()
        lvl_times.clear()
        wd = tempfile.mkdtemp(prefix="masa_r3m_")
        stage_t = {}
        try:
            job = Job(JobConfig(work_dir=wd))
            t0 = time.time()
            marks = [("start", t0)]

            def log(*a, **k):
                msg = " ".join(str(x) for x in a)
                if "flushed row" in msg:
                    return
                if msg.startswith("stage") and (" in " in msg
                                                or "wrote" in msg
                                                or "best=" in msg):
                    marks.append((msg.split(":")[0], time.time()))
                print(f"[{time.time()-t0:8.2f}s]", msg, flush=True)

            aln = runner.align_job(job, s0, h1, log=log)
            total = time.time() - t0
            for (p, tp), (q, tq) in zip(marks, marks[1:]):
                stage_t[q] = tq - tp
            print(f"RUN{run} TOTAL {total:.2f}s score={aln.raw_score} "
                  f"stages={ {k: round(v, 2) for k, v in stage_t.items()} }",
                  flush=True)
            print("  stage2 hops:", [(round(t, 2), hb) for t, hb, _ in
                                     hop_times], flush=True)
            print("  stage4 levels:",
                  [(round(t, 2), B, h, njq, "R" if rev else "F")
                   for t, B, h, njq, rev in lvl_times], flush=True)
        finally:
            shutil.rmtree(wd, ignore_errors=True)

    score.reverse_pass_and_match = orig_rpm
    bmm._run_level = orig_rl
    return 0


if __name__ == "__main__":
    sys.exit(main())
