#!/usr/bin/env python
"""On-chip record for SPECULATIVE traceback beyond unit scale (BASELINE
config 4's stage-2 strategy, TPDS2016; executeTracebackPredicted,
libmasa.cpp:698-757): the 1M frozen pair through the weighted column
split (4 slabs, pallas backend), stage 2 via BOTH strategies.

Asserts: both produce the frozen score 796634 AND byte-identical final
alignments; prints the speculation reuse count and stage timings.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/spec_record.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

    params = ScoreParams()
    pcfg_probe = WavefrontConfig(alpha=32, rs=32, chunk=8192,
                                 track_best=True, store_lastcol=False)
    R = pcfg_probe.rows
    m = int(os.environ.get("MASA_SPEC_M", 1 << 20))
    backend = os.environ.get("MASA_SPEC_BACKEND", "pallas")
    nparts = int(os.environ.get("MASA_SPEC_PARTS", 4))
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    s0 = rng.choice(bases, size=m).astype(np.uint8)
    s1 = homolog(np.random.default_rng(1), s0)

    def probe():
        sub = s0[:2 * R]
        t0 = time.time()
        strips.run_partition(pcfg_probe, sub, s1, params,
                             InitType.WITH_ZEROES, InitType.WITH_ZEROES,
                             backend="pallas", want_last_row=False)
        return 2 * R * len(s1) / (time.time() - t0) / 1e9

    if not os.environ.get("MASA_SPEC_NOPROBE"):
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

    from masa_tpu.core.job import Job, JobConfig
    from masa_tpu.parallel.split import (
        auto_urls, pipelined_traceback, run_part_stage1, split_points,
        speculative_traceback,
    )
    from masa_tpu.stages import pipeline as pl
    from masa_tpu.stages import stage6
    from masa_tpu.stages.core import stage1_config

    wd = tempfile.mkdtemp(prefix="masa_spec_")
    job = Job(JobConfig(work_dir=wd))
    points = split_points(len(s1), [1.0] * nparts)
    urls = auto_urls(wd, nparts)
    kcfg = stage1_config(len(s0), len(s1), job.sra_limit())
    iv = job.calculate_flush_intervals(len(s0), len(s1),
                                       align_to=kcfg.rows)[0]
    t0 = time.time()
    parts = []
    for k in range(nparts):
        parts.append(run_part_stage1(
            s0, s1, k, points, params, cfg=kcfg,
            load_url=urls[k - 1] if k > 0 else None,
            flush_url=urls[k] if k < nparts - 1 else None,
            backend=backend, buffered=False, special_every=iv))
    t1 = time.time()
    best = max(p.best for p in parts)
    print(f"stage1 (weighted split x{nparts}): best={best} "
          f"in {t1 - t0:.2f}s", flush=True)

    import copy

    def finish(cps):
        pc = pl.PipelineConfig(params=params)
        cps = pl.stage3_densify(s0, s1, pc, cps)
        aln = pl.stage5_emit(s0, s1, pc, cps)
        stage6.recheck(aln, s0, s1, params)
        return aln

    # pipelined first (it consumes/truncates the stores -> deep-copy)
    parts_p = copy.deepcopy(parts)
    t2 = time.time()
    cps_p = pipelined_traceback(s0, s1, parts_p, params, backend=backend)
    t3 = time.time()
    aln_p = finish(cps_p)
    print(f"pipelined: {len(cps_p)} cps in {t3 - t2:.2f}s "
          f"score={aln_p.raw_score}", flush=True)

    t4 = time.time()
    cps_s, reused = speculative_traceback(s0, s1, parts, params,
                                          backend=backend)
    t5 = time.time()
    aln_s = finish(cps_s)
    print(f"speculative: {len(cps_s)} cps ({reused} reused) in "
          f"{t5 - t4:.2f}s score={aln_s.raw_score}", flush=True)

    assert aln_s.raw_score == aln_p.raw_score, (aln_s.raw_score,
                                                aln_p.raw_score)
    assert (aln_s.start, aln_s.end, aln_s.gaps) == \
        (aln_p.start, aln_p.end, aln_p.gaps), "alignments differ"
    if m == 1 << 20:
        assert aln_s.raw_score == 796634, aln_s.raw_score
    import shutil

    shutil.rmtree(wd, ignore_errors=True)
    print(json.dumps({
        "metric": "speculative_traceback_1M",
        "m": m, "nparts": nparts, "backend": backend,
        "stage1_s": round(t1 - t0, 2),
        "stage2_pipelined_s": round(t3 - t2, 2),
        "stage2_speculative_s": round(t5 - t4, 2),
        "reused_crosspoints": int(reused),
        "score": int(aln_s.raw_score),
        "alignment_equal": True,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
