#!/usr/bin/env python
"""Fresh-seed fuzz soak: run every randomized differential lane from
tests/test_fuzz_modes.py with seeds OUTSIDE the committed pytest ranges.

The committed suite pins seeds for reproducibility; this tool is the
exploration arm — run it between rounds with a new --offset and widen
the committed ranges when a seed finds something.

Usage:
    python tools/fuzz_soak.py [--offset N] [--per-lane K]

CPU-only (forces the cpu backend + 8 virtual devices in-process), safe
to run nice'd alongside chip work.
"""

import argparse
import os
import sys
import tempfile
import time
import traceback

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--offset", type=int, default=100,
                    help="first seed (committed ranges end well below 100)")
    ap.add_argument("--per-lane", type=int, default=20)
    args = ap.parse_args()

    import test_fuzz_modes as f

    class _TmpPath:
        """Minimal stand-in for pytest's tmp_path fixture."""

        def __init__(self, base):
            self._base = base

        def __truediv__(self, name):
            return os.path.join(self._base, name)

    lanes = [
        ("pipeline_vs_oracle", lambda s: f.test_fuzz_pipeline_vs_oracle(s)),
        ("sharded_vs_oracle", lambda s: f.test_fuzz_sharded_vs_oracle(s)),
        ("stage4_differential",
         lambda s: f.test_fuzz_stage4_strategies_differential(s)),
        ("oversize_weighted",
         lambda s: f.test_fuzz_oversize_and_weighted_split(s)),
    ]

    def crash_lane(s):
        with tempfile.TemporaryDirectory() as td:
            f.test_fuzz_crash_resume_anywhere(s, _TmpPath(td))

    lanes.append(("crash_resume", crash_lane))

    failures = []
    t0 = time.time()
    for name, fn in lanes:
        for s in range(args.offset, args.offset + args.per_lane):
            try:
                fn(s)
                status = "ok"
            except Exception:  # noqa: BLE001 — soak records, never stops
                status = "FAIL"
                failures.append((name, s, traceback.format_exc()))
            print(f"[{time.time()-t0:7.1f}s] {name} seed={s} {status}",
                  flush=True)

    print(f"\n=== soak done: {len(failures)} failures ===", flush=True)
    for name, s, tb in failures:
        print(f"\n--- {name} seed={s} ---\n{tb}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
