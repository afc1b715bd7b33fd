#!/usr/bin/env python
"""Re-measure the planner cost-model constants on the CURRENT chip and
print them next to the hardwired values (stages/core.py, ops/strips.py),
plus a ready-to-paste env override block.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/calibrate.py

How each constant is measured:
  - rung GCUPS + dispatch_s: two warm fused runs of g1 and g2 full
    strips per ladder rung over a 1M-wide matrix; the SLOPE between
    them is the sustained rate (cold compiles excluded), the residual
    intercept per strip is the dispatch cost.
  - scan GCUPS: t(m=R+tail) - t(m=R) prices the tail rows that fall to
    the scan twin.
  - hop_sync_s: average of N scalar device->host pulls after a trivial
    device op (the per-hop verdict pull round trip).
  - mm GCUPS: the batched dyn Mosaic engine on the mid stage-4 level
    shape (B=64, h=4096, w=8192), warm, timed.
  - windowed_overhead_s: per-strip cost of the unfused windowed path
    (strips._WINDOWED_OVERHEAD_S forced to -1 so every prunable strip
    goes windowed) minus its cells at the measured rung rate.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from masa_tpu.utils.devices import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    import jax
    import jax.numpy as jnp

    from bench import homolog
    from masa_tpu.ops import batched_mm as bmm
    from masa_tpu.ops import strips, wavefront as wf
    from masa_tpu.stages import core
    from masa_tpu.types import InitType, Recurrence, ScoreParams

    params = ScoreParams()
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    n = 1 << 20
    s0 = rng.choice(bases, n).astype(np.uint8)
    s1 = rng.choice(bases, n).astype(np.uint8)
    measured = {}

    def run(cfg, m, prune=False, seq1=None):
        t0 = time.time()
        r = strips.run_partition(
            cfg, s0[:m], seq1 if seq1 is not None else s1, params,
            InitType.WITH_ZEROES, InitType.WITH_ZEROES,
            backend="pallas", want_last_row=False, prune=prune)
        # the result's best fields come from jax.device_get (a sync)
        _ = r.best
        return time.time() - t0, r

    # ---- rung rates + dispatch (slope between g1 and g2 strips) -------
    rung_pairs = {4096: (8, 15), 32768: (3, 10), 131072: (2, 8)}
    rung_gcups = {}
    for cfg in core._TPU_LADDER:
        R = cfg.rows
        g1, g2 = rung_pairs[R]
        try:
            run(cfg, g1 * R)                      # warm/compile
            t1 = min(run(cfg, g1 * R)[0] for _ in range(2))
            t2 = min(run(cfg, g2 * R)[0] for _ in range(2))
            rate = (g2 - g1) * R * n / max(t2 - t1, 1e-9)
            disp = max((t1 - g1 * R * n / rate) / g1, 0.0)
            rung_gcups[R] = rate
            measured[f"rung_{R}_gcups"] = rate / 1e9
            measured[f"rung_{R}_dispatch_s"] = disp
            print(f"[rung R={R}] {rate/1e9:.1f} GCUPS, "
                  f"dispatch {disp*1e3:.1f} ms/strip "
                  f"(t{g1}={t1:.2f}s t{g2}={t2:.2f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[rung R={R}] FAILED {e!r}"[:300], flush=True)

    # ---- scan twin rate (partial-strip tail) ---------------------------
    try:
        cfg0 = core._TPU_LADDER[0]
        R = cfg0.rows
        tail = 2048
        run(cfg0, R + tail)                      # warm
        tR = min(run(cfg0, R)[0] for _ in range(2))
        tRt = min(run(cfg0, R + tail)[0] for _ in range(2))
        scan = tail * n / max(tRt - tR, 1e-9)
        measured["scan_gcups"] = scan / 1e9
        print(f"[scan] {scan/1e9:.2f} GCUPS "
              f"(tail {tail} rows: {tRt - tR:.2f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[scan] FAILED {e!r}"[:300], flush=True)

    # ---- per-hop sync (scalar verdict pull round trip) -----------------
    try:
        x = jnp.int32(3)
        np.asarray(x + 1)                        # warm
        N = 20
        t0 = time.time()
        for _ in range(N):
            np.asarray(x + 1)
        hop = (time.time() - t0) / N
        measured["hop_sync_s"] = hop
        print(f"[hop_sync] {hop*1e3:.1f} ms/pull", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[hop_sync] FAILED {e!r}"[:300], flush=True)

    # ---- batched stage-4 engine rate ------------------------------------
    try:
        B, h, w, njq = 64, 4096, 8192, 8192
        halves = [bmm._Half(k * ((n - h) // B), h, k * ((n - w) // B),
                            w, 0, 0) for k in range(B)]
        dev = bmm._DevSeqs(s0, s1, pad0=131072 + 8, pad1=njq + 65536)
        out = bmm._halves_mosaic(dev, halves, False, params, njq)
        np.asarray(out[0]).ravel()[:1]
        t0 = time.time()
        out = bmm._halves_mosaic(dev, halves, False, params, njq)
        np.asarray(out[0]).ravel()[:1]
        mm = B * h * w / (time.time() - t0)
        measured["mm_gcups"] = mm / 1e9
        print(f"[mm] {mm/1e9:.1f} GCUPS (B={B} h={h} w={w})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[mm] FAILED {e!r}"[:300], flush=True)

    # ---- windowed-path per-strip overhead --------------------------------
    try:
        cfg = core._TPU_LADDER[-1]
        R = cfg.rows
        h1 = homolog(np.random.default_rng(1), s0)  # similar: SW prunes
        g = 4
        run(cfg, g * R, prune=True, seq1=h1)     # warm, fused-gated
        t_f, r_f = run(cfg, g * R, prune=True, seq1=h1)
        old = strips._WINDOWED_OVERHEAD_S
        strips._WINDOWED_OVERHEAD_S = -1.0       # force windowed
        try:
            run(cfg, g * R, prune=True, seq1=h1)  # warm window buckets
            t_w, r_w = run(cfg, g * R, prune=True, seq1=h1)
        finally:
            strips._WINDOWED_OVERHEAD_S = old
        rate = rung_gcups.get(R, core._KERNEL_GCUPS)
        over = (t_w - r_w.cells / rate) / g
        measured["windowed_overhead_s"] = over
        print(f"[windowed] fused {t_f:.2f}s ({r_f.pruned_cells/1e6:.0f} "
              f"Mcells pruned) vs windowed {t_w:.2f}s "
              f"({r_w.pruned_cells/1e6:.0f} Mcells pruned) -> "
              f"overhead {over:.2f} s/strip", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[windowed] FAILED {e!r}"[:300], flush=True)

    # ---- summary ---------------------------------------------------------
    hard = {
        "rung_4096_gcups": core._RUNG_GCUPS[4096] / 1e9,
        "rung_32768_gcups": core._RUNG_GCUPS[32768] / 1e9,
        "rung_131072_gcups": core._RUNG_GCUPS[131072] / 1e9,
        "scan_gcups": core._SCAN_GCUPS / 1e9,
        "dispatch_s": core._DISPATCH_S,
        "hop_sync_s": core._HOP_SYNC_S,
        "mm_gcups": core._MM_GCUPS / 1e9,
        "windowed_overhead_s": strips._WINDOWED_OVERHEAD_S,
        "windowed_rate_gcups": strips._WINDOWED_RATE / 1e9,
    }
    print("\nconstant              hardwired   measured", flush=True)
    for k, hv in hard.items():
        mv = measured.get(k)
        if mv is None and k == "dispatch_s":
            ds = [v for kk, v in measured.items()
                  if kk.endswith("dispatch_s")]
            mv = sum(ds) / len(ds) if ds else None
        print(f"{k:22s} {hv:9.3f}   "
              f"{mv:9.3f}" if mv is not None else
              f"{k:22s} {hv:9.3f}   (not measured)", flush=True)

    env = []
    if all(f"rung_{r}_gcups" in measured for r in (4096, 32768, 131072)):
        env.append("MASA_TPU_RUNG_GCUPS=\"" + ",".join(
            f"{r}:{measured[f'rung_{r}_gcups']:.0f}"
            for r in (4096, 32768, 131072)) + "\"")
        env.append(f"MASA_TPU_KERNEL_GCUPS="
                   f"{measured['rung_131072_gcups']*1e9:.3e}")
        env.append(f"MASA_TPU_WINDOWED_RATE="
                   f"{measured['rung_131072_gcups']*1e9:.3e}")
    if "scan_gcups" in measured:
        env.append(f"MASA_TPU_SCAN_GCUPS={measured['scan_gcups']*1e9:.3e}")
    ds = [v for k, v in measured.items() if k.endswith("dispatch_s")]
    if ds:
        env.append(f"MASA_TPU_DISPATCH_S={sum(ds)/len(ds):.3f}")
    if "hop_sync_s" in measured:
        env.append(f"MASA_TPU_HOP_SYNC_S={measured['hop_sync_s']:.3f}")
    if "mm_gcups" in measured:
        env.append(f"MASA_TPU_MM_GCUPS={measured['mm_gcups']*1e9:.3e}")
    if "windowed_overhead_s" in measured:
        env.append(f"MASA_TPU_WINDOWED_OVERHEAD_S="
                   f"{max(measured['windowed_overhead_s'], 0.0):.2f}")
    print("\n# suggested overrides (export before a run):", flush=True)
    for line in env:
        print("export " + line, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
