#!/usr/bin/env python
"""Measure the chip's VPU characteristics relevant to the wavefront
kernel and print a roofline for the DP step.

Three Pallas microbenchmarks, all on (RS, 128) int32 vectors in VMEM:

  par   : W independent max-chains interleaved -> peak sustained ISSUE
          rate (vector ops/s) when dependencies never stall.
  ser   : one fully serial max-chain -> dependent-op LATENCY.
  mix   : the wavefront step's exact op mix (e/f/sub/h/best chains with
          the strip's real k-loop dependencies, shifts omitted) ->
          an upper bound for the DP kernel's steady-state cells/s.

The DP step computes alpha*RS*128 cells with ~13 vector ops per
(RS,128) sub-row and a serial sub-row chain (f_k and h_k depend on
k-1): its throughput cannot exceed
    cells/s = alpha*RS*128 / (step critical path in seconds)
whatever the dispatch/fusion layer does.  Comparing bench.py's GCUPS
against `mix` says how close the real kernel is to what the VPU allows.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/roofline.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, reps=3):
    """block_until_ready is NOT reliable over the tunneled backend (it
    can return before the work runs); a scalar pull forces completion."""

    def force(out):
        return int(np.asarray(out[0][0:1, 0:1])[0, 0])

    force(fn(*args))
    best = None
    for _ in range(reps):
        t0 = time.time()
        force(fn(*args))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from masa_tpu.utils.devices import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    RS = 32
    T = 1 << 18       # base loop length; timing uses the T->2T SLOPE so
    W = 8             # the ~33 ms dispatch floor cancels out

    def bench_kernel(body, n_in, label, ops_per_iter, dtype=None,
                     lanes=128):
        """body(vals, it) -> vals; vals = list of (RS,lanes) arrays.
        Returns (seconds for T net iterations, native ops/s)."""
        dtype = dtype or jnp.int32

        def make_call(iters):
            def kernel(*refs):
                in_refs, out_ref = refs[:-1], refs[-1]
                vals = [r[...] for r in in_refs]

                def loop(it, vals):
                    return body(vals, it)

                vals = jax.lax.fori_loop(0, iters, loop, vals)
                acc = vals[0]
                for v in vals[1:]:
                    acc = jnp.maximum(acc, v)
                out_ref[...] = acc.astype(jnp.int32)

            call = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((RS, lanes), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            return jax.jit(lambda *a: (call(*a),))

        xs = [jnp.asarray(np.random.default_rng(i).integers(
            -1000, 1000, (RS, lanes), dtype=np.int32).astype(dtype))
            for i in range(n_in)]
        d1 = timed(make_call(T), *xs)
        d2 = timed(make_call(2 * T), *xs)
        dt = max(d2 - d1, 1e-9)
        native_ops = T * ops_per_iter * (RS // 8)  # (8,128) issues
        rate = native_ops / dt
        print(f"{label:4s}: {dt*1e3:8.3f} ms/T-net (T={d1*1e3:.1f} "
              f"2T={d2*1e3:.1f})  {rate/1e9:7.2f} G native-vector-ops/s  "
              f"({T} iters x {ops_per_iter} (RS,128)-ops)")
        return dt, rate

    # Every body consumes the loop index (XOR) so XLA cannot fold or
    # strength-reduce the loop away (it did, before: "0.64 ns latency").

    # --- par: W independent chains, 2 dependent ops each per iteration --
    def par_body(vals, it):
        return [jnp.maximum(v ^ it, v - 1) for v in vals]

    _, par_rate = bench_kernel(par_body, W, "par", 2 * W)

    # --- ser: one serial chain ------------------------------------------
    def ser_body(vals, it):
        (v,) = vals
        for _ in range(8):          # 8 x 2 dependent ops per iteration
            v = jnp.maximum(v ^ it, v - 1)
        return [v]

    ser_dt, _ = bench_kernel(ser_body, 1, "ser", 16)
    # latency per dependent (RS,128) op
    lat_s = ser_dt / (T * 16)

    # --- mix: the DP step's dependency structure ------------------------
    # state per k: h, e, f; serial over ALPHA sub-rows exactly like
    # _make_step's k-loop (f_k <- f_{k-1}, h_k <- h_{k-1}).
    ALPHA = 8          # sub-chain only; one step = ALPHA sub-rows
    GO, GE = 3, 2

    def mix_body(vals, it):
        hh = list(vals[:ALPHA])
        ee = list(vals[ALPHA:2 * ALPHA])
        up_h = vals[2 * ALPHA]
        up_f = vals[2 * ALPHA + 1]
        dg0 = vals[2 * ALPHA + 2]
        rb = vals[2 * ALPHA + 3] ^ it       # fold-breaker (the real step
        hs, fs = [], []                     # reads a fresh b char too)
        for k in range(ALPHA):
            e_k = jnp.maximum(hh[k] - GO, ee[k]) - GE
            uh = up_h if k == 0 else hs[k - 1]
            uf = up_f if k == 0 else fs[k - 1]
            f_k = jnp.maximum(uh - GO, uf) - GE
            dg = dg0 if k == 0 else hh[k - 1]
            sub = jnp.where(rb == k, 1, -3)
            h_k = jnp.maximum(jnp.maximum(dg + sub, e_k), f_k)
            h_k = jnp.maximum(h_k, 0)
            hs.append(h_k)
            fs.append(f_k)
            ee[k] = e_k
        return hs + ee + [up_h, up_f, dg0, vals[2 * ALPHA + 3]]

    OPS_PER_K = 12     # e:3 f:3 sub:2 h:3 sw:1 (best omitted)
    mix_dt, _ = bench_kernel(mix_body, 2 * ALPHA + 4, "mix",
                             ALPHA * OPS_PER_K)
    # cells per mix iteration = ALPHA * RS * 128
    cells_s = T * ALPHA * RS * 128 / mix_dt

    # --- m16: the same DP mix on int16 (RS, 256) vectors ----------------
    # The one untested 2x lever from the round-2 roofline: IF the VPU
    # issues (8,256) int16 ops at the (8,128) int32 rate, a 16-bit
    # delta-packed kernel doubles GCUPS.  If the measured rate is ~the
    # int32 rate per ELEMENT (i.e., int16 is emulated in 32-bit regs),
    # the packing cannot win and this records the negative.
    def mix16_body(vals, it):
        it16 = it.astype(jnp.int16) if hasattr(it, "astype") else it
        hh = list(vals[:ALPHA])
        ee = list(vals[ALPHA:2 * ALPHA])
        up_h = vals[2 * ALPHA]
        up_f = vals[2 * ALPHA + 1]
        dg0 = vals[2 * ALPHA + 2]
        rb = vals[2 * ALPHA + 3] ^ it16
        hs, fs = [], []
        for k in range(ALPHA):
            e_k = jnp.maximum(hh[k] - jnp.int16(GO), ee[k]) - jnp.int16(GE)
            uh = up_h if k == 0 else hs[k - 1]
            uf = up_f if k == 0 else fs[k - 1]
            f_k = jnp.maximum(uh - jnp.int16(GO), uf) - jnp.int16(GE)
            dg = dg0 if k == 0 else hh[k - 1]
            sub = jnp.where(rb == jnp.int16(k), jnp.int16(1),
                            jnp.int16(-3))
            h_k = jnp.maximum(jnp.maximum(dg + sub, e_k), f_k)
            h_k = jnp.maximum(h_k, jnp.int16(0))
            hs.append(h_k)
            fs.append(f_k)
            ee[k] = e_k
        return hs + ee + [up_h, up_f, dg0, vals[2 * ALPHA + 3]]

    try:
        mix16_dt, _ = bench_kernel(mix16_body, 2 * ALPHA + 4, "m16",
                                   ALPHA * OPS_PER_K, dtype=jnp.int16,
                                   lanes=256)
        cells16_s = T * ALPHA * RS * 256 / mix16_dt
    except Exception as e:  # Mosaic may reject int16 shapes outright
        print(f"m16 : REJECTED ({type(e).__name__}: {str(e)[:120]})")
        cells16_s = None

    print(json.dumps({
        "par_native_ops_per_s": round(par_rate / 1e9, 2),
        "ser_latency_ns": round(lat_s * 1e9, 2),
        "mix_alpha": ALPHA,
        "mix_rs": RS,
        "mix_bound_gcups": round(cells_s / 1e9, 1),
        "mix16_bound_gcups": (round(cells16_s / 1e9, 1)
                              if cells16_s else None),
        "note": "mix omits shifts/flush/rolls/bus stores: it is an "
                "UPPER bound on the full kernel at this (alpha, rs); "
                "mix16 is the same mix on int16 (RS,256) — the 2x "
                "packing lever is real only if mix16 ~= 2x mix",
    }))


if __name__ == "__main__":
    main()
