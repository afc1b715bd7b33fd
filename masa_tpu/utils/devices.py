"""Device enumeration/selection — the cuda_util analogue
(src/cuda_util.cpp:191-305): list accelerators, derive fork weights, pick
a device per process id."""

from __future__ import annotations


def list_devices() -> list[dict]:
    import jax

    out = []
    for d in jax.devices():
        out.append({
            "id": d.id,
            "platform": d.platform,
            "kind": getattr(d, "device_kind", "unknown"),
            "process": d.process_index,
        })
    return out


_BURST = None


def _probe_burst():
    """Module-level jitted probe (a fresh jit per call would retrace and
    recompile on every invocation — a remote compile costs 10-90 s)."""
    global _BURST
    if _BURST is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def burst(x):
            # int32 VPU burst matching the DP op mix (the wavefront cell
            # update is max/add/select chains on int32 vectors, not f32
            # matmul — weighting an int32-bound workload by MXU f32
            # throughput mis-ranks heterogeneous devices)
            y = x
            for _ in range(48):
                y = jnp.maximum(y + 3, x - y)
                y = jnp.where(y > 0, y - 2, y + 1)
            return y

        _BURST = burst
    return _BURST


def device_weights(probe: bool = False, reps: int = 3) -> list[float]:
    """Relative throughput weights for column splitting (getGPUWeights
    feeding --fork, src/cuda_util.cpp:191).  Uniform by default (a
    homogeneous slice); ``probe=True`` times a small matmul burst on
    every device and weights by measured min-of-N throughput — the
    TPU-native analogue of the reference's per-GPU bandwidth probe.
    Caveat: over a tunneled backend the measurement includes dispatch
    round-trip jitter; use explicit weights when exactness matters."""
    import jax

    devs = jax.devices()
    if not probe or len(devs) < 2:
        return [1.0] * len(devs)

    import time

    import jax.numpy as jnp

    burst = _probe_burst()
    weights = []
    for d in devs:
        x = jax.device_put(jnp.ones((256, 512), jnp.int32), d)
        float(burst(x)[0, 0])                 # compile/warm (the scalar
        best = None                           # pull forces completion)
        for _ in range(reps):
            t0 = time.time()
            float(burst(x)[0, 0])
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        weights.append(1.0 / max(best, 1e-9))
    lo = min(weights)
    return [w / lo for w in weights]


def select_device(fork_id: int):
    """Device for process `fork_id` (selectGPU, cuda_util.cpp:287)."""
    import jax

    devs = jax.devices()
    return devs[fork_id % len(devs)]


def format_device_list() -> str:
    lines = ["available devices:"]
    for d in list_devices():
        lines.append(
            f"  [{d['id']}] {d['platform']} {d['kind']} "
            f"(process {d['process']})"
        )
    return "\n".join(lines)


def enable_persistent_compile_cache() -> str | None:
    """Point JAX's persistent compilation cache at a local directory
    (MASA_TPU_JAX_CACHE overrides).  Kernel compiles on a remote-compile
    TPU service cost 10-90 s each; the cache makes every repeat process
    hit disk instead.  Returns the cache dir (None if unavailable)."""
    import os

    import jax

    path = os.environ.get(
        "MASA_TPU_JAX_CACHE",
        os.path.expanduser("~/.cache/masa_tpu_jax"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
        return path
    except Exception:
        return None


def compile_time_tracker():
    """Accumulate the seconds JAX spends in its compile pipeline (jaxpr
    trace + MLIR lowering + backend compile, which is also where
    persistent-cache LOADS are charged) via the jax monitoring events.
    Returns a zero-arg callable yielding the running total, so callers
    can split kernel cold-start out of steady-state wall time
    (big_run's cold_load_s)."""
    from jax._src import monitoring

    tot = [0.0]

    def _dur(event, secs, **_kw):
        # /jax/core/compile/ phases are disjoint (trace, lower, backend
        # compile — the last is also where persistent-cache loads are
        # charged); cache-specific events overlap them, so counting
        # both would double-book a cache load
        if event.startswith("/jax/core/compile/"):
            tot[0] += secs

    monitoring.register_event_duration_secs_listener(_dur)
    return lambda: tot[0]
