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


def device_weights() -> list[float]:
    """Relative throughput weights for column splitting (getGPUWeights
    feeding --fork; uniform on a homogeneous slice)."""
    devs = list_devices()
    return [1.0] * len(devs)


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
