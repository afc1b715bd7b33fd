"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU (the driver separately dry-runs the
multi-chip path); the real-TPU kernel benchmarks live in bench.py.
"""

import os

# Force CPU: the ambient environment may preset JAX_PLATFORMS (e.g. the
# "axon" TPU tunnel, which ignores the env var); tests must never claim
# the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_dna(rng, n, alphabet=b"ACGT"):
    return np.frombuffer(
        bytes(rng.choice(list(alphabet), size=n).astype(np.uint8)),
        dtype=np.uint8,
    ).copy()


@pytest.fixture
def dna():
    def make(n, seed=0, alphabet=b"ACGT"):
        r = np.random.default_rng(seed)
        return r.choice(np.frombuffer(alphabet, np.uint8), size=n).astype(
            np.uint8
        )

    return make


def mutate(rng, seq, sub_rate=0.1, indel_rate=0.05):
    """Derive a homologous sequence: substitutions + short indels."""
    out = []
    bases = np.frombuffer(b"ACGT", np.uint8)
    i = 0
    n = len(seq)
    while i < n:
        r = rng.random()
        if r < indel_rate / 2:
            out.extend(rng.choice(bases, size=rng.integers(1, 5)))
        elif r < indel_rate:
            i += int(rng.integers(1, 5))
        elif r < indel_rate + sub_rate:
            out.append(rng.choice(bases))
            i += 1
        else:
            out.append(seq[i])
            i += 1
    return np.array(out, dtype=np.uint8)


@pytest.fixture
def homolog():
    def make(seq, seed=1, sub_rate=0.1, indel_rate=0.05):
        r = np.random.default_rng(seed)
        return mutate(r, seq, sub_rate, indel_rate)

    return make
