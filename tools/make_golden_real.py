#!/usr/bin/env python
"""Generate the realistic-genomic-content golden fixtures.

The environment has no network egress, so the README's NCBI accession
pairs (/root/reference/README.md:87-93) cannot be fetched; these
fixtures reproduce the *content classes* that make real genomic
sequence hard — and that purely-random fixtures never exercise:

  * assembly-gap N runs (both short scattered and a long gap)
  * tandem repeats: microsatellites (ACn, AGATn) and a minisatellite
  * dispersed SINE-like repeats (a ~300 bp element pasted with decay)
  * low-complexity poly-A/poly-AT stretches
  * GC-content islands (isochore-like composition shifts)
  * a homolog with substitutions, indels, a deleted interior segment,
    and DIFFERENT gap placement around the repeats (where aligners
    actually disagree)

Deterministic (fixed seeds); writes tests/golden/real{1,2}_{a,b}.fa and
prints the frozen oracle results to paste into tests/test_golden_real.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASES = np.frombuffer(b"ACGT", np.uint8)
A, C, G, T, N = (np.uint8(ord(x)) for x in "ACGTN")


def _markov(rng, length, gc):
    """Composition-biased random DNA (GC fraction ~= gc)."""
    p = np.array([(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2])
    return rng.choice(BASES, size=length, p=p).astype(np.uint8)


def make_backbone(rng, length):
    """Isochore-structured backbone: alternating GC-poor/GC-rich islands."""
    out = []
    done = 0
    while done < length:
        seg = int(rng.integers(1500, 4000))
        gc = float(rng.choice([0.33, 0.42, 0.58, 0.65]))
        out.append(_markov(rng, seg, gc))
        done += seg
    return np.concatenate(out)[:length]


def plant_features(rng, seq):
    seq = seq.copy()
    L = len(seq)

    # microsatellites: (AC)n and (AGAT)n expansions
    for unit in (b"AC", b"AGAT", b"AAG"):
        u = np.frombuffer(unit, np.uint8)
        for _ in range(4):
            reps = int(rng.integers(15, 60))
            pos = int(rng.integers(0, L - reps * len(u)))
            seq[pos : pos + reps * len(u)] = np.tile(u, reps)

    # one minisatellite (32 bp unit, ~20 copies with decay)
    unit = rng.choice(BASES, 32).astype(np.uint8)
    reps = 20
    pos = int(rng.integers(0, L - reps * 32))
    block = np.tile(unit, reps)
    mut = rng.random(len(block)) < 0.03
    block[mut] = rng.choice(BASES, int(mut.sum())).astype(np.uint8)
    seq[pos : pos + len(block)] = block

    # dispersed SINE-like element: one ~300bp consensus, 8 decayed copies
    sine = rng.choice(BASES, 300).astype(np.uint8)
    for _ in range(8):
        cp = sine.copy()
        mut = rng.random(300) < float(rng.uniform(0.02, 0.15))
        cp[mut] = rng.choice(BASES, int(mut.sum())).astype(np.uint8)
        pos = int(rng.integers(0, L - 300))
        seq[pos : pos + 300] = cp

    # low-complexity: poly-A and (AT)n stretches
    for _ in range(4):
        ln = int(rng.integers(25, 120))
        pos = int(rng.integers(0, L - ln))
        seq[pos : pos + ln] = A
    for _ in range(2):
        ln = int(rng.integers(30, 80))
        pos = int(rng.integers(0, L - ln))
        seq[pos : pos + ln] = np.tile(
            np.frombuffer(b"AT", np.uint8), ln // 2 + 1)[:ln]

    # assembly gaps: scattered short N runs + one long N gap
    for _ in range(5):
        ln = int(rng.integers(5, 40))
        pos = int(rng.integers(0, L - ln))
        seq[pos : pos + ln] = N
    ln = int(rng.integers(200, 500))
    pos = int(rng.integers(L // 3, 2 * L // 3))
    seq[pos : pos + ln] = N
    return seq


def homologize(rng, seq, sub=0.06, indel_every=900, del_span=None):
    """Homolog: substitutions + short indels + one interior deletion."""
    out = seq.copy()
    idx = rng.random(len(out)) < sub
    out[idx] = rng.choice(BASES, int(idx.sum())).astype(np.uint8)
    parts = []
    prev = 0
    for cut in range(indel_every, len(out), indel_every):
        parts.append(out[prev:cut])
        if rng.random() < 0.5:
            parts.append(rng.choice(BASES, int(rng.integers(1, 12))
                                    ).astype(np.uint8))
            prev = cut
        else:
            prev = min(cut + int(rng.integers(1, 12)), len(out))
    parts.append(out[prev:])
    out = np.concatenate(parts)
    if del_span:
        a, b = del_span
        out = np.concatenate([out[:a], out[b:]])
    return out


def write_fasta(path, name, seq):
    s = seq.tobytes().decode()
    with open(path, "w") as f:
        f.write(f">{name}\n")
        for i in range(0, len(s), 70):
            f.write(s[i : i + 70] + "\n")


def main():
    here = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden")

    # real1: 16 KBP pair (fast suite)
    rng = np.random.default_rng(20260817)
    a1 = plant_features(rng, make_backbone(rng, 16384))
    b1 = homologize(np.random.default_rng(101), a1,
                    del_span=(7000, 7600))
    write_fasta(os.path.join(here, "real1_a.fa"),
                "real1-a synthetic-genomic 16KBP (N-runs, repeats, "
                "low-complexity, GC-islands)", a1)
    write_fasta(os.path.join(here, "real1_b.fa"),
                f"real1-b homolog {len(b1)}bp (6% subs, indels, 600bp "
                "deletion)", b1)

    # real2: 49 KBP pair (slow-marked mode matrix)
    rng = np.random.default_rng(77)
    a2 = plant_features(rng, make_backbone(rng, 49152))
    b2 = homologize(np.random.default_rng(707), a2, sub=0.08,
                    indel_every=1300, del_span=(21000, 22500))
    write_fasta(os.path.join(here, "real2_a.fa"),
                "real2-a synthetic-genomic 49KBP", a2)
    write_fasta(os.path.join(here, "real2_b.fa"),
                f"real2-b homolog {len(b2)}bp", b2)

    # frozen oracle results (the CLI maps N -> mismatch-to-everything)
    from masa_tpu.biology.sequence import Sequence
    from masa_tpu.ops import oracle
    from masa_tpu.types import ScoreParams

    for tag in ("real1", "real2"):
        sa = Sequence.from_file(os.path.join(here, f"{tag}_a.fa")).data()
        sb = Sequence.from_file(os.path.join(here, f"{tag}_b.fa")).data()
        ref = oracle.dp_rows(sa, sb, ScoreParams())
        print(f"{tag}: SW best={ref.best} at ({ref.best_i},{ref.best_j}) "
              f"lens=({len(sa)},{len(sb)})", flush=True)


if __name__ == "__main__":
    main()
