"""Column-split multi-process stage 1: the reference's --split/--part and
--fork modes (libmasa.cpp:497-642).

Sequence #1 is split into weighted vertical slabs; each process computes
its slab, streaming its last column to the right neighbor through a cells
URL (file:// for the serial "fake backend", socket:// for forked
processes).  Best scores flow rightward through the AlignerPool.

This is the host/DCN-level layer; intra-host multi-chip sharding lives in
parallel/sharded.py (ppermute over ICI).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from masa_tpu.io import cells as cio
from masa_tpu.models.scoring import border_cells
from masa_tpu.ops import strips
from masa_tpu.ops import wavefront as wf
from masa_tpu.types import InitType, Recurrence, ScoreParams


def split_points(n: int, weights: list[float]) -> list[int]:
    """Column boundaries for weighted slabs (split_sequences,
    libmasa.cpp:497-535)."""
    total = sum(weights)
    pts = [0]
    acc = 0.0
    for w in weights[:-1]:
        acc += w
        pts.append(int(round(n * acc / total)))
    pts.append(n)
    return pts


def auto_urls(work_dir: str, nparts: int, use_sockets: bool = False,
              base_port: int = 7000) -> list[str]:
    """Boundary stream URLs between parts k and k+1 (STEP files or
    localhost sockets, libmasa.cpp:516-527, 585-595)."""
    if use_sockets:
        return [f"socket://127.0.0.1:{base_port + k}"
                for k in range(nparts - 1)]
    return [f"file://{work_dir}/STEP-{k:02d}.tmp"
            for k in range(nparts - 1)]


@dataclasses.dataclass
class PartResult:
    best: int
    best_i: int
    best_j: int
    last_h: np.ndarray  # (width,) the part's final-row H (cells only)
    last_f: np.ndarray
    cells: int


def run_part_stage1(
    seq0: np.ndarray,
    seq1: np.ndarray,
    part: int,
    points: list[int],
    params: ScoreParams = ScoreParams(),
    cfg: wf.WavefrontConfig | None = None,
    load_url: str | None = None,
    flush_url: str | None = None,
    backend: str = "scan",
    buffered: bool = True,
) -> PartResult:
    """Stage 1 over one vertical slab.  load_url supplies the left border
    (from part-1); flush_url receives this part's last column."""
    from masa_tpu.stages.core import default_config

    m = len(seq0)
    j0, j1 = points[part], points[part + 1]
    slab = np.ascontiguousarray(seq1[j0:j1])
    cfg = cfg or default_config()
    cfg = dataclasses.replace(
        cfg,
        recurrence=Recurrence.SMITH_WATERMAN,
        track_best=True,
        store_lastcol=flush_url is not None,
    )

    reader = None
    writer = None
    if load_url:
        reader = cio.open_reader(load_url)
        if buffered:
            reader = cio.BufferedCellsReader(reader, chunk=cfg.rows,
                                             total=m)
    if flush_url:
        writer = cio.open_writer(flush_url)
        if buffered:
            writer = cio.BufferedCellsWriter(writer)

    # first row: zeros for SW local alignment over every slab
    row_h, _ = border_cells(j1 - j0 + 1, InitType.WITH_ZEROES, params)
    res = strips.run_partition(
        cfg, seq0, slab, params,
        InitType.WITH_ZEROES,
        InitType.CUSTOM if reader else InitType.WITH_ZEROES,
        first_col=None,
        backend=backend,
        first_col_reader=reader,
        lastcol_writer=writer,
    )
    if writer:
        writer.close()
    if reader:
        reader.close()
    return PartResult(
        best=res.best,
        best_i=res.best_i,
        best_j=j0 + res.best_j,
        last_h=np.asarray(res.last_h[1:]),
        last_f=np.asarray(res.last_f[1:]),
        cells=res.cells,
    )


def run_split_serial(
    seq0: np.ndarray,
    seq1: np.ndarray,
    nparts: int,
    work_dir: str,
    params: ScoreParams = ScoreParams(),
    cfg: wf.WavefrontConfig | None = None,
    backend: str = "scan",
) -> list[PartResult]:
    """All parts in sequence with file:// handoff — the reference's
    single-machine distributed test mode."""
    points = split_points(len(seq1), [1.0] * nparts)
    urls = auto_urls(work_dir, nparts)
    out = []
    for k in range(nparts):
        out.append(run_part_stage1(
            seq0, seq1, k, points, params, cfg,
            load_url=urls[k - 1] if k > 0 else None,
            flush_url=urls[k] if k < nparts - 1 else None,
            backend=backend,
            buffered=False,
        ))
    return out


def run_split_processes(
    seq0: np.ndarray,
    seq1: np.ndarray,
    nparts: int,
    params: ScoreParams = ScoreParams(),
    cfg: wf.WavefrontConfig | None = None,
    backend: str = "scan",
    base_port: int = 7100,
) -> list[PartResult]:
    """All parts as concurrent processes wired by localhost sockets (the
    reference's fork_multi_process, libmasa.cpp:540-642) — here threads
    stand in for forks (the compute releases the GIL inside XLA)."""
    import threading

    points = split_points(len(seq1), [1.0] * nparts)
    urls = auto_urls("", nparts, use_sockets=True, base_port=base_port)
    results: list = [None] * nparts
    errs: list = [None] * nparts

    def work(k):
        try:
            results[k] = run_part_stage1(
                seq0, seq1, k, points, params, cfg,
                load_url=urls[k - 1] if k > 0 else None,
                flush_url=urls[k] if k < nparts - 1 else None,
                backend=backend,
            )
        except Exception as e:  # pragma: no cover
            errs[k] = e

    threads = [threading.Thread(target=work, args=(k,))
               for k in range(nparts)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for e in errs:
        if e:
            raise e
    return results
