"""SRA store: proportional RAM/disk placement, border-type metadata,
crash-visibility semantics, and in-process instance caching.

Reference anchors: sra/SpecialRowsPartition.cpp:316-333 (proportional
counters), :129-175 (border types encoded per file), Job.cpp:202-211
(the job owns its areas).
"""

import numpy as np

from masa_tpu.core.sra import SpecialRowsArea, SpecialRowsPartition
from masa_tpu.types import InitType


def rows_of(n, k, base=0):
    h = np.arange(n, dtype=np.int64) + base
    f = -h - 1
    return h, f


def sizes(tmp_path, n):
    """(ram_bytes, disk_bytes) actually charged for one n-cell row."""
    p = SpecialRowsPartition(str(tmp_path / "probe"), 0, 0, 10, n,
                             ram_limit=1 << 30, disk_limit=0)
    p.put(1, *rows_of(n, 0))
    ram = p._ram_bytes
    p2 = SpecialRowsPartition(str(tmp_path / "probe2"), 0, 0, 10, n,
                              ram_limit=0, disk_limit=1 << 30)
    p2.put(1, *rows_of(n, 0))
    return ram, p2._disk_bytes


class TestPlacement:
    def test_equal_budgets_split_evenly(self, tmp_path):
        """Equal budgets (in each store's own row size): placement keeps
        usage proportional, so 8 rows land 4/4."""
        n = 100
        ram_sz, disk_sz = sizes(tmp_path, n)
        p = SpecialRowsPartition(str(tmp_path / "p"), 0, 0, 10_000, n,
                                 ram_limit=ram_sz * 4,
                                 disk_limit=disk_sz * 4)
        for k in range(8):
            p.put((k + 1) * 10, *rows_of(n, k))
        assert len(p._ram) == 4 and len(p._disk) == 4
        # every row readable regardless of placement
        for k in range(8):
            h, f = p.get((k + 1) * 10)
            assert h[0] == 0 and len(h) == n

    def test_budget_ratio_drives_placement(self, tmp_path):
        """1:3 RAM:disk budget => 1/4 of rows in RAM (the reference's
        proportional counters)."""
        n = 64
        ram_sz, disk_sz = sizes(tmp_path, n)
        p = SpecialRowsPartition(str(tmp_path / "p"), 0, 0, 10_000, n,
                                 ram_limit=ram_sz * 3,
                                 disk_limit=disk_sz * 9)
        for k in range(12):
            p.put((k + 1) * 10, *rows_of(n, k))
        assert len(p._ram) == 3 and len(p._disk) == 9

    def test_dominant_disk_budget_prefers_disk(self, tmp_path):
        """A disk budget far larger than RAM keeps the disk fraction
        lower, so rows stream to disk (persistence-heavy config)."""
        n = 64
        ram_sz, disk_sz = sizes(tmp_path, n)
        p = SpecialRowsPartition(str(tmp_path / "p"), 0, 0, 10_000, n,
                                 ram_limit=ram_sz * 2,
                                 disk_limit=disk_sz * 100)
        for k in range(10):
            p.put((k + 1) * 10, *rows_of(n, k))
        assert len(p._disk) >= 9

    def test_crash_semantics_disk_only_visible(self, tmp_path):
        """A fresh instance (the restarted process) sees only the disk
        rows; last_row() is the resume point."""
        n = 32
        ram_sz, disk_sz = sizes(tmp_path, n)
        p = SpecialRowsPartition(str(tmp_path / "p"), 0, 0, 10_000, n,
                                 ram_limit=ram_sz * 2,
                                 disk_limit=disk_sz * 2)
        for k in range(4):
            p.put((k + 1) * 10, *rows_of(n, k))
        assert p._disk, "expected at least one disk row"
        fresh = SpecialRowsPartition(str(tmp_path / "p"), 0, 0, 10_000, n,
                                     ram_limit=ram_sz * 2,
                                     disk_limit=disk_sz * 2)
        assert set(fresh.rows()) == set(p._disk)
        assert fresh.last_row() == max(p._disk)


class TestAreaCache:
    def test_partition_instances_cached(self, tmp_path):
        """open_partition must return the SAME instance so RAM rows stay
        reachable across stage boundaries within the process."""
        area = SpecialRowsArea(str(tmp_path / "a"), ram_limit=1 << 20,
                               disk_limit=1 << 20)
        part = area.create_partition(0, 0, 1000, 500)
        part.put(100, *rows_of(501, 0))
        again = area.open_partition(50, 50)
        assert again is part
        assert 100 in again.rows()

    def test_border_type_metadata_roundtrip(self, tmp_path):
        area = SpecialRowsArea(str(tmp_path / "a"))
        area.create_partition(
            0, 0, 1000, 500,
            row_init=InitType.WITH_GAPS, col_init=InitType.WITH_ZEROES)
        # a fresh area (restarted process) recovers the border types
        area2 = SpecialRowsArea(str(tmp_path / "a"))
        p = area2.open_partition(10, 10)
        assert InitType(p.row_init) == InitType.WITH_GAPS
        assert InitType(p.col_init) == InitType.WITH_ZEROES
