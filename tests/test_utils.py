"""Timer, RecurrentTimer, INI config system."""

import io
import time

from masa_tpu.utils.config import load_config, parse_size
from masa_tpu.utils.timer import RecurrentTimer, Timer


class TestTimer:
    def test_events(self):
        t = Timer()
        t.create_event("A")
        t.init()
        time.sleep(0.01)
        t.event_record("A")
        buf = io.StringIO()
        total = t.print_statistics(buf, cells=1000000)
        assert total >= 10
        assert "MCUPS" in buf.getvalue()

    def test_recurrent(self):
        hits = []
        with RecurrentTimer(0.02, lambda: hits.append(1)):
            time.sleep(0.1)
        assert len(hits) >= 2


class TestConfig:
    def test_parse_size(self):
        assert parse_size("512") == 512
        assert parse_size("4K") == 4096
        assert parse_size("1.5G") == 3 << 29

    def test_ini(self, tmp_path):
        p = tmp_path / "masa.cfg"
        p.write_text(
            "[global]\nram-size = 2G\nblock-pruning = no\n"
            "[stage4]\nmaximum-partition = 32\n"
        )
        cfg = load_config(str(p))
        assert cfg.ram_size == 2 << 30
        assert cfg.block_pruning is False
        assert cfg.stages[4].maximum_partition == 32

    def test_apply(self, tmp_path):
        from masa_tpu.core.job import JobConfig
        from masa_tpu.utils.config import apply_to_job_config

        p = tmp_path / "masa.cfg"
        p.write_text("[global]\nram-size = 2G\n")
        jcfg = JobConfig()
        apply_to_job_config(load_config(str(p)), jcfg)
        assert jcfg.ram_limit == 2 << 30


class TestBlocksFile:
    def test_roundtrip_and_reduce(self, tmp_path):
        import numpy as np

        from masa_tpu.core.blocks_file import BlocksFile

        bf = BlocksFile(str(tmp_path / "blocks.bin"))
        for r in range(6):
            bf.add_row(np.arange(10) * (r + 1))
        bf.save()
        grid = BlocksFile.load(str(tmp_path / "blocks.bin"))
        assert grid.shape == (6, 10)
        assert grid[5, 9] == 54
        red = bf.reduce(3, 5)
        assert red.shape == (3, 5)
        assert red.max() == 54


class TestDevices:
    def test_list(self):
        from masa_tpu.utils.devices import (
            device_weights, format_device_list, list_devices,
        )

        devs = list_devices()
        assert len(devs) == 8  # virtual CPU mesh
        assert len(device_weights()) == 8
        assert "available devices" in format_device_list()


def test_device_weight_probe():
    """Probed fork weights: one per device, normalized to min 1.0, all
    finite (the getGPUWeights analogue on the 8-device virtual mesh)."""
    import jax

    from masa_tpu.utils.devices import device_weights

    uniform = device_weights()
    assert uniform == [1.0] * len(jax.devices())
    w = device_weights(probe=True, reps=1)
    assert len(w) == len(jax.devices())
    assert min(w) == 1.0
    assert all(x >= 1.0 and x < 1e6 for x in w)


def test_aligner_fork_weights_cycle():
    from masa_tpu.core.aligner import CPUAligner

    w = CPUAligner().get_fork_weights(3)
    assert len(w) == 3 and all(x > 0 for x in w)
