"""Row-compression codec tests (io/rowcodec.py): exact roundtrip for all
codecs on adversarial contents, realistic compression ratios, and the
compressed SRA store end-to-end (the reference's configs SRA compression
enums, configs/Configs.hpp:35-41, actually wired here)."""

import numpy as np
import pytest

from masa_tpu.core import sra
from masa_tpu.io.rowcodec import CODECS, decode_row, encode_row
from masa_tpu.types import INF


def realistic_row(n, seed):
    """An H row resembling stage-1 output (bounded deltas) and an F row
    that is -INF in dead regions, close to H elsewhere."""
    rng = np.random.default_rng(seed)
    dh = rng.integers(-5, 2, n)
    h = np.cumsum(dh) + 100
    f = np.where(rng.random(n) < 0.3, h - rng.integers(5, 60, n), -INF)
    return h.astype(np.int64), f.astype(np.int64)


@pytest.mark.parametrize("codec", CODECS)
def test_roundtrip_realistic(codec):
    h, f = realistic_row(10000, 1)
    raw = encode_row(codec, h, f)
    h2, f2 = decode_row(codec, raw, len(h))
    np.testing.assert_array_equal(h, h2)
    np.testing.assert_array_equal(f, f2)


@pytest.mark.parametrize("codec", CODECS)
def test_roundtrip_adversarial(codec):
    """Arbitrary int values incl. +-INF sentinels and huge jumps."""
    rng = np.random.default_rng(2)
    h = rng.integers(-INF, INF, 2001).astype(np.int64)
    h[::7] = -INF
    h[3::11] = INF
    f = rng.integers(-INF, INF, 2001).astype(np.int64)
    f[::5] = -INF
    raw = encode_row(codec, h, f)
    h2, f2 = decode_row(codec, raw, len(h))
    np.testing.assert_array_equal(h, h2)
    np.testing.assert_array_equal(f, f2)


@pytest.mark.parametrize("codec", CODECS)
@pytest.mark.parametrize("n", [0, 1, 2, 3])
def test_roundtrip_tiny(codec, n):
    h = np.arange(n, dtype=np.int64) * 1000 - 500
    f = h - 7
    h2, f2 = decode_row(codec, encode_row(codec, h, f), n)
    np.testing.assert_array_equal(h, h2)
    np.testing.assert_array_equal(f, f2)


def test_compression_ratios_on_real_dp_row():
    """On an actual stage-1 special row (bounded H/F deltas) the codecs
    must hit their design ratios: 8bit ~4x, 4bit ~8x, vlc ~4x."""
    from masa_tpu.ops import oracle
    from masa_tpu.types import ScoreParams

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    s0 = rng.choice(bases, 600).astype(np.uint8)
    s1 = rng.choice(bases, 30000).astype(np.uint8)
    res = oracle.dp_rows(s0, s1, ScoreParams(), special_rows=(300,))
    h, f = res.specials[300]
    sizes = {c: len(encode_row(c, h, f)) for c in CODECS}
    assert sizes["8bit"] <= 0.27 * sizes["none"]
    assert sizes["4bit"] <= 0.14 * sizes["none"]
    assert sizes["vlc"] <= 0.27 * sizes["none"]


def test_inf_plateaus_compress():
    """-INF plateaus (row 0 / cleared buses) delta to zero: all
    compressed codecs stay far below raw size."""
    n = 50000
    h = np.arange(n, dtype=np.int64)
    f = np.full(n, -INF, np.int64)
    sizes = {c: len(encode_row(c, h, f)) for c in CODECS}
    for c in ("8bit", "4bit", "vlc"):
        assert sizes[c] < 0.3 * sizes["none"], c


@pytest.mark.parametrize("codec", ["8bit", "4bit", "vlc"])
def test_sra_store_with_compression(tmp_path, codec):
    """Compressed SRA partition: write/read/resume/truncate."""
    area = sra.SpecialRowsArea(str(tmp_path / "area"), codec=codec)
    part = area.create_partition(0, 0, 4096, 8192)
    rows = {}
    for r in (1024, 2048, 3072):
        h, f = realistic_row(8193, r)
        part.put(r, h, f)
        rows[r] = (h, f)
    # read back through a fresh open (disk scan path)
    part2 = area.open_partition(1500, 100)
    assert part2 is not None and part2.codec == codec
    for r, (h, f) in rows.items():
        h2, f2 = part2.get(r)
        np.testing.assert_array_equal(h, h2)
        np.testing.assert_array_equal(f, f2)
    assert part2.last_row() == 3072
    part2.truncate_above(2048)
    assert part2.rows() == [1024, 2048]


def test_sra_reads_legacy_msr1(tmp_path):
    """MSR1 files written by earlier builds still read."""
    import struct

    d = tmp_path / "p"
    d.mkdir()
    h = np.arange(100, dtype=np.int64)
    f = h - 3
    data = np.empty((100, 2), np.int32)
    data[:, 0] = h
    data[:, 1] = f
    raw = b"MSR1" + struct.pack("<qq", 7, 100) + data.tobytes()
    (d / "row.0000000007.bin").write_bytes(raw)
    h2, f2 = sra.read_row(str(d), 7)
    np.testing.assert_array_equal(h, h2)
    np.testing.assert_array_equal(f, f2)


def test_vlc_wire_format_pinned():
    """The vlc payload is zigzag+LEB128 regardless of which encoder branch
    ran: small deltas are exactly one byte each (the fast path emits the
    same stream the general path used to), and a handcrafted multi-byte
    stream decodes."""
    from masa_tpu.io.rowcodec import _dec_vlc, _enc_vlc

    small = np.array([0, 1, -1, 3, -7, 63, -64], np.int64)
    b = _enc_vlc(small)
    assert b.dtype == np.uint8 and len(b) == len(small)
    zig = (small << 1) ^ (small >> 63)
    np.testing.assert_array_equal(b.astype(np.int64), zig)
    np.testing.assert_array_equal(_dec_vlc(b, len(small)), small)

    mixed = np.array([5, 300, -2, -INF, 0, INF], np.int64)
    b2 = _enc_vlc(mixed)
    # 300 zigzags to 600 -> 2 bytes; INF (999999999) -> 5 bytes
    assert len(b2) > len(mixed)
    np.testing.assert_array_equal(_dec_vlc(b2, len(mixed)), mixed)
