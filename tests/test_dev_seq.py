"""Device-resident sequence cache semantics (wavefront.dev_seq family).

These views feed every on-device slice (stage 1 strips, stage 2 reverse
march, the stage-4 data plane); a wrong cache hit silently corrupts the
DP inputs, so the direction/pad/identity rules get direct coverage:

  * an opposite-direction twin serves via an ON-DEVICE flip (never
    returned un-flipped),
  * a larger-pad entry serves a smaller-pad request,
  * dev_seq_seed_reversed keys the flipped view under the REVERSED host
    array so later consumers hit it,
  * distinct arrays never collide, and the LRU stays bounded.
"""

import numpy as np
import pytest

from masa_tpu.ops import wavefront as wf


@pytest.fixture(autouse=True)
def _fresh_cache():
    saved = wf._DEV_SEQ_CACHE
    wf._DEV_SEQ_CACHE = None
    yield
    wf._DEV_SEQ_CACHE = saved


def _arr(n, seed=0):
    return np.random.default_rng(seed).integers(
        0, 4, size=n, dtype=np.int32).astype(np.uint8)


SENT = wf.A_SENTINEL


class TestDevSeqCache:
    def test_upload_content_and_padding(self):
        a = _arr(100)
        d = np.asarray(wf.dev_seq(a, SENT, pad=16))
        assert len(d) == 116
        np.testing.assert_array_equal(d[:100], a)
        assert (d[100:] == SENT).all()

    def test_reverse_serves_from_forward_by_device_flip(self):
        a = _arr(257, seed=1)
        wf.dev_seq(a, SENT, pad=8)
        # peek must produce the reversed view WITHOUT an upload path
        # (the forward twin exists), and the content must be flipped
        p = wf.dev_seq_peek(a, SENT, pad=8, reverse=True)
        assert p is not None
        p = np.asarray(p)
        np.testing.assert_array_equal(p[:257], a[::-1])
        assert (p[257:] == SENT).all()

    def test_forward_serves_from_reverse_by_device_flip(self):
        a = _arr(64, seed=2)
        wf.dev_seq(a, SENT, pad=4, reverse=True)
        d = np.asarray(wf.dev_seq(a, SENT, pad=4, reverse=False))
        np.testing.assert_array_equal(d[:64], a)

    def test_larger_pad_serves_smaller_request(self):
        a = _arr(50, seed=3)
        big = wf.dev_seq(a, SENT, pad=100)
        n_entries = len(wf._DEV_SEQ_CACHE)
        small = wf.dev_seq(a, SENT, pad=10)
        assert small is big                    # same device buffer
        assert len(wf._DEV_SEQ_CACHE) == n_entries

    def test_peek_without_any_entry_is_none(self):
        a = _arr(10, seed=4)
        assert wf.dev_seq_peek(a, SENT, pad=0) is None

    def test_seed_reversed_keys_on_the_reversed_host_array(self):
        fwd = _arr(300, seed=5)
        rev = np.ascontiguousarray(fwd[::-1])
        wf.dev_seq(fwd, SENT, pad=16)
        wf.dev_seq_seed_reversed(fwd, rev, SENT, pad=16)
        # a consumer passing the REVERSED host array hits the seeded
        # entry (forward direction of rev == content of rev)
        hit = wf.dev_seq_peek(rev, SENT, pad=16)
        assert hit is not None
        np.testing.assert_array_equal(np.asarray(hit)[:300], rev)

    def test_seed_reversed_without_forward_entry_is_a_noop(self):
        fwd = _arr(20, seed=6)
        rev = np.ascontiguousarray(fwd[::-1])
        wf.dev_seq_seed_reversed(fwd, rev, SENT, pad=0)
        assert wf.dev_seq_peek(rev, SENT, pad=0) is None

    def test_distinct_arrays_do_not_collide(self):
        a = _arr(128, seed=7)
        b = _arr(128, seed=8)
        wf.dev_seq(a, SENT, pad=0)
        db = np.asarray(wf.dev_seq(b, SENT, pad=0))
        np.testing.assert_array_equal(db[:128], b)

    def test_lru_stays_bounded(self):
        keep = [
            _arr(64, seed=100 + i) for i in range(14)
        ]  # hold refs: pointer reuse would alias keys
        for x in keep:
            wf.dev_seq(x, SENT, pad=0)
        assert len(wf._DEV_SEQ_CACHE) <= 10
