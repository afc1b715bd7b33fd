"""NetRing control-plane tests (parallel/netring.py — the working
re-creation of the reference's dormant MasaNet TCP ring,
masanet/MasaNet.cpp:555 + command/*)."""

import pytest

from masa_tpu.parallel.netring import NetRing


@pytest.fixture
def ring4():
    nodes = [NetRing(k) for k in range(4)]
    try:
        for n in nodes[1:]:
            n.join(*nodes[0].addr)
        for n in nodes:
            n.discover()
        yield nodes
    finally:
        for n in nodes:
            n.close()


class TestNetRing:
    def test_join_and_discover(self, ring4):
        for n in ring4:
            assert sorted(n.peers) == [0, 1, 2, 3]

    def test_ring_token_travels_in_id_order(self, ring4):
        path = ring4[0].ring_test()
        assert path == [0, 1, 2, 3]
        path = ring4[2].ring_test()
        assert path == [2, 3, 0, 1]

    def test_notify_score_circulates(self, ring4):
        ring4[1].notify_score(100, 200, 777)
        for n in ring4:
            assert n.best_score == (100, 200, 777)
        # lower score never downgrades
        ring4[3].notify_score(1, 1, 5)
        for n in ring4:
            assert n.best_score == (100, 200, 777)

    def test_status_query(self, ring4):
        ring4[2].stage = 4
        ring4[2].notify_score(9, 9, 42)
        st = ring4[0].status_of(2)
        assert st["cmd"] == "STATUS_RESPONSE"
        assert st["id"] == 2 and st["stage"] == 4
        assert st["best"] == [9, 9, 42]

    def test_unknown_command_is_reported(self, ring4):
        reply = ring4[0]._call(ring4[1].addr, {"cmd": "BOGUS"})
        assert reply["cmd"] == "ERROR"

    def test_two_node_ring(self):
        a, b = NetRing(10), NetRing(11)
        try:
            b.join(*a.addr)
            a.discover()
            assert a.ring_test() == [10, 11]
        finally:
            a.close()
            b.close()
