"""Topology builders and fault injection."""

import numpy as np

from bullet_tpu.parallel import topology as topo


def test_ring():
    t = topo.ring(6)
    assert t.kind == "ring"
    assert t.validate_symmetric()
    assert (t.degree() == 2).all()
    assert set(t.neighbors[0]) == {1, 5}


def test_chain():
    t = topo.chain(5)
    assert t.diameter == 4
    deg = t.degree()
    assert deg[0] == 1 and deg[4] == 1 and (deg[1:4] == 2).all()
    assert t.validate_symmetric()


def test_full_mesh():
    t = topo.full_mesh(5)
    assert (t.degree() == 4).all()
    assert t.diameter == 1


def test_star():
    t = topo.star(7, hub=0)
    assert t.degree()[0] == 6
    assert (t.degree()[1:] == 1).all()
    assert t.validate_symmetric()


def test_bridge_matches_reference_example():
    """2 clusters × 5 full-mesh + 1 bridge node
    (examples/bullet-bridge-example.js:16-18,226-296)."""
    t = topo.bridge((5, 5), 1)
    assert t.num_peers == 11
    deg = t.degree()
    assert deg[10] == 2  # bridge links one gateway per cluster
    assert deg[0] == 5 and deg[5] == 5  # gateways: 4 intra + bridge
    assert (deg[1:5] == 4).all() and (deg[6:10] == 4).all()
    assert t.validate_symmetric()
    assert t.diameter == 4


def test_drop_links_partitions():
    t = topo.chain(4)
    cut = t.drop_links([(1, 2)])
    adj = cut.adjacency()
    assert not adj[1, 2] and not adj[2, 1]
    assert adj[0, 1] and adj[2, 3]


def test_drop_peer():
    t = topo.star(5, hub=0)
    cut = t.drop_peer(0)
    assert (cut.degree() == 0).all()


def test_from_adjacency_roundtrip():
    t = topo.ring(8)
    t2 = topo.from_adjacency(t.adjacency())
    np.testing.assert_array_equal(t.adjacency(), t2.adjacency())
    assert t2.diameter == 4


def test_random_graph_symmetric():
    t = topo.random_graph(20, degree=3, seed=1)
    assert t.validate_symmetric()
    assert (t.degree() >= 3).all()
