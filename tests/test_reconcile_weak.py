"""reconcile() on arbitrary (directed / partitioned / weakly connected)
topologies must land bit-exactly on run_until_converged's fixed point.

Gossip is pull-based (peer p merges FROM neighbors[p]), so the fixed point
of peer p is the lattice join over p's REACHABLE set. reconcile() computes
it via a dynamic program over the SCC condensation
(netsim.PeerNetworkSim._reconcile_weak, topology.strong_components); these
tests pin that equivalence with fuzzing over random directed graphs —
the generalization of the CLAUDE.md strongly-connected invariant."""

import numpy as np
import pytest

from bullet_tpu.models.netsim import PeerNetworkSim
from bullet_tpu.parallel import topology as topo


def random_directed(num_peers: int, rng, p_edge: float) -> topo.Topology:
    """Random DIRECTED topology (q ∈ neighbors[p] ⇒ p pulls from q),
    self-loops excluded, isolated peers allowed."""
    adj = rng.random((num_peers, num_peers)) < p_edge
    np.fill_diagonal(adj, False)
    return topo.from_adjacency(adj, name="fuzz-directed")


def seeded_pair(num_peers, t, rng, n_writes, **kw):
    """Two sims with identical random write streams."""
    sims = [
        PeerNetworkSim(num_peers, capacity=256, topology=t, **kw)
        for _ in range(2)
    ]
    writes = [
        (
            int(rng.integers(num_peers)),
            f"d/k{int(rng.integers(6))}",
            int(rng.integers(-100, 100)),
        )
        for _ in range(n_writes)
    ]
    for s in sims:
        for peer, key, value in writes:
            s.put(peer, key, value)
    return sims


def assert_same_fixed_point(sim_rec, sim_run, lean=False):
    sim_rec.reconcile()
    # generous bound: every finite pull-distance is < P
    sim_run.run_until_converged(max_rounds=2 * sim_run.num_peers + 4)
    assert sim_run.last_residual == 0
    fields_a = tuple(sim_rec.table)
    fields_b = tuple(sim_run.table)
    if lean:
        fields_a, fields_b = fields_a[:4], fields_b[:4]
    for x, y in zip(fields_a, fields_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("layout", ["dense", "packed"])
def test_fuzz_directed_topologies(seed, layout):
    rng = np.random.default_rng(1000 + seed)
    num_peers = int(rng.integers(5, 14))
    t = random_directed(num_peers, rng, p_edge=float(rng.uniform(0.05, 0.3)))
    a, b = seeded_pair(num_peers, t, rng, n_writes=40, layout=layout)
    assert_same_fixed_point(a, b)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_directed_lww(seed):
    rng = np.random.default_rng(2000 + seed)
    num_peers = int(rng.integers(5, 12))
    t = random_directed(num_peers, rng, p_edge=0.18)
    a, b = seeded_pair(num_peers, t, rng, n_writes=30, mode="lww")
    assert_same_fixed_point(a, b)


def test_fuzz_directed_lean():
    rng = np.random.default_rng(3000)
    t = random_directed(9, rng, p_edge=0.2)
    a, b = seeded_pair(9, t, rng, n_writes=30, lean_gossip=True)
    assert_same_fixed_point(a, b, lean=True)


def test_directed_chain_flows_one_way():
    """p pulls from p+1 only: values flow DOWN the index order and never
    up — peer 0's closure is everyone, peer P-1's is only itself."""
    n = 6
    adj = np.zeros((n, n), dtype=bool)
    for p in range(n - 1):
        adj[p, p + 1] = True  # p pulls from p+1
    t = topo.from_adjacency(adj, name="directed-chain")
    assert not t.is_connected()
    sim = PeerNetworkSim(n, capacity=128, topology=t)
    ref = PeerNetworkSim(n, capacity=128, topology=t)
    for s in (sim, ref):
        for p in range(n):
            s.put(p, f"own/p{p}", p + 1)
    sim.reconcile()
    ref.run_until_converged(max_rounds=2 * n + 4)
    for x, y in zip(sim.table, ref.table):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert sim.get(0, f"own/p{n-1}") == n  # 0 sees the far end
    assert sim.get(n - 1, "own/p0") is None  # far end sees nothing


def test_isolated_peers_untouched():
    rng = np.random.default_rng(7)
    adj = np.zeros((5, 5), dtype=bool)
    adj[0, 1] = adj[1, 0] = True  # one 2-SCC + three isolated peers
    t = topo.from_adjacency(adj)
    a, b = seeded_pair(5, t, rng, n_writes=20, layout="packed")
    assert_same_fixed_point(a, b)
    # isolated peer's row holds exactly its own writes
    assert a.get(3, "d/k0") == b.get(3, "d/k0")


def test_strong_components_reverse_topo_order():
    """Every cross-component pull edge u→v has comp[v] < comp[u] — the
    ordering the condensation DP depends on."""
    rng = np.random.default_rng(11)
    for _ in range(20):
        n = int(rng.integers(3, 15))
        t = random_directed(n, rng, p_edge=float(rng.uniform(0.05, 0.4)))
        comp = t.strong_components()
        assert comp.min() >= 0
        for p in range(n):
            for q in t.neighbors[p]:
                if q >= 0 and comp[q] != comp[p]:
                    assert comp[q] < comp[p], (p, q, comp)
        # mutual reachability ⇔ same component (check via closure)
        adjm = t.adjacency()
        reach = adjm | np.eye(n, dtype=bool)
        for _ in range(n):
            reach = reach | (reach @ reach)
        same = reach & reach.T
        for p in range(n):
            for q in range(n):
                assert (comp[p] == comp[q]) == bool(same[p, q])


def test_weak_reconcile_star_of_sccs():
    """Two 3-cycles, one pulling from the other through a single edge."""
    n = 6
    adj = np.zeros((n, n), dtype=bool)
    for c in (0, 3):  # 3-cycles {0,1,2} and {3,4,5}
        for i in range(3):
            adj[c + i, c + (i + 1) % 3] = True
    adj[0, 3] = True  # cycle A pulls from cycle B
    t = topo.from_adjacency(adj)
    a, b = seeded_pair(n, t, np.random.default_rng(5), 25, layout="packed")
    assert_same_fixed_point(a, b)
    # A sees B's writes, B does not see A's
    a2 = PeerNetworkSim(n, capacity=128, topology=t, layout="packed")
    a2.put(4, "from/b", 9)
    a2.put(1, "from/a", 8)
    a2.reconcile()
    assert a2.get(2, "from/b") == 9
    assert a2.get(5, "from/a") is None
