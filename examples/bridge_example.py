"""Two full-mesh clusters joined by a bridge node, with a partition
experiment.

Mirrors /root/reference/examples/bullet-bridge-example.js (2 clusters × 5
peers + 1 bridge) and actually runs the bridge-failure scenario the
reference docs only discuss (docs/network-topologies.md:235-240).
"""

import _env  # noqa: F401 - backend selection
from bullet_tpu.models.netsim import PeerNetworkSim
from bullet_tpu.parallel import topology as topo


def main() -> None:
    t = topo.bridge((5, 5), 1)
    sim = PeerNetworkSim(t.num_peers, capacity=128, topology=t)
    bridge_peer = t.num_peers - 1
    cluster_a = range(0, 5)
    cluster_b = range(5, 10)
    print(f"{t.num_peers} peers: cluster A = 0-4 (mesh), cluster B = 5-9 (mesh), "
          f"bridge = {bridge_peer}")

    # cluster-local channels + a cross-cluster broadcast
    sim.put(1, "channels/clusterA/msg1", "hello from A1")
    sim.put(7, "channels/clusterB/msg1", "hello from B7")
    sim.put(0, "global/announcement", "all hands")
    rounds = sim.run_until_converged()
    print(f"Converged in {rounds} rounds (diameter {t.diameter})")
    assert sim.tables_equal()
    assert sim.get(9, "channels/clusterA/msg1") == "hello from A1"
    assert sim.get(2, "channels/clusterB/msg1") == "hello from B7"
    print("Cross-cluster data flowed through the bridge")

    # ---- partition experiment: the bridge node fails
    print(f"\nDropping bridge peer {bridge_peer}...")
    healthy = sim.topology
    sim.topology = healthy.drop_peer(bridge_peer)
    sim.put(2, "during_partition/from_a", 1)
    sim.put(8, "during_partition/from_b", 2)
    sim.run_until_converged(max_rounds=8)
    assert all(sim.get(p, "during_partition/from_a") == 1 for p in cluster_a)
    assert all(sim.get(p, "during_partition/from_a") is None for p in cluster_b)
    print("Clusters converge internally but not across the partition")

    # reconcile() understands partitions too: it lands each component on
    # its own fixed point directly (SCC condensation), without simulating
    # rounds — same states the loop above reached
    sim.put(3, "during_partition/more_a", 7)
    sim.reconcile()
    assert all(sim.get(p, "during_partition/more_a") == 7 for p in cluster_a)
    assert all(sim.get(p, "during_partition/more_a") is None for p in cluster_b)
    print("Direct reconcile() respects the partition (per-component joins)")

    print("Healing the bridge...")
    sim.topology = healthy
    rounds = sim.run_until_converged()
    assert sim.tables_equal()
    assert sim.get(9, "during_partition/from_a") == 1
    assert sim.get(0, "during_partition/from_b") == 2
    print(f"Healed and fully converged in {rounds} rounds")

    print("Bridge example completed")


if __name__ == "__main__":
    main()
