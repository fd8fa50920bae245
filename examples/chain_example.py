"""32-peer chain propagation study: how many gossip rounds does an update
take to travel each hop distance?

Mirrors /root/reference/examples/bullet-chain-example.js (32 nodes, diameter
31, propagation-test messages and a spread visualization) — the engine
version measures exact hop-arrival rounds instead of sampling log files, and
prints the heat map as text rather than HTML.
"""

import _env  # noqa: F401 - backend selection
from bullet_tpu.models.netsim import PeerNetworkSim

NUM_PEERS = 32


def main() -> None:
    sim = PeerNetworkSim(NUM_PEERS, capacity=128, topology="chain")
    print(f"Chain of {NUM_PEERS} peers, diameter {sim.topology.diameter}")

    # peer 0 publishes one message; step one round at a time and record when
    # each peer first sees it
    sim.put(0, "probe/msg", "hello-from-0")
    arrival = {0: 0}
    round_no = 0
    while len(arrival) < NUM_PEERS and round_no < NUM_PEERS + 2:
        round_no += 1
        sim.step(rounds=1)
        for peer in range(NUM_PEERS):
            if peer not in arrival and sim.get(peer, "probe/msg") == "hello-from-0":
                arrival[peer] = round_no

    print("hop-distance -> arrival round:")
    bar = ""
    for peer in range(NUM_PEERS):
        assert arrival[peer] == peer, (peer, arrival[peer])  # 1 hop per round
        bar += "#"
        if peer % 8 == 7:
            print(f"  peers 0..{peer}: {bar}")
    print(f"Update reached all {NUM_PEERS} peers in {max(arrival.values())} rounds "
          f"(= network diameter, the optimum)")

    # a middle peer reaches both ends in diameter/2-ish rounds
    sim2 = PeerNetworkSim(NUM_PEERS, capacity=128, topology="chain")
    sim2.put(NUM_PEERS // 2, "mid/msg", 1)
    rounds = sim2.run_until_converged()
    print(f"From the middle peer, convergence took {rounds} rounds")
    assert rounds <= NUM_PEERS // 2 + 1

    print("Chain example completed")


if __name__ == "__main__":
    main()
