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

    # ---- propagation heat map: message × hop distance → arrival round ----
    # The reference injects a propagation-test message every 3rd update and
    # renders an HTML heat map of spread over hop distance
    # (bullet-chain-example.js:136-147, 319-688). Here every 3rd simulated
    # update is tagged as a probe from a rotating source peer; the matrix
    # records, for each probe, how many rounds each hop distance took.
    sim3 = PeerNetworkSim(NUM_PEERS, capacity=256, topology="chain")
    sources = []
    for u in range(12):  # 12 updates, every 3rd is a probe
        peer = (u * 7) % NUM_PEERS
        if u % 3 == 0:
            sim3.put(peer, f"probe/m{len(sources)}", f"probe-{u}")
            sources.append(peer)
        else:
            sim3.put(peer, f"noise/u{u}", u)
    probes = [f"probe/m{i}" for i in range(len(sources))]
    arrival_m = {key: {sources[i]: 0} for i, key in enumerate(probes)}
    round_no = 0
    while round_no < NUM_PEERS + 2 and any(
        len(arrival_m[k]) < NUM_PEERS for k in probes
    ):
        round_no += 1
        sim3.step(rounds=1)
        for i, key in enumerate(probes):
            want = f"probe-{i * 3}"
            for peer in range(NUM_PEERS):
                if peer not in arrival_m[key] and sim3.get(peer, key) == want:
                    arrival_m[key][peer] = round_no

    # rows: probes; cols: hop distance from that probe's source; cell:
    # arrival round. On a chain the shortest path IS the only path, so
    # arrival round must equal hop distance exactly.
    max_hop = max(
        max(abs(p - s) for p in range(NUM_PEERS)) for s in sources
    )
    matrix = []
    for i, key in enumerate(probes):
        s = sources[i]
        row = [None] * (max_hop + 1)
        for peer, rnd in arrival_m[key].items():
            hop = abs(peer - s)
            row[hop] = max(rnd if row[hop] is None else row[hop], rnd)
            assert rnd == hop, (key, peer, rnd, hop)
        matrix.append(row)

    shades = " .:-=+*#%@"
    print("\npropagation heat map (rows: probe msgs, cols: hop distance,")
    print("cell: arrival round — linear on a chain, shade = latency):")
    header = "      " + "".join(f"{h:>3}" for h in range(0, max_hop + 1, 4))
    print(header)
    for i, row in enumerate(matrix):
        cells = "".join(
            " " if v is None else shades[min(v * (len(shades) - 1) // max_hop,
                                             len(shades) - 1)]
            for v in row
        )
        print(f"  m{i} [{cells}] src=peer{sources[i]}")

    html = ["<html><head><title>bullet_tpu chain propagation</title>",
            "<style>td{width:14px;height:14px;font-size:8px;"
            "text-align:center}</style></head><body>",
            "<h3>Message spread over hop distance (arrival round)</h3>",
            "<table>"]
    html.append(
        "<tr><th>msg</th>"
        + "".join(f"<th>{h}</th>" for h in range(max_hop + 1))
        + "</tr>"
    )
    for i, row in enumerate(matrix):
        cells = []
        for v in row:
            if v is None:
                cells.append("<td></td>")
            else:
                heat = 255 - int(200 * v / max(max_hop, 1))
                cells.append(
                    f'<td style="background:rgb(255,{heat},{heat})">{v}</td>'
                )
        html.append(f"<tr><td>m{i} (p{sources[i]})</td>" + "".join(cells) + "</tr>")
    html.append("</table></body></html>")
    out_path = "/tmp/bullet_tpu_chain_propagation.html"
    with open(out_path, "w") as f:
        f.write("\n".join(html))
    print(f"HTML heat map written to {out_path}")

    print("Chain example completed")


if __name__ == "__main__":
    main()
