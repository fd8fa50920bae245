"""Live per-peer HTTP /status endpoints + central monitor aggregator.

Mirrors the reference's runtime observability surface: each node in its
multi-process examples serves an HTTP ``/status`` JSON endpoint and a
central monitor polls them all
(/root/reference/examples/bullet-circle-network-example.js:118-139,213-274;
/root/reference/examples/bullet-chain-example.js:153-182). Here the same
surface is one line per peer: attach a StatusServer, point a
MonitorServer at the URLs.
"""

import _env  # noqa: F401 - backend selection / sys.path
import time

from bullet_tpu.db.core import Bullet
from bullet_tpu.db.monitor import MonitorServer, StatusServer, fetch_status

NUM_PEERS = 3


def main() -> None:
    # a small chain of real networked peers (TCP/NDJSON links):
    # node1 ← node2 ← node3, each dialing its predecessor
    bullets = []
    for i in range(NUM_PEERS):
        peers = []
        if bullets:
            peers = [f"tcp://127.0.0.1:{bullets[-1].network.port}"]
        bullets.append(
            Bullet({"storage": False, "server": True, "port": 0, "peers": peers})
        )

    # wait for every link before publishing: put floods relay hop-by-hop
    # over live connections (src/bullet-network.js:378-396)
    deadline = time.monotonic() + 20
    expected = [1, 2, 1]  # chain degree per node
    while time.monotonic() < deadline:
        if all(len(b.network.peers) >= n for b, n in zip(bullets, expected)):
            break
        time.sleep(0.05)

    statuses = [
        StatusServer(b, extra=(lambda pos: lambda: {"position": pos})(i + 1))
        for i, b in enumerate(bullets)
    ]
    monitor = MonitorServer([s.url for s in statuses], port=0)
    print(f"monitor serving at {monitor.url}")

    try:
        # every peer publishes its node record (the reference's nodePath put)
        for i, b in enumerate(bullets):
            b.get(f"nodes/node{i + 1}").put(
                {"id": i + 1, "name": f"Node {i + 1}", "status": "online"}
            )

        # wait until the flood converges: every peer sees all 3 node records
        deadline = time.monotonic() + 20
        while time.monotonic() < deadline:
            if all(
                len(b.get("nodes").value() or {}) == NUM_PEERS for b in bullets
            ):
                break
            time.sleep(0.1)

        view = monitor.collect()
        assert view["networkSize"] == NUM_PEERS
        online = [n for n in view["nodes"] if n["status"] == "online"]
        assert len(online) == NUM_PEERS, view
        for n in online:
            assert n["visibleNodes"] == NUM_PEERS, n
            print(
                f"node {n['position']}: online, sees {n['visibleNodes']} nodes, "
                f"peers={len(n['peers'])}"
            )

        # the aggregated view is also served over HTTP
        served = fetch_status(monitor.url)
        assert served["networkSize"] == NUM_PEERS

        # kill one peer: the monitor reports it as an error row, the rest
        # stay online (the reference's offline handling)
        statuses[2].close()
        bullets[2].close()
        view = monitor.collect()
        by_status = sorted(n["status"] for n in view["nodes"])
        assert by_status == ["error", "online", "online"], view
        print("after killing node 3:", by_status)
        print("Monitor example completed")
    finally:
        monitor.close()
        for s in statuses[:2]:
            s.close()
        for b in bullets[:2]:
            b.close()


if __name__ == "__main__":
    main()
