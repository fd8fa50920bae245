"""Two-peer network sync to convergence over real sockets.

Mirrors /root/reference/examples/bullet-sync-example.js: populate peer 1
with a sizeable dataset, start peer 2 pointing at it, poll until item counts
match, then inject concurrent conflicting writes and watch CRT resolve them.
(Dataset scaled to ~2k items so the example runs in seconds; pass --items N
to go bigger, the reference used ~8.5k.)
"""

import argparse
import random
import time

import _env  # noqa: F401 - sys.path + backend setup
import bullet_tpu as bt


def wait_for(predicate, timeout=60.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(0.25)
    return False


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--items", type=int, default=2000)
    args = parser.parse_args()

    rng = random.Random(42)

    print("Starting first peer...")
    peer1 = bt.create({"storage": False, "host": "127.0.0.1", "port": 0})
    print(f"First peer on tcp://127.0.0.1:{peer1.network.port}")

    print(f"Populating {args.items} items...")
    t0 = time.time()
    for i in range(args.items):
        peer1.set_data(
            f"items/item{i}",
            {
                "name": f"Item {i}",
                "value": rng.randint(0, 10_000),
                "desc": "x" * rng.randint(10, 120),
            },
            broadcast=False,
        )
    peer1.get("metadata").put({"itemCount": args.items, "dbVersion": "1.0.0"})
    print(f"Populated in {time.time() - t0:.1f}s")

    print("Starting second peer...")
    peer2 = bt.create(
        {
            "storage": False,
            "host": "127.0.0.1",
            "port": 0,
            "peers": [f"tcp://127.0.0.1:{peer1.network.port}"],
            "connect_sync_delay": 0.2,
        }
    )
    peer2.on("all", lambda event, data: print(f"  [peer2 event] {event}")
             if str(event).startswith("sync:") and event != "sync:chunk" else None)

    def peer2_count():
        items = peer2.store.get("items") or {}
        return len(items)

    print("Waiting for sync...")
    t0 = time.time()
    ok = wait_for(lambda: peer2_count() >= args.items, timeout=120)
    print(f"Peer 2 has {peer2_count()}/{args.items} items after "
          f"{time.time() - t0:.1f}s (synced={ok})")
    assert ok

    print("Injecting concurrent conflicting writes...")
    peer1.set_data("conflict/score", 10, broadcast=False)
    peer2.set_data("conflict/score", 99, broadcast=False)
    peer1.network.request_sync()
    peer2.network.request_sync()
    ok = wait_for(
        lambda: peer1.store.get("conflict", {}).get("score")
        == peer2.store.get("conflict", {}).get("score")
        is not None
        or peer1.store.get("conflict", {}).get("score")
        == peer2.store.get("conflict", {}).get("score")
    )
    v1 = peer1.store.get("conflict", {}).get("score")
    v2 = peer2.store.get("conflict", {}).get("score")
    print(f"Converged conflict value: peer1={v1} peer2={v2}")
    assert v1 == v2 == 99  # comparator value-max

    stats = peer2.network.get_sync_stats()
    print("Sync stats:", {k: stats[k] for k in ("totalSyncs", "failedSyncs")})

    peer1.close()
    peer2.close()
    print("Sync example completed")


if __name__ == "__main__":
    main()
