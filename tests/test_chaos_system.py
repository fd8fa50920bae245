"""System-level chaos soak: the whole stack at once.

Three wire-connected db peers take concurrent writes from multiple
threads each (same key space, so the CRT arbitrates constantly), one
peer dies mid-run under traffic, an engine replica live-mirrors another
— and at the end the survivors' stores must be FULLY EQUAL (clocked
sync apply + per-entry error isolation + the stale-dominant re-offer
make anti-entropy converge even type-flapping scalar/dict/delete chaos
— this soak is the regression test for those fixes), and the device
replica must agree exactly on the monotone key space (where the
value-max mirror contract coincides with the db's clock resolution; see
attach_live_bridge's docstring for why type-flapping chaos keys may
differ from the MIRROR).

This is the system-level race-detection analog: the component suites
pin each layer's behavior in isolation; this one exercises the locking,
the flood dedup, anti-entropy, the bridge forwarder, and the CRT under
genuine thread + socket concurrency (reference behavior: concurrent
multi-peer writes converge, bullet-crt.js:164-279 + flood relay
bullet-network.js:332-346)."""

import itertools
import threading
import time

import numpy as np
import pytest

import bullet_tpu as bt
from bullet_tpu.models.bridge import attach_live_bridge
from bullet_tpu.models.netsim import PeerNetworkSim


def _leaves(store, prefix=""):
    out = {}
    for k, v in store.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_leaves(v, p))
        else:
            out[p] = v
    return out


def _divergence_report(peers) -> str:
    """Self-diagnosing soak failure: the per-key value diff plus each
    diverged path's meta (clock + lastModified) on every peer — a stuck
    anti-entropy state is only debuggable from the clocks (this is how
    the leafless-subtree black hole and the subtree-reoffer freeze were
    found), and the soak is too rare-flaky to reproduce on demand."""
    import json

    sets = [_leaves(p.store) for p in peers]
    keys = sorted(set().union(*map(set, sets)))
    lines = []
    for k in keys:
        vals = [s.get(k, "<absent>") for s in sets]
        if any(v != vals[0] for v in vals[1:]):
            lines.append(f"{k}: values={vals!r}")
            roots = {k, k.rsplit("/", 1)[0]}
            for r in sorted(roots):
                metas = [p.meta.get(r) for p in peers]
                lines.append(f"  {r} meta: {json.dumps(metas, default=str)}")
            for i, p in enumerate(peers):
                node = p.store
                for part in k.split("/")[:-1]:
                    node = node.get(part) if isinstance(node, dict) else None
                lines.append(f"  peer{i} parent-node: {node!r}")
    return "\n".join(lines) or "(no per-key diff: store shapes differ)"


def test_chaos_concurrent_writers_peer_death_and_mirror():
    p0 = bt.create({"storage": False, "port": 0, "host": "127.0.0.1"})
    p1 = bt.create({
        "storage": False, "port": 0, "host": "127.0.0.1",
        "peers": [f"tcp://127.0.0.1:{p0.network.port}"],
        "connect_sync_delay": 0.1,
    })
    p2 = bt.create({
        "storage": False, "port": 0, "host": "127.0.0.1",
        "peers": [
            f"tcp://127.0.0.1:{p0.network.port}",
            f"tcp://127.0.0.1:{p1.network.port}",
        ],
        "connect_sync_delay": 0.1,
    })
    sim = PeerNetworkSim(2, capacity=1024, topology="ring", layout="rank1")
    handle = attach_live_bridge(p0, sim, peer=0)
    peers = [p0, p1, p2]
    # the monotone space: every write is a fresh, strictly larger float,
    # so the converged db value per key is the global max — exactly what
    # the value-max mirror serves
    mono_counter = itertools.count(1)
    mono_lock = threading.Lock()
    try:
        time.sleep(0.5)  # let the mesh connect

        stop_p2 = threading.Event()
        errors: list = []

        def writer(peer_idx: int, thread_idx: int) -> None:
            rng = np.random.default_rng(100 * peer_idx + thread_idx)
            try:
                for i in range(120):
                    if peer_idx == 2 and stop_p2.is_set():
                        return  # p2 died under us; its writers stop
                    roll = int(rng.integers(10))
                    if roll < 3:
                        with mono_lock:
                            val = float(next(mono_counter))
                        peers[peer_idx].get(
                            f"mono/m{int(rng.integers(8))}"
                        ).put(val)
                    else:
                        # full chaos: type flapping, delete storms,
                        # subtree puts — all on the shared key space
                        node = peers[peer_idx].get(
                            f"data/k{int(rng.integers(24))}"
                        )
                        if roll == 3:
                            node.put(None)
                        elif roll == 4:
                            node.put({"n": int(rng.integers(1000)),
                                      "s": f"w{peer_idx}.{thread_idx}.{i}"})
                        else:
                            node.put(float(rng.integers(1 << 20)))
                    if i % 40 == 17:
                        time.sleep(0.01)
            except Exception as exc:  # noqa: BLE001 - the soak's assertion
                if not (peer_idx == 2 and stop_p2.is_set()):
                    errors.append((peer_idx, thread_idx, exc))

        threads = [
            threading.Thread(target=writer, args=(pi, ti))
            for pi in range(3) for ti in range(2)
        ]
        for t in threads:
            t.start()
        # peer death under live traffic: p2 closes mid-run while its own
        # writer threads and inbound floods are active
        time.sleep(0.6)
        stop_p2.set()
        p2.close()
        for t in threads:
            t.join(timeout=60)
            assert not t.is_alive(), "writer thread hung"
        assert not errors, errors

        # heal: anti-entropy both ways between the survivors, then poll
        # to store equality (floods already carried most of it). The
        # deadline is generous: a sync request racing the dead peer's
        # teardown can burn a retry cycle before the live pair settles.
        deadline = time.time() + 90
        while time.time() < deadline:
            p0.network.request_sync()
            p1.network.request_sync()
            time.sleep(0.4)
            if _leaves(p0.store) == _leaves(p1.store):
                break
        assert _leaves(p0.store) == _leaves(p1.store), (
            "survivors failed to converge:\n" + _divergence_report([p0, p1])
        )
        leaves = _leaves(p0.store)
        assert leaves, "chaos produced an empty store?"

        # device replica: exact agreement on the monotone space (global
        # max per key on both sides), sane reads on the chaos space
        view = handle.view()
        mono = {p: v for p, v in leaves.items() if p.startswith("mono/")}
        assert mono, "no monotone writes landed?"
        for path, value in mono.items():
            assert view.get(path) == value, (path, view.get(path), value)
        for path in leaves:
            view.get(path)  # must decode without error
    finally:
        handle.detach()
        for p in (p0, p1, p2):
            try:
                p.close()
            except Exception:  # noqa: BLE001 - already closed
                pass


def _free_port() -> int:
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("seed", [0, 1])
def test_chaos_big_mixed_links_partition_and_restart(tmp_path, seed):
    """The scaled soak (VERDICT r4 item 5): 6 peers on MIXED ws:// and
    tcp:// links in a ring+chords topology, concurrent writer threads on
    every peer, a timed wire-layer partition (one peer's links severed
    repeatedly, then healed), and a peer KILLED mid-flood and RESTARTED
    from its file storage with its pinned peer id — ending in full store
    equality across all six, with a device mirror serving the monotone
    space exactly throughout.

    Reference semantics being soaked: flood relay bullet-network.js:332-346,
    anti-entropy bullet-network-sync.js:551-569, restart-restore
    bullet-file-storage.js:96-163 + clock resume from persisted meta."""
    num = 6
    ports = [_free_port() for _ in range(num)]
    restart_id = "e3b0c442-98fc-4b61-b26a-chaos-restart"  # pinned for resume

    def make(i: int, with_storage: bool):
        # ring + two chords; alternate framing per dial so both wire
        # protocols carry chaos traffic (the server auto-detects inbound)
        targets = [(i - 1) % num]
        if i == 0:
            targets.append(3)
        if i == 2:
            targets.append(5)
        urls = [
            ("ws" if (i + j) % 2 else "tcp") + f"://127.0.0.1:{ports[j]}"
            for j in targets
        ]
        opts = {
            "port": ports[i], "host": "127.0.0.1", "peers": urls,
            "connect_sync_delay": 0.1,
        }
        if with_storage:
            opts.update({
                "storage": True, "storage_path": str(tmp_path / "p4"),
                "save_interval": 0.3, "peer_id": restart_id,
            })
        else:
            opts["storage"] = False
        return bt.create(opts)

    peers = [make(i, with_storage=(i == 4)) for i in range(num)]
    sim = PeerNetworkSim(2, capacity=2048, topology="ring", layout="rank1")
    handle = attach_live_bridge(peers[0], sim, peer=0)
    mono_counter = itertools.count(1)
    mono_lock = threading.Lock()
    dead = threading.Event()  # p4 down
    part_stop = threading.Event()
    errors: list = []

    def writer(peer_idx: int, thread_idx: int) -> None:
        rng = np.random.default_rng(1000 * seed + 10 * peer_idx + thread_idx)
        try:
            for i in range(80):
                if peer_idx == 4 and dead.is_set():
                    return
                roll = int(rng.integers(10))
                try:
                    if roll < 3:
                        with mono_lock:
                            val = float(next(mono_counter))
                        peers[peer_idx].get(
                            f"mono/m{int(rng.integers(8))}"
                        ).put(val)
                    elif roll == 3:
                        peers[peer_idx].get(
                            f"data/k{int(rng.integers(24))}"
                        ).put(None)
                    elif roll == 4:
                        peers[peer_idx].get(
                            f"data/k{int(rng.integers(24))}"
                        ).put({"n": int(rng.integers(1000)),
                               "s": f"w{peer_idx}.{thread_idx}.{i}"})
                    else:
                        peers[peer_idx].get(
                            f"data/k{int(rng.integers(24))}"
                        ).put(float(rng.integers(1 << 20)))
                except Exception:
                    if not (peer_idx == 4 and dead.is_set()):
                        raise
                if i % 25 == 11:
                    time.sleep(0.01)
        except Exception as exc:  # noqa: BLE001 - the soak's assertion
            errors.append((peer_idx, thread_idx, exc))

    def sever_p3() -> None:
        # wire-layer partition: keep cutting p3's links until healed
        while not part_stop.is_set():
            for conn in list(peers[3].network.peers.values()):
                try:
                    conn.close()
                except Exception:  # noqa: BLE001 - racing teardown
                    pass
            time.sleep(0.15)

    try:
        time.sleep(0.8)  # mesh connect
        threads = [
            threading.Thread(target=writer, args=(pi, ti))
            for pi in range(num) for ti in range(2)
        ]
        for t in threads:
            t.start()

        # timed partition of p3 under live traffic
        part = threading.Thread(target=sever_p3)
        part.start()

        # kill p4 mid-flood (its storage keeps the pre-kill state)
        time.sleep(0.6)
        dead.set()
        peers[4].close()

        # heal the partition
        time.sleep(0.8)
        part_stop.set()
        part.join(timeout=10)

        # restart p4 from disk with the same port + peer id: file load +
        # clock resume, then reconnects and anti-entropy pull it level
        peers[4] = make(4, with_storage=True)
        assert peers[4].store, "restart lost the persisted store"

        for t in threads:
            t.join(timeout=90)
            assert not t.is_alive(), "writer thread hung"
        assert not errors, errors

        deadline = time.time() + 150
        last = None
        while time.time() < deadline:
            for p in peers:
                p.network.request_sync()
            time.sleep(0.5)
            last = [_leaves(p.store) for p in peers]
            if all(s == last[0] for s in last[1:]):
                break
        assert all(s == last[0] for s in last[1:]), (
            "peers failed to converge after partition+restart: sizes "
            + str([len(s) for s in last]) + "\n" + _divergence_report(peers)
        )
        leaves = last[0]
        assert leaves, "chaos produced an empty store?"

        # device mirror: exact on the monotone space, decodable everywhere
        view = handle.view()
        mono = {p: v for p, v in leaves.items() if p.startswith("mono/")}
        assert mono, "no monotone writes landed?"
        for path, value in mono.items():
            assert view.get(path) == value, (path, view.get(path), value)
        for path in leaves:
            view.get(path)
    finally:
        handle.detach()
        for p in peers:
            try:
                p.close()
            except Exception:  # noqa: BLE001 - already closed
                pass
