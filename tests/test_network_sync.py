"""Real two-peer networking: flood, dedup/TTL, anti-entropy sync, convergence
(reference: /root/reference/src/bullet-network.js, bullet-network-sync.js;
workload shape mirrors examples/bullet-sync-example.js)."""

import time

import pytest

import bullet_tpu as bt


def make_peer(**over):
    opts = {
        "storage": False,
        "host": "127.0.0.1",
        "port": 0,
        "connect_sync_delay": 0.05,
        "reconnect_interval": 0.5,
    }
    opts.update(over)
    return bt.create(opts)


def wait_for(predicate, timeout=15.0, interval=0.05):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(interval)
    return False


@pytest.fixture
def pair():
    p1 = make_peer()
    p2 = make_peer(peers=[f"tcp://127.0.0.1:{p1.network.port}"])
    assert wait_for(lambda: p1.network.peers and p2.network.peers, 10)
    yield p1, p2
    p1.close()
    p2.close()


def test_handshake_establishes_link(pair):
    p1, p2 = pair
    assert p2.id in p1.network.peers
    assert p1.id in p2.network.peers


def test_flood_put_both_directions(pair):
    p1, p2 = pair
    p1.get("a/b").put({"v": 1})
    p2.get("c/d").put({"v": 2})
    assert wait_for(lambda: p2.store.get("a", {}).get("b") == {"v": 1})
    assert wait_for(lambda: p1.store.get("c", {}).get("d") == {"v": 2})


def test_initial_sync_transfers_preexisting_data(pair):
    p1, p2 = pair
    # p1 had data before p2 connected? add before requesting a fresh sync
    for i in range(120):  # > 2 chunks at chunk_size 50
        p1.set_data(f"items/item{i}", {"n": i}, broadcast=False)
    p2.network.request_sync()
    assert wait_for(
        lambda: len(p2.store.get("items", {})) == 120, timeout=20
    ), f"only {len(p2.store.get('items', {}))} items synced"


def test_conflicting_writes_converge(pair):
    p1, p2 = pair
    p1.set_data("k/v", 10, broadcast=False)
    p2.set_data("k/v", 99, broadcast=False)
    p1.network.request_sync()
    p2.network.request_sync()
    assert wait_for(
        lambda: p1.store.get("k", {}).get("v") == p2.store.get("k", {}).get("v")
        and p1.store.get("k", {}).get("v") is not None
    )
    assert p1.store["k"]["v"] == 99  # comparator value-max


def test_sync_stats(pair):
    p1, p2 = pair
    p1.get("s/x").put(1)
    p2.network.request_sync()
    assert wait_for(lambda: p2.network.get_sync_stats()["totalSyncs"] >= 1)
    stats = p2.network.get_sync_stats()
    assert p1.id in stats["peers"]
    assert stats["failedSyncs"] == 0


def test_sync_events(pair):
    p1, p2 = pair
    events = []
    p2.network.on("sync:complete", lambda d: events.append(d))
    p1.get("e/x").put(1)
    p2.network.request_sync()
    assert wait_for(lambda: len(events) >= 1)


def test_three_peer_relay():
    """Chain p1 - p2 - p3: a put at p1 must relay through p2 to p3 (TTL flood,
    bullet-network.js:378-396)."""
    p1 = make_peer()
    p2 = make_peer(peers=[f"tcp://127.0.0.1:{p1.network.port}"])
    p3 = make_peer(peers=[f"tcp://127.0.0.1:{p2.network.port}"])
    try:
        assert wait_for(lambda: len(p2.network.peers) == 2 and p3.network.peers)
        p1.get("relay/msg").put({"hop": 1})
        assert wait_for(lambda: p3.store.get("relay", {}).get("msg") == {"hop": 1})
    finally:
        for p in (p1, p2, p3):
            p.close()


def test_self_connection_rejected():
    p1 = make_peer()
    try:
        # dialing ourselves must not create a peer entry
        p1.network._connect_to_peer(f"tcp://127.0.0.1:{p1.network.port}")
        time.sleep(0.5)
        assert p1.id not in p1.network.peers
    finally:
        p1.close()


def test_connection_handler_rejects():
    p1 = make_peer(connection_handler=lambda headers, sock, peer_id: False)
    p2 = make_peer(peers=[f"tcp://127.0.0.1:{p1.network.port}"])
    try:
        time.sleep(1.0)
        assert not p1.network.peers
    finally:
        p1.close()
        p2.close()


def test_prepare_connection_headers():
    received = {}

    def handler(headers, sock, peer_id):
        received.update(headers)
        return True

    p1 = make_peer(connection_handler=handler)
    p2 = make_peer(
        peers=[f"tcp://127.0.0.1:{p1.network.port}"],
        prepare_connection_headers=lambda url: {"auth": "token123"},
    )
    try:
        assert wait_for(lambda: received.get("auth") == "token123")
        assert received["x-peer-id"] == p2.id
    finally:
        p1.close()
        p2.close()


def test_scalar_put_over_network(pair):
    """Scalar wire payloads carry no __fromNetwork tag (bullet-network.js:339-344)."""
    p1, p2 = pair
    p1.get("nums/x").put(7)
    assert wait_for(lambda: p2.store.get("nums", {}).get("x") == 7)


def test_sync_watermark_covers_writes_during_collection():
    """Anti-entropy watermark: a write landing on the responder WHILE it is
    collecting/sending a sync must be picked up by the NEXT sync. The
    reference stamps the requester's finish time as `since`
    (bullet-network-sync.js:402), which permanently skips such writes
    (divergence fixed like Q1): the responder now sends its collection-start
    time and the requester uses it as the watermark."""
    # auto-sync disabled: the race window must be driven manually
    p1 = make_peer(connect_sync_delay=1000)
    p2 = make_peer(peers=[f"tcp://127.0.0.1:{p1.network.port}"],
                   connect_sync_delay=1000)
    assert wait_for(lambda: p1.network.peers and p2.network.peers, 10)
    sync1 = p1.network.sync

    orig_collect = sync1._collect_sync_data

    def racing_collect(since, partial, paths):
        entries = orig_collect(since, partial, paths)
        # a write lands after collection but before sync-complete: the
        # transfer misses it, the watermark must not
        p1.set_data("raced/key", "late-write", broadcast=False)
        return entries

    sync1._collect_sync_data = racing_collect
    p2.network.request_sync()
    assert wait_for(
        lambda: p2.network.sync._peer_state(p1.id)["status"] == "complete"
    )
    sync1._collect_sync_data = orig_collect
    assert p2.store.get("raced") is None  # indeed missed by the first sync

    time.sleep(0.01)  # the raced write must be strictly inside the window
    p2.network.request_sync()
    try:
        assert wait_for(
            lambda: p2.store.get("raced", {}).get("key") == "late-write"
        ), "incremental sync skipped the write raced against collection"
    finally:
        p1.close()
        p2.close()


def test_lost_chunk_recovers_instead_of_wedging():
    """Code-review r2 (liveness): a dropped mid-transfer chunk used to loop
    resume requests forever (attempts never incremented, the responder's
    resume ack restarts a sync in the REVERSE direction). Now one resume
    attempt is tried, then a full re-request recovers the sync."""
    p1 = make_peer(connect_sync_delay=1000)
    p2 = make_peer(peers=[f"tcp://127.0.0.1:{p1.network.port}"],
                   connect_sync_delay=1000,
                   initial_sync_timeout=0.6, retry_interval=0.2,
                   max_sync_attempts=4)
    try:
        assert wait_for(lambda: p1.network.peers and p2.network.peers, 10)
        for i in range(120):  # 3 chunks at chunk_size 50
            p1.set_data(f"items/item{i}", {"n": i}, broadcast=False)

        sync2 = p2.network.sync
        orig = sync2._handle_sync_chunk
        dropped = []

        def dropping(peer_id, message):
            if message.get("chunkIndex") == 1 and not dropped:
                dropped.append(message["id"])
                return  # lose the middle chunk of the first transfer
            return orig(peer_id, message)

        sync2._handle_sync_chunk = dropping
        p2.network.request_sync()
        assert wait_for(
            lambda: len(p2.store.get("items", {})) == 120, timeout=20
        ), (f"sync wedged: {len(p2.store.get('items', {}))} items, "
            f"state={sync2._peer_state(p1.id)['status']}")
        assert sync2._peer_state(p1.id)["status"] == "complete"
    finally:
        p1.close()
        p2.close()


def test_tombstone_at_watermark_propagates():
    """Deletes stamped exactly at the since watermark must still sync
    (the live-entry filter re-sends at == since; tombstones now match).

    The tombstone is crafted DOMINANT (clock strictly above the state it
    deletes): under clocked sync apply, deletes win by clock dominance
    and lose concurrent battles by value — a tombstone with a merely
    equal clock would (correctly) lose to the live 5."""
    p1 = make_peer(connect_sync_delay=1000)
    p2 = make_peer(peers=[f"tcp://127.0.0.1:{p1.network.port}"],
                   connect_sync_delay=1000)
    try:
        assert wait_for(lambda: p1.network.peers and p2.network.peers, 10)
        p1.set_data("doomed/x", 5, broadcast=False)
        p2.network.request_sync()
        assert wait_for(lambda: p2.store.get("doomed", {}).get("x") == 5)
        # tombstone the entry with lastModified EXACTLY at p2's watermark
        # and a clock that DOMINATES the replicated state
        state = p2.network.sync._peer_state(p1.id)
        p1.store["doomed"]["x"] = None
        clock = {**p1.meta["doomed/x"]["vectorClock"]}
        clock[p1.id] = clock.get(p1.id, 0) + 1
        p1.meta["doomed/x"] = {
            **p1.meta["doomed/x"],
            "vectorClock": clock,
            "deleted": True,
            "lastModified": state["last_sync_time_ms"],
        }
        p2.store["doomed"]["x"] = 5  # simulate divergence to repair
        p2.network.request_sync()
        assert wait_for(
            lambda: p2.store.get("doomed", {}).get("x") is None, timeout=10
        ), p2.store.get("doomed")
    finally:
        p1.close()
        p2.close()


def test_network_churn_stress():
    """Lifecycle stress: peers joining, writing, dying mid-sync, and
    rejoining must leave the survivors consistent and the sync state
    machines unwedged (reconnect + retry + anti-entropy together)."""
    hub = make_peer(connect_sync_delay=0.05)
    hub_url = f"tcp://127.0.0.1:{hub.network.port}"
    survivors = [hub]
    try:
        # wave 1: three peers join, write, and confirm convergence
        wave1 = [make_peer(peers=[hub_url], connect_sync_delay=0.05)
                 for _ in range(3)]
        survivors += wave1
        assert wait_for(lambda: len(hub.network.peers) == 3, 10)
        for i, p in enumerate(wave1):
            p.get(f"w1/p{i}").put(i + 1)
        assert wait_for(lambda: all(
            len(p.store.get("w1", {})) == 3 for p in survivors
        ), 15), {id(p): p.store.get("w1") for p in survivors}

        # one peer dies abruptly mid-activity
        victim = wave1.pop()
        survivors.remove(victim)
        victim.get("w1/dying").put("gone")
        victim.network.server_socket.close()
        for conn in list(victim.network.peers.values()):
            conn.socket.close()  # abrupt: no goodbye
        victim.close()
        assert wait_for(lambda: len(hub.network.peers) == 2, 10)

        # survivors keep working
        hub.get("w2/after").put(42)
        assert wait_for(lambda: all(
            p.store.get("w2", {}).get("after") == 42 for p in survivors
        ))

        # a new peer joins later and anti-entropy catches it up fully
        late = make_peer(peers=[hub_url], connect_sync_delay=0.05)
        survivors.append(late)
        assert wait_for(lambda: len(late.store.get("w1", {})) >= 3
                        and late.store.get("w2", {}).get("after") == 42, 15), \
            late.store
        stats = late.network.get_sync_stats()
        assert stats["failedSyncs"] == 0
    finally:
        for p in survivors:
            p.close()


def test_clocked_scalar_sync_converges_concurrent_values():
    """Concurrent scalar writes on two peers converge through mutual
    anti-entropy to the SAME value on both sides (value resolution under
    the entries' own clocks). The reference applies non-object sync
    entries as clockless LOCAL writes (bullet-network-sync.js:551-569),
    so each direction bulldozes the other and the pair ping-pongs
    forever — fixed via the per-entry vectorClock already on the wire."""
    p1 = make_peer(connect_sync_delay=1000)
    p2 = make_peer(peers=[f"tcp://127.0.0.1:{p1.network.port}"],
                   connect_sync_delay=1000)
    try:
        assert wait_for(lambda: p1.network.peers and p2.network.peers, 10)
        # concurrent: neither clock knows the other
        p1.set_data("s/x", 7.0, broadcast=False)
        p2.set_data("s/x", 9.0, broadcast=False)
        p1.set_data("s/y", 3.0, broadcast=False)
        p2.set_data("s/y", 1.0, broadcast=False)
        for _ in range(2):
            p2.network.request_sync()
            assert wait_for(
                lambda: p2.network.sync._peer_state(p1.id)["status"]
                == "complete", 10)
            p1.network.request_sync()
            assert wait_for(
                lambda: p1.network.sync._peer_state(p2.id)["status"]
                == "complete", 10)
        assert wait_for(
            lambda: p1.store.get("s") == p2.store.get("s"), 10
        ), (p1.store.get("s"), p2.store.get("s"))
        # concurrent resolution is by value — the larger write wins
        assert p1.store["s"]["x"] == 9.0
        assert p1.store["s"]["y"] == 3.0
    finally:
        p1.close()
        p2.close()


def test_sync_historical_scalar_does_not_regress():
    """A historical (clock-dominated) scalar entry must NOT overwrite
    newer local state — and the losing entry bumps the path's
    lastModified so the stale sender gets the winning value re-offered
    on ITS next pull even though its watermark postdates the write."""
    p1 = make_peer(connect_sync_delay=1000)
    p2 = make_peer(peers=[f"tcp://127.0.0.1:{p1.network.port}"],
                   connect_sync_delay=1000)
    try:
        assert wait_for(lambda: p1.network.peers and p2.network.peers, 10)
        p1.set_data("h/x", 5.0, broadcast=False)
        p2.network.request_sync()
        assert wait_for(lambda: p2.store.get("h", {}).get("x") == 5.0)
        # p2 writes causally AFTER (its clock descends from p1's entry —
        # first-contact adoption makes this real dominance, not the
        # reference's fresh-self-clock concurrency)
        p2.set_data("h/x", 2.0, broadcast=False)
        before = p2.meta["h/x"]["lastModified"]
        # p2 pulls p1's now-historical 5.0: must keep 2.0
        last = p2.network.sync._peer_state(p1.id)["last_sync_time"]
        p2.network.request_sync()
        assert wait_for(
            lambda: p2.network.sync._peer_state(p1.id)["last_sync_time"]
            > last, 10)
        assert p2.store["h"]["x"] == 2.0
        # ...and the losing entry touched lastModified for re-offer
        assert p2.meta["h/x"]["lastModified"] >= before
        # the stale peer converges by pulling
        p1.network.request_sync()
        assert wait_for(lambda: p1.store.get("h", {}).get("x") == 2.0, 10)
    finally:
        p1.close()
        p2.close()


def test_sync_subtree_vs_scalar_conflict_converges():
    """A child leaf arriving where the local ancestor is a SCALAR (the
    Q3 strict-mode TypeError) resolves at the collision point by clock:
    concurrent → the scalar wins on BOTH sides (the dict side adopts it
    through the normal decision table), dominant entry → the scalar is
    superseded and the subtree installs. Either way the chunk's later
    entries still apply."""
    p1 = make_peer(connect_sync_delay=1000)
    p2 = make_peer(peers=[f"tcp://127.0.0.1:{p1.network.port}"],
                   connect_sync_delay=1000)
    try:
        assert wait_for(lambda: p1.network.peers and p2.network.peers, 10)
        # CONCURRENT: p2 scalar vs p1 subtree at conflict/k
        p2.set_data("conflict/k", 123456789.0, broadcast=False)
        p1.set_data("aa/first", 1.0, broadcast=False)
        p1.set_data("conflict/k", {"n": 1, "s": "sub"}, broadcast=False)
        p1.set_data("zz/last", 2.0, broadcast=False)
        p2.network.request_sync()
        assert wait_for(lambda: p2.store.get("zz", {}).get("last") == 2.0, 10), (
            "entries after the collision were lost"
        )
        assert p2.store.get("aa", {}).get("first") == 1.0
        # concurrent → the scalar stays at p2...
        assert p2.store["conflict"]["k"] == 123456789.0
        assert p2.network.sync.entry_errors == 0
        # ...and the dict side ADOPTS it on its own pull: converged
        p1.network.request_sync()
        assert wait_for(
            lambda: p1.store.get("conflict", {}).get("k") == 123456789.0, 10
        ), p1.store.get("conflict")

        # DOMINANT: p1 overwrites with a subtree whose clock now
        # descends from the scalar — the scalar side must install it
        p1.set_data("conflict/k", {"n": 2, "s": "dom"}, broadcast=False)
        p2.network.request_sync()
        assert wait_for(
            lambda: p2.store.get("conflict", {}).get("k")
            == {"n": 2, "s": "dom"}, 10
        ), p2.store.get("conflict")
    finally:
        p1.close()
        p2.close()


def test_sync_chunk_poisoned_entry_isolated_clockless():
    """clocked_sync_apply=False (reference apply): the collision cannot
    be clock-resolved, so it is counted and surfaced — and must still
    not lose the REST of the chunk (the reference's unguarded loop
    aborts mid-chunk while the watermark advances)."""
    p1 = make_peer(connect_sync_delay=1000)
    p2 = make_peer(peers=[f"tcp://127.0.0.1:{p1.network.port}"],
                   connect_sync_delay=1000, clocked_sync_apply=False)
    try:
        assert wait_for(lambda: p1.network.peers and p2.network.peers, 10)
        p2.set_data("conflict/k", 123456789.0, broadcast=False)
        p1.set_data("aa/first", 1.0, broadcast=False)
        p1.set_data("conflict/k", {"n": 1, "s": "sub"}, broadcast=False)
        p1.set_data("zz/last", 2.0, broadcast=False)
        errors = []
        p2.network.on("sync:entry-error", lambda e: errors.append(e))
        p2.network.request_sync()
        assert wait_for(lambda: p2.store.get("zz", {}).get("last") == 2.0, 10), (
            "entries after the poisoned one were lost"
        )
        assert p2.store.get("aa", {}).get("first") == 1.0
        assert p2.network.sync.entry_errors >= 1
        assert p2.network.sync.get_sync_stats()["entryErrors"] >= 1
        assert errors and errors[0]["path"].startswith("conflict/k/")
    finally:
        p1.close()
        p2.close()


def test_clocked_sync_apply_switch():
    """clocked_sync_apply=False restores the reference's clockless
    application of scalar sync entries: the applied path's clock is a
    fresh SELF-stamp (only the local peer id — causality erased, the
    reference-exact quirk), where the default mode adopts the entry's
    clock (the sender's id) so later deletes/overwrites can dominate."""
    p1 = make_peer(connect_sync_delay=1000)
    p2 = make_peer(peers=[f"tcp://127.0.0.1:{p1.network.port}"],
                   connect_sync_delay=1000, clocked_sync_apply=False)
    p3 = make_peer(peers=[f"tcp://127.0.0.1:{p1.network.port}"],
                   connect_sync_delay=1000)
    try:
        assert wait_for(lambda: len(p1.network.peers) == 2
                        and p2.network.peers and p3.network.peers, 10)
        p1.set_data("r/x", 5.0, broadcast=False)
        p2.network.request_sync()
        p3.network.request_sync()
        assert wait_for(lambda: p2.store.get("r", {}).get("x") == 5.0, 10)
        assert wait_for(lambda: p3.store.get("r", {}).get("x") == 5.0, 10)
        # reference mode: fresh self-clock, sender's causality erased
        assert set(p2.meta["r/x"]["vectorClock"]) == {p2.id}
        # fixed mode: the entry's clock is adopted verbatim
        assert set(p3.meta["r/x"]["vectorClock"]) == {p1.id}
    finally:
        p1.close()
        p2.close()
        p3.close()


def test_subtree_winner_reoffers_after_scalar_loss(pair):
    """The frozen-split regression the system chaos soak uncovered: when
    a replicated SCALAR loses to a local SUBTREE winner, the loser-touch
    lands on the subtree ROOT's meta — which is not a store leaf — so a
    leaf-lastModified-only ``since`` filter would never re-offer the
    winning child leaves, and the scalar holder stays diverged forever
    (4-vs-2 stable split, 300 anti-entropy rounds no-op). The collection
    filter must be ancestor-aware: a touch anywhere above a leaf lifts
    it over the watermark."""
    p1, p2 = pair

    # p2: the dominant subtree winner — child leaves with clock {w: 2}
    # and ANCIENT lastModified (behind every watermark), plus a root
    # meta whose clock dominates the scalar's
    p2.set_data("data/k/n", 1, broadcast=False, incoming_clock={"w": 2})
    p2.set_data("data/k/s", 2, broadcast=False, incoming_clock={"w": 2})
    with p2._lock:
        for leaf in ("data/k/n", "data/k/s"):
            p2.meta[leaf] = {**p2.meta[leaf], "lastModified": 1000}
        p2.meta["data/k"] = {"vectorClock": {"w": 2}, "lastModified": 1000}
        p2.crt.vector_clocks["data/k"] = {"w": 2}

    # both watermarks postdate the subtree's stamps: without the
    # ancestor-aware filter, n/s can never be offered to p1 again
    now_ms = int(time.time() * 1000)
    for requester, responder in ((p1, p2), (p2, p1)):
        st = requester.network.sync._peer_state(responder.id)
        st["last_sync_time_ms"] = now_ms

    # p1: the dominated scalar (clock {w: 1}), lastModified AFTER the
    # watermarks — it still flows to p2, loses there, and the loser-touch
    # lands on data/k (the subtree root, not a store leaf)
    time.sleep(0.01)
    p1.set_data("data/k", None, broadcast=False, incoming_clock={"w": 1})

    def k(bullet):
        # direct store probe: a _get_data read would AUTOVIVIFY through
        # the scalar (Q3 reads-are-writes) and perturb the very state
        # under test
        return bullet.store.get("data", {}).get("k")

    def converged():
        # p2 pulls p1's fresh scalar (it loses, touching data/k's meta);
        # p1 pulls p2's subtree (admitted only via the ancestor touch)
        p2.network.request_sync(p1.id)
        p1.network.request_sync(p2.id)
        time.sleep(0.2)
        return k(p1) == {"n": 1, "s": 2} and k(p2) == {"n": 1, "s": 2}

    assert wait_for(converged, 20), (
        "subtree winner was never re-offered: p1 data/k="
        + repr(k(p1)) + " p2 data/k=" + repr(k(p2))
    )


def test_falsy_scalar_ancestor_resolves_by_clock(pair):
    """A child-leaf sync entry whose local ancestor is a FALSY scalar
    (None) must clock-resolve like the truthy-TypeError case — NOT slip
    through the vivifying read and win unconditionally. Concurrent
    clocks: the scalar stays (and the dict side of the same conflict
    adopts the scalar, so both replicas converge); dominant entry clock:
    the scalar clears and the leaf applies."""
    p1, p2 = pair

    # concurrent: scalar None (clock {a: 1}) vs leaf (clock {b: 1})
    p1.set_data("c/k", None, broadcast=False, incoming_clock={"a": 1})
    p1.network.sync._process_sync_entries(
        [{"path": "c/k/n", "data": 7, "vectorClock": {"b": 1},
          "lastModified": 1, "deleted": False}], "test-peer",
    )
    assert p1.store["c"]["k"] is None, "concurrent leaf must not vivify over the scalar"

    # dominant: leaf clock descends from the scalar's ({a: 2} > {a: 1})
    p1.network.sync._process_sync_entries(
        [{"path": "c/k/n", "data": 9, "vectorClock": {"a": 2},
          "lastModified": 2, "deleted": False}], "test-peer",
    )
    assert p1.store["c"]["k"] == {"n": 9}, p1.store["c"]

    # the dict side of the concurrent conflict adopts the scalar
    # (incomparable favors incoming), matching the scalar side's keep
    p2.set_data("c/k/n", 7, broadcast=False, incoming_clock={"b": 1})
    p2.network.sync._process_sync_entries(
        [{"path": "c/k", "data": None, "vectorClock": {"a": 1},
          "lastModified": 3, "deleted": False}], "test-peer",
    )
    assert p2.store["c"]["k"] is None, p2.store["c"]
