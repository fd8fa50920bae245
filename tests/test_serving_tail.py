"""Bounded serving tail latency (VERDICT r4 item 4): staged bridge writes,
pow2-bucketed flat applies, and the warm_apply_buckets precompile ladder.

The r3 serving p95 (~0.6 s under write flood) had two causes, each pinned
here: (a) the live-bridge forwarder took the view lock per write — a hot
wire thread convoys any query waiting on that lock; (b) every novel
reduced-batch size compiled a fresh XLA apply program mid-query."""

import numpy as np
import pytest

import bullet_tpu as bt
from bullet_tpu.models.bridge import attach_live_bridge
from bullet_tpu.models.netsim import PeerNetworkSim, _pad_flat_ops

LAYOUTS = ["packed", "rank", "rank1"]


def test_pad_flat_ops_shape_and_invariants():
    p, n = 4, 100
    k = 37
    reduced = (
        np.arange(k, dtype=np.int32) % p,       # peer
        np.arange(k, dtype=np.int32),           # slot
        np.full(k, 7, dtype=np.int32),          # rank
    )
    padded = _pad_flat_ops(reduced, p, n)
    assert len(padded[0]) == 64  # next pow2 (>= min bucket)
    # prefix is the original batch, padding is guaranteed-loser rows
    for orig, pad in zip(reduced, padded):
        np.testing.assert_array_equal(pad[:k], orig)
    assert (padded[0][k:] == p - 1).all()
    assert (padded[1][k:] >= n).all()          # out-of-range: scatter drops
    assert (padded[2][k:] == 0).all()          # rank 0 / cls 0 never wins
    # sorted-unique (peer, slot) contract preserved
    pairs = padded[0].astype(np.int64) * (n + 64) + padded[1]
    assert (np.diff(pairs[np.argsort(padded[0], kind="stable")][k:]) > 0).all()
    # exact bucket sizes pass through untouched
    exact = tuple(a[:64] for a in padded)
    assert _pad_flat_ops(exact, p, n) is exact


@pytest.mark.parametrize("layout", LAYOUTS)
def test_varied_batch_sizes_bit_match_one_shot(layout):
    """Applying the same ops in odd-sized chunks (each padded to a
    different bucket) must produce the identical table as one flush."""
    rng = np.random.default_rng(42)
    a = PeerNetworkSim(4, capacity=256, layout=layout)
    b = PeerNetworkSim(4, capacity=256, layout=layout)
    ops = [
        (int(rng.integers(4)), f"d/k{int(rng.integers(40))}",
         float(rng.integers(-50, 50)))
        for _ in range(300)
    ]
    # a: chunked applies with deliberately irregular sizes
    at = 0
    for size in (1, 3, 17, 50, 90, 139):
        for peer, path, val in ops[at: at + size]:
            a.put(peer, path, val)
        a.step(rounds=0)
        at += size
    assert at == len(ops)
    # b: one shot
    for peer, path, val in ops:
        b.put(peer, path, val)
    b.step(rounds=0)
    a.run_until_converged()
    b.run_until_converged()
    assert a.tables_equal() and b.tables_equal()
    if layout == "packed":
        # packed entries are content-addressed: bit-compare directly
        for fa, fb in zip(a.table, b.table):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
    # rank/rank1 bits depend on insert batching (gap allocation), so the
    # invariant is decoded-state equality, not raw rank equality
    assert a.get(0) == b.get(0)


@pytest.mark.parametrize("layout", LAYOUTS)
def test_warm_apply_buckets_state_invariant(layout):
    sim = PeerNetworkSim(2, capacity=128, layout=layout)
    sim.put(0, "x/a", 5)
    sim.put(1, "x/b", "hello")
    sim.step(rounds=0)
    before = [np.asarray(f).copy() for f in sim.table]
    warmed = sim.warm_apply_buckets(1 << 10)
    assert warmed == 5  # 64, 128, 256, 512, 1024
    for f, want in zip(sim.table, before):
        np.testing.assert_array_equal(np.asarray(f), want)
    assert sim.get(0, "x/a") == 5


def test_bridge_staging_read_your_writes():
    """The forwarder stages writes lock-free; every write accepted before
    a view query is visible to that query (refresh="apply")."""
    sim = PeerNetworkSim(2, capacity=512, layout="rank1")
    db = bt.create({"storage": False, "disable_network": True})
    handle = attach_live_bridge(db, sim, peer=0)
    try:
        view = handle.view()
        db.get("users/u1").put({"age": 30, "tags": {"a": 1}})
        assert handle.backlog() == 1
        # nothing touched the sim yet — staged only
        assert sim.get(0, "users/u1") is None
        assert view.get("users/u1") == {"age": 30, "tags": {"a": 1}}
        assert handle.backlog() == 0
        # pump() moves without gossip; flush() converges
        db.get("users/u2").put({"age": 31})
        moved = handle.pump()
        assert moved == 1 and handle.backlog() == 0
        handle.flush()
        assert sim.get(1, "users/u2") == {"age": 31}  # gossiped
        # counts see every acked write
        db.get("users/u3").put({"age": 35})
        assert view.count("users", "age", 31) == 1
        assert view.count("users", "age", 35) == 1
    finally:
        handle.detach()
        db.close()


def test_bridge_staging_dict_decomposition_matches_direct_put():
    """Staged dict values decompose with flatten_value — identical final
    state to mirroring via per-op sim.put (the pre-staging forwarder)."""
    value = {"a": 1, "nested": {"b": "x", "deeper": {"c": None}}, "e": {}}
    staged_sim = PeerNetworkSim(1, capacity=128, layout="rank1")
    db = bt.create({"storage": False, "disable_network": True})
    handle = attach_live_bridge(db, staged_sim, peer=0)
    try:
        db.get("root").put(value)
        handle.flush()
    finally:
        handle.detach()
        db.close()
    direct_sim = PeerNetworkSim(1, capacity=128, layout="rank1")
    direct_sim.put(0, "root", value)
    direct_sim.step(rounds=0)
    assert staged_sim.get(0, "root") == direct_sim.get(0, "root")
