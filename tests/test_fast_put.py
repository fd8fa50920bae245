"""Scalar-put fast path (netsim._put_scalar_fast): identical semantics to
the full path, just memoized — VERDICT r2 #5.

Reference shape: the scalar ``node.put()`` write loop
/root/reference/src/bullet.js:700-703.
"""

import numpy as np

from bullet_tpu.models.netsim import PeerNetworkSim


def _converged_state(sim):
    sim.run_until_converged()
    assert sim.tables_equal()
    return [np.asarray(f).copy() for f in sim.table]


def test_fast_path_matches_slow_path_state():
    """Same puts through the fast path and through the full path (forced by
    a no-op traced hook) must land bit-identical converged tables."""
    def load(sim):
        for i in range(300):
            sim.put(i % 8, f"a/u{i % 40}/x", i * 1.25)
            sim.put(i % 8, f"a/u{i % 40}/s", f"v{i % 17}")
        sim.put(0, "a/nan", float("nan"))
        sim.put(1, "a/none", None)
        sim.put(2, "a/bool", True)
        sim.put(3, "a/neg", -0.0)
        sim.put(4, "a/int", 5)
        sim.put(5, "a/intf", 5.0)  # must collide with the int encoding

    fast = PeerNetworkSim(8, capacity=1024, topology="ring", layout="packed")
    assert fast._fast_put_ok
    load(fast)
    want = _converged_state(fast)

    slow = PeerNetworkSim(8, capacity=1024, topology="ring", layout="packed")
    slow._fast_put_ok = False  # force the classic flatten/encode path
    load(slow)
    got = _converged_state(slow)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)


def test_registration_disables_fast_path():
    sim = PeerNetworkSim(4, capacity=256, topology="ring", layout="packed")
    assert sim._fast_put_ok
    sim.on_event("write", lambda *a: None)
    assert not sim._fast_put_ok
    sim2 = PeerNetworkSim(4, capacity=256, topology="ring", layout="packed")
    sim2.define_schema("s", {"properties": {"name": {"type": "string"}}})
    sim2.apply_schema("users", "s")
    assert not sim2._fast_put_ok
    # schema actually enforces on scalar puts after binding
    assert sim2.put(0, "users/u1/name", "ok")
    assert not sim2.put(0, "users/u1/name", 42)


def test_string_cache_survives_rebalance():
    """String encodings re-rank when the order-statistic tree rebalances;
    the cache must never serve stale (khi, klo)."""
    sim = PeerNetworkSim(4, capacity=4096, topology="ring", layout="packed")
    # interleave cached re-puts with novel strings that force rebalances
    for i in range(1500):
        sim.put(i % 4, f"s/k{i % 31}", "pivot")  # the cached hot value
        sim.put(i % 4, f"s/n{i}", f"z{i:05d}")  # novel -> tree inserts
    sim.run_until_converged()
    assert sim.tables_equal()
    assert sim.get(3, "s/k5") == "pivot"


def test_fast_path_dict_values_still_decompose():
    sim = PeerNetworkSim(4, capacity=256, topology="ring", layout="packed")
    sim.put(0, "obj", {"a": 1, "b": {"c": "two"}})
    sim.run_until_converged()
    assert sim.get(2, "obj/a") == 1
    assert sim.get(1, "obj/b/c") == "two"


def test_fast_path_lamport_monotone_with_bulk():
    """Scalar (list-shadow clock) and bulk (np clock) stamping interleave
    without ever reusing a counter."""
    sim = PeerNetworkSim(4, capacity=1024, topology="ring", mode="lww")
    sim.put(0, "m/x", 1)
    slots = sim.host.intern_batch([f"m/b{i}" for i in range(10)])
    sim.put_bulk(np.zeros(10, np.int32), slots,
                 np.arange(10).astype(np.float64))
    sim.put(0, "m/x", 2)  # must out-stamp everything before it
    sim.run_until_converged()
    assert sim.get(3, "m/x") == 2
    # the list shadow and the np clock agree after the vectorized boundary
    assert sim._clock_list == list(map(int, sim._clock))
