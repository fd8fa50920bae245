"""Bulk ingestion (put_bulk) and vectorized number encoding."""

import math

import numpy as np

from bullet_tpu.models.netsim import PeerNetworkSim
from bullet_tpu.utils.encode import ValueInterner, bulk_encode_numbers, number_key, number_keys_np


def test_number_keys_np_matches_scalar():
    rng = np.random.default_rng(0)
    values = np.concatenate(
        [
            rng.uniform(-1e12, 1e12, 200),
            [0.0, -0.0, math.inf, -math.inf, math.nan, 1e-300, -1e-300],
        ]
    )
    khi, klo = number_keys_np(values)
    for i, v in enumerate(values):
        skhi, sklo = number_key(float(v))
        assert (khi[i], klo[i]) == (skhi, sklo), v


def test_bulk_encode_numbers_interning():
    interner = ValueInterner()
    values = np.asarray([5.0, 2.5, 5.0, -1.0, 2.5])
    cls, khi, klo, vid = bulk_encode_numbers(interner, values)
    assert vid[0] == vid[2] and vid[1] == vid[4]
    assert interner.decode(int(vid[0])) == 5
    assert interner.decode(int(vid[1])) == 2.5
    # agrees with scalar encode
    s = interner.encode(5)
    assert (s[0], s[1], s[2], s[3]) == (cls[0], khi[0], klo[0], vid[0])


def test_put_bulk_equivalent_to_put():
    rng = np.random.default_rng(1)
    peers = rng.integers(0, 8, size=200).astype(np.int32)
    keys = rng.integers(0, 16, size=200)
    values = rng.integers(0, 1000, size=200).astype(np.float64)
    paths = [f"d/k{int(k)}" for k in keys]

    sim_a = PeerNetworkSim(8, capacity=64, topology="ring")
    for p, path, v in zip(peers, paths, values):
        sim_a.put(int(p), path, float(v) if v != int(v) else int(v))
    sim_a.run_until_converged()

    sim_b = PeerNetworkSim(8, capacity=64, topology="ring")
    sim_b.put_bulk(peers, paths, values)
    sim_b.run_until_converged()

    assert sim_a.get(0, "d") == sim_b.get(0, "d")
    assert sim_b.tables_equal()


def test_put_bulk_with_slot_ids_and_mixed_batches():
    sim = PeerNetworkSim(4, capacity=64, topology="mesh")
    slots = np.asarray(
        [sim.intern_path(f"m/k{i}") for i in range(8)], dtype=np.int32
    )
    sim.put(0, "m/k0", 5)  # scalar put in the same step
    sim.put_bulk(
        np.asarray([1, 2, 3, 1]), slots[[0, 1, 2, 3]], np.asarray([9, 7, 3, 1])
    )
    sim.run_until_converged()
    assert sim.get(0, "m/k0") == 9  # bulk 9 beats scalar 5
    assert sim.get(3, "m/k1") == 7
    assert sim.tables_equal()


def test_put_bulk_nonnumeric_fallback():
    sim = PeerNetworkSim(2, capacity=32, topology="ring")
    sim.put_bulk(
        np.asarray([0, 1, 0]),
        ["a", "b", "c"],
        ["hello", None, [1, 2]],
    )
    sim.run_until_converged()
    assert sim.get(1, "a") == "hello"
    assert sim.get(0, "b") is None or sim.get(0, "b") == {}  # null leaf
    assert sim.get(1, "c") == [1, 2]


def test_put_bulk_lww_ordering():
    sim = PeerNetworkSim(2, capacity=32, topology="ring", mode="lww")
    sim.put_bulk(np.asarray([0, 0, 0]), ["x", "x", "x"], np.asarray([9, 5, 2]))
    sim.run_until_converged()
    assert sim.get(1, "x") == 2  # last in batch has the highest Lamport stamp


def test_put_bulk_scalar_peer_broadcast(cpu_sim_factory=None):
    """A single int peer loads every row into that peer (the common
    one-peer data-loader case)."""
    import numpy as np

    from bullet_tpu.models.netsim import PeerNetworkSim

    sim = PeerNetworkSim(4, capacity=64, topology="ring", mode="reference")
    sim.put_bulk(2, ["a/x", "a/y", "a/z"], np.array([1.0, 2.0, 3.0]))
    sim.run_until_converged()
    assert sim.tables_equal()
    assert sim.get(0, "a/x") == 1 and sim.get(3, "a/z") == 3


def test_reduce_flat_ops_matches_lexsort_oracle():
    """The argsort+reduceat reduction must keep exactly the
    (cls, khi, klo, vid)-lexmax op per (peer, slot) — checked against a
    straight 4-key lexsort oracle on heavy-duplicate random batches."""
    import numpy as np

    from bullet_tpu.ops.packed import CV_SHIFT, reduce_flat_ops

    def oracle(peer, slot, cls, khi, klo, vid):
        keep = cls > 0
        peer, slot, cls, khi, klo, vid = (
            a[keep] for a in (peer, slot, cls, khi, klo, vid)
        )
        if peer.size == 0:
            return None
        bias = np.int64(1) << 31
        pslot = (peer.astype(np.int64) << 32) | slot.astype(np.int64)
        key64 = (
            ((khi.astype(np.int64) + bias).astype(np.uint64) << np.uint64(32))
            | (klo.astype(np.int64) + bias).astype(np.uint64)
        )
        order = np.lexsort((vid, key64, cls, pslot))
        ps = pslot[order]
        last = np.ones(order.size, dtype=bool)
        last[:-1] = ps[1:] != ps[:-1]
        idx = order[last]
        cv = ((cls[idx].astype(np.int64) << CV_SHIFT) | vid[idx]).astype(
            np.int32
        )
        return peer[idx], slot[idx], khi[idx], klo[idx], cv

    rng = np.random.default_rng(7)
    for k, peers, slots in ((1, 1, 1), (500, 3, 7), (5000, 16, 50)):
        peer = rng.integers(0, peers, k).astype(np.int32)
        slot = rng.integers(0, slots, k).astype(np.int32)
        cls = rng.integers(0, 5, k).astype(np.int32)  # incl. cls=0 drops
        khi = rng.integers(-(1 << 31), 1 << 31, k).astype(np.int32)
        klo = rng.integers(-(1 << 31), 1 << 31, k).astype(np.int32)
        vid = rng.integers(0, 1 << 28, k).astype(np.int32)
        want = oracle(peer, slot, cls, khi, klo, vid)
        got = reduce_flat_ops(peer, slot, cls, khi, klo, vid)
        if want is None:
            assert got is None
            continue
        for w, g in zip(want, got):
            np.testing.assert_array_equal(w, g)

    # all-invalid batch reduces to None
    z = np.zeros(4, dtype=np.int32)
    assert reduce_flat_ops(z, z, z, z, z, z) is None
