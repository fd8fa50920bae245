"""Engine checkpoint/resume and the fluent cursor API."""

import numpy as np
import pytest

from bullet_tpu.models.netsim import PeerNetworkSim


def test_fluent_node_api():
    sim = PeerNetworkSim(4, capacity=64, topology="ring")
    p0 = sim.peer(0)
    p0.get("users/a").put({"name": "Ann", "age": 30})
    sim.run_until_converged()
    assert sim.peer(3).get("users/a").value() == {"name": "Ann", "age": 30}
    assert sim.peer(3).get("users/a").get("age").value() == 30
    assert sim.peer(2).equals("users", "name", "Ann") == ["users/a"]

    seen = []
    node = sim.peer(1).get("watch")
    node.on(seen.append)
    sim.peer(0).get("watch").put(5)
    sim.run_until_converged()
    assert seen == [None, 5]
    node.off()
    sim.peer(0).get("watch").put(9)
    sim.run_until_converged()
    assert seen == [None, 5]


def test_checkpoint_roundtrip(tmp_path):
    sim = PeerNetworkSim(6, capacity=64, topology="chain", mode="lww")
    sim.put(0, "users/a", {"name": "Ann", "tags": ["x", "y"]})
    sim.put(3, "metrics/count", 42)
    sim.put(5, "s", "hello")
    sim.run_until_converged()
    ckpt = str(tmp_path / "ckpt")
    sim.save_checkpoint(ckpt)

    restored = PeerNetworkSim.load_checkpoint(ckpt)
    assert restored.num_peers == 6
    assert restored.mode == "lww"
    assert restored.topology.kind == "chain"
    assert restored.get(2, "users/a") == {"name": "Ann", "tags": ["x", "y"]}
    assert restored.get(0, "metrics/count") == 42
    for a, b in zip(sim.table, restored.table):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored sim keeps working: writes, lamport clocks, convergence
    restored.put(1, "metrics/count", 7)  # lww: later write wins
    restored.run_until_converged()
    assert restored.get(4, "metrics/count") == 7
    assert restored.tables_equal()


def test_checkpoint_string_ranks_replay(tmp_path):
    sim = PeerNetworkSim(2, capacity=64, topology="ring")
    for i, word in enumerate(["mango", "apple", "zebra", "kiwi", "banana"]):
        sim.put(0, f"w/{i}", word)
    sim.run_until_converged()
    ckpt = str(tmp_path / "ckpt2")
    sim.save_checkpoint(ckpt)
    restored = PeerNetworkSim.load_checkpoint(ckpt)
    # string ordering still behaves after replay
    restored.put(0, "battle", "aaa")
    restored.put(1, "battle", "zzz")
    restored.run_until_converged()
    assert restored.get(0, "battle") == "zzz"


def test_checkpoint_orbax_backend(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    sim = PeerNetworkSim(4, capacity=32, topology="ring")
    sim.put(0, "o/x", 7)
    sim.put(2, "o/y", "hello")
    sim.run_until_converged()
    ckpt = str(tmp_path / "ock")
    sim.save_checkpoint(ckpt, backend="orbax")
    restored = PeerNetworkSim.load_checkpoint(ckpt)
    assert restored.get(1, "o/x") == 7
    assert restored.get(3, "o/y") == "hello"
    for a, b in zip(sim.table, restored.table):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_flushes_pending_ops(tmp_path):
    """Code-review r2: acknowledged puts queued but not yet stepped must
    survive a checkpoint (save used to drop _pending silently)."""
    from bullet_tpu.models.netsim import PeerNetworkSim

    sim = PeerNetworkSim(2, capacity=64, topology="ring")
    sim.put(0, "queued/x", 7)  # no step before saving
    sim.save_checkpoint(str(tmp_path / "ck"))
    loaded = PeerNetworkSim.load_checkpoint(str(tmp_path / "ck"))
    assert loaded.get(0, "queued/x") == 7


def test_checkpoint_pending_rekey_preserved(tmp_path):
    """A string-rank rebalance pending at save time must not leave stale
    khi/klo keys in the checkpoint (load replays the interner to the NEW
    ranks and then disables re-keying)."""
    from bullet_tpu.models.netsim import PeerNetworkSim

    sim = PeerNetworkSim(2, capacity=512, topology="ring")
    # dense adjacent strings force midpoint-gap exhaustion -> rebalance(s)
    for i in range(60):
        sim.put(0, f"s/k{i:03d}", f"v{i:05d}")
    sim.run_until_converged()
    for i in range(60):  # interleave new strings between existing ranks
        sim.put(1, f"s/m{i:03d}", f"v{i:05d}a")
    # do NOT step: needs_rekey may be pending right now
    sim.save_checkpoint(str(tmp_path / "ck"))
    loaded = PeerNetworkSim.load_checkpoint(str(tmp_path / "ck"))
    loaded.run_until_converged()
    assert loaded.tables_equal()
    # string order keys must still sort correctly after restore
    hits = loaded.equals(0, "s", "v00003")
    assert hits == ["s/k003"], hits


def test_checkpoint_roundtrip_packed(tmp_path):
    """Packed 3-array layout round-trips through a checkpoint (the field
    set follows the sim's table layout) and the restored sim keeps
    working on the packed paths."""
    sim = PeerNetworkSim(8, capacity=256, topology="ring", layout="packed")
    sim.put(0, "users/a", {"name": "Ann"})
    sim.put(3, "metrics/count", 42)
    sim.put(5, "s", "hello")
    sim.run_until_converged()
    ckpt = str(tmp_path / "ckpt_packed")
    sim.save_checkpoint(ckpt)

    restored = PeerNetworkSim.load_checkpoint(ckpt)
    assert restored.layout == "packed"
    assert restored.get(7, "users/a") == {"name": "Ann"}
    assert restored.get(2, "metrics/count") == 42
    assert restored.get(1, "s") == "hello"
    assert restored.table._fields == sim.table._fields  # 3-array packed
    for a, b in zip(sim.table, restored.table):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    restored.put(1, "metrics/count", 50)
    restored.run_until_converged()
    assert restored.get(4, "metrics/count") == 50
    assert restored.tables_equal()


def test_restore_discards_pending_ops():
    """restore() rewinds to EXACTLY the snapshot: queued-but-unapplied
    puts are discarded, so the restored state cannot depend on whether a
    step/query happened to apply them before the restore (twin sims that
    applied at different times used to diverge through a restore)."""
    from bullet_tpu.models.netsim import PeerNetworkSim

    a = PeerNetworkSim(2, capacity=128, topology="ring", layout="rank1")
    b = PeerNetworkSim(2, capacity=128, topology="ring", layout="rank1")
    for s in (a, b):
        s.put(0, "base/x", 1)
        s.run_until_converged()
    snap_a, snap_b = a.snapshot(), b.snapshot()
    # identical post-snapshot writes; only A applies before the restore
    a.put(0, "post/y", 2)
    b.put(0, "post/y", 2)
    a.step(rounds=0)  # A applies; B keeps it queued
    a.restore(snap_a)
    b.restore(snap_b)
    a.run_until_converged()
    b.run_until_converged()
    assert a.get(0, "post/y") is None and b.get(0, "post/y") is None
    assert a.get(0, "base/x") == b.get(0, "base/x") == 1
    import numpy as np

    np.testing.assert_array_equal(
        np.asarray(a.table.rank), np.asarray(b.table.rank)
    )


def test_snapshot_flushes_pending_ops():
    """snapshot() captures every put issued before it — twin sims whose
    queues were applied at different times must capture identical
    snapshots (snapshot flushes, restore discards: a clean timeline
    cut)."""
    from bullet_tpu.models.netsim import PeerNetworkSim

    a = PeerNetworkSim(2, capacity=128, topology="ring", layout="rank1")
    b = PeerNetworkSim(2, capacity=128, topology="ring", layout="rank1")
    for s in (a, b):
        s.put(0, "k/x", 5)
    a.step(rounds=0)  # A applies; B's put stays queued
    snap_a, snap_b = a.snapshot(), b.snapshot()
    import numpy as np

    for fa, fb in zip(snap_a["table"], snap_b["table"]):
        np.testing.assert_array_equal(fa, fb)
    # and both restore to the same state
    a.restore(snap_a)
    b.restore(snap_b)
    assert a.get(0, "k/x") == b.get(0, "k/x") == 5
