"""Write-path device staging (netsim._stage_device_apply): put_bulk
pre-reduces, block-builds, and starts the op-stream h2d at ingest time;
the next apply consumes the staged segments. Contract: bit-identical
tables to the unstaged path in every case — token-valid fast path,
stale-token fallback (re-enter as flat ops), capacity-growth refusal —
and snapshot/restore treat staged batches exactly like pending ops."""

import numpy as np
import pytest

from bullet_tpu.models.netsim import PeerNetworkSim


def _mk(staged: bool, capacity: int = 1024) -> PeerNetworkSim:
    sim = PeerNetworkSim(64, capacity=capacity, topology="ring",
                         layout="packed")
    sim._stage_on_cpu = staged
    return sim


def _load(sim: PeerNetworkSim, seed: int, keys: int = 256,
          writes: int = 4096, batches: int = 2) -> None:
    rng = np.random.default_rng(seed)
    slots = sim.host.intern_batch([f"s/k{i}" for i in range(keys)])
    # a scalar put queued BEFORE the bulk load rides the same staging
    sim.put(3, "s/k0", 123.0)
    for b in range(batches):
        k = writes if b == 0 else writes // 4
        sim.put_bulk(
            rng.integers(0, 64, k).astype(np.int32),
            slots[rng.integers(0, keys, k)],
            rng.integers(0, 1 << 20, k).astype(np.float64),
        )


def _tables_equal(a: PeerNetworkSim, b: PeerNetworkSim) -> None:
    for x, y in zip(a.table, b.table):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("flush", ["reconcile", "step"])
def test_staged_apply_matches_unstaged(flush):
    """Multi-batch load: tables must be bit-identical. (ops_applied may
    legitimately differ — each staged batch applies separately, exactly
    the mutation count an apply between the two put_bulks would give,
    while the unstaged path pre-dedups across batches.)"""
    a, b = _mk(False), _mk(True)
    _load(a, 7)
    _load(b, 7)
    assert not a._staged_apply
    assert b._staged_apply, "staging hook did not engage"
    applied = []
    for s in (a, b):
        before = s.stats["ops_applied"]
        getattr(s, flush)() if flush == "reconcile" else s.step(1)
        applied.append(s.stats["ops_applied"] - before)
    assert not b._staged_apply
    assert applied[0] > 0 and applied[1] > 0
    _tables_equal(a, b)


def test_staged_apply_single_batch_exact_count():
    """One ingest batch: staged and unstaged agree on the table AND the
    exact applied count (no cross-batch dedup in play)."""
    a, b = _mk(False), _mk(True)
    _load(a, 19, batches=1)
    _load(b, 19, batches=1)
    assert len(b._staged_apply) == 1
    fa = a.reconcile()
    fb = b.reconcile()
    assert fa == fb
    assert a.stats["ops_applied"] == b.stats["ops_applied"] > 0
    _tables_equal(a, b)


def test_stale_token_reenters_flat_path():
    a, b = _mk(False), _mk(True)
    _load(a, 11)
    _load(b, 11)
    for entry in b._staged_apply:
        entry["vals_epoch"] = -1  # simulate a string rebalance after stage
    ra = a.reconcile()
    rb = b.reconcile()
    assert ra == rb
    assert not b._staged_apply
    _tables_equal(a, b)
    assert a.stats["ops_applied"] == b.stats["ops_applied"] > 0


def test_capacity_growth_refuses_staging():
    # slots past the current device capacity: staging must leave the
    # queue alone (the apply grows the table first), and the result must
    # still match the unstaged twin
    a, b = _mk(False, capacity=128), _mk(True, capacity=128)
    for s in (a, b):
        slots = s.host.intern_batch([f"g/k{i}" for i in range(200)])
        assert int(slots.max()) >= s.table[0].shape[1]
        s.put_bulk(
            np.arange(64, dtype=np.int32).repeat(3)[:200].astype(np.int32),
            slots,
            np.arange(200, dtype=np.float64),
        )
    assert not b._staged_apply, "staging must refuse past-capacity slots"
    assert b._pending_bulk, "the queue must survive the refusal"
    a.reconcile()
    b.reconcile()
    _tables_equal(a, b)


def test_snapshot_flushes_staged_and_restore_discards():
    s = _mk(True)
    _load(s, 13)
    assert s._staged_apply
    snap = s.snapshot()  # must flush staged batches like pending ops
    assert not s._staged_apply
    base = [np.asarray(f).copy() for f in s.table]

    # new staged writes after the snapshot belong to the abandoned
    # timeline: restore() must discard them with the pending queue
    slots = s.host.intern_batch([f"s/k{i}" for i in range(8)])
    s.put_bulk(
        np.arange(8, dtype=np.int32), slots,
        np.full(8, 9.0e6, dtype=np.float64),
    )
    assert s._staged_apply
    s.restore(snap)
    assert not s._staged_apply
    s.step(0)  # apply-only flush: nothing may be pending after restore
    for x, y in zip(s.table, base):
        np.testing.assert_array_equal(np.asarray(x), y)


def test_staged_entries_survive_value_roundtrip():
    # end-to-end read-back through the staged path: values land exactly
    s = _mk(True)
    slots = s.host.intern_batch(["a/x", "a/y", "b/z"])
    s.put_bulk(np.array([1, 2, 3], np.int32), slots,
               np.array([10.5, -2.0, 7.0]))
    assert s._staged_apply
    s.reconcile()
    assert s.get(1, "a/x") == 10.5
    assert s.get(2, "a/y") == -2.0
    # reconcile converges every peer to the join
    assert s.get(0, "b/z") == 7.0
