"""Regression tests for the code-review findings (each pinned a real bug)."""

import numpy as np

import bullet_tpu as bt
from bullet_tpu.models.netsim import PeerNetworkSim


def test_network_writes_pass_strict_validation(bullet_factory):
    """Wire markers (__fromNetwork/__vectorClock) must not trip strict
    schemas — they're transport framing, not user data."""
    b = bullet_factory()
    b.define_schema(
        "cfg",
        {
            "type": "object",
            "additionalProperties": False,
            "properties": {"name": {"type": "string"}},
        },
    )
    b.apply_schema("config", "cfg")
    b.set_data(
        "config",
        {"name": "remote", "__fromNetwork": True, "__vectorClock": {"peer": 3}},
        broadcast=False,
    )
    assert b.store.get("config", {}).get("name") == "remote"
    # genuinely unknown properties still blocked
    b.set_data("config", {"name": "x", "evil": 1}, broadcast=False)
    assert "evil" not in (b.store.get("config") or {})


def test_strict_collection_schema_accepts_members(bullet_factory):
    """additionalProperties:false governs member contents, not member ids."""
    b = bullet_factory()
    b.define_schema(
        "user",
        {
            "type": "object",
            "additionalProperties": False,
            "properties": {"name": {"type": "string"}},
        },
    )
    b.apply_schema("users", "user")
    b.get("users/u1").put({"name": "alice"})
    assert b.get("users/u1").value() == {"name": "alice"}
    b.get("users/u2").put({"name": "bob", "extra": 1})
    assert b.store.get("users", {}).get("u2") is None


def test_sync_resume_ack_does_not_complete():
    """A sync-response carrying resuming:true must not finish the sync (it
    would advance `since` past the missing chunks forever)."""
    from bullet_tpu.db.sync import BulletNetworkSync

    class FakeNetwork:
        def __init__(self):
            self.peers = {}
            self.sent = []
            self._listeners = {}

        def on(self, event, fn):
            self._listeners.setdefault(event, []).append(fn)

        def emit(self, event, *a):
            for fn in self._listeners.get(event, ()):
                fn(*a)

        def send_to_peer(self, pid, msg):
            self.sent.append((pid, msg))
            return True

    class FakeBullet:
        store = {}
        meta = {}

        def _get_data(self, p):
            return None

        def set_data(self, *a, **k):
            pass

    net = FakeNetwork()
    sync = BulletNetworkSync(FakeBullet(), net, {"sync_interval": 9999})
    try:
        sync.request_sync("peerX")
        req_id = net.sent[-1][1]["id"]
        state = sync._peer_state("peerX")
        assert state["status"] == "requested"
        sync._handle_sync_response(
            "peerX", {"requestId": req_id, "resuming": True, "missingChunks": 3}
        )
        assert state["status"] == "requested"  # NOT complete
        assert state["last_sync_time_ms"] == 0  # since not advanced
    finally:
        sync.close()


def test_on_after_intern_fires_none_not_clamped_value():
    """Subscribing to a brand-new path past capacity must not gather a
    clamped neighbor slot."""
    sim = PeerNetworkSim(2, capacity=8, topology="ring")
    for i in range(8):
        sim.put(0, f"k{i}", 100 + i)
    sim.run_until_converged()
    seen = []
    sim.on(0, "brand/new/path", seen.append)
    assert seen == [None]


def test_query_after_intern_growth():
    """equals() immediately after interning past capacity must not raise a
    struct/table shape mismatch."""
    sim = PeerNetworkSim(2, capacity=8, topology="ring")
    for i in range(7):
        sim.put(0, f"k{i}", i)
    sim.run_until_converged()
    sim.put(0, "users/u1/age", 30)  # interns past capacity, not yet stepped
    assert sim.equals(0, "users", "age", 30) == []
    sim.run_until_converged()
    assert sim.equals(0, "users", "age", 30) == ["users/u1"]


def test_simpeer_equals_none_value():
    """Three-arg equals with value=None must query for null, not degrade to
    the two-arg leaf form."""
    sim = PeerNetworkSim(2, capacity=64, topology="mesh")
    sim.put(0, "users/u1", {"age": None, "name": "x"})
    sim.put(0, "users/u2", {"age": 30, "name": "y"})
    sim.run_until_converged()
    assert sim.peer(1).equals("users", "age", None) == ["users/u1"]


def test_file_storage_atexit_unregistered(tmp_path):
    import atexit

    b = bt.create(
        {
            "disable_network": True,
            "storage": True,
            "storage_type": "file",
            "storage_path": str(tmp_path / "s"),
            "save_interval": 0,
        }
    )
    hook = b.storage._exit_save
    b.close()
    # unregistering again is a no-op only if it was removed; atexit has no
    # introspection API, so just verify double-close and re-register safety
    atexit.unregister(hook)


def test_serializer_index_boundary_match(bullet_factory):
    b = bullet_factory()
    b.get("users/u1").put({"age": 1})
    b.get("users_archive/u1").put({"age": 2})
    b.index("users", "age")
    b.index("users_archive", "age")
    import json

    meta = json.loads(b.export_to_json("users"))["metadata"]
    assert "users:age" in meta["indices"]
    assert "users_archive:age" not in meta["indices"]
