"""Storage providers: file persistence + encryption + restart-restore
(reference: /root/reference/src/bullet-file-storage.js, bullet-storage.js,
bullet-memory-storage.js; the restart flow mirrors examples/bullet-example.js:42-69)."""

import json
import os

import bullet_tpu as bt


def make(tmp_path, **over):
    opts = {
        "disable_network": True,
        "storage": True,
        "storage_type": "file",
        "storage_path": str(tmp_path / "bullet-data"),
        "save_interval": 0,  # no timers in tests; save explicitly
    }
    opts.update(over)
    return bt.create(opts)


def test_file_storage_writes_three_files(tmp_path):
    b = make(tmp_path)
    b.get("users/a").put({"name": "A"})
    b.storage.save()
    root = tmp_path / "bullet-data"
    for name in ("store.json", "meta.json", "log.json"):
        assert (root / name).exists()
    store = json.loads((root / "store.json").read_text())
    assert store["users"]["a"]["name"] == "A"
    b.close()


def test_restart_restore(tmp_path):
    b = make(tmp_path)
    b.get("users/john").put({"name": "John", "age": 30})
    b.close()

    b2 = make(tmp_path)
    assert b2.get("users/john").value() == {"name": "John", "age": 30}
    assert "users/john" in b2.meta  # vector clocks restored
    b2.close()


def test_encrypted_storage_roundtrip(tmp_path):
    b = make(tmp_path, encrypt=True, encryption_key="my-secret-key")
    b.get("secret/data").put({"pin": 1234})
    b.close()

    raw = (tmp_path / "bullet-data" / "store.json").read_bytes()
    assert b"pin" not in raw  # actually encrypted on disk

    b2 = make(tmp_path, encrypt=True, encryption_key="my-secret-key")
    assert b2.get("secret/data").value() == {"pin": 1234}
    b2.close()


def test_encrypted_file_format_is_hex_iv_prefixed(tmp_path):
    """Wire format parity: hex(iv) + hex(ciphertext)
    (bullet-file-storage.js:218-231)."""
    b = make(tmp_path, encrypt=True, encryption_key="k")
    b.get("x").put(1)
    b.close()
    raw = (tmp_path / "bullet-data" / "store.json").read_text()
    assert len(raw) >= 32
    bytes.fromhex(raw)  # whole file is valid hex


def test_log_restored_and_capped(tmp_path):
    b = make(tmp_path)
    for i in range(20):
        b.get("c").put(i)
    b.close()
    b2 = make(tmp_path)
    assert len(b2.log) > 0
    assert len(b2.log) <= 1000
    b2.close()


def test_has_changes_detection(tmp_path):
    b = make(tmp_path)
    b.get("k").put(1)
    b.storage.save()
    assert not b.storage._has_changes()
    b.get("k").put(2)
    assert b.storage._has_changes()
    b.close()


def test_memory_storage_snapshot(bullet_factory):
    b = bullet_factory(storage=True, storage_type="memory")
    b.get("m").put({"x": 1})
    b.storage.save()
    assert b.storage.persisted["store"]["m"] == {"x": 1}
    # snapshot is a deep copy, not a reference
    b.store["m"]["x"] = 99
    assert b.storage.persisted["store"]["m"]["x"] == 1


def test_custom_storage_class(tmp_path):
    from bullet_tpu.db.storage import BulletStorage

    saves = []

    class Custom(BulletStorage):
        def __init__(self, bullet, options):
            super().__init__(bullet, options)
            self._init_storage()

        def _save_data(self):
            saves.append(True)

    b = bt.create(
        {"disable_network": True, "storage": True, "storage_type": Custom}
    )
    b.get("x").put(1)
    b.storage.save()
    assert saves
    b.close()


def test_storage_events(tmp_path):
    b = make(tmp_path)
    events = []
    b.on("all", lambda event, data: events.append(event))
    b.get("x").put(1)
    b.storage.save()
    assert "storage:save:start" in events
    assert "storage:save:complete" in events
    b.close()


def test_debounced_save_fires_with_no_listeners(bullet_factory):
    """The listener-free _notify early-out must still arm the debounced
    autosave for non-file storage (regression guard for the fast path)."""
    b = bullet_factory(storage=True, storage_type="memory")
    assert not b.listeners
    b.get("d").put({"x": 7})
    assert b._save_timer is not None
    # run the pending save synchronously instead of sleeping out the timer
    b._save_timer.cancel()
    b.storage.save()
    assert b.storage.persisted["store"]["d"] == {"x": 7}
