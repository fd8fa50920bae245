"""Middleware hooks, event bus, and built-in helpers (reference:
/root/reference/src/bullet-middleware.js and examples/bullet-middleware-example.js)."""

import re

import pytest


def test_before_put_veto(bullet_factory):
    b = bullet_factory()
    b.before_put(lambda path, data: False if path.startswith("locked") else None)
    b.get("locked/x").put(1)
    b.get("free/x").put(1)
    assert "locked" not in b.store
    assert b.get("free/x").value() == 1


def test_before_put_mutate_data(bullet_factory):
    b = bullet_factory()
    b.before_put(lambda path, data: {**data, "stamped": True} if isinstance(data, dict) else data)
    b.get("u").put({"a": 1})
    assert b.get("u").value() == {"a": 1, "stamped": True}


def test_before_put_redirect_path(bullet_factory):
    b = bullet_factory()
    b.before_put(
        lambda path, data: {"path": "redirected", "data": data}
        if path == "original"
        else None
    )
    b.get("original").put(42)
    assert b.get("redirected").value() == 42


def test_put_hook_error_blocks_write(bullet_factory):
    b = bullet_factory()
    errors = []
    b.on("error", errors.append)

    def boom(path, data):
        raise ValueError("nope")

    b.before_put(boom)
    b.get("x").put(1)
    assert "x" not in b.store
    assert errors and errors[0]["operation"] == "put"


def test_after_put_sees_old_data(bullet_factory):
    b = bullet_factory()
    calls = []
    b.after_put(lambda path, data, old: calls.append((path, data, old)))
    b.get("k").put(1)
    b.get("k").put(2)
    assert calls[0] == ("k", 1, {})  # old of a fresh path is vivified {}
    assert calls[1] == ("k", 2, 1)


def test_get_hook_rewrites_path(bullet_factory):
    b = bullet_factory()
    b.get("real/data").put(7)
    b.on_get(lambda path: path.replace("alias", "real") if "alias" in path else path)
    assert b.get("alias/data").value() == 7


def test_after_get_transforms_data(bullet_factory):
    b = bullet_factory()
    b.get("n").put(10)
    b.after_get(lambda path, data: data * 2 if path == "n" else data)
    assert b.get("n").value() == 20


def test_get_hook_error_does_not_block_read(bullet_factory):
    """Get-hook errors are caught; the read proceeds (bullet-middleware.js:30-44)."""
    b = bullet_factory()
    errors = []
    b.on("error", errors.append)

    def bad(path):
        raise RuntimeError("denied")

    b.use("get", bad)
    b.get("v").put(3)
    assert b.get("v").value() == 3
    assert errors


def test_events_write_read_all(bullet_factory):
    b = bullet_factory()
    events = []
    b.on("all", lambda event, data: events.append(event))
    b.get("e").put(1)
    b.get("e").value()
    assert "write" in events
    assert "read" in events


def test_delete_hooks(bullet_factory):
    b = bullet_factory()
    deleted = []
    b.before_delete(lambda path: False if path == "keep" else None)
    b.after_delete(lambda path, old: deleted.append((path, old)))
    b.get("keep").put({"a": 1})
    b.get("gone").put({"b": 2})
    b.get("keep").delete()
    b.get("gone").delete()
    assert b.store["keep"] == {"a": 1}
    assert b.store["gone"] is None
    assert deleted == [("gone", {"b": 2})]


def test_transform_helper_both_directions(bullet_factory):
    b = bullet_factory()
    b.middleware.transform(
        "secret",
        lambda data, path, direction: (
            {**data, "dir": direction} if isinstance(data, dict) else data
        ),
    )
    b.get("secret/item").put({"v": 1})
    out = b.get("secret/item").value()
    assert out["dir"] == "read"
    assert b.store["secret"]["item"]["dir"] == "write"


def test_encrypt_fields_helper(bullet_factory):
    b = bullet_factory()
    b.middleware.encrypt_fields(
        "users",
        ["ssn"],
        lambda v: f"enc({v})",
        lambda v: v[4:-1] if isinstance(v, str) and v.startswith("enc(") else v,
    )
    b.get("users/a").put({"name": "A", "ssn": "123"})
    assert b.store["users"]["a"]["ssn"] == "enc(123)"
    assert b.get("users/a").value()["ssn"] == "123"


def test_access_control_write_denied(bullet_factory):
    b = bullet_factory()
    b.middleware.access_control("admin", lambda path, op, *a: op != "write")
    b.get("admin/cfg").put({"x": 1})
    assert "admin" not in b.store or b.store["admin"].get("cfg") is None


def test_rewrite_path_helper(bullet_factory):
    b = bullet_factory()
    b.get("v2/thing").put(5)
    b.middleware.rewrite_path(r"^v1/", "v2/")
    assert b.get("v1/thing").value() == 5


def test_log_helper(bullet_factory):
    b = bullet_factory()
    lines = []
    b.middleware.log(["write"], lambda *args: lines.append(args))
    b.get("z").put(1)
    assert lines and lines[0][0] == "WRITE: z"


def test_use_unknown_operation_raises(bullet_factory):
    b = bullet_factory()
    with pytest.raises(ValueError):
        b.middleware.use("bogus", lambda: None)
    with pytest.raises(TypeError):
        b.middleware.use("put", "not-a-function")
