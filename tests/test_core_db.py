"""Core graph API behavior (reference: /root/reference/src/bullet.js and
examples/bullet-example.js)."""

import pytest


def test_put_get_value(bullet_factory):
    b = bullet_factory()
    b.get("users/john").put({"name": "John", "age": 30})
    assert b.get("users/john").value() == {"name": "John", "age": 30}
    assert b.get("users/john/age").value() == 30
    assert b.get("users/john").get("name").value() == "John"


def test_missing_path_autovivifies(bullet_factory):
    """Quirk Q3: reads create empty objects along the path (bullet.js:115-129)."""
    b = bullet_factory()
    assert b.get("nothing/here").value() == {}
    assert b.store["nothing"]["here"] == {}


def test_autovivify_replaces_falsy_leaves(bullet_factory):
    """The reference walk replaces JS-falsy leaf values with {} on read."""
    b = bullet_factory()
    b.get("flags/zero").put(0)
    assert b.get("flags/zero").value() == {}  # destroyed by the read itself


def test_read_through_scalar_raises(bullet_factory):
    """Strict-mode property-set on a primitive throws in the reference."""
    b = bullet_factory()
    b.get("a").put(5)
    with pytest.raises(TypeError):
        b.get("a/b").value()


def test_autovivify_off_is_nondestructive(bullet_factory):
    b = bullet_factory(autovivify=False)
    b.get("flags/zero").put(0)
    assert b.get("flags/zero").value() == 0
    assert b.get("nothing/here").value() is None
    assert "nothing" not in b.store


def test_on_fires_immediately_and_on_change(bullet_factory):
    b = bullet_factory()
    seen = []
    b.get("k").put(1)
    b.get("k").on(seen.append)
    assert seen == [1]
    b.get("k").put(2)
    assert seen == [1, 2]


def test_parent_listeners_bubble(bullet_factory):
    """Ancestor notification walk (bullet.js:238-256)."""
    b = bullet_factory()
    seen = []
    b.get("users").on(lambda d: seen.append(sorted(d.keys()) if d else []))
    b.get("users/a").put({"x": 1})
    b.get("users/b").put({"x": 2})
    assert seen[-1] == ["a", "b"]


def test_off_removes_listener(bullet_factory):
    b = bullet_factory()
    seen = []
    cb = seen.append
    node = b.get("k")
    node.put(1)
    node.on(cb)
    node.off(cb)
    node.put(2)
    assert seen == [1]


def test_remove_puts_null_on_object(bullet_factory):
    """remove() puts null (bullet.js:755-758); objects lose to null under the
    default comparator so removal works for object values. A subsequent read
    re-vivifies the null to {} (quirk Q3) — exactly like the reference."""
    b = bullet_factory()
    b.get("doomed").put({"x": 1})
    b.get("doomed").remove()
    assert b.store["doomed"] is None
    assert b.get("doomed").value() == {}


def test_remove_scalar_is_noop_reference_quirk(bullet_factory):
    """Q2 + comparator: null < 5, so removing a greater scalar is a no-op in
    the reference; we reproduce it."""
    b = bullet_factory()
    b.get("n").put(5)
    b.get("n").remove()
    assert b.get("n").value() == 5


def test_log_capped_at_1000(bullet_factory):
    b = bullet_factory()
    for i in range(1100):
        b.get("counter").put(i)
    assert len(b.log) <= 1000
    assert b.log[-1]["data"] == 1099


def test_meta_tracks_source_and_clock(bullet_factory):
    b = bullet_factory()
    b.get("m").put(1)
    meta = b.meta["m"]
    assert meta["source"] == "local"
    assert b.id in meta["vectorClock"]
    assert meta["lastModified"] > 0


def test_network_flag_stripped(bullet_factory):
    b = bullet_factory()
    b.set_data("remote/x", {"v": 1, "__fromNetwork": True}, broadcast=False)
    assert b.get("remote/x").value() == {"v": 1}
    assert b.meta["remote/x"]["source"] == "network"


def test_listener_errors_isolated(bullet_factory):
    """The immediate fire in on() is unwrapped (throws to caller,
    bullet.js:717); later notifications isolate listener errors
    (bullet.js:229-235)."""
    b = bullet_factory()
    seen = []

    def bad(_):
        raise RuntimeError("boom")

    b.get("k").put(0)
    with pytest.raises(RuntimeError):
        b.get("k").on(bad)
    b.get("k").on(seen.append)
    b.get("k").put(1)  # bad stayed registered; its error must be isolated now
    assert seen[-1] == 1


def test_factory_and_version():
    import bullet_tpu as bt

    assert isinstance(bt.VERSION, str)
    b = bt.create({"storage": False, "disable_network": True})
    assert isinstance(b, bt.Bullet)
    b.close()


def test_camelcase_aliases(bullet_factory):
    b = bullet_factory()
    b.setData("x", 1)
    assert b.get("x").value() == 1
    assert callable(b.defineSchema)
    assert callable(b.exportToJSON)
