"""Oracle tests for the host CRT: hand-derived cases from the reference
decision table (/root/reference/src/bullet-crt.js:164-279, :329-385),
including the aliasing quirk Q2 and the "no current state" self-clock quirk
(SURVEY.md §3)."""

from bullet_tpu.db.crt import BulletCRT, compare_vector_clocks, merge_vector_clocks


class FakeBullet:
    def __init__(self, peer_id="A"):
        self.id = peer_id
        self.meta = {}
        self._data = {}

    def _get_data(self, path):
        return self._data.get(path, {})


def make(peer_id="A"):
    b = FakeBullet(peer_id)
    return b, BulletCRT(b)


def apply_local(bullet, crt, path, value):
    """Drive handle_update the way Bullet.setData does (bullet.js:139-155)."""
    r = crt.handle_update(path, value, from_network=False)
    if r["doUpdate"]:
        bullet._data[path] = r["value"]
        bullet.meta[path] = {"vectorClock": r["vectorClock"]}
    return r


def apply_network(bullet, crt, path, value, clock):
    payload = value
    if isinstance(value, dict):
        payload = {**value, "__vectorClock": clock}
        r = crt.handle_update(path, payload, from_network=True)
    else:
        # scalar wire payloads carry no clock (bullet-network.js:339-344);
        # the reference treats them as local updates
        r = crt.handle_update(path, value, from_network=False)
    if r["doUpdate"]:
        bullet._data[path] = r["value"]
        bullet.meta[path] = {"vectorClock": r["vectorClock"]}
    return r


def test_clock_compare():
    assert compare_vector_clocks({"A": 2}, {"A": 1}) == 1
    assert compare_vector_clocks({"A": 1}, {"A": 2}) == -1
    assert compare_vector_clocks({"A": 1}, {"B": 1}) == 0  # concurrent
    assert compare_vector_clocks({"A": 1}, {"A": 1}) == 0  # equal
    assert compare_vector_clocks(None, {"A": 1}) == -1
    assert compare_vector_clocks({"A": 1}, None) == 1
    assert compare_vector_clocks({"A": 2, "B": 1}, {"A": 1, "B": 2}) == 0


def test_clock_merge():
    assert merge_vector_clocks({"A": 2, "B": 1}, {"A": 1, "B": 3}) == {"A": 2, "B": 3}
    assert merge_vector_clocks(None, {"A": 1}) == {"A": 1}


def test_first_local_put_double_increments():
    """Fresh path: increment in handleUpdate + increment in resolve's
    "no current state" branch -> self clock at 3 (quirk, bullet-crt.js:358+173)."""
    b, crt = make("A")
    r = apply_local(b, crt, "x", 5)
    assert r["doUpdate"] is True
    assert r["value"] == 5
    assert r["vectorClock"] == {"A": 3}


def test_q2_smaller_local_reput_dropped():
    b, crt = make("A")
    apply_local(b, crt, "x", 5)
    r = apply_local(b, crt, "x", 3)
    assert r["doUpdate"] is False
    assert b._data["x"] == 5
    assert r["decision"].reason == "identical clocks, decided by value comparison"


def test_q2_larger_local_reput_wins():
    b, crt = make("A")
    apply_local(b, crt, "x", 5)
    r = apply_local(b, crt, "x", 7)
    assert r["doUpdate"] is True
    assert b._data["x"] == 7


def test_q2_object_reput_always_wins():
    """Objects compare as 1 under the default comparator (bullet-crt.js:11-15),
    so local object re-puts always replace."""
    b, crt = make("A")
    apply_local(b, crt, "x", {"a": 1})
    r = apply_local(b, crt, "x", {"a": 0})
    assert r["doUpdate"] is True
    assert b._data["x"] == {"a": 0}


def test_network_fresh_state_discards_incoming_clock():
    """"no current state" stamps a fresh self-clock, ignoring the wire clock
    (bullet-crt.js:171-184)."""
    b, crt = make("B")
    r = apply_network(b, crt, "x", {"v": 1}, {"A": 7})
    assert r["doUpdate"] is True
    assert r["vectorClock"] == {"B": 2}


def test_network_dominant_clock_wins():
    b, crt = make("B")
    apply_network(b, crt, "x", {"v": 1}, {"A": 7})  # stored with {B:2}
    r = apply_network(b, crt, "x", {"v": 0}, {"B": 5})  # dominates {B:2}
    assert r["doUpdate"] is True
    assert b._data["x"] == {"v": 0}
    assert r["decision"].reason == "incoming vector clock dominates"


def test_network_historical_clock_dropped():
    b, crt = make("B")
    apply_network(b, crt, "x", {"v": 1}, {"A": 7})  # stored with {B:2}
    r = apply_network(b, crt, "x", {"v": 9}, {"B": 1})  # dominated by {B:2}
    assert r["doUpdate"] is False
    assert b._data["x"] == {"v": 1}
    assert r["decision"].historical is True


def test_concurrent_scalars_value_max():
    b, crt = make("B")
    apply_local(b, crt, "x", 10)  # clock {B:3}
    # concurrent wire clock from another writer
    r = crt.handle_update("x", 99, from_network=False)
    # local increment makes clocks identical-object -> value comparison
    assert r["doUpdate"] is True
    assert r["value"] == 99


def test_concurrent_objects_deep_merge():
    """Field-disjoint concurrent object writes union; overlapping fields
    resolve by comparator (bullet-crt.js:122-153, quirk Q4)."""
    b, crt = make("B")
    apply_network(b, crt, "x", {"a": 1, "c": 5}, {"A": 1})  # stored clock {B:2}
    r = apply_network(b, crt, "x", {"b": 2, "c": 3}, {"C": 1})  # concurrent
    assert r["doUpdate"] is True
    assert r["decision"].concurrent is True
    assert b._data["x"] == {"a": 1, "b": 2, "c": 5}  # c: max(3, 5) = 5


def test_broadcast_data_carries_clock():
    b, crt = make("A")
    r = apply_local(b, crt, "x", {"v": 1})
    assert r["broadcastData"]["__vectorClock"] == r["vectorClock"]
    r2 = apply_local(b, crt, "y", 5)
    assert r2["broadcastData"] == 5  # scalars carry no clock


def test_custom_comparator():
    b, crt = make("A")
    crt.set_compare(lambda incoming, existing: -1)  # incoming always loses
    apply_local(b, crt, "x", 1)
    r = apply_local(b, crt, "x", 100)
    assert r["doUpdate"] is False
    assert b._data["x"] == 1


def test_identical_clocks_and_values_no_update():
    b, crt = make("A")
    apply_local(b, crt, "x", 5)
    r = apply_local(b, crt, "x", 5)
    assert r["doUpdate"] is False
    assert r["decision"].reason == "identical clocks and values"
