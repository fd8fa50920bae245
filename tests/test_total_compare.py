"""The last divergence hole and its fix: ``compare: "total"``.

The reference comparator (/root/reference/src/bullet-crt.js:11-15) returns
"incoming wins" for JS-incomparable pairs, so identical-clock conflicts
between e.g. a non-numeric string and a number resolve by ARRIVAL ORDER —
replicas can adopt each other's values and permanently disagree, and even
when they settle, the settled value depends on sync order. Rounds 3-4 fixed
five other inherited divergence holes on purpose; this suite documents the
residual under the default ``js_compare`` (reference parity) and proves the
opt-in ``total_compare`` closes it.
"""

import math
import time

import numpy as np
import pytest

import bullet_tpu as bt
from bullet_tpu.utils.jsvalues import (
    js_compare,
    strict_equals,
    total_compare,
    utf16_key,
)

# a value pool spanning every type tag, with JS-incomparable cross-type pairs
POOL = [
    None,
    False,
    True,
    0,
    -0.0,
    1,
    1.0,
    -3,
    2.5,
    float("nan"),
    float("inf"),
    float("-inf"),
    "",
    "a",
    "abc",
    "2",
    "12",
    "\U0001f600",  # astral plane: UTF-16 surrogates order below U+FFFD
    "�",
    [],
    [1, 2],
    {},
    {"a": 1},
    {"a": 1, "b": "x"},
    {"b": "x", "a": 1},  # same canonical JSON as the previous entry
]


def test_total_compare_is_a_total_order():
    """Antisymmetry + transitivity + reflexivity over the full pool."""
    n = len(POOL)
    cmp = np.zeros((n, n), dtype=int)
    for i, a in enumerate(POOL):
        for j, b in enumerate(POOL):
            cmp[i, j] = total_compare(a, b)
    for i in range(n):
        assert cmp[i, i] == 0
        for j in range(n):
            assert cmp[i, j] == -cmp[j, i], (POOL[i], POOL[j])
            for k in range(n):
                # transitivity: a<=b and b<=c => a<=c
                if cmp[i, j] <= 0 and cmp[j, k] <= 0:
                    assert cmp[i, k] <= 0, (POOL[i], POOL[j], POOL[k])


def test_total_compare_agrees_with_js_on_same_type_pairs():
    """Where JS CAN order a pair (same-type number/number, string/string),
    the total order must not contradict it."""
    nums = [v for v in POOL if isinstance(v, (int, float))
            and not isinstance(v, bool) and not (isinstance(v, float) and math.isnan(v))]
    for a in nums:
        for b in nums:
            want = 0 if float(a) == float(b) else (-1 if a < b else 1)
            assert total_compare(a, b) == want, (a, b)
    strs = [v for v in POOL if isinstance(v, str)]
    for a in strs:
        for b in strs:
            ka, kb = utf16_key(a), utf16_key(b)
            want = 0 if ka == kb else (-1 if ka < kb else 1)
            assert total_compare(a, b) == want, (a, b)


def test_total_compare_type_tags_match_engine_rank_order():
    """null < number < string < opaque — the engine's CLS_* order."""
    assert total_compare(None, -math.inf) < 0
    assert total_compare(math.inf, "") < 0  # every number < every string
    assert total_compare(float("nan"), "") < 0  # NaN is still a number
    assert total_compare("zzz", []) < 0  # every string < every opaque
    assert total_compare([1, 2], {"a": 1}) != 0
    # distinguishable values with equal JS coercion still have a winner
    assert total_compare(True, 1) != 0
    assert total_compare(False, 0) != 0
    assert total_compare(True, 1) == -total_compare(1, True)
    # strict equality always maps to 0
    for v in POOL:
        if isinstance(v, float) and math.isnan(v):
            continue
        assert total_compare(v, v) == 0
    # canonical-JSON equality: key order doesn't matter
    assert total_compare({"a": 1, "b": "x"}, {"b": "x", "a": 1}) == 0


def test_js_compare_is_not_antisymmetric_total_is():
    """The residual in one line: js_compare says BOTH '"abc" beats 5' and
    '5 beats "abc"' (incoming always wins on incomparable pairs)."""
    assert js_compare("abc", 5) == 1
    assert js_compare(5, "abc") == 1  # <- arrival order decides
    assert total_compare("abc", 5) == -total_compare(5, "abc") != 0


# ---------------------------------------------------------------- CRT level


def _deliver_identical_clock(compare_opt):
    """Two replicas, same path, same vector clock, JS-incomparable values
    delivered in opposite orders (exactly what crossed anti-entropy does:
    after a first exchange both hold the identical merged clock, then each
    re-offers its value to the other)."""
    clock = {"writer-x": 5}
    out = []
    for first, second in (("abc", 42), (42, "abc")):
        b = bt.create({
            "storage": False, "disable_network": True, "compare": compare_opt,
        })
        try:
            b.set_data("conflict/k", first, broadcast=False,
                       incoming_clock=dict(clock))
            b.set_data("conflict/k", second, broadcast=False,
                       incoming_clock=dict(clock))
            out.append(b.get("conflict/k").value())
        finally:
            b.close()
    return out


def test_identical_clock_conflict_is_arrival_order_under_js():
    """Documents the reference residual (bullet-crt.js:11-15): identical
    clocks + incomparable values => each replica keeps whatever arrived
    LAST, so replicas that saw opposite orders hold different values."""
    a, b = _deliver_identical_clock("js")
    assert a == 42 and b == "abc"  # last writer won on both => diverged
    assert a != b


def test_identical_clock_conflict_converges_under_total():
    a, b = _deliver_identical_clock("total")
    assert a == b == "abc"  # strings outrank numbers, either order


# --------------------------------------------------------------- wire level


def _partitioned_conflict(compare_opt, first_syncer):
    """p0 writes a non-numeric string, p1 writes a number to the same keys
    while disconnected; then they connect and anti-entropy runs in a
    controlled order. Returns the converged per-key values (asserts the
    pair converges WITH EACH OTHER; cross-order agreement is the caller's
    assertion)."""
    p0 = bt.create({
        "storage": False, "port": 0, "host": "127.0.0.1",
        "compare": compare_opt, "connect_sync_delay": 3600.0,
    })
    p1 = bt.create({
        "storage": False, "port": 0, "host": "127.0.0.1",
        "compare": compare_opt, "connect_sync_delay": 3600.0,
    })
    try:
        # partitioned writes: conflicting, JS-incomparable, same keys,
        # written BEFORE the peers ever connect — put floods can't carry
        # them, so only anti-entropy (in the controlled order below)
        # reconciles, making the js-mode order dependence deterministic.
        for k in range(4):
            p0.get(f"c/k{k}").put(f"s{k}x")  # non-numeric string
            p1.get(f"c/k{k}").put(float(k + 1))
        p1.network._connect_to_peer(f"tcp://127.0.0.1:{p0.network.port}")
        deadline = time.time() + 10
        while not p0.network.peers and time.time() < deadline:
            time.sleep(0.02)
        assert p0.network.peers, "peers failed to connect"
        order = (p0, p1) if first_syncer == 0 else (p1, p0)
        for requester in order:
            requester.network.request_sync()
            deadline = time.time() + 20
            while time.time() < deadline:
                stats = requester.network.get_sync_stats()
                if stats and not stats.get("inProgress"):
                    break
                time.sleep(0.05)
        deadline = time.time() + 30
        while time.time() < deadline:
            if all(
                p0.get(f"c/k{k}").value() == p1.get(f"c/k{k}").value()
                for k in range(4)
            ):
                break
            for requester in order:
                requester.network.request_sync()
            time.sleep(0.3)
        vals0 = {k: p0.get(f"c/k{k}").value() for k in range(4)}
        vals1 = {k: p1.get(f"c/k{k}").value() for k in range(4)}
        assert vals0 == vals1, f"pair failed to converge: {vals0} vs {vals1}"
        return vals0
    finally:
        p1.close()
        p0.close()


@pytest.mark.parametrize("compare_opt", ["js", "total"])
def test_wire_conflict_order_dependence(compare_opt):
    """Under the reference comparator the CONVERGED value depends on which
    peer synced first (arrival order leaks into the outcome); under the
    total order both orders land on the same winner — the string."""
    a = _partitioned_conflict(compare_opt, first_syncer=0)
    b = _partitioned_conflict(compare_opt, first_syncer=1)
    if compare_opt == "total":
        assert a == b == {k: f"s{k}x" for k in range(4)}
    else:
        # documents the residual: same writes, different sync order,
        # different (internally converged) outcome on every key
        assert a == {k: f"s{k}x" for k in range(4)} or a == {
            k: float(k + 1) for k in range(4)
        }
        assert a != b


# ------------------------------------------------------------- chaos level


@pytest.mark.parametrize("seed", [0, 1])
def test_type_flapping_soak_converges_under_total(seed):
    """Three live peers, concurrent type-flapping writers that ALWAYS write
    JS-incomparable value kinds (non-numeric strings vs numbers vs bools)
    to a shared key space — the workload the default comparator cannot
    deterministically settle. Under ``compare: "total"`` the survivors must
    reach full store equality through floods + anti-entropy."""
    import threading

    opts = {
        "storage": False, "port": 0, "host": "127.0.0.1",
        "compare": "total", "connect_sync_delay": 0.1,
    }
    p0 = bt.create(dict(opts))
    p1 = bt.create({**opts, "peers": [f"tcp://127.0.0.1:{p0.network.port}"]})
    p2 = bt.create({**opts, "peers": [
        f"tcp://127.0.0.1:{p0.network.port}",
        f"tcp://127.0.0.1:{p1.network.port}",
    ]})
    peers = [p0, p1, p2]
    try:
        time.sleep(0.5)
        errors = []

        def writer(pi, ti):
            rng = np.random.default_rng(1000 * seed + 10 * pi + ti)
            try:
                for i in range(80):
                    key = f"flap/k{int(rng.integers(12))}"
                    roll = int(rng.integers(4))
                    if roll == 0:
                        peers[pi].get(key).put(f"w{pi}.{ti}.{i}")
                    elif roll == 1:
                        peers[pi].get(key).put(float(rng.integers(1 << 16)))
                    elif roll == 2:
                        peers[pi].get(key).put(bool(rng.integers(2)))
                    else:
                        peers[pi].get(key).put(int(rng.integers(2)))
            except Exception as exc:  # noqa: BLE001
                errors.append((pi, ti, exc))

        threads = [
            threading.Thread(target=writer, args=(pi, ti))
            for pi in range(3) for ti in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
            assert not t.is_alive()
        assert not errors, errors

        from tests.test_chaos_system import _divergence_report, _leaves

        deadline = time.time() + 90
        while time.time() < deadline:
            for p in peers:
                p.network.request_sync()
            time.sleep(0.4)
            sets = [_leaves(p.store) for p in peers]
            if sets[0] == sets[1] == sets[2]:
                break
        sets = [_leaves(p.store) for p in peers]
        assert sets[0] == sets[1] == sets[2], (
            "type-flapping soak failed to converge under total_compare:\n"
            + _divergence_report(peers)
        )
    finally:
        for p in peers:
            p.close()


# ----------------------------------------------- scalar-vs-subtree tie


def _partitioned_subtree_conflict(compare_opt, first_syncer):
    """p0 writes a DICT subtree, p1 writes a scalar to the same key while
    partitioned (concurrent clocks), then anti-entropy runs in a
    controlled order. The dict side resolves through the decision table
    (compare(scalar, dict)); the scalar side resolves through
    sync._resolve_scalar_ancestor (child leaves colliding with a scalar
    ancestor) — the two MUST pick the same winner in both sync orders.
    Found by the wire-fuzz chaos soak: under ``total`` the dict side kept
    its dict while the scalar side froze on the scalar (the clock-tie
    rule there predated the comparator and always kept the scalar)."""
    p0 = bt.create({
        "storage": False, "port": 0, "host": "127.0.0.1",
        "compare": compare_opt, "connect_sync_delay": 3600.0,
    })
    p1 = bt.create({
        "storage": False, "port": 0, "host": "127.0.0.1",
        "compare": compare_opt, "connect_sync_delay": 3600.0,
    })
    try:
        # truly partitioned writes (pre-connect): floods never carry
        # them, so BOTH resolution paths run under the controlled sync
        # order alone — deterministic in each direction.
        for k in range(3):
            p0.get(f"t/k{k}").put({"n": k + 1, "s": f"d{k}"})
            p1.get(f"t/k{k}").put(f"s{k}x")
        p1.network._connect_to_peer(f"tcp://127.0.0.1:{p0.network.port}")
        deadline = time.time() + 10
        while not p0.network.peers and time.time() < deadline:
            time.sleep(0.02)
        assert p0.network.peers, "peers failed to connect"
        order = (p0, p1) if first_syncer == 0 else (p1, p0)
        deadline = time.time() + 45
        while time.time() < deadline:
            if all(
                p0.get(f"t/k{k}").value() == p1.get(f"t/k{k}").value()
                for k in range(3)
            ):
                break
            for requester in order:
                requester.network.request_sync()
            time.sleep(0.3)
        vals0 = {k: p0.get(f"t/k{k}").value() for k in range(3)}
        vals1 = {k: p1.get(f"t/k{k}").value() for k in range(3)}
        assert vals0 == vals1, (
            f"scalar-vs-subtree pair failed to converge: {vals0} vs {vals1}"
        )
        return vals0
    finally:
        p1.close()
        p0.close()


@pytest.mark.parametrize("first_syncer", [0, 1])
@pytest.mark.parametrize("compare_opt", ["js", "total"])
def test_scalar_vs_subtree_clock_tie_converges(compare_opt, first_syncer):
    """Both comparators must converge the scalar-vs-subtree clock tie in
    BOTH sync orders — under ``js`` to the scalar (the dict side adopts
    the incoming scalar, incomparable ⇒ incoming wins, so the scalar side
    keeps it), under ``total`` to the dict (opaque outranks every scalar,
    so the scalar side must adopt the subtree)."""
    vals = _partitioned_subtree_conflict(compare_opt, first_syncer)
    if compare_opt == "total":
        assert vals == {k: {"n": k + 1, "s": f"d{k}"} for k in range(3)}
    else:
        assert vals == {k: f"s{k}x" for k in range(3)}
