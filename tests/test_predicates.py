"""Traced-predicate filter/count (ops/predicates.py): the compiled device
mask program must bit-match the host oracle (Predicate.evaluate over decoded
children) on fuzzed data and fuzzed predicate trees, on every layout.

Reference behavior being generalized: bullet-query.js:270-283 (filter),
:293-313 (count), :342-354 (find)."""

import math
import random

import pytest

from bullet_tpu.models.netsim import PeerNetworkSim
from bullet_tpu.ops.predicates import P, Predicate

LAYOUTS = ["dense", "packed", "rank", "rank1"]


def _sim(layout, capacity=512, peers=2):
    return PeerNetworkSim(peers, capacity=capacity, layout=layout)


USERS = {
    "u1": {"name": "Alice", "age": 28, "active": True, "score": 9.5},
    "u2": {"name": "Bob", "age": 35, "active": True},
    "u3": {"name": "Carol", "age": 42, "active": False, "score": 3},
    "u4": {"name": "Dave", "active": True, "score": 0},
    "u5": {"name": "Eve", "age": 31, "nested": {"deep": 1}},
    "u6": {"name": "Frank", "age": True},  # bool-typed age (JS coercion)
}


def _host_expected(sim, peer, base, pred):
    data = sim.get(peer, base) or {}
    return sorted(
        f"{base}/{k}" for k, v in data.items() if pred.evaluate(v)
    )


@pytest.mark.parametrize("layout", LAYOUTS)
def test_field_predicates_match_oracle(layout):
    sim = _sim(layout)
    for uid, rec in USERS.items():
        sim.put(0, f"users/{uid}", rec)
    sim.step(rounds=0)  # engine model: puts queue until a step
    preds = [
        P["age"] > 25,
        P["age"] >= 31,
        P["age"] < 35,
        P["age"].between(28, 35),
        P["name"] == "Bob",
        P["active"] == True,  # noqa: E712 - DSL, not comparison
        P["active"] == 1,  # bool vid != number vid: matches nothing
        (P["age"] > 25) & (P["active"] == True),  # noqa: E712
        (P["age"] > 40) | (P["score"] >= 9),
        ~(P["age"] > 25),  # includes children missing age
        ~P.has("score"),
        P.has("nested"),  # subtree, not a leaf: matches nothing
        P["age"] != 28,
        (P["name"] == "Zed") | ~(P["score"] < 100),
        P["age"] > 0,  # bool age coerces: true > 0
    ]
    for pred in preds:
        want = _host_expected(sim, 0, "users", pred)
        got = sim.filter(0, "users", pred)
        assert got == want, f"{pred.signature()}: {got} != {want}"
        assert sim.count(0, "users", pred) == len(want)
    # find returns the first sorted hit
    assert sim.find(0, "users", P["age"] > 100) is None
    assert sim.find(0, "users", P["age"] > 30) == _host_expected(
        sim, 0, "users", P["age"] > 30
    )[0]


@pytest.mark.parametrize("layout", ["dense", "rank1"])
def test_leaf_form_predicates(layout):
    sim = _sim(layout)
    scores = {"a": 10, "b": 55.5, "c": 90, "d": "n/a", "e": True}
    for k, v in scores.items():
        sim.put(0, f"scores/{k}", v)
    sim.step(rounds=0)
    for pred in [
        P.value() >= 55,
        P.value() < 11,  # includes True (coerces to 1)
        P.value() == "n/a",
        ~(P.value() > 50),
        P.value().between(10, 90),
    ]:
        want = _host_expected(sim, 0, "scores", pred)
        assert sim.filter(0, "scores", pred) == want, pred.signature()
        assert sim.count(0, "scores", pred) == len(want)


@pytest.mark.parametrize("layout", LAYOUTS)
def test_predicate_edge_values(layout):
    sim = _sim(layout)
    vals = {
        "nan": float("nan"),
        "inf": float("inf"),
        "ninf": float("-inf"),
        "zero": 0,
        "negzero": -0.0,
        "tiny": 5e-324,
        "big": 1.5e308,
        "one": 1,
        "true": True,
    }
    for k, v in vals.items():
        sim.put(0, f"n/{k}", {"v": v})
    sim.step(rounds=0)
    cases = [
        P["v"] > 0,  # excludes NaN, includes inf/tiny/big/true
        P["v"] >= float("-inf"),  # everything numeric except NaN
        P["v"] < float("inf"),
        P["v"] > float("inf"),  # nothing
        P["v"] == float("nan"),  # all NaNs are one encoded value
        P["v"] == 0,  # -0.0 and 0 are one canonical value
        P["v"] == 1,  # number 1, NOT True
        P["v"] == True,  # noqa: E712 - True, NOT 1
        P["v"] <= 0,
        P["v"].between(float("nan"), 5),  # NaN bound: empty
    ]
    for pred in cases:
        want = _host_expected(sim, 0, "n", pred)
        got = sim.filter(0, "n", pred)
        assert got == want, f"{pred.signature()}: {got} != {want}"


def test_predicate_misc_semantics():
    sim = _sim("dense")
    sim.put(0, "users/u1", {"age": 30, "note": None})
    sim.step(rounds=0)
    # null leaves decode as absent: == None matches nothing, has() is False
    assert sim.filter(0, "users", P["note"] == None) == []  # noqa: E711
    assert sim.filter(0, "users", P.has("note")) == []
    # unknown field / unknown base
    assert sim.filter(0, "users", P["ghost"] > 1) == []
    assert sim.filter(0, "nowhere", P["age"] > 1) == []
    assert sim.count(0, "nowhere", P["age"] > 1) == 0
    # predicates have no truth value (catches accidental `and`/`or`)
    with pytest.raises(TypeError):
        bool(P["age"] > 1)
    with pytest.raises(TypeError):
        (P["age"] > 1) and (P["age"] < 2)


@pytest.mark.parametrize("layout", LAYOUTS)
@pytest.mark.parametrize("seed", [0, 1])
def test_predicate_fuzz_vs_oracle(layout, seed):
    rng = random.Random(1000 + seed)
    sim = _sim(layout, capacity=2048)

    fields = ["a", "b", "c", "d"]

    def rand_value():
        r = rng.random()
        if r < 0.35:
            return rng.choice([-5, 0, 1, 2.5, 42, 1e9, -0.0, 7])
        if r < 0.5:
            return rng.choice(["x", "y", "zz", ""])
        if r < 0.6:
            return rng.choice([True, False])
        if r < 0.7:
            return None
        if r < 0.8:
            return {"inner": rng.randint(0, 3)}
        return rng.uniform(-100, 100)

    for i in range(60):
        rec = {
            f: rand_value()
            for f in fields
            if rng.random() < 0.7
        }
        sim.put(rng.randrange(2), f"items/i{i}", rec or {"a": 1})
    sim.run_until_converged()

    def rand_atom():
        f = rng.choice(fields)
        r = rng.random()
        if r < 0.3:
            op = rng.choice(["__lt__", "__le__", "__gt__", "__ge__"])
            return getattr(P[f], op)(rng.choice([-5, 0, 1, 2.5, 42, 50.0]))
        if r < 0.5:
            return P[f].between(rng.randint(-10, 5), rng.randint(5, 60))
        if r < 0.8:
            return P[f] == rng.choice([1, 2.5, "x", "zz", True, False, -5])
        return P.has(f)

    def rand_tree(depth):
        if depth == 0 or rng.random() < 0.4:
            return rand_atom()
        r = rng.random()
        if r < 0.4:
            return rand_tree(depth - 1) & rand_tree(depth - 1)
        if r < 0.8:
            return rand_tree(depth - 1) | rand_tree(depth - 1)
        return ~rand_tree(depth - 1)

    for peer in range(2):
        for _ in range(12):
            pred = rand_tree(2)
            assert isinstance(pred, Predicate)
            want = _host_expected(sim, peer, "items", pred)
            got = sim.filter(peer, "items", pred)
            assert got == want, f"peer {peer} {pred.signature()}"
            assert sim.count(peer, "items", pred) == len(want)
