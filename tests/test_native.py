"""Native string-order index: availability, API, and bit-identical ranks vs
the pure-Python implementation."""

import random

import pytest

from bullet_tpu.native import load, make_string_order_index
from bullet_tpu.utils.encode import StringOrderIndex

needs_native = pytest.mark.skipif(load() is None, reason="no native toolchain")


@needs_native
def test_native_lib_loads():
    idx = make_string_order_index()
    assert type(idx).__name__ == "NativeStringOrderIndex"


@needs_native
def test_native_matches_python_exactly():
    """Same insertion sequence ⇒ identical ranks and rebalance points (ranks
    feed the device order keys, so this must be exact)."""
    rng = random.Random(0)
    words = []
    base = "m"
    for i in range(500):
        choice = rng.random()
        if choice < 0.4:
            base = base + rng.choice("az")  # adversarial adjacent inserts
            words.append(base)
        elif choice < 0.7:
            words.append("w" + str(rng.randrange(1000)))
        else:
            words.append(rng.choice(words) if words else "seed")

    py = StringOrderIndex()
    nat = make_string_order_index()
    for w in words:
        r_py, b_py = py.insert(w)
        r_nat, b_nat = nat.insert(w)
        assert (r_py, b_py) == (r_nat, b_nat), w
    assert py.rebalances == nat.rebalances
    for w in set(words):
        assert py.rank(w) == nat.rank(w)
    assert len(nat) == len(set(words))


@needs_native
def test_native_rank_missing_raises():
    nat = make_string_order_index()
    with pytest.raises(KeyError):
        nat.rank("ghost")


@needs_native
def test_native_unicode_ordering():
    nat = make_string_order_index()
    words = ["apple", "Ápple", "zèbra", "日本語", "z", "éclair"]
    for w in words:
        nat.insert(w)
    ranks = {w: nat.insert(w)[0] for w in words}
    for a in words:
        for b in words:
            if a < b:  # Python codepoint order == UTF-8 byte order
                assert ranks[a] < ranks[b], (a, b)


def test_fallback_when_disabled(monkeypatch):
    import bullet_tpu.native as native

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_failed", True)
    idx = native.make_string_order_index()
    assert isinstance(idx, StringOrderIndex)


def test_interner_uses_factory():
    from bullet_tpu.utils.encode import ValueInterner

    interner = ValueInterner()
    interner.encode("hello")
    interner.encode("world")
    k1 = interner.encode("hello")[:3]
    k2 = interner.encode("world")[:3]
    assert k1 < k2
