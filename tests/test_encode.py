"""Order-key codec properties: the engine's total order must agree with the
reference comparator (JS ``<``) wherever the reference is convergent."""

import math
import random

from bullet_tpu.utils.encode import (
    CLS_NULL,
    CLS_NUMBER,
    CLS_OPAQUE,
    CLS_STRING,
    StringOrderIndex,
    ValueInterner,
    number_key,
)
from bullet_tpu.utils.jsvalues import js_compare


def key_tuple(interner, v):
    cls, khi, klo, vid = interner.encode(v)
    return (cls, khi, klo, vid)


def test_number_key_orders_like_floats():
    rng = random.Random(0)
    values = [rng.uniform(-1e12, 1e12) for _ in range(500)]
    values += [0.0, -0.0, 1e-300, -1e-300, math.inf, -math.inf, 1.5, -1.5, 2**53]
    values.sort()
    keys = [number_key(v) for v in values]
    assert keys == sorted(keys)


def test_number_key_negative_zero_collapses():
    assert number_key(0.0) == number_key(-0.0)


def test_nan_sorts_above_inf():
    assert number_key(math.nan) > number_key(math.inf)


def test_interner_total_order_matches_js_for_numbers():
    interner = ValueInterner()
    rng = random.Random(1)
    values = [rng.uniform(-1e6, 1e6) for _ in range(200)] + [True, False, 0, 1, -1]
    for a in rng.sample(values, 50):
        for b in rng.sample(values, 50):
            cmp_js = js_compare(a, b)
            ka, kb = key_tuple(interner, a)[:3], key_tuple(interner, b)[:3]
            if cmp_js > 0 and not (ka == kb):
                assert ka > kb
            elif cmp_js < 0:
                assert ka < kb


def test_interner_strings_lexicographic():
    interner = ValueInterner()
    words = ["apple", "banana", "Apple", "zebra", "aardvark", "banana!", "b"]
    keys = {w: key_tuple(interner, w)[:3] for w in words}
    for a in words:
        for b in words:
            if a < b:
                assert keys[a] < keys[b], (a, b)


def test_interner_classes_ordered():
    interner = ValueInterner()
    null_k = key_tuple(interner, None)
    num_k = key_tuple(interner, 5)
    str_k = key_tuple(interner, "5")
    arr_k = key_tuple(interner, [1, 2])
    assert null_k[0] == CLS_NULL
    assert num_k[0] == CLS_NUMBER
    assert str_k[0] == CLS_STRING
    assert arr_k[0] == CLS_OPAQUE
    assert null_k < num_k < str_k < arr_k


def test_interner_roundtrip_and_identity():
    interner = ValueInterner()
    values = [None, True, False, 0, 1, -3.5, "hello", "", [1, "a", None], [1, ["b"]]]
    vids = []
    for v in values:
        _, _, _, vid = interner.encode(v)
        vids.append(vid)
        assert interner.decode(vid) == v
    # re-encoding returns the same vid
    for v, vid in zip(values, vids):
        assert interner.encode(v)[3] == vid


def test_bool_and_number_same_key_distinct_vid():
    interner = ValueInterner()
    k_true = interner.encode(True)
    k_one = interner.encode(1)
    assert k_true[:3] == k_one[:3]  # JS coerces in comparisons
    assert k_true[3] != k_one[3]  # but === distinguishes


def test_string_order_index_rebalance():
    idx = StringOrderIndex()
    # force adjacent inserts; ranks must stay ordered through rebalances
    words = []
    for i in range(200):
        w = "a" * (i % 17) + chr(ord("a") + (i * 7) % 26)
        idx.insert(w)
        words.append(w)
    uniq = sorted(set(words))
    ranks = [idx.rank(w) for w in uniq]
    assert ranks == sorted(ranks)
    assert len(set(ranks)) == len(ranks)


def test_interner_rebalance_rekeys_existing_strings():
    interner = ValueInterner()
    epoch0 = interner.epoch
    # adversarial: insert strings in an order forcing midpoint exhaustion
    base = "m"
    strings = [base]
    interner.encode(base)
    for i in range(80):
        base = base + ("a" if i % 2 else "z")
        strings.append(base)
        interner.encode(base)
    # regardless of rebalances, final keys must be lexicographically ordered
    keys = {s: interner.key_of(interner.encode(s)[3]) for s in strings}
    for a in strings:
        for b in strings:
            if a < b:
                assert keys[a] < keys[b]
    assert interner.epoch >= epoch0


def test_key_table_gather():
    interner = ValueInterner()
    for v in [None, 1, "x", [3]]:
        interner.encode(v)
    cls, khi, klo = interner.key_table()
    vid = interner.encode("x")[3]
    assert (cls[vid], khi[vid], klo[vid]) == tuple(interner.encode("x")[:3])


def test_scalar_and_bulk_number_storage_agree():
    """Code-review r2: the decoded value for a vid must not depend on which
    ingest path interned it first (scalar stored raw 5.0 / -0.0 where bulk
    canonicalized to 5 / 0)."""
    import numpy as np

    from bullet_tpu.utils.encode import ValueInterner, bulk_encode_numbers

    a = ValueInterner()
    _, _, _, vid_scalar = a.encode(5.0)
    assert a.decode(vid_scalar) == 5 and type(a.decode(vid_scalar)) is int
    _, _, _, vz = a.encode(-0.0)
    assert a.decode(vz) == 0 and type(a.decode(vz)) is int

    b = ValueInterner()
    _, _, _, vids = bulk_encode_numbers(b, np.array([5.0, -0.0]))
    assert a.decode(vid_scalar) == b.decode(int(vids[0]))
    assert a.decode(vz) == b.decode(int(vids[1]))
    # non-integral and huge floats stay floats
    _, _, _, vf = a.encode(2.5)
    assert type(a.decode(vf)) is float
    _, _, _, vbig = a.encode(1e300)
    assert type(a.decode(vbig)) is float


def test_lazy_bulk_decode_bit_exact():
    """Bulk-interned numbers materialize lazily from the order key; the
    sign-flip transform is bijective, so decode must round-trip every
    class of float64 exactly (and canonicalize like the scalar path)."""
    import math

    import numpy as np

    from bullet_tpu.utils.encode import ValueInterner, bulk_encode_numbers

    vals = np.array(
        [0.0, -0.0, 5.0, -3.5, np.nan, np.inf, -np.inf, 1e308, -1e-308,
         2.0**62, -(2.0**62), 5e-324, math.pi, -math.pi]
    )
    it = ValueInterner()
    _, _, _, vids = bulk_encode_numbers(it, vals)
    ref = ValueInterner()
    for i, f in enumerate(vals.tolist()):
        expect = ref.decode(ref.encode(f)[3])
        got = it.decode(int(vids[i]))
        if isinstance(expect, float) and math.isnan(expect):
            assert isinstance(got, float) and math.isnan(got)
        else:
            assert got == expect and type(got) is type(expect), (f, got, expect)
    # decode memoizes: second read returns the same object
    assert it.decode(int(vids[2])) is it.decode(int(vids[2]))


def test_key_table_is_a_snapshot():
    """key_table() must return copies — the interner keeps growing/re-keying
    its columns after export (device re-keying holds the old snapshot)."""
    it = ValueInterner()
    it.encode(1.5)
    cls, khi, klo = it.key_table()
    before = (cls.copy(), khi.copy(), klo.copy())
    for i in range(2000):  # force column growth + string inserts
        it.encode(float(i))
        it.encode(f"s{i}")
    assert (cls == before[0]).all() and (khi == before[1]).all()
    assert (klo == before[2]).all()


def test_bulk_encode_strings_matches_scalar_with_rebalance():
    """One batch insert must be bit-identical to sequential scalar encodes —
    vids, final keys, AND the epoch counter — including through forced
    midpoint-exhaustion respreads."""
    from bullet_tpu.utils.encode import ValueInterner, bulk_encode_strings

    strings = ["m"]
    for i in range(80):  # nested midpoints force respreads
        strings.append(strings[-1] + ("a" if i % 2 else "z"))
    strings += ["m", "alpha", "zeta", strings[40]]  # dups + easy keys

    bulk = ValueInterner()
    c1, h1, l1, v1 = bulk_encode_strings(bulk, strings)
    scalar = ValueInterner()
    enc = [scalar.encode(s) for s in strings]
    assert bulk.epoch == scalar.epoch and bulk.epoch > 0
    for i, (_, _, _, v) in enumerate(enc):
        # vids match exactly; keys compare POST-rebalance (a scalar encode's
        # returned key is a snapshot that later respreads re-key)
        assert v1[i] == v, strings[i]
        assert (c1[i], h1[i], l1[i]) == scalar.key_of(v), strings[i]
        assert bulk.key_of(int(v1[i])) == scalar.key_of(v), strings[i]
    # pre-existing strings rekeyed identically too
    pre = ValueInterner()
    pre.encode("k1")
    pre.encode("k2")
    c2, h2, l2, v2 = bulk_encode_strings(pre, strings)
    assert pre.key_of(pre.encode("k1")[3]) < pre.key_of(pre.encode("k2")[3])
    order = sorted(set(strings) | {"k1", "k2"})
    keys = {s: pre.key_of(pre.encode(s)[3]) for s in order}
    for a, b in zip(order, order[1:]):
        assert keys[a] < keys[b]


def test_bulk_encode_values_mixed():
    """Numbers, strings, null, bool, arrays in one batch: decoded values and
    classes match the scalar path; duplicate values share vids."""
    import numpy as np

    from bullet_tpu.utils.encode import (
        CLS_NULL, CLS_NUMBER, CLS_OPAQUE, CLS_STRING,
        ValueInterner, bulk_encode_values,
    )

    vals = [1.5, "x", None, True, [1, 2], "x", -7, "y", None, 1.5]
    it = ValueInterner()
    cls, khi, klo, vid = bulk_encode_values(it, vals)
    assert list(cls) == [
        CLS_NUMBER, CLS_STRING, CLS_NULL, CLS_NUMBER, CLS_OPAQUE,
        CLS_STRING, CLS_NUMBER, CLS_STRING, CLS_NULL, CLS_NUMBER,
    ]
    assert vid[1] == vid[5] and vid[0] == vid[9] and vid[2] == vid[8]
    for i, v in enumerate(vals):
        got = it.decode(int(vid[i]))
        assert got == v or (v is None and got is None), (v, got)
    # keys match a fresh scalar interner's keys for order-comparable classes
    ref = ValueInterner()
    for i, v in enumerate(vals):
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            c, h, l, _ = ref.encode(v)
            assert (cls[i], khi[i], klo[i]) == (c, h, l)


def test_string_order_index_batch_matches_python_fallback():
    """Native and pure-Python index batch APIs agree (ranks + respreads)."""
    import numpy as np

    from bullet_tpu.native import load, NativeStringOrderIndex
    from bullet_tpu.utils.encode import StringOrderIndex

    lib = load()
    if lib is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    strings = ["m"]
    for i in range(60):
        strings.append(strings[-1] + ("a" if i % 2 else "z"))
    nat, py = NativeStringOrderIndex(lib), StringOrderIndex()
    r_nat, reb_nat = nat.insert_batch(strings)
    r_py, reb_py = py.insert_batch(strings)
    assert reb_nat == reb_py
    np.testing.assert_array_equal(r_nat, r_py)
    np.testing.assert_array_equal(nat.rank_batch(strings), py.rank_batch(strings))


def test_decode_batch_matches_scalar_decode():
    """decode_batch must return the same Python objects (values AND types)
    as per-vid decode, including the lazy-number materialization +
    canonicalization corner cases, and memoize identically."""
    import numpy as np

    from bullet_tpu.utils.encode import ValueInterner

    rng = np.random.default_rng(3)
    vals = (
        [float(x) * (10.0 ** int(e)) for x, e in
         zip(rng.standard_normal(100), rng.integers(-6, 7, 100))]
        + [0.0, -0.0, 1.0, -1.0, 2.0**62, -(2.0**62), 2.0**63,
           float("inf"), float("-inf"), float("nan"), 3, -7, 2**40,
           True, False, None, "abc", "", [1, 2], [u"\U0001F600"]]
    )
    a, b = ValueInterner(), ValueInterner()
    vids_a = [a.encode(v)[3] for v in vals]
    vids_b = [b.encode(v)[3] for v in vals]
    batch = a.decode_batch(np.asarray(vids_a))        # batch first
    singles = [b.decode(v) for v in vids_b]           # scalar-only twin
    again = [a.decode(v) for v in vids_a]             # memoized re-read
    for x, y, z in zip(batch.tolist(), singles, again):
        if isinstance(y, float) and np.isnan(y):
            assert np.isnan(x) and np.isnan(z)
        else:
            assert x == y and x == z
        assert type(x) is type(y)


def test_bulk_encode_values_classification_exact():
    """bulk_encode_values' homogeneous fast paths and cached type
    dispatch must classify EXACTLY like the scalar encoder: bool (its
    own __class__) and np.bool_ never reach the numeric batch, int/str
    subclasses (IntEnum, str subclasses, np.float64) follow their base
    class, and the bulk encodes bit-match class-grouped scalar encodes
    (numbers-first vid assignment)."""
    import enum

    import numpy as np

    from bullet_tpu.utils.encode import ValueInterner, bulk_encode_values

    class E(enum.IntEnum):
        A = 5

    class S(str):
        pass

    mixed = [1, 2.5, True, False, "x", S("y"), E.A, np.float64(3.5), None,
             -0.0, float("nan"), "", 0, True, [1, 2]]
    all_nums = [3, -1.5, 0, 2**40, 7.25]
    all_strs = ["b", "", "a", "b"]

    for vals in (mixed, all_nums, all_strs):
        a, b = ValueInterner(), ValueInterner()
        cls, khi, klo, vid = bulk_encode_values(a, vals)
        # scalar twin: encode in the bulk path's vid-assignment order
        # (numbers, then strings, then the rest in encounter order)
        def kind(v):
            if isinstance(v, bool):
                return 2
            if isinstance(v, (int, float)):
                return 0
            return 1 if isinstance(v, str) else 2
        for k in (0, 1, 2):
            for v in vals:
                if kind(v) == k:
                    b.encode(v)
        expect = np.array([b.encode(v) for v in vals], dtype=np.int64).T
        np.testing.assert_array_equal(
            np.stack([cls, khi, klo, vid]).astype(np.int64), expect
        )
