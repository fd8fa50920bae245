"""Query/indexing behavior (reference: /root/reference/src/bullet-query.js and
examples/bullet-query-example.js)."""

import pytest

USERS = {
    "user1": {"name": "Alice", "age": 28, "active": True, "role": "admin"},
    "user2": {"name": "Bob", "age": 35, "active": True, "role": "user"},
    "user3": {"name": "Carol", "age": 42, "active": False, "role": "user"},
    "user4": {"name": "Dave", "age": 23, "active": True, "role": "editor"},
    "user5": {"name": "Eve", "age": 31, "active": True, "role": "user"},
}


@pytest.fixture
def qb(bullet_factory):
    b = bullet_factory()
    for uid, data in USERS.items():
        b.get(f"users/{uid}").put(data)
    return b


def paths(nodes):
    return sorted(n.path for n in nodes)


def test_equals_with_field(qb):
    qb.index("users", "role")
    assert paths(qb.equals("users", "role", "user")) == [
        "users/user2",
        "users/user3",
        "users/user5",
    ]


def test_equals_lazy_index(qb):
    # no explicit index() call — built lazily (bullet-query.js:194-196)
    assert paths(qb.equals("users", "role", "admin")) == ["users/user1"]


def test_equals_boolean(qb):
    assert paths(qb.equals("users", "active", False)) == ["users/user3"]


def test_range_numeric(qb):
    assert paths(qb.range("users", "age", 28, 35)) == [
        "users/user1",
        "users/user2",
        "users/user5",
    ]


def test_count(qb):
    assert qb.count("users", "role", "user") == 3
    assert qb.count("users", "role", "nobody") == 0


def test_filter(qb):
    out = qb.filter("users", lambda v, k: isinstance(v, dict) and v.get("age", 0) > 30)
    assert paths(out) == ["users/user2", "users/user3", "users/user5"]


def test_find(qb):
    node = qb.find("users", lambda v, k: isinstance(v, dict) and v.get("name") == "Eve")
    assert node is not None and node.path == "users/user5"
    assert qb.find("users", lambda v, k: False) is None


def test_map(qb):
    names = qb.map("users", lambda v, k: v.get("name") if isinstance(v, dict) else None)
    assert sorted(n for n in names if n) == ["Alice", "Bob", "Carol", "Dave", "Eve"]


def test_index_updates_on_write(qb):
    qb.index("users", "role")
    qb.get("users/user6").put({"name": "Frank", "age": 50, "role": "admin"})
    assert paths(qb.equals("users", "role", "admin")) == ["users/user1", "users/user6"]


def test_leaf_index_without_field(bullet_factory):
    b = bullet_factory()
    b.get("scores/a").put(10)
    b.get("scores/b").put(20)
    b.get("scores/c").put(10)
    b.index("scores")
    assert paths(b.equals("scores", 10)) == ["scores/a", "scores/c"]
    assert b.count("scores", 20) == 1


def test_leaf_index_maintained(bullet_factory):
    b = bullet_factory()
    b.get("scores/a").put(10)
    b.index("scores")
    b.get("scores/b").put(15)
    assert paths(b.equals("scores", 15)) == ["scores/b"]


def test_range_three_arg_leaf_form(bullet_factory):
    b = bullet_factory()
    for key, v in [("a", 5), ("b", 15), ("c", 25)]:
        b.get(f"n/{key}").put(v)
    assert paths(b.range("n", 10, 30)) == ["n/b", "n/c"]


def test_query_disabled(bullet_factory):
    b = bullet_factory(enable_indexing=False)
    b.get("u/a").put({"x": 1})
    assert b.equals("u", "x", 1) == []
    assert b.range("u", "x", 0, 2) == []
    assert b.find("u", lambda v, k: True) is None
    assert b.count("u", "x", 1) == 0
