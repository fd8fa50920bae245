"""Schema validation behavior (reference: /root/reference/src/bullet-validation.js
and examples/bullet-validation-example.js). Unlike the reference (quirk Q1),
validation gates the real write path here."""

import pytest

from bullet_tpu.db.validation import ValidationError

USER_SCHEMA = {
    "type": "object",
    "required": ["username", "email"],
    "properties": {
        "username": {"type": "string", "min": 3, "max": 20},
        "email": {"type": "string", "format": "email"},
        "age": {"type": "integer", "min": 13, "max": 120},
        "role": {"type": "string", "enum": ["admin", "user", "editor"]},
        "website": {"type": "string", "format": "url"},
        "tags": {"type": "array", "max": 5},
        "profile": {
            "type": "object",
            "properties": {
                "bio": {"type": "string", "max": 100},
                "location": {"type": "string"},
            },
        },
    },
}


@pytest.fixture
def vb(bullet_factory):
    b = bullet_factory()
    b.define_schema("user", USER_SCHEMA)
    b.apply_schema("users", "user")
    return b


def ok_user(**over):
    base = {"username": "alice", "email": "a@example.com", "age": 30, "role": "admin"}
    base.update(over)
    return base


def test_valid_put_passes(vb):
    vb.get("users/alice").put(ok_user())
    assert vb.get("users/alice").value()["username"] == "alice"


def test_missing_required_blocked(vb):
    vb.get("users/bob").put({"username": "bob"})
    assert "bob" not in vb.store.get("users", {})


def test_wrong_type_blocked(vb):
    vb.get("users/x").put(ok_user(age="old"))
    assert "x" not in vb.store.get("users", {})


def test_enum_blocked(vb):
    vb.get("users/x").put(ok_user(role="superuser"))
    assert "x" not in vb.store.get("users", {})


def test_range_blocked(vb):
    vb.get("users/x").put(ok_user(age=7))
    assert "x" not in vb.store.get("users", {})


def test_string_length(vb):
    vb.get("users/x").put(ok_user(username="ab"))
    assert "x" not in vb.store.get("users", {})


def test_email_format(vb):
    vb.get("users/x").put(ok_user(email="not-an-email"))
    assert "x" not in vb.store.get("users", {})


def test_nested_property_put(vb):
    """Sub-path puts validate against the governing ancestor schema
    (bullet-validation.js:218-248)."""
    vb.get("users/alice").put(ok_user())
    vb.get("users/alice/age").put(35)
    assert vb.get("users/alice/age").value() == 35
    vb.get("users/alice/age").put("ancient")
    assert vb.get("users/alice/age").value() == 35


def test_nested_object_property(vb):
    vb.get("users/alice").put(ok_user(profile={"bio": "hi", "location": "x"}))
    vb.get("users/alice/profile/bio").put("b" * 200)  # exceeds max 100
    assert vb.get("users/alice/profile/bio").value() == "hi"


def test_error_handlers_fire(vb):
    by_type, all_errors = [], []
    vb.on_validation_error("required", by_type.append)
    vb.on_validation_error("all", all_errors.append)
    vb.get("users/x").put({"username": "nope"})
    assert by_type and by_type[0].type == "required"
    assert all_errors


def test_explicit_validate_raises(vb):
    assert vb.validate("user", ok_user()) is True
    with pytest.raises(ValidationError):
        vb.validate("user", {"username": "x"})


def test_unknown_schema_raises(vb):
    with pytest.raises(KeyError):
        vb.validate("ghost", {})
    with pytest.raises(KeyError):
        vb.apply_schema("p", "ghost")


def test_additional_properties_false(bullet_factory):
    b = bullet_factory()
    b.define_schema(
        "strict",
        {
            "type": "object",
            "additionalProperties": False,
            "properties": {"a": {"type": "number"}},
        },
    )
    b.apply_schema("s", "strict")
    b.get("s").put({"a": 1, "b": 2})
    assert b.store.get("s") is None or "b" not in b.store.get("s", {})
    b.get("s").put({"a": 1})
    assert b.get("s").value() == {"a": 1}


def test_custom_validators(bullet_factory):
    b = bullet_factory()
    b.define_schema(
        "even",
        {
            "type": "object",
            "properties": {"n": {"type": "integer", "validators": [lambda v: v % 2 == 0]}},
        },
    )
    b.apply_schema("e", "even")
    b.get("e").put({"n": 3})
    assert b.store.get("e") is None
    b.get("e").put({"n": 4})
    assert b.get("e").value() == {"n": 4}


def test_formats():
    from bullet_tpu.db.validation import BulletValidation

    check = BulletValidation._check_format
    assert check("a@b.co", "email")
    assert not check("a b", "email")
    assert check("https://x.io/y", "url")
    assert check("2024-01-01", "date")
    assert check("2024-01-01T10:00:00Z", "date-time")
    assert check("123e4567-e89b-42d3-a456-426614174000", "uuid")
    assert check("192.168.0.1", "ipv4")
    assert not check("192.168.0", "ipv4")
    assert check("fe80::1", "ipv6")


def test_validate_on_write_off_restores_reference_quirk(bullet_factory):
    """validate_on_write=False restores Q1: invalid puts go through."""
    b = bullet_factory(validate_on_write=False)
    b.define_schema("user", USER_SCHEMA)
    b.apply_schema("users", "user")
    b.get("users/x").put({"bogus": True})
    assert b.get("users/x").value() == {"bogus": True}


def test_remove_schema(vb):
    vb.validation.remove_schema("users")
    vb.get("users/x").put({"anything": 1})
    assert vb.get("users/x").value() == {"anything": 1}
