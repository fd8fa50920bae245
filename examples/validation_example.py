"""Schema validation: types, formats, enums, ranges, nested properties,
custom validators, error handlers.

Mirrors /root/reference/examples/bullet-validation-example.js — but here the
schemas actually gate the write path (the reference's hook is dead code,
SURVEY quirk Q1).
"""

import _env  # noqa: F401 - sys.path + backend setup
import bullet_tpu as bt


def main() -> None:
    bullet = bt.create({"disable_network": True, "storage": False})

    errors = []
    bullet.on_validation_error("all", lambda e: errors.append(f"[{e.type}] {e}"))

    bullet.define_schema(
        "user",
        {
            "type": "object",
            "required": ["username", "email"],
            "properties": {
                "username": {"type": "string", "min": 3, "max": 20},
                "email": {"type": "string", "format": "email"},
                "age": {"type": "integer", "min": 13, "max": 120},
                "role": {"type": "string", "enum": ["admin", "user", "editor"]},
                "verified": {"type": "boolean"},
                "profile": {
                    "type": "object",
                    "properties": {
                        "bio": {"type": "string", "max": 100},
                        "website": {"type": "string", "format": "url"},
                    },
                },
            },
        },
    )
    bullet.define_schema(
        "product",
        {
            "type": "object",
            "required": ["name", "price"],
            "properties": {
                "name": {"type": "string"},
                "price": {"type": "number", "min": 0},
                "sku": {"type": "string", "pattern": r"^[A-Z]{3}-\d{4}$"},
                "even_stock": {"type": "integer", "validators": [lambda v: v % 2 == 0]},
            },
        },
    )
    bullet.apply_schema("users", "user")
    bullet.apply_schema("products", "product")

    print("1. Valid user:")
    bullet.get("users/valid").put(
        {"username": "alice", "email": "alice@example.com", "age": 30, "role": "admin"}
    )
    assert bullet.get("users/valid").value()["username"] == "alice"
    print("   stored OK")

    cases = [
        ("missing_email", {"username": "no_email"}),
        ("wrong_age", {"username": "wrong_age", "email": "w@x.io", "age": "twenty"}),
        ("bad_email", {"username": "bad_email", "email": "not-an-email"}),
        ("bad_role", {"username": "bad_role", "email": "r@x.io", "role": "superuser"}),
        ("too_young", {"username": "young", "email": "y@x.io", "age": 7}),
        ("short_name", {"username": "ab", "email": "s@x.io"}),
    ]
    for i, (uid, data) in enumerate(cases, start=2):
        before = len(errors)
        bullet.get(f"users/{uid}").put(data)
        stored = bullet.store.get("users", {}).get(uid)
        print(f"{i}. Invalid user ({uid}): blocked={stored is None}, "
              f"error={errors[before] if len(errors) > before else None}")
        assert stored is None

    print("8. Nested property put (bio too long):")
    bullet.get("users/valid/profile/bio").put("x" * 200)
    assert bullet.get("users/valid").value().get("profile", {}).get("bio") != "x" * 200
    print("   blocked")

    print("9. Custom validator (odd stock):")
    bullet.get("products/p1").put({"name": "Widget", "price": 9.5, "even_stock": 3})
    assert bullet.store.get("products", {}).get("p1") is None
    print("   blocked")

    print("10. Explicit validate():")
    ok = bullet.validate("product", {"name": "Gadget", "price": 1, "sku": "ABC-1234"})
    print("   valid:", ok)
    try:
        bullet.validate("product", {"name": "Gadget", "price": -5})
        raise AssertionError("should have raised")
    except bt.ValidationError as e:
        print("   invalid raises:", e)

    print(f"Captured {len(errors)} validation errors via handlers")
    bullet.close()
    print("Validation example completed")


if __name__ == "__main__":
    main()
