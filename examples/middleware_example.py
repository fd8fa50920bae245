"""Middleware: path rewrite, transforms, field encryption, access control,
computed fields, activity log, performance timing.

Mirrors /root/reference/examples/bullet-middleware-example.js.
"""

import base64
import time

import _env  # noqa: F401 - sys.path + backend setup
import bullet_tpu as bt


def main() -> None:
    bullet = bt.create({"disable_network": True, "storage": False})
    mw = bullet.middleware

    # 1. path rewriting: v1 API reads map to v2
    bullet.get("api/v2/config").put({"version": 2})
    mw.rewrite_path(r"^api/v1/", "api/v2/")
    assert bullet.get("api/v1/config").value() == {"version": 2}
    print("1. rewrite: api/v1/config ->", bullet.get("api/v1/config").value())

    # 2. transforms: normalize emails on write, add display name on read
    mw.transform(
        "accounts",
        lambda data, path, direction: (
            {**data, "email": data.get("email", "").lower()}
            if direction == "write" and isinstance(data, dict)
            else data
        ),
        "write",
    )
    bullet.get("accounts/a1").put({"email": "USER@Example.COM"})
    assert bullet.get("accounts/a1").value()["email"] == "user@example.com"
    print("2. transform normalized email:", bullet.get("accounts/a1").value())

    # 3. field encryption
    mw.encrypt_fields(
        "secure",
        ["ssn", "card"],
        lambda v: base64.b64encode(str(v).encode()).decode(),
        lambda v: base64.b64decode(v.encode()).decode(),
    )
    bullet.get("secure/rec1").put({"name": "Jane", "ssn": "123-45-6789"})
    raw = bullet.store["secure"]["rec1"]["ssn"]
    assert raw != "123-45-6789"
    assert bullet.get("secure/rec1").value()["ssn"] == "123-45-6789"
    print("3. encrypted at rest:", raw, "-> decrypted on read")

    # 4. access control: admin area is read-only
    mw.access_control("admin", lambda path, op, *a: op != "write")
    bullet.get("admin/settings").put({"locked": True})
    assert bullet.store.get("admin", {}).get("settings") is None
    print("4. access control blocked write to admin/settings")

    # 5. computed fields via afterGet
    def add_full_name(path, data):
        if path.startswith("people/") and isinstance(data, dict) and "first" in data:
            return {**data, "fullName": f"{data['first']} {data['last']}"}
        return data

    mw.after_get(add_full_name)
    bullet.get("people/p1").put({"first": "Ada", "last": "Lovelace"})
    assert bullet.get("people/p1").value()["fullName"] == "Ada Lovelace"
    print("5. computed field:", bullet.get("people/p1").value()["fullName"])

    # 6. activity log via events
    activity = []
    bullet.on("write", lambda e: activity.append(("write", e["path"])))
    bullet.on("delete", lambda e: activity.append(("delete", e["path"])))
    bullet.get("tasks/t1").put({"title": "ship it"})
    bullet.get("tasks/t1").delete()
    assert ("write", "tasks/t1") in activity and ("delete", "tasks/t1") in activity
    print("6. activity log:", activity[-2:])

    # 7. performance timing around puts
    timings = []
    starts = {}
    mw.before_put(lambda path, data: starts.__setitem__(path, time.perf_counter()))
    mw.after_put(
        lambda path, data, old: timings.append(
            (path, time.perf_counter() - starts.pop(path, time.perf_counter()))
        )
    )
    bullet.get("perf/x").put(1)
    print(f"7. timed put: {timings[-1][0]} in {timings[-1][1]*1e6:.0f}us")

    bullet.close()
    print("Middleware example completed")


if __name__ == "__main__":
    main()
