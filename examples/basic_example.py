"""Basic put/get/on with encrypted file storage and restart-restore.

Mirrors /root/reference/examples/bullet-example.js (timer choreography
replaced by straight-line code).
"""

import shutil
import tempfile

import _env  # noqa: F401 - sys.path + backend setup
import bullet_tpu as bt


def main() -> None:
    storage_path = tempfile.mkdtemp(prefix="bullet-data-")
    options = {
        "disable_network": True,  # reference: server: false
        "storage": True,
        "storage_path": storage_path,
        "save_interval": 0,
        "encrypt": True,
        "encryption_key": "my-secret-key",
    }

    bullet = bt.create(options)

    bullet.get("users/john").on(lambda data: print("User data updated:", data))

    bullet.get("users/john").put(
        {"name": "John Doe", "email": "john@example.com", "age": 30}
    )
    bullet.get("users/john").put(
        {"name": "John Doe", "email": "john@example.com", "age": 31,
         "lastLogin": "2026-08-16T00:00:00Z"}
    )
    print("Current store:", bullet.store)

    print("Shutting down...")
    bullet.close()

    print("Reopening database...")
    restored = bt.create(options)
    print("Restored data:", restored.store)
    john = restored.get("users/john").value()
    print("Restored user data:", john)
    assert john["age"] == 31 and john["name"] == "John Doe"
    restored.close()

    shutil.rmtree(storage_path, ignore_errors=True)
    print("Example completed")


if __name__ == "__main__":
    main()
