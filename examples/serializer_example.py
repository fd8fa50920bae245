"""Serialization: JSON/CSV/XML round-trips with custom types.

Mirrors /root/reference/examples/bullet-serializer-example.js (writes its
exports to ./exports like the reference).
"""

import os
import re
from datetime import datetime

import _env  # noqa: F401 - sys.path + backend setup
import bullet_tpu as bt

EXPORT_DIR = os.path.join(os.path.dirname(__file__), "exports")


def main() -> None:
    bullet = bt.create({"disable_network": True, "storage": False})
    os.makedirs(EXPORT_DIR, exist_ok=True)

    bullet.get("library/books/b1").put(
        {"title": "Dune", "year": 1965, "tags": ["scifi", "classic"], "rating": 4.5}
    )
    bullet.get("library/books/b2").put(
        {"title": "Neuromancer", "year": 1984, "tags": ["cyberpunk"], "rating": 4.2}
    )
    bullet.get("library/meta").put(
        {"updated": datetime(2026, 8, 16, 12, 0, 0), "pattern": re.compile(r"b\d+")}
    )

    # JSON with custom types
    json_str = bullet.export_to_json("library", {"pretty_print": True})
    with open(os.path.join(EXPORT_DIR, "library.json"), "w") as f:
        f.write(json_str)
    print("JSON exported:", len(json_str), "bytes")

    other = bt.create({"disable_network": True, "storage": False})
    result = other.import_from_json(json_str, "imported")
    assert result["success"]
    imported = other.get("imported").value()
    assert imported["books"]["b1"]["title"] == "Dune"
    assert isinstance(imported["meta"]["updated"], datetime)
    assert imported["meta"]["pattern"].pattern == r"b\d+"
    print("JSON round-trip OK (Date and RegExp revived)")

    # CSV
    csv_str = bullet.export_to_csv("library/books")
    with open(os.path.join(EXPORT_DIR, "books.csv"), "w") as f:
        f.write(csv_str)
    print("CSV:\n" + csv_str)
    result = other.import_from_csv(csv_str, "books_csv")
    assert result["success"]
    assert other.get("books_csv/b1").value()["year"] == 1965

    # XML
    xml_str = bullet.export_to_xml("library/books")
    with open(os.path.join(EXPORT_DIR, "books.xml"), "w") as f:
        f.write(xml_str)
    result = other.import_from_xml(xml_str, "books_xml")
    assert result["success"]
    assert other.get("books_xml/b2").value()["title"] == "Neuromancer"
    print("XML round-trip OK")

    # custom type registration
    class Money:
        def __init__(self, cents, currency="USD"):
            self.cents, self.currency = cents, currency

        def __eq__(self, o):
            return (self.cents, self.currency) == (o.cents, o.currency)

    for b in (bullet, other):
        b.register_serializer_type(
            "Money",
            lambda m: {"__type": "Money", "cents": m.cents, "currency": m.currency},
            lambda d: Money(d["cents"], d["currency"]),
        )
        b.serializer.python_types[Money] = "Money"

    bullet.get("prices/p1").put({"amount": Money(1999)})
    result = other.import_from_json(bullet.export_to_json("prices"), "prices")
    assert result["success"]
    assert other.get("prices/p1").value()["amount"] == Money(1999)
    print("Custom type (Money) round-trip OK")

    bullet.close()
    other.close()
    print("Serializer example completed; exports in", EXPORT_DIR)


if __name__ == "__main__":
    main()
