"""Serialization round-trips (reference: /root/reference/src/bullet-serializer.js
and examples/bullet-serializer-example.js)."""

import json
import re
from datetime import datetime


def test_json_envelope(bullet_factory):
    b = bullet_factory()
    b.get("app/cfg").put({"name": "x", "version": 2})
    out = json.loads(b.export_to_json("app/cfg"))
    assert out["format"] == "bullet-json"
    assert out["version"] == "1.0"
    assert out["path"] == "app/cfg"
    assert out["data"] == {"name": "x", "version": 2}
    assert "metadata" in out


def test_json_roundtrip(bullet_factory):
    b1, b2 = bullet_factory(), bullet_factory()
    b1.get("users/a").put({"name": "A", "scores": [1, 2, 3], "nested": {"k": True}})
    exported = b1.export_to_json("users/a")
    result = b2.import_from_json(exported, "copied")
    assert result["success"]
    assert b2.get("copied").value() == b1.get("users/a").value()


def test_json_import_invalid_format(bullet_factory):
    b = bullet_factory()
    result = b.import_from_json('{"not": "bullet"}')
    assert result["success"] is False


def test_custom_types_roundtrip(bullet_factory):
    b1, b2 = bullet_factory(), bullet_factory()
    d = datetime(2024, 3, 1, 12, 30, 45)
    b1.get("typed").put({"when": d, "pat": re.compile("ab+", re.I), "tags": {"x", "y"}})
    exported = b1.export_to_json("typed")
    raw = json.loads(exported)
    assert raw["data"]["when"]["__type"] == "Date"
    assert raw["data"]["pat"]["__type"] == "RegExp"
    assert raw["data"]["tags"]["__type"] == "Set"
    b2.import_from_json(exported, "typed")
    value = b2.get("typed").value()
    assert value["when"].replace(tzinfo=None) == d
    assert value["pat"].pattern == "ab+"
    assert value["tags"] == {"x", "y"}


def test_register_custom_type(bullet_factory):
    class Point:
        def __init__(self, x, y):
            self.x, self.y = x, y

    b1, b2 = bullet_factory(), bullet_factory()
    for b in (b1, b2):
        b.register_serializer_type(
            "Point",
            lambda p: {"__type": "Point", "x": p.x, "y": p.y},
            lambda d: Point(d["x"], d["y"]),
        )
        b.serializer.python_types[Point] = "Point"
    b1.get("geo").put({"origin": Point(3, 4)})
    out = b2.import_from_json(b1.export_to_json("geo"), "geo")
    assert out["success"]
    p = b2.get("geo").value()["origin"]
    assert (p.x, p.y) == (3, 4)


def test_max_depth_guard(bullet_factory):
    b = bullet_factory()
    b.get("deep").put({"a": {"b": {"c": {"d": 1}}}})
    out = json.loads(b.export_to_json("deep", {"max_depth": 2}))
    assert "[max depth reached]" in json.dumps(out)


def test_csv_export_children_as_rows(bullet_factory):
    b = bullet_factory()
    b.get("people/p1").put({"name": "Ann", "age": 30})
    b.get("people/p2").put({"name": 'Bo"b', "age": 25, "note": "a,b"})
    csv = b.export_to_csv("people")
    lines = csv.splitlines()
    assert lines[0].split(",")[0] == "id"
    assert '"Bo""b"' in csv
    assert '"a,b"' in csv


def test_csv_roundtrip(bullet_factory):
    b1, b2 = bullet_factory(), bullet_factory()
    b1.get("items/i1").put({"name": "widget", "price": 9.5, "active": True})
    b1.get("items/i2").put({"name": "gadget", "price": 20, "active": False})
    csv = b1.export_to_csv("items")
    result = b2.import_from_csv(csv, "items")
    assert result["success"]
    imported = b2.get("items").value()
    assert imported["i1"]["name"] == "widget"
    assert imported["i1"]["price"] == 9.5
    assert imported["i1"]["active"] is True
    assert imported["i2"]["price"] == 20


def test_csv_type_coercion(bullet_factory):
    b = bullet_factory()
    csv = "id,n,f,t,s\nrow1,42,3.14,true,hello\nrow2,,2.0,false,"
    result = b.import_from_csv(csv, "coerced")
    assert result["success"]
    data = b.get("coerced").value()
    assert data["row1"] == {"id": "row1", "n": 42, "f": 3.14, "t": True, "s": "hello"}
    assert data["row2"]["n"] is None
    assert data["row2"]["t"] is False


def test_xml_roundtrip(bullet_factory):
    b1, b2 = bullet_factory(), bullet_factory()
    b1.get("cfg").put(
        {"name": "app", "port": 8080, "debug": False, "tags": ["a", "b"], "none": None}
    )
    xml = b1.export_to_xml("cfg")
    assert xml.startswith('<?xml version="1.0"')
    assert '<port type="number">8080</port>' in xml
    result = b2.import_from_xml(xml, "cfg")
    assert result["success"]
    value = b2.get("cfg").value()
    assert value["name"] == "app"
    assert value["port"] == 8080
    assert value["debug"] is False
    assert value["tags"] == ["a", "b"]
    assert value["none"] is None


def test_xml_escaping(bullet_factory):
    b1, b2 = bullet_factory(), bullet_factory()
    b1.get("esc").put({"text": 'a<b>&"c"'})
    xml = b1.export_to_xml("esc")
    assert "&lt;" in xml and "&amp;" in xml
    result = b2.import_from_xml(xml, "esc")
    assert result["success"]
    assert b2.get("esc").value()["text"] == 'a<b>&"c"'


def test_metadata_roundtrip_rebuilds_indices(bullet_factory):
    b1, b2 = bullet_factory(), bullet_factory()
    b1.get("users/u1").put({"role": "admin"})
    b1.index("users", "role")
    exported = b1.export_to_json("users")
    b2.import_from_json(exported, "users")
    assert "users:role" in b2.query.indices
