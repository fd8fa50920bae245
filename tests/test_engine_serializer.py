"""Engine serializer facade: export/import a peer's replica through the
db-layer serializer (reference formats), completing the component twin."""

import json

import numpy as np
import pytest

from bullet_tpu.models.netsim import PeerNetworkSim


@pytest.fixture
def sim():
    s = PeerNetworkSim(4, capacity=256, topology="ring")
    s.put(0, "users/u1/name", "alice")
    s.put(1, "users/u1/age", 30)
    s.put(2, "users/u2/name", "bob")
    s.put(3, "users/u2/age", 25)
    s.run_until_converged()
    assert s.tables_equal()
    return s


def test_export_json_roundtrip(sim):
    out = sim.export_to_json(0, "users")
    envelope = json.loads(out)
    assert envelope["format"] == "bullet-json"
    assert envelope["data"]["u1"] == {"name": "alice", "age": 30}

    # import into a fresh sim at one peer, converge, read everywhere
    sim2 = PeerNetworkSim(4, capacity=256, topology="mesh")
    result = sim2.import_from_json(2, out, "users")
    assert result["success"]
    sim2.run_until_converged()
    assert sim2.get(0, "users/u2/name") == "bob"
    assert sim2.get(3, "users/u1/age") == 30


def test_export_csv_and_import(sim):
    csv_out = sim.export_to_csv(1, "users")
    assert "name" in csv_out.splitlines()[0]
    sim2 = PeerNetworkSim(2, capacity=128, topology="ring")
    result = sim2.import_from_csv(0, csv_out, "people")
    assert result["success"]
    sim2.run_until_converged()
    assert sim2.get(1, "people/u1/age") == 30


def test_export_xml_and_import(sim):
    xml_out = sim.export_to_xml(2, "users")
    assert xml_out.startswith("<?xml")
    sim2 = PeerNetworkSim(2, capacity=128, topology="ring")
    result = sim2.import_from_xml(1, xml_out, "mirror")
    assert result["success"]
    sim2.run_until_converged()
    assert sim2.get(0, "mirror/u1/name") == "alice"


def test_export_matches_across_replicas(sim):
    """Converged replicas serialize identically from any peer."""
    outs = {sim.export_to_json(p, "users") for p in range(4)}
    assert len(outs) == 1


def test_import_failure_enqueues_nothing():
    sim = PeerNetworkSim(2, capacity=128, topology="ring")
    result = sim.import_from_json(0, "{not json", "x")
    assert not result["success"]
    sim.run_until_converged()
    assert sim.get(0, "x") is None
    assert sim.stats["ops_enqueued"] == 0


def test_packed_layout_serializes_too():
    sim = PeerNetworkSim(2, capacity=128, topology="ring", layout="packed")
    sim.put(0, "k/v", 7)
    sim.run_until_converged()
    envelope = json.loads(sim.export_to_json(1))
    assert envelope["data"]["k"]["v"] == 7
