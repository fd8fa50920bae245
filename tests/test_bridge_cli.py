"""db <-> engine bridge and the standalone peer CLI."""

import json
import os
import socket
import subprocess
import sys
import time

import bullet_tpu as bt
from bullet_tpu.models.bridge import (
    dump_sim_into_bullet,
    load_bullet_into_sim,
    sim_from_bullet,
)
from bullet_tpu.models.netsim import PeerNetworkSim


def test_bullet_to_sim_and_back(bullet_factory):
    b = bullet_factory()
    b.get("users/a").put({"name": "Ann", "age": 30, "tags": ["x"]})
    b.get("users/b").put({"name": "Bo"})
    b.get("counters/hits").put(42)

    sim = sim_from_bullet(b, num_peers=4, topology="mesh")
    assert sim.tables_equal()
    assert sim.get(3, "users/a") == {"name": "Ann", "age": 30, "tags": ["x"]}
    assert sim.get(2, "counters/hits") == 42

    out = bullet_factory()
    n = dump_sim_into_bullet(sim, out, peer=1)
    assert n >= 5
    assert out.get("users/a").value() == b.get("users/a").value()
    assert out.get("counters/hits").value() == 42
    # dumped writes went through the CRT: meta clocks exist
    assert "users/a/name" in out.meta


def test_load_counts_leaves(bullet_factory):
    b = bullet_factory()
    b.get("x").put({"a": 1, "b": {"c": 2, "d": 3}})
    sim = PeerNetworkSim(2, capacity=64, topology="ring")
    n = load_bullet_into_sim(b, sim, peer=0)
    assert n == 3


def test_cli_serve_and_speak():
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    proc = subprocess.Popen(
        [sys.executable, "-m", "bullet_tpu", "serve", "--host", "127.0.0.1",
         "--port", "0"],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
    )
    try:
        port = None
        deadline = time.time() + 15
        while time.time() < deadline and port is None:
            line = proc.stdout.readline()
            if "listening on" in line:
                port = int(line.rsplit(":", 1)[1])
        assert port, "server did not report a port"

        # speak the protocol from a raw socket
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        s.sendall(json.dumps({"type": "handshake", "peerId": "cli-test",
                              "id": "h1"}).encode() + b"\n")
        reader = s.makefile("rb")
        resp = json.loads(reader.readline())
        assert resp["type"] == "handshake-response"
        s.sendall(json.dumps({"type": "put", "path": "cli/x",
                              "data": {"v": 1}, "id": "m1",
                              "ttl": 4}).encode() + b"\n")
        time.sleep(0.4)
        s.close()
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_bulk_load_matches_scalar_puts(bullet_factory):
    """load_bullet_into_sim's one-put_bulk load must converge to EXACTLY
    the state per-leaf scalar puts produce (paths are unique per
    traversal, so the batch lattice reduction has no winners to pick).
    Comparison is on DECODED values: bulk interning assigns vids
    class-grouped while scalar puts intern in encounter order, so raw
    table bits legitimately differ between the two sims."""
    b = bullet_factory()
    b.get("users/a").put({"name": "Ann", "age": 30, "ok": True,
                          "tags": ["x", 2], "nested": {"deep": {"v": -0.5}}})
    b.get("counters/hits").put(42)
    b.get("empty_str").put("")

    for layout in ("dense", "rank1"):
        kw = {} if layout == "dense" else {"layout": layout}
        bulk = PeerNetworkSim(3, capacity=128, topology="ring", **kw)
        scalar = PeerNetworkSim(3, capacity=128, topology="ring", **kw)
        n = load_bullet_into_sim(b, bulk, peer=0)

        def traverse(obj, prefix):
            if not isinstance(obj, dict):
                scalar.put(0, prefix, obj)
                return 1
            return sum(
                traverse(v, f"{prefix}/{k}" if prefix else str(k))
                for k, v in obj.items()
            )

        assert n == traverse(b.store, "")
        bulk.run_until_converged()
        scalar.run_until_converged()
        assert bulk.tables_equal() and scalar.tables_equal()
        for slot in range(len(scalar.host.paths)):
            path = scalar.host.paths.path(slot)
            assert bulk.get(2, path) == scalar.get(2, path), (layout, path)
        assert bulk.get(1, "users/a/nested/deep/v") == -0.5
        assert bulk.get(0, "users/a/ok") is True
        assert bulk.get(2, "empty_str") == ""
