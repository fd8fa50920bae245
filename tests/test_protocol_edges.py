"""Network protocol edge cases: TTL expiry, dedup pruning, partial sync,
malformed frames."""

import json
import socket
import time

import pytest

import bullet_tpu as bt


def make_peer(**over):
    opts = {"storage": False, "host": "127.0.0.1", "port": 0,
            "connect_sync_delay": 0.05}
    opts.update(over)
    return bt.create(opts)


def raw_link(port, peer_id="raw"):
    s = socket.create_connection(("127.0.0.1", port), timeout=5)
    s.sendall(json.dumps({"type": "handshake", "peerId": peer_id,
                          "id": f"h-{peer_id}"}).encode() + b"\n")
    reader = s.makefile("rb")
    json.loads(reader.readline())  # handshake-response
    return s, reader


def test_ttl_zero_put_dropped():
    p = make_peer()
    try:
        s, _ = raw_link(p.network.port)
        s.sendall(json.dumps({"type": "put", "path": "t/x", "data": 1,
                              "id": "m1", "ttl": 0}).encode() + b"\n")
        time.sleep(0.3)
        assert "t" not in p.store
        s.close()
    finally:
        p.close()


def test_duplicate_message_id_applied_once():
    p = make_peer()
    try:
        calls = []
        p.on("write", lambda e: calls.append(e["path"]))
        s, _ = raw_link(p.network.port)
        msg = json.dumps({"type": "put", "path": "d/x", "data": {"v": 1},
                          "id": "dup-1", "ttl": 4}).encode() + b"\n"
        s.sendall(msg * 3)
        time.sleep(0.4)
        assert calls.count("d/x") == 1
        s.close()
    finally:
        p.close()


def test_dedup_cache_prunes():
    p = make_peer(message_cache_size=50)
    try:
        s, _ = raw_link(p.network.port)
        for i in range(120):
            s.sendall(json.dumps({"type": "put", "path": f"c/k{i}", "data": i,
                                  "id": f"m{i}", "ttl": 2}).encode() + b"\n")
        time.sleep(1.0)
        assert len(p.network.processed_messages) <= 60
        assert len(p.store.get("c", {})) == 120  # all still applied
        s.close()
    finally:
        p.close()


def test_partial_sync_transfers_only_named_paths():
    p1 = make_peer()
    p2 = make_peer(peers=[f"tcp://127.0.0.1:{p1.network.port}"],
                   enable_sync=True)
    try:
        deadline = time.time() + 10
        while time.time() < deadline and not p2.network.peers:
            time.sleep(0.05)
        # wait out the automatic connect sync, then clear p2
        time.sleep(1.0)
        p1.set_data("wanted/a", {"v": 1}, broadcast=False)
        p1.set_data("unwanted/b", {"v": 2}, broadcast=False)
        p2.network.request_sync(
            p1.id, {"partial": True, "paths": ["wanted/a"]}
        )
        deadline = time.time() + 10
        while time.time() < deadline and "wanted" not in p2.store:
            time.sleep(0.05)
        assert p2.store.get("wanted", {}).get("a") == {"v": 1}
        assert "unwanted" not in p2.store
    finally:
        p1.close()
        p2.close()


def test_unknown_message_type_survives():
    p = make_peer()
    try:
        seen = []
        p.network.on("unknown-message", lambda pid, m: seen.append(m["type"]))
        s, _ = raw_link(p.network.port)
        s.sendall(json.dumps({"type": "frobnicate", "id": "u1"}).encode() + b"\n")
        s.sendall(json.dumps({"type": "put", "path": "ok/x", "data": 1,
                              "id": "u2", "ttl": 2}).encode() + b"\n")
        time.sleep(0.4)
        assert seen == ["frobnicate"]
        assert p.store.get("ok", {}).get("x") == 1
        s.close()
    finally:
        p.close()


def test_handshake_required_before_messages():
    p = make_peer()
    try:
        s = socket.create_connection(("127.0.0.1", p.network.port), timeout=5)
        # no handshake: first frame is a put -> connection rejected
        s.sendall(json.dumps({"type": "put", "path": "nope/x", "data": 1,
                              "id": "n1", "ttl": 2}).encode() + b"\n")
        time.sleep(0.4)
        assert "nope" not in p.store
        assert not p.network.peers
        s.close()
    finally:
        p.close()
