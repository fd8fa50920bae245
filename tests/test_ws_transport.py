"""RFC 6455 WebSocket transport (db/ws.py + network.py ws:// framing): wire
interop surface for real bullet-js peers (/root/reference/src/
bullet-network.js:43-63, 72, 143-218)."""

import io
import json
import socket
import time

import pytest

import bullet_tpu as bt
from bullet_tpu.db import ws


def wait_for(predicate, timeout=15.0, interval=0.05):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(interval)
    return False


def make_peer(**over):
    opts = {
        "storage": False,
        "host": "127.0.0.1",
        "port": 0,
        "connect_sync_delay": 0.05,
        "reconnect_interval": 0.5,
    }
    opts.update(over)
    return bt.create(opts)


# ------------------------------------------------------------- frame layer


def test_accept_key_rfc_vector():
    # the worked example from RFC 6455 §1.3
    assert (
        ws.accept_key("dGhlIHNhbXBsZSBub25jZQ==")
        == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    )


@pytest.mark.parametrize("size", [0, 5, 125, 126, 300, 70000])
@pytest.mark.parametrize("mask", [False, True])
def test_frame_roundtrip(size, mask):
    payload = bytes(i % 251 for i in range(size))
    frame = ws.encode_frame(payload, ws.OP_BINARY, mask=mask)
    opcode, fin, out = ws.read_frame(io.BytesIO(frame))
    assert (opcode, fin, out) == (ws.OP_BINARY, True, payload)


def test_read_message_handles_ping_and_fragments():
    a, b = socket.socketpair()
    try:
        reader = a.makefile("rb")
        # ping followed by a fragmented text message
        b.sendall(ws.encode_frame(b"hi", ws.OP_PING))
        part1 = ws.encode_frame(b"hel", ws.OP_TEXT)
        part1 = bytes([part1[0] & 0x7F]) + part1[1:]  # clear FIN
        part2 = ws.encode_frame(b"lo", ws.OP_CONT)
        b.sendall(part1 + part2)
        assert ws.read_message(reader, a, client_side=False) == "hello"
        # the ping got a pong back
        opcode, _fin, payload = ws.read_frame(b.makefile("rb"))
        assert opcode == ws.OP_PONG and payload == b"hi"
    finally:
        a.close()
        b.close()


# --------------------------------------------------------------- transport


def test_ws_flood_and_sync_between_peers():
    """Two bullet peers over a real ws:// link: flood + anti-entropy."""
    p1 = make_peer()
    p2 = make_peer(peers=[f"ws://127.0.0.1:{p1.network.port}"])
    try:
        assert wait_for(lambda: p1.network.peers and p2.network.peers, 10)
        conn = next(iter(p2.network.peers.values()))
        assert conn.framing == "ws-client"
        srv = next(iter(p1.network.peers.values()))
        assert srv.framing == "ws-server"

        p2.get("a/b").put({"v": 1})
        p1.get("c/d").put({"v": 2})
        assert wait_for(lambda: p1.store.get("a", {}).get("b") == {"v": 1})
        assert wait_for(lambda: p2.store.get("c", {}).get("d") == {"v": 2})

        p1.set_data("pre/existing", 42, broadcast=False)
        p2.network.request_sync()
        assert wait_for(lambda: p2.store.get("pre", {}).get("existing") == 42)
    finally:
        p1.close()
        p2.close()


def test_mixed_framing_one_port():
    """The server auto-detects framing: one NDJSON peer and one WS peer on
    the same port, all three converge by flood relay."""
    hub = make_peer()
    nd = make_peer(peers=[f"tcp://127.0.0.1:{hub.network.port}"])
    wsp = make_peer(peers=[f"ws://127.0.0.1:{hub.network.port}"])
    try:
        assert wait_for(lambda: len(hub.network.peers) == 2, 10)
        nd.get("from/nd").put(1)
        wsp.get("from/ws").put(2)
        assert wait_for(lambda: wsp.store.get("from", {}).get("nd") == 1)
        assert wait_for(lambda: nd.store.get("from", {}).get("ws") == 2)
    finally:
        hub.close()
        nd.close()
        wsp.close()


def test_raw_ws_client_like_bullet_js():
    """A hand-rolled WebSocket client following the exact bullet-js wire
    sequence (upgrade with x-peer-id header, handshake message, JSON text
    frames) can exchange puts with a bullet_tpu server."""
    srv = make_peer()
    sock = None
    try:
        sock = socket.create_connection(("127.0.0.1", srv.network.port), 5)
        reader = sock.makefile("rb")
        assert ws.client_handshake(
            sock, reader, "127.0.0.1", srv.network.port,
            {"x-peer-id": "raw-js-peer"},
        )
        sock.sendall(ws.encode_frame(
            json.dumps({"type": "handshake", "id": "m1",
                        "peerId": "raw-js-peer"}).encode(),
            ws.OP_TEXT, mask=True))
        # server answers handshake-response (bullet-network.js:261-269)
        msg = json.loads(ws.read_message(reader, sock, client_side=True))
        assert msg["type"] == "handshake-response"
        assert msg["peerId"] == srv.id

        # a put from the "js" peer floods into the server's store
        sock.sendall(ws.encode_frame(
            json.dumps({"type": "put", "id": "m2", "path": "js/value",
                        "data": {"n": 7}, "ttl": 32}).encode(),
            ws.OP_TEXT, mask=True))
        assert wait_for(lambda: srv.store.get("js", {}).get("value") == {"n": 7})

        # a local server put broadcasts back as a ws text frame
        srv.get("srv/value").put(9)
        deadline = time.time() + 10
        got = None
        while time.time() < deadline:
            text = ws.read_message(reader, sock, client_side=True)
            assert text is not None
            m = json.loads(text)
            if m.get("type") == "put" and m.get("path") == "srv/value":
                got = m
                break
        assert got and got["data"] == 9, got
    finally:
        if sock is not None:
            sock.close()
        srv.close()


def test_wss_tls_dial(tmp_path):
    """wss:// peers dial over TLS (code-review r2: a plain socket to a TLS
    listener looped reconnects forever). A minimal TLS WebSocket responder
    stands in for a TLS-terminated bullet-js peer."""
    import ssl
    import subprocess
    import threading

    key, crt = str(tmp_path / "k.pem"), str(tmp_path / "c.pem")
    gen = subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout", key,
         "-out", crt, "-days", "1", "-nodes", "-subj", "/CN=127.0.0.1"],
        capture_output=True,
    )
    if gen.returncode != 0:
        pytest.skip(f"openssl unavailable: {gen.stderr[:80]}")

    server_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    server_ctx.load_cert_chain(crt, key)
    listener = socket.socket()
    listener.bind(("127.0.0.1", 0))
    listener.listen(1)
    port = listener.getsockname()[1]
    got = {}

    def serve():
        raw, _ = listener.accept()
        tls = server_ctx.wrap_socket(raw, server_side=True)
        reader = tls.makefile("rb")
        line = reader.readline()
        headers = ws.server_handshake(reader, tls, line)
        got["peer_header"] = headers.get("x-peer-id")
        tls.sendall(ws.encode_frame(json.dumps(
            {"type": "handshake-response", "id": "s1",
             "peerId": "tls-peer"}).encode(), ws.OP_TEXT))
        # read the client's handshake message
        got["client_msg"] = json.loads(
            ws.read_message(reader, tls, client_side=False))
        time.sleep(0.3)
        tls.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    client_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    client_ctx.check_hostname = False
    client_ctx.verify_mode = ssl.CERT_NONE
    p = make_peer(peers=[f"wss://127.0.0.1:{port}"], ssl_context=client_ctx)
    try:
        assert wait_for(lambda: "tls-peer" in p.network.peers, 10)
        t.join(timeout=5)
        assert got["peer_header"] == p.id
        assert got["client_msg"]["type"] == "handshake"
    finally:
        p.close()
        listener.close()


def test_ws_peer_feeds_live_engine_bridge():
    """Composition: a real ws:// link (bullet-js wire) feeding the live
    engine bridge — flooded writes land in a rank1 device replica."""
    from bullet_tpu.models.bridge import attach_live_bridge
    from bullet_tpu.models.netsim import PeerNetworkSim

    sim = PeerNetworkSim(2, capacity=128, topology="ring", layout="rank1")
    p1 = make_peer(connect_sync_delay=600)
    p2 = make_peer(peers=[f"ws://127.0.0.1:{p1.network.port}"],
                   connect_sync_delay=600)
    handle = attach_live_bridge(p1, sim, peer=0)
    try:
        assert wait_for(lambda: p1.network.peers and p2.network.peers, 10)
        assert next(iter(p2.network.peers.values())).framing == "ws-client"
        p2.get("w/x").put(7)
        p2.get("w/obj").put({"s": "over-ws"})
        assert wait_for(lambda: p1.store.get("w", {}).get("x") == 7)
        assert wait_for(
            lambda: (p1.store.get("w", {}).get("obj") or {}).get("s")
            == "over-ws"
        )
        handle.flush()
        assert sim.get(0, "w/x") == 7
        assert sim.get(0, "w/obj/s") == "over-ws"
        assert sim.tables_equal()
    finally:
        handle.detach()
        p1.close()
        p2.close()
