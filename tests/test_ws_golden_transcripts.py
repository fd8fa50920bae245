"""Golden wire-transcript fixtures for bullet-js interop (no Node runtime
exists in this image, so the sessions are hand-derived line-by-line from the
reference source and replayed byte-for-byte against the live server).

Inbound bytes are constructed HERE with an independent inline RFC 6455
framer (fixed mask keys, exact header layout) — NOT with db/ws.py — so the
server's parser is pinned against literally the bytes a bullet-js peer (the
npm ``ws`` client) would emit. Outbound frames are read raw and their
header bytes asserted exactly (FIN|text = 0x81, mask bit clear, minimal
length encoding — RFC 6455 §5.2: servers MUST NOT mask); payloads are then
compared against golden message shapes with exact key sets (JSON key order
is not part of the protocol — the reference parses with JSON.parse).

Derivations:
* upgrade + handshake/handshake-response: bullet-network.js:156-199, 261-269
* put flood with ``__vectorClock``:      bullet-network.js:332-346, 404-418
                                          + bullet-crt.js:343-375
* sync request/response/chunk/complete:   bullet-network-sync.js:93-198
* partial sync (whole-subtree entries):   bullet-network-sync.js:673-705
* ``since``-incremental sync:             bullet-network-sync.js:592-604
* sync-progress cadence (>10 chunks):     bullet-network-sync.js:176-188
"""

import json
import socket
import time

import pytest

import bullet_tpu as bt

# RFC 6455 §1.3 worked example: this key MUST produce this accept token
GOLDEN_WS_KEY = "dGhlIHNhbXBsZSBub25jZQ=="
GOLDEN_WS_ACCEPT = "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="

MASK_KEY = bytes([0x12, 0x34, 0x56, 0x78])  # fixed: deterministic frames


# ---------------------------------------------------------- inline framer
# Independent of bullet_tpu.db.ws on purpose: a bug mirrored between our
# encoder and decoder would otherwise cancel out.


def client_text_frame(payload: bytes) -> bytes:
    """Masked client text frame, exactly as the npm ``ws`` package sends:
    FIN=1 RSV=0 opcode=1, mask=1, minimal length encoding, 4-byte masking
    key, payload XOR-masked (RFC 6455 §5.2-5.3)."""
    header = bytearray([0x81])
    n = len(payload)
    if n < 126:
        header.append(0x80 | n)
    elif n < (1 << 16):
        header.append(0x80 | 126)
        header += n.to_bytes(2, "big")
    else:
        header.append(0x80 | 127)
        header += n.to_bytes(8, "big")
    header += MASK_KEY
    masked = bytes(b ^ MASK_KEY[i % 4] for i, b in enumerate(payload))
    return bytes(header) + masked


def read_server_frame(reader) -> bytes:
    """Read one outbound frame, asserting the exact golden header bytes:
    0x81 (FIN + text), mask bit CLEAR, minimal length encoding."""
    b0 = reader.read(1)
    assert b0 == b"\x81", f"expected FIN|text 0x81 header, got {b0!r}"
    b1 = reader.read(1)[0]
    assert not (b1 & 0x80), "server frames must not be masked (RFC §5.2)"
    n = b1 & 0x7F
    if n == 126:
        n = int.from_bytes(reader.read(2), "big")
        assert n >= 126, "non-minimal 16-bit length encoding"
    elif n == 127:
        n = int.from_bytes(reader.read(8), "big")
        assert n >= (1 << 16), "non-minimal 64-bit length encoding"
    payload = reader.read(n)
    assert len(payload) == n
    return payload


def read_server_message(reader) -> dict:
    return json.loads(read_server_frame(reader).decode("utf-8"))


def assert_shape(msg: dict, golden: dict) -> None:
    """Exact key set; golden values compare literally, ``type`` callables
    (for volatile fields: generated ids, Date.now timestamps)."""
    assert set(msg) == set(golden), (sorted(msg), sorted(golden))
    for key, want in golden.items():
        if isinstance(want, type):
            assert isinstance(msg[key], want), (key, msg[key])
        else:
            assert msg[key] == want, (key, msg[key], want)


@pytest.fixture
def server():
    srv = bt.create({
        "storage": False,
        "host": "127.0.0.1",
        "port": 0,
        # large: the server must not interleave its own sync-request into
        # the golden transcript
        "connect_sync_delay": 60.0,
    })
    yield srv
    srv.close()


def connect_golden(server):
    """Replay the exact npm-ws upgrade request and assert the golden 101
    response line-by-line, including the RFC worked-example accept token."""
    sock = socket.create_connection(("127.0.0.1", server.network.port), 5)
    reader = sock.makefile("rb")
    request = (
        f"GET / HTTP/1.1\r\n"
        f"Host: 127.0.0.1:{server.network.port}\r\n"
        f"Upgrade: websocket\r\n"
        f"Connection: Upgrade\r\n"
        f"Sec-WebSocket-Key: {GOLDEN_WS_KEY}\r\n"
        f"Sec-WebSocket-Version: 13\r\n"
        f"x-peer-id: golden-js-peer\r\n"
        f"\r\n"
    ).encode("latin-1")
    sock.sendall(request)
    status = reader.readline()
    assert status == b"HTTP/1.1 101 Switching Protocols\r\n", status
    headers = {}
    while True:
        line = reader.readline()
        if line in (b"\r\n", b""):
            break
        name, _, value = line.decode("latin-1").strip().partition(": ")
        headers[name.lower()] = value
    assert headers["upgrade"].lower() == "websocket"
    assert headers["connection"].lower() == "upgrade"
    assert headers["sec-websocket-accept"] == GOLDEN_WS_ACCEPT
    return sock, reader


def test_golden_handshake_transcript(server):
    sock, reader = connect_golden(server)
    try:
        # client handshake, exactly bullet-network.js:162-168
        sock.sendall(client_text_frame(json.dumps({
            "type": "handshake",
            "id": "golden-msg-1",
            "peerId": "golden-js-peer",
        }).encode()))
        # server must answer handshake-response with EXACTLY the reference
        # field set (bullet-network.js:261-269)
        assert_shape(read_server_message(reader), {
            "type": "handshake-response",
            "id": str,
            "peerId": server.id,
        })
    finally:
        sock.close()


def test_golden_put_transcript_with_vector_clock(server):
    sock, reader = connect_golden(server)
    try:
        sock.sendall(client_text_frame(json.dumps({
            "type": "handshake", "id": "golden-msg-1",
            "peerId": "golden-js-peer",
        }).encode()))
        read_server_message(reader)  # handshake-response (covered above)

        # a CRT-enabled bullet-js peer floods puts whose object payloads
        # carry the vector clock inline (bullet-crt.js:374); the receiver
        # strips it and merges (bullet-crt.js:343-353)
        sock.sendall(client_text_frame(json.dumps({
            "id": "golden-msg-2",
            "type": "put",
            "path": "greet/msg",
            "data": {"text": "hi", "__vectorClock": {"golden-js-peer": 1}},
            "ttl": 32,
        }).encode()))
        deadline = time.time() + 10
        while time.time() < deadline:
            if server.get("greet/msg").value() == {"text": "hi"}:
                break
            time.sleep(0.05)
        assert server.get("greet/msg").value() == {"text": "hi"}
        # reference quirk, pinned: with no current state the receiver
        # DISCARDS the sender's clock and stores its own freshly
        # incremented one — getVectorClock initializes to {id: 1}
        # (bullet-crt.js:41-47) and the no-current-state branch increments
        # it (bullet-crt.js:172-184), hence exactly {receiver: 2}
        clock = (server.meta.get("greet/msg") or {}).get("vectorClock", {})
        assert clock == {server.id: 2}, clock

        # a local object put must flood back as the reference put message
        # (bullet-network.js:404-418) whose data carries OUR clock entry
        # (bullet-crt.js:367-375)
        server.get("srv/obj").put({"a": 1})
        msg = read_server_message(reader)
        assert_shape(msg, {
            "id": str,
            "type": "put",
            "path": "srv/obj",
            "data": dict,
            "ttl": 32,  # the reference default maxTTL (bullet-network.js:14)
        })
        assert msg["data"]["a"] == 1
        # exactly {id: 3}: getVectorClock inits {id: 1}
        # (bullet-crt.js:41-47), the local-update branch increments
        # (bullet-crt.js:358), and the no-current-state branch increments
        # the SAME aliased dict again (bullet-crt.js:173, quirk Q2)
        assert msg["data"]["__vectorClock"] == {server.id: 3}, msg["data"]
    finally:
        sock.close()


def test_golden_sync_transcript(server):
    # seed a known store so the sync payload is deterministic
    server.get("greet/msg").put({"text": "hi"})
    server.get("nums/x").put(7)

    sock, reader = connect_golden(server)
    try:
        sock.sendall(client_text_frame(json.dumps({
            "type": "handshake", "id": "golden-msg-1",
            "peerId": "golden-js-peer",
        }).encode()))
        read_server_message(reader)

        # full-sync request, exactly bullet-network-sync.js:93-99
        sock.sendall(client_text_frame(json.dumps({
            "type": "sync-request",
            "id": "golden-sync-req",
            "since": 0,
            "partial": False,
            "paths": [],
        }).encode()))

        # golden response sequence (bullet-network-sync.js:143-198):
        # sync-response, then chunks, then sync-complete — nothing else
        response = read_server_message(reader)
        assert_shape(response, {
            "type": "sync-response",
            "id": str,
            "requestId": "golden-sync-req",
            "totalChunks": 1,       # 2 leaf entries < chunk size 50
            "totalEntries": 2,      # greet/msg/text, nums/x
            "timestamp": int,
        })

        chunk = read_server_message(reader)
        assert_shape(chunk, {
            "type": "sync-chunk",
            "id": str,
            "requestId": "golden-sync-req",
            "chunkIndex": 0,
            "totalChunks": 1,
            "entries": list,
            "isLastChunk": True,
        })
        by_path = {e["path"]: e for e in chunk["entries"]}
        assert set(by_path) == {"greet/msg/text", "nums/x"}
        for entry in chunk["entries"]:
            # exact entry field set (bullet-network-sync.js:620-633)
            assert set(entry) == {
                "path", "data", "vectorClock", "lastModified", "deleted"
            }, sorted(entry)
            assert entry["deleted"] is False
            assert isinstance(entry["vectorClock"], dict)
            assert isinstance(entry["lastModified"], int)
        assert by_path["greet/msg/text"]["data"] == "hi"
        assert by_path["nums/x"]["data"] == 7

        complete = read_server_message(reader)
        assert_shape(complete, {
            "type": "sync-complete",
            "id": str,
            "requestId": "golden-sync-req",
            "timestamp": int,
        })
    finally:
        sock.close()


def test_golden_partial_sync_transcript(server):
    """Partial sync returns ONLY the requested subtrees
    (bullet-network-sync.js:101-117 request shape, :500-527 collection)."""
    server.get("greet/msg").put({"text": "hi"})
    server.get("nums/x").put(7)
    server.get("other/y").put(1)

    sock, reader = connect_golden(server)
    try:
        sock.sendall(client_text_frame(json.dumps({
            "type": "handshake", "id": "golden-msg-1",
            "peerId": "golden-js-peer",
        }).encode()))
        read_server_message(reader)

        # partial request, exactly bullet-network-sync.js:101-117
        sock.sendall(client_text_frame(json.dumps({
            "type": "sync-request",
            "id": "golden-partial-req",
            "since": 0,
            "partial": True,
            "paths": ["greet"],
        }).encode()))

        response = read_server_message(reader)
        assert_shape(response, {
            "type": "sync-response",
            "id": str,
            "requestId": "golden-partial-req",
            "totalChunks": 1,
            "totalEntries": 1,      # ONE subtree entry for "greet"
            "timestamp": int,
        })
        # unlike full sync's leaf decomposition, the reference's partial
        # collection emits the WHOLE requested subtree as a single entry
        # (bullet-network-sync.js:676-698: _getData(path) wholesale)
        chunk = read_server_message(reader)
        assert [e["path"] for e in chunk["entries"]] == ["greet"]
        entry = chunk["entries"][0]
        assert set(entry) == {
            "path", "data", "vectorClock", "lastModified", "deleted"
        }, sorted(entry)
        assert entry["data"] == {"msg": {"text": "hi"}}
        assert entry["deleted"] is False
        complete = read_server_message(reader)
        assert complete["type"] == "sync-complete"
    finally:
        sock.close()


def test_golden_incremental_since_transcript(server):
    """``since`` filters out entries older than the watermark
    (bullet-network-sync.js:602-604: lastModified < since is skipped)."""
    server.get("old/a").put(1)
    time.sleep(0.05)  # strictly separate the ms timestamps

    sock, reader = connect_golden(server)
    try:
        sock.sendall(client_text_frame(json.dumps({
            "type": "handshake", "id": "golden-msg-1",
            "peerId": "golden-js-peer",
        }).encode()))
        read_server_message(reader)

        # first full sync: harvest the responder's collection-start
        # watermark from the sync-response timestamp
        sock.sendall(client_text_frame(json.dumps({
            "type": "sync-request", "id": "golden-sync-1",
            "since": 0, "partial": False, "paths": [],
        }).encode()))
        response = read_server_message(reader)
        watermark = response["timestamp"]
        chunk = read_server_message(reader)
        assert {e["path"] for e in chunk["entries"]} == {"old/a"}
        assert read_server_message(reader)["type"] == "sync-complete"

        time.sleep(0.05)
        server.get("new/b").put(2)
        # connected peers receive the flooded put first
        # (bullet-network.js:404-418). Scalar puts additionally carry a
        # top-level vectorClock — a deliberate wire SUPERSET: the
        # reference's _handlePut destructures only {path, data, ttl} and
        # relays the untouched message (bullet-network.js:332-346), so
        # real bullet-js peers ignore the field and forward it intact,
        # while bullet_tpu receivers use it to apply scalar floods
        # causally (docs/conflict-resolution.md).
        flood = read_server_message(reader)
        assert_shape(flood, {
            "id": str, "type": "put", "path": "new/b", "data": int,
            "ttl": 32, "vectorClock": dict,
        })
        assert flood["data"] == 2
        assert all(isinstance(v, int) for v in flood["vectorClock"].values())

        # incremental sync from the watermark: only the newer write
        sock.sendall(client_text_frame(json.dumps({
            "type": "sync-request", "id": "golden-sync-2",
            "since": watermark, "partial": False, "paths": [],
        }).encode()))
        response = read_server_message(reader)
        assert_shape(response, {
            "type": "sync-response",
            "id": str,
            "requestId": "golden-sync-2",
            "totalChunks": 1,
            "totalEntries": 1,
            "timestamp": int,
        })
        chunk = read_server_message(reader)
        assert [e["path"] for e in chunk["entries"]] == ["new/b"]
        assert chunk["entries"][0]["data"] == 2
        assert read_server_message(reader)["type"] == "sync-complete"
    finally:
        sock.close()


def test_golden_sync_progress_cadence(server):
    """>10 chunks triggers sync-progress after every 10th chunk, with the
    exact reference field set and Math.floor percentages
    (bullet-network-sync.js:176-188): progress after chunk 0 (0%) and
    chunk 10 (90%) for an 11-chunk transfer, nowhere else."""
    for i in range(520):  # 520 leaves -> 11 chunks of <=50
        server.get(f"bulk/k{i}").put(i)

    sock, reader = connect_golden(server)
    try:
        sock.sendall(client_text_frame(json.dumps({
            "type": "handshake", "id": "golden-msg-1",
            "peerId": "golden-js-peer",
        }).encode()))
        read_server_message(reader)

        sock.sendall(client_text_frame(json.dumps({
            "type": "sync-request", "id": "golden-big-req",
            "since": 0, "partial": False, "paths": [],
        }).encode()))

        response = read_server_message(reader)
        assert_shape(response, {
            "type": "sync-response",
            "id": str,
            "requestId": "golden-big-req",
            "totalChunks": 11,
            "totalEntries": 520,
            "timestamp": int,
        })

        seq = []  # (type, chunkIndex) in arrival order until sync-complete
        entries_seen = 0
        while True:
            msg = read_server_message(reader)
            if msg["type"] == "sync-complete":
                seq.append(("complete", None))
                break
            if msg["type"] == "sync-chunk":
                seq.append(("chunk", msg["chunkIndex"]))
                entries_seen += len(msg["entries"])
                assert msg["isLastChunk"] == (msg["chunkIndex"] == 10)
            else:
                assert_shape(msg, {
                    "type": "sync-progress",
                    "id": str,
                    "requestId": "golden-big-req",
                    "chunkIndex": int,
                    "totalChunks": 11,
                    "progress": int,
                })
                seq.append(("progress", msg["chunkIndex"]))
                assert msg["progress"] == msg["chunkIndex"] * 100 // 11

        assert entries_seen == 520
        want = [("chunk", 0), ("progress", 0)]
        want += [("chunk", i) for i in range(1, 10)]
        want += [("chunk", 10), ("progress", 10), ("complete", None)]
        assert seq == want, seq
    finally:
        sock.close()


def test_golden_leafless_subtree_entry(server):
    """Wire superset pin: LEAFLESS subtrees with their own clock ship as
    explicit ``data: {}`` entries (docs/conflict-resolution.md #7 — a
    dominant leafless subtree is otherwise a sync black hole). The entry
    uses the standard field set, so a real bullet-js receiver resolves
    it as an ordinary object put (bullet-network-sync.js:551-560 merges
    object data through the CRT); the reference's own collector simply
    never emits one (its traverse recurses into objects and finds no
    leaves, :610-618)."""
    server.get("nums/x").put(7)
    # a leafless subtree exactly as Q3 vivification produces it: a null
    # value whose child is then read — the walk replaces null with {}
    # and vivifies the child, leaving meta (and the clock) at the root
    server.set_data("ghost/node", None, broadcast=False)
    server._get_data_raw("ghost/node/child")
    assert server.store["ghost"]["node"] == {"child": {}}

    sock, reader = connect_golden(server)
    try:
        sock.sendall(client_text_frame(json.dumps({
            "type": "handshake", "id": "golden-msg-1",
            "peerId": "golden-js-peer",
        }).encode()))
        read_server_message(reader)
        sock.sendall(client_text_frame(json.dumps({
            "type": "sync-request", "id": "golden-ghost-req",
            "since": 0, "partial": False, "paths": [],
        }).encode()))

        response = read_server_message(reader)
        assert response["totalEntries"] == 2  # nums/x + the {} entry
        chunk = read_server_message(reader)
        by_path = {e["path"]: e for e in chunk["entries"]}
        assert set(by_path) == {"nums/x", "ghost/node"}
        ghost = by_path["ghost/node"]
        # standard entry field set — indistinguishable from a dict put
        assert set(ghost) == {
            "path", "data", "vectorClock", "lastModified", "deleted"
        }, sorted(ghost)
        assert ghost["data"] == {}
        assert ghost["deleted"] is False
        assert isinstance(ghost["vectorClock"], dict) and ghost["vectorClock"]
        read_server_message(reader)  # sync-complete
    finally:
        sock.close()
