"""Wire interop with bullet-js: real RFC 6455 WebSocket transport.

A bullet_tpu node can join an actual bullet-js network — ``ws://`` peer
URLs speak the exact reference wire protocol (x-peer-id upgrade header,
JSON text frames, handshake/handshake-response messages;
/root/reference/src/bullet-network.js:43-63,139-218). This demo runs a
three-node network mixing both framings on one port, then drives a raw
WebSocket client the way the `ws` npm package would.
"""

import json
import socket
import time

import _env  # noqa: F401 - sys.path + backend setup
import bullet_tpu as bt
from bullet_tpu.db import ws


def wait_for(predicate, timeout=15.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(0.05)
    return False


def main() -> None:
    hub = bt.create({"storage": False, "host": "127.0.0.1", "port": 0,
                     "connect_sync_delay": 0.05})
    ws_peer = bt.create({"storage": False, "host": "127.0.0.1", "port": 0,
                         "peers": [f"ws://127.0.0.1:{hub.network.port}"],
                         "connect_sync_delay": 0.05})
    tcp_peer = bt.create({"storage": False, "host": "127.0.0.1", "port": 0,
                          "peers": [f"tcp://127.0.0.1:{hub.network.port}"],
                          "connect_sync_delay": 0.05})
    try:
        assert wait_for(lambda: len(hub.network.peers) == 2)
        framings = sorted(c.framing for c in hub.network.peers.values())
        print(f"hub serves two framings on one port: {framings}")
        assert framings == ["ndjson", "ws-server"]

        ws_peer.get("greetings/ws").put("over websocket frames")
        tcp_peer.get("greetings/tcp").put("over ndjson lines")
        want = {"ws": "over websocket frames", "tcp": "over ndjson lines"}
        assert wait_for(lambda: all(
            p.get("greetings").value() == want for p in (hub, ws_peer, tcp_peer)
        ))
        print("flood relay crossed framings: all three replicas agree")

        # a hand-rolled WebSocket client, byte-for-byte what `ws` would send
        sock = socket.create_connection(("127.0.0.1", hub.network.port), 5)
        reader = sock.makefile("rb")
        assert ws.client_handshake(sock, reader, "127.0.0.1",
                                   hub.network.port, {"x-peer-id": "js-node"})
        sock.sendall(ws.encode_frame(json.dumps(
            {"type": "handshake", "id": "h1", "peerId": "js-node"}
        ).encode(), ws.OP_TEXT, mask=True))
        resp = json.loads(ws.read_message(reader, sock, client_side=True))
        print(f"raw client handshake answered: {resp['type']} from {resp['peerId'][:8]}…")
        sock.sendall(ws.encode_frame(json.dumps(
            {"type": "put", "id": "p1", "path": "from/js", "data": 7, "ttl": 32}
        ).encode(), ws.OP_TEXT, mask=True))
        assert wait_for(lambda: hub.get("from/js").value() == 7)
        assert wait_for(lambda: tcp_peer.get("from/js").value() == 7)
        print("raw WebSocket put flooded through to the NDJSON peer")
        sock.close()
        print("WS interop example completed")
    finally:
        hub.close()
        ws_peer.close()
        tcp_peer.close()


if __name__ == "__main__":
    main()
