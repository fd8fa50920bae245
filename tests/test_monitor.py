"""Per-peer HTTP /status endpoints + monitor aggregator (db/monitor.py).

Twin of the reference's per-node status servers and central monitor
(examples/bullet-chain-example.js:153-182,264-321;
examples/bullet-circle-network-example.js:118-139,213-274)."""

import json
import urllib.error
import urllib.request

import pytest

from bullet_tpu.db.core import Bullet
from bullet_tpu.db.monitor import MonitorServer, StatusServer, fetch_status


def _local_bullet(**opts):
    return Bullet({"disable_network": True, "storage": False, **opts})


def test_status_endpoint_payload():
    bullet = _local_bullet()
    try:
        bullet.get("nodes/node1").put({"id": 1, "status": "online"})
        bullet.get("nodes/node2").put({"id": 2, "status": "online"})
        with StatusServer(bullet) as status:
            payload = fetch_status(status.url)
            assert payload["nodeId"] == bullet.id
            assert payload["status"] == "online"
            assert payload["visibleNodes"] == 2
            assert payload["network"]["node1"]["id"] == 1
            assert payload["logLength"] == len(bullet.log)
            assert "timestamp" in payload
            # no network layer → peers empty, no syncStats key
            assert payload["peers"] == []
            assert "syncStats" not in payload
    finally:
        bullet.close()


def test_status_endpoint_404_and_extra_fields():
    bullet = _local_bullet()
    try:
        with StatusServer(
            bullet, network_path=None, extra=lambda: {"position": 7}
        ) as status:
            payload = fetch_status(status.url)
            assert payload["position"] == 7  # chain-example position field
            assert "network" not in payload
            base = status.url.rsplit("/", 1)[0]
            with pytest.raises(urllib.error.HTTPError) as err:
                urllib.request.urlopen(f"{base}/nope", timeout=5)
            assert err.value.code == 404
    finally:
        bullet.close()


def test_monitor_aggregates_online_and_error_nodes():
    bullets = [_local_bullet() for _ in range(2)]
    statuses = []
    try:
        for i, b in enumerate(bullets):
            b.get("nodes/self").put({"id": i})
            statuses.append(StatusServer(b))
        urls = [s.url for s in statuses]
        # one dead URL: the aggregator must report it as an error row, not
        # raise (bullet-circle-network-example.js:236-243)
        urls.append("http://127.0.0.1:1/status")
        with MonitorServer(urls, port=0, timeout=2.0) as monitor:
            # programmatic collection
            view = monitor.collect()
            assert view["networkSize"] == 3
            assert [n["status"] for n in view["nodes"]] == [
                "online",
                "online",
                "error",
            ]
            # spread order matches the reference: the node's own reported
            # nodeId wins over the positional one
            # (bullet-circle-network-example.js:231-235)
            assert view["nodes"][0]["nodeId"] == bullets[0].id
            assert view["nodes"][2]["nodeId"] == 3  # error row keeps position
            # the same payload over HTTP
            served = fetch_status(monitor.url)
            assert served["networkSize"] == 3
            assert {n["status"] for n in served["nodes"]} == {"online", "error"}
    finally:
        for s in statuses:
            s.close()
        for b in bullets:
            b.close()


def test_status_with_live_network_includes_sync_stats():
    """A networked pair: each peer's /status carries connected peers and
    getSyncStats() (src/bullet-network-sync.js:797-836)."""
    import time

    a = Bullet({"storage": False, "server": True, "port": 0})
    port_a = a.network.port
    b = Bullet({"storage": False, "server": False, "peers": [f"tcp://127.0.0.1:{port_a}"]})
    try:
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and not (a.network.peers and b.network.peers):
            time.sleep(0.05)
        assert a.network.peers and b.network.peers
        with StatusServer(a) as status:
            payload = fetch_status(status.url)
            assert payload["peers"] == [b.id]
            assert isinstance(payload["syncStats"], dict)
            # json round-trip sanity: payload was already served as JSON
            assert json.dumps(payload)
    finally:
        b.close()
        a.close()
