"""Wire-fuzz chaos soak (VERDICT r5 item 7): a byte-mangling TCP proxy
sits on one live link and randomly truncates, duplicates, and bit-flips
the stream in BOTH directions — NDJSON lines and RFC 6455 ws frames —
while writer threads flood every peer.

Contract being soaked: garbage is dropped per message (the reference
catches JSON.parse failures per message, bullet-network.js:239-246; our
read loop additionally isolates handler errors per message), NO thread
dies with an uncaught exception (threading.excepthook is armed for the
whole run), the process stays up, and after the fuzzed link is severed
all peers still reach full store equality through the clean links +
anti-entropy.

Peers run ``compare: "total"`` — a bit flip can forge a put that applies
the SAME message id (flood dedup then suppresses the clean relay) and
the SAME clock with a different value/type on one replica only, which is
exactly the identical-clock incomparable conflict the reference's
comparator resolves by arrival order (bullet-crt.js:11-15). The total
order is what makes convergence a theorem here rather than a likelihood,
and this soak doubles as its system test."""

import socket
import threading
import time

import numpy as np
import pytest

import bullet_tpu as bt


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _leaves(store, prefix=""):
    out = {}
    for k, v in store.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_leaves(v, p))
        else:
            out[p] = v
    return out


class _FuzzProxy:
    """Bidirectional TCP proxy that corrupts the byte stream.

    Per 4096-byte chunk: 5% truncate at a random offset, 5% duplicate the
    whole chunk, 15% flip one random bit. Protocol-agnostic, so the same
    mangling hits NDJSON framing (resyncs at the next newline) and ws
    frames (can desync the framing entirely — the reader must treat that
    as a dead link, not a crash)."""

    def __init__(self, target_port: int, seed: int):
        self._target_port = target_port
        self._rng = np.random.default_rng(seed)
        self._rng_lock = threading.Lock()
        self._stop = threading.Event()
        self._socks: list = []
        self._threads: list = []
        self.mutations = 0
        self._lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._lsock.bind(("127.0.0.1", 0))
        self._lsock.listen(8)
        self.port = self._lsock.getsockname()[1]
        t = threading.Thread(
            target=self._accept, name="fuzzproxy-accept", daemon=True
        )
        t.start()
        self._threads.append(t)

    def _accept(self) -> None:
        while not self._stop.is_set():
            try:
                down, _ = self._lsock.accept()
            except OSError:
                return
            try:
                up = socket.create_connection(
                    ("127.0.0.1", self._target_port), timeout=5
                )
            except OSError:
                down.close()
                continue
            self._socks += [down, up]
            for src, dst, tag in ((down, up, "up"), (up, down, "down")):
                t = threading.Thread(
                    target=self._pump, args=(src, dst),
                    name=f"fuzzproxy-pump-{tag}", daemon=True,
                )
                t.start()
                self._threads.append(t)

    def _mutate(self, data: bytes) -> bytes:
        with self._rng_lock:
            r = float(self._rng.random())
            if r < 0.05:
                self.mutations += 1
                return data[: int(self._rng.integers(0, len(data)))]
            if r < 0.10:
                self.mutations += 1
                return data + data
            if r < 0.25:
                self.mutations += 1
                i = int(self._rng.integers(0, len(data)))
                bit = 1 << int(self._rng.integers(0, 8))
                return data[:i] + bytes([data[i] ^ bit]) + data[i + 1:]
        return data

    def _pump(self, src: socket.socket, dst: socket.socket) -> None:
        try:
            while not self._stop.is_set():
                data = src.recv(4096)
                if not data:
                    break
                data = self._mutate(data)
                if data:
                    dst.sendall(data)
        except OSError:
            pass
        finally:
            for s in (src, dst):
                try:
                    s.close()
                except OSError:
                    pass

    def close(self) -> None:
        self._stop.set()
        try:
            self._lsock.close()
        except OSError:
            pass
        for s in self._socks:
            try:
                s.close()
            except OSError:
                pass
        for t in self._threads:
            t.join(timeout=5)


@pytest.mark.parametrize("framing", ["tcp", "ws"])
@pytest.mark.parametrize("seed", [0, 1])
def test_chaos_wire_fuzz_garbage_mid_flood(framing, seed):
    thread_errors: list = []
    orig_hook = threading.excepthook

    def hook(args):
        thread_errors.append(
            (args.thread.name if args.thread else "?", args.exc_value)
        )

    threading.excepthook = hook
    p0_port = _free_port()
    proxy = _FuzzProxy(p0_port, seed=100 + seed)
    common = {"storage": False, "host": "127.0.0.1",
              "compare": "total", "connect_sync_delay": 0.1,
              "reconnect_interval": 0.3}
    p0 = bt.create({**common, "port": p0_port})
    # p1 reaches p0 ONLY through the fuzzing proxy; p2 is the clean path
    p1 = bt.create({
        **common, "port": 0,
        "peers": [f"{framing}://127.0.0.1:{proxy.port}"],
    })
    p2 = bt.create({
        **common, "port": 0,
        "peers": [f"tcp://127.0.0.1:{p0_port}",
                  f"tcp://127.0.0.1:{p1.network.port}"],
    })
    peers = [p0, p1, p2]
    writer_errors: list = []

    def writer(peer_idx: int, thread_idx: int) -> None:
        rng = np.random.default_rng(10 * seed + 3 * peer_idx + thread_idx)
        try:
            for i in range(60):
                roll = int(rng.integers(8))
                key = f"data/k{int(rng.integers(16))}"
                if roll == 0:
                    peers[peer_idx].get(key).put(None)
                elif roll == 1:
                    peers[peer_idx].get(key).put(
                        {"n": int(rng.integers(1000)),
                         "s": f"w{peer_idx}.{thread_idx}.{i}"})
                elif roll == 2:
                    peers[peer_idx].get(key).put(f"s{int(rng.integers(99))}")
                else:
                    peers[peer_idx].get(key).put(float(rng.integers(1 << 20)))
                if i % 20 == 7:
                    time.sleep(0.01)
        except Exception as exc:  # noqa: BLE001 - the soak's assertion
            writer_errors.append((peer_idx, thread_idx, exc))

    try:
        time.sleep(0.6)  # let the mesh (incl. the fuzzed dial) connect
        threads = [
            threading.Thread(target=writer, args=(pi, ti))
            for pi in range(3) for ti in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
            assert not t.is_alive(), "writer thread hung"
        assert not writer_errors, writer_errors

        # keep pushing traffic through the fuzzed link (a corrupted ws
        # frame kills the connection; reconnect_interval=0.3 revives it)
        # until enough chunks were actually mangled — a short flood can
        # fit in a handful of recv() chunks and leave the fuzzer idle
        fill = "x" * 512  # fatten frames so the flood spans many chunks
        deadline = time.time() + 60
        i = 0
        while proxy.mutations < 6 and time.time() < deadline:
            p1.get(f"fill/f{i % 32}").put(f"{fill}{i}")
            i += 1
            if i % 8 == 0:
                p1.network.request_sync()
                time.sleep(0.2)
        assert proxy.mutations >= 3, (
            f"fuzz proxy only mutated {proxy.mutations} chunks — "
            "the soak exercised nothing")
        proxy.close()

        deadline = time.time() + 90
        last = None
        while time.time() < deadline:
            for p in peers:
                p.network.request_sync()
            time.sleep(0.5)
            last = [_leaves(p.store) for p in peers]
            if last[0] and all(s == last[0] for s in last[1:]):
                break
        assert last[0] and all(s == last[0] for s in last[1:]), (
            "peers failed to converge after wire fuzz: sizes "
            + str([len(s) for s in last])
        )

        # no thread anywhere died with an uncaught exception — garbage is
        # dropped per message, never allowed to kill a reader
        assert not thread_errors, thread_errors
    finally:
        threading.excepthook = orig_hook
        proxy.close()
        for p in peers:
            p.close()
