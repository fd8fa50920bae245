"""Fused-depth (M) sweep for the full-P stripe multi-round kernel.

VERDICT r2 #3: M=5 was chosen from first principles (DMA ~3.8 us vs
~2.4 us compute per block-round, docs/tpu-performance.md) but never swept.
This measures M in {1, 5, 8, 10, 12, 16} at the north-star shape on real
hardware: per-round throughput (the steady-state metric the bench reports)
plus compile wall time (Mosaic unrolls M rounds per kernel, so compile cost
grows with M and gates how big M can reasonably be).

Run: BULLET_SWEEP_SHAPE=1024x1048576 python benchmarks/fuse_sweep.py
(BULLET_SWEEP_LAYOUT=rank / rank1 sweeps the 8 B / 4 B rank layouts instead —
its single-int32-compare merge halves compute per round, so the optimal
M can differ from packed's.)
Tunnel notes (CLAUDE.md): block_until_ready is unreliable here — completion
is forced by a scalar readback; per-dispatch ~10 ms is amortized by fusing
all rounds into one jit fori_loop.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ROUNDS = 240  # divisible by every swept M


def build_packed(num_peers, capacity, layout="packed"):
    from bullet_tpu.ops.packed import PackedTable
    from bullet_tpu.ops.rank import Rank1Table, RankTable

    @jax.jit
    def build():
        row = jax.lax.broadcasted_iota(jnp.int32, (num_peers, capacity), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (num_peers, capacity), 1)
        h = (row * 1103515245 + col * 40503) & 0x7FFFFFFF

        def mix(salt, mod):
            return ((h ^ salt) * 1664525 & 0x7FFFFFFF) % mod

        cls = mix(1, 4)
        cv = (cls << 28) | mix(4, 1 << 20)
        if layout == "rank1":
            return Rank1Table(
                rank=jnp.where(cls > 0, mix(8, 1 << 30) + 1, 0)
            )
        if layout == "rank":
            return RankTable(
                rank=jnp.where(cls > 0, mix(8, 1 << 30) + 1, 0), cv=cv
            )
        return PackedTable(
            khi=mix(2, 2000) - 1000, klo=mix(3, 2000) - 1000, cv=cv
        )

    return build


def time_fuse(num_peers, capacity, fuse, layout="packed", window=False):
    from bullet_tpu.ops.packed import (
        ring_multiround_packed_traced,
        ring_round_packed_traced,
        ring_window_packed_traced,
    )

    def packed_round(_, t):
        if window:
            t2, _c = ring_window_packed_traced(t, True, fuse, False)
        elif fuse == 1:
            t2, _c = ring_round_packed_traced(t, True, False)
        else:
            t2, _c = ring_multiround_packed_traced(t, True, fuse, False)
        return t2

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(t):
        out = jax.lax.fori_loop(0, ROUNDS // fuse, packed_round, t)
        return jnp.sum(out[-1]), out

    build = build_packed(num_peers, capacity, layout)
    t0 = time.perf_counter()
    s, warm = run(build())  # compile + warm
    int(s)
    compile_s = time.perf_counter() - t0
    del warm  # only ONE table fits HBM at the north-star shape: drop every
    # reference before the next build (run donates, so out aliases table)
    best = float("inf")
    for _ in range(2):
        table = build()
        int(jnp.sum(table[-1][:1, :128]))  # force build before timing
        t0 = time.perf_counter()
        s, out = run(table)
        int(s)  # scalar readback = real completion on the tunnel
        best = min(best, time.perf_counter() - t0)
        del out, table
    merges_per_s = 2 * num_peers * capacity * ROUNDS / best
    return merges_per_s, best, compile_s


def main():
    shape = os.environ.get("BULLET_SWEEP_SHAPE", "1024x1048576")
    layout = os.environ.get("BULLET_SWEEP_LAYOUT", "packed")
    # BULLET_SWEEP_WINDOW=1 sweeps the O(log m) window-join kernel instead
    # of the sequential multiround (depths need not divide ROUNDS evenly in
    # spirit, but the loop math here still requires it)
    window = os.environ.get("BULLET_SWEEP_WINDOW", "0") == "1"
    num_peers, capacity = (int(x) for x in shape.split("x"))
    sweep = [int(m) for m in os.environ.get(
        "BULLET_SWEEP_M", "40,80,120" if window else "1,5,8,10,12,16"
    ).split(",")]
    print(f"# shape P={num_peers} N={capacity} rounds={ROUNDS} "
          f"layout={layout} window={window} "
          f"backend={jax.default_backend()}", flush=True)
    results = []
    for m in sweep:
        assert ROUNDS % m == 0, m
        merges, dt, compile_s = time_fuse(
            num_peers, capacity, m, layout, window=window)
        row = {"M": m, "merges_per_s": merges, "run_s": round(dt, 3),
               "compile_s": round(compile_s, 1),
               "us_per_round": round(dt / ROUNDS * 1e6, 2)}
        results.append(row)
        print(json.dumps(row), flush=True)
    best = max(results, key=lambda r: r["merges_per_s"])
    print(f"# best: M={best['M']} at {best['merges_per_s']/1e9:.1f}B merges/s")


if __name__ == "__main__":
    main()
