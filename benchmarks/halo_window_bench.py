"""Hardware timing for the WINDOWED HALO kernel at P past the full-P
stripe budget (VERDICT r4 item 3: rank1 P=8192 must beat the 8-round
halo's 652.8 B merges/s by >= 5x).

Methodology matches bench.py's packed path: hash-built table (one fused
jit), k window passes fused in a donated fori_loop, scalar readback for
real completion, logical-merge accounting (rounds advanced x entries x 2
neighbors) with total rounds under the P/2 ring diameter so every
simulated round genuinely advances protocol state.

Usage:
  python benchmarks/halo_window_bench.py                      # rank1 8192
  python benchmarks/halo_window_bench.py --layout packed --p 1024 --n 20 \
      --sweep 16 24 40                                        # n = log2
  python benchmarks/halo_window_bench.py --halo8              # the fallback
"""

import argparse
import functools
import os
import sys
import time

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _enable_compile_cache  # noqa: E402

_enable_compile_cache()


def build(layout: str, p: int, n: int):
    from bullet_tpu.ops.packed import PackedTable
    from bullet_tpu.ops.rank import Rank1Table, RankTable

    @jax.jit
    def go():
        row = jax.lax.broadcasted_iota(jnp.int32, (p, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (p, n), 1)
        h = (row * 1103515245 + col * 40503) & 0x7FFFFFFF

        def mix(salt, mod):
            return ((h ^ salt) * 1664525 & 0x7FFFFFFF) % mod

        cls = mix(1, 4)
        if layout == "rank1":
            return Rank1Table(rank=jnp.where(cls > 0, mix(8, 1 << 30) + 1, 0))
        if layout == "rank":
            return RankTable(
                rank=jnp.where(cls > 0, mix(8, 1 << 30) + 1, 0),
                cv=(cls << 28) | mix(4, 1 << 20),
            )
        return PackedTable(
            khi=mix(2, 2000) - 1000, klo=mix(3, 2000) - 1000,
            cv=(cls << 28) | mix(4, 1 << 20),
        )

    return go()


def time_window(layout: str, p: int, n: int, m: int) -> float:
    from bullet_tpu.ops.packed import ring_window_halo_packed_traced

    passes = max(1, min(4, (p // 2) // m))  # rounds <= P/2 ring diameter
    rounds = passes * m

    def one(_, t):
        t2, _c = ring_window_halo_packed_traced(t, True, m, False)
        return t2

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(t):
        out = jax.lax.fori_loop(0, passes, one, t)
        return jnp.sum(out[-1]), out

    s, warm = run(build(layout, p, n))
    int(s)
    del warm
    t = build(layout, p, n)
    int(jnp.sum(t[-1][:1, :128]))
    t0 = time.perf_counter()
    s, out = run(t)
    int(s)
    dt = time.perf_counter() - t0
    del out
    rate = 2 * p * n * rounds / dt
    print(f"{layout} P={p} N={n} halo window m={m}: {dt:.3f}s for {rounds} "
          f"rounds -> {rate / 1e12:.2f} T logical merges/s", flush=True)
    return rate


def time_halo8(layout: str, p: int, n: int) -> float:
    """The shipped fallback this kernel replaces: the HALO_FUSE=8
    trapezoidal frontier, all stripes dirty (the blind-jump case)."""
    from bullet_tpu.ops.packed import (
        HALO_FUSE,
        frontier_halo_multiround_packed_traced,
        frontier_ids_compact,
        _halo_tiles_packed,
    )

    _tile_p, tile_n = _halo_tiles_packed(p, n)
    t_total = n // tile_n
    rounds = min(480, p // 2) // HALO_FUSE * HALO_FUSE

    def one(_, carry):
        t, ids = carry
        t2, ids2 = frontier_halo_multiround_packed_traced(t, ids, True, False)
        # blind-jump accounting: keep every stripe dirty like pass 1
        return t2, ids

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(t):
        ids = jnp.concatenate([
            frontier_ids_compact(jnp.ones(t_total, bool), t_total),
            jnp.zeros((1,), jnp.int32),
        ])
        out, _ = jax.lax.fori_loop(0, rounds // HALO_FUSE, one, (t, ids))
        return jnp.sum(out[-1]), out

    s, warm = run(build(layout, p, n))
    int(s)
    del warm
    t = build(layout, p, n)
    int(jnp.sum(t[-1][:1, :128]))
    t0 = time.perf_counter()
    s, out = run(t)
    int(s)
    dt = time.perf_counter() - t0
    del out
    rate = 2 * p * n * rounds / dt
    print(f"{layout} P={p} N={n} halo-8 frontier (all dirty): {dt:.3f}s for "
          f"{rounds} rounds -> {rate / 1e9:.1f} B logical merges/s",
          flush=True)
    return rate


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--layout", default="rank1",
                    choices=["packed", "rank", "rank1"])
    ap.add_argument("--p", type=int, default=8192)
    ap.add_argument("--n", type=int, default=18, help="log2 slots")
    ap.add_argument("--halo8", action="store_true")
    ap.add_argument("--sweep", type=int, nargs="*", default=None)
    args = ap.parse_args()
    p, n = args.p, 1 << args.n
    if args.halo8:
        time_halo8(args.layout, p, n)
    if args.sweep is not None:
        for m in args.sweep:
            time_window(args.layout, p, n, m)
    elif not args.halo8:
        from bullet_tpu.ops.packed import halo_window

        nf = {"packed": 3, "rank": 2, "rank1": 1}[args.layout]
        time_window(args.layout, p, n, halo_window(nf) or 8)
