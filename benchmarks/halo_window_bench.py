"""Hardware timing for the WINDOWED HALO kernel at P past the full-P
stripe budget (VERDICT r4 item 3: rank1 P=8192 must beat the 8-round
halo's 652.8 B merges/s by >= 5x).

Methodology matches bench.py's packed path: hash-built table (one fused
jit), k window passes fused in a donated fori_loop, scalar readback for
real completion, logical-merge accounting (rounds advanced x entries x 2
neighbors) with total rounds under the P/2 ring diameter so every
simulated round genuinely advances protocol state.

Usage:
  python benchmarks/halo_window_bench.py                 # shipped depth
  python benchmarks/halo_window_bench.py --sweep 40 80 120
  python benchmarks/halo_window_bench.py --halo8         # the fallback
"""

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

P, N = 8192, 1 << 18


def build_rank1():
    from bullet_tpu.ops.rank import Rank1Table

    @jax.jit
    def build():
        row = jax.lax.broadcasted_iota(jnp.int32, (P, N), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (P, N), 1)
        h = (row * 1103515245 + col * 40503) & 0x7FFFFFFF

        def mix(salt, mod):
            return ((h ^ salt) * 1664525 & 0x7FFFFFFF) % mod

        return Rank1Table(
            rank=jnp.where(mix(1, 4) > 0, mix(8, 1 << 30) + 1, 0)
        )

    return build()


def time_window(m: int) -> float:
    from bullet_tpu.ops.packed import ring_window_halo_packed_traced

    rounds = 4 * m  # 4 passes; <= P/2 = 4096 ring diameter

    def one(_, t):
        t2, _c = ring_window_halo_packed_traced(t, True, m, False)
        return t2

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(t):
        out = jax.lax.fori_loop(0, rounds // m, one, t)
        return jnp.sum(out[-1]), out

    s, warm = run(build_rank1())
    int(s)
    del warm
    t = build_rank1()
    int(jnp.sum(t[-1][:1, :128]))
    t0 = time.perf_counter()
    s, out = run(t)
    int(s)
    dt = time.perf_counter() - t0
    del out
    rate = 2 * P * N * rounds / dt
    print(f"halo window m={m}: {dt:.3f}s for {rounds} rounds "
          f"-> {rate / 1e12:.2f} T logical merges/s", flush=True)
    return rate


def time_halo8() -> float:
    """The shipped fallback this kernel replaces: the HALO_FUSE=8
    trapezoidal frontier, all stripes dirty (the blind-jump case)."""
    from bullet_tpu.ops.packed import (
        HALO_FUSE,
        frontier_halo_multiround_packed_traced,
        frontier_ids_compact,
        _halo_tiles_packed,
    )

    _tile_p, tile_n = _halo_tiles_packed(P, N)
    t_total = N // tile_n
    rounds = 480 // HALO_FUSE * HALO_FUSE

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

    s, warm = run(build_rank1())
    int(s)
    del warm
    t = build_rank1()
    int(jnp.sum(t[-1][:1, :128]))
    t0 = time.perf_counter()
    s, out = run(t)
    int(s)
    dt = time.perf_counter() - t0
    del out
    rate = 2 * P * N * rounds / dt
    print(f"halo-8 frontier (all dirty): {dt:.3f}s for {rounds} rounds "
          f"-> {rate / 1e9:.1f} B logical merges/s", flush=True)
    return rate


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--halo8" in args:
        time_halo8()
        args.remove("--halo8")
    if args and args[0] == "--sweep":
        for m in [int(x) for x in args[1:]]:
            time_window(m)
    else:
        from bullet_tpu.ops.packed import halo_window

        time_window(halo_window(1))
