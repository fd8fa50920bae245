"""Benchmark: merged graph ops/sec/chip (the BASELINE.json primary metric).

Runs the flagship gossip-merge step on the default backend (the real TPU
under the driver). The measured unit is one CRT merge decision — one
(entry vs entry) winner-select, i.e. what one bullet-crt ``resolve`` call
does per path (/root/reference/src/bullet-crt.js:164-279). The reference
publishes no numbers (BASELINE.md: ``published: {}``), so ``vs_baseline``
is measured against the north-star target of 100M merged ops/sec.

Measurement notes: rounds are fused into a single compiled ``fori_loop``
(dispatch through the axon tunnel costs ~10 ms/call), and completion is
forced with a scalar readback — ``block_until_ready`` does not reliably
block on the experimental axon platform.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time


def _enable_compile_cache() -> None:
    """Persistent compile cache: kernel compiles cost minutes through the
    axon tunnel; caching makes repeated bench runs start hot."""
    try:
        import jax

        cache_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass


def make_table(num_peers: int, capacity: int):
    """Cheap deterministic pseudo-random table, built in one fused jit call
    (jax.random would add 14 slow dispatches through the tunnel)."""
    import jax
    import jax.numpy as jnp

    from bullet_tpu.ops.merge import TableState

    @jax.jit
    def build():
        row = jax.lax.broadcasted_iota(jnp.int32, (num_peers, capacity), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (num_peers, capacity), 1)
        h = (row * 1103515245 + col * 40503) & 0x7FFFFFFF

        def mix(salt, mod):
            return ((h ^ salt) * 1664525 & 0x7FFFFFFF) % mod

        return TableState(
            cls=mix(1, 4),
            khi=mix(2, 2000) - 1000,
            klo=mix(3, 2000) - 1000,
            vid=mix(4, 1 << 20),
            writer=mix(5, num_peers),
            ctr=mix(6, 1 << 20),
            tick=mix(7, 1 << 10),
        )

    return build()


def bench_gossip(num_peers: int, capacity: int, rounds: int, impl: str) -> float:
    """Entries merged per second for repeated ring gossip rounds
    (2 neighbor merges per round), all rounds fused into one compiled loop.

    impl: "xla" (fused by XLA), "pallas" (generic merge kernel ×2), "fused"
    (single-pass ring-round Pallas kernel), "lean" (4-array value-key
    variant), "packed" (3-array 12 B/entry layout, in-place stripes),
    "rank" (2-array 8 B/entry layout — 16 B/entry/round of HBM traffic and
    a single-compare merge), or "rank1" (1-array 4 B/entry layout — the
    rank bijection alone, 8 B/entry/round and one compare + one select,
    the fastest layout; see ops/rank.py Rank1Table)."""
    import jax
    import jax.numpy as jnp

    from bullet_tpu.ops.merge import (
        TableState,
        merge_tables_pallas,
        merge_tables_xla,
    )
    from bullet_tpu.ops.packed import packed_ring_supported
    from bullet_tpu.ops.ring_kernel import ring_round_pallas, ring_round_pallas_lean

    if impl in ("packed", "rank", "rank1"):
        # the compact layouts bench at the BASELINE.json north-star shape
        # (1,024 peers × 1M slots: 12.9 GB packed, 8.6 GB rank, 4.3 GB
        # rank1) — the dense layouts cannot hold it on one chip, which is
        # the point
        num_peers, capacity = 1024, 1 << 20
        if not packed_ring_supported(num_peers, capacity):
            raise RuntimeError("packed stripe kernel unsupported at this shape")
        from bullet_tpu.ops.packed import PackedTable
        from bullet_tpu.ops.rank import Rank1Table, RankTable

        @jax.jit
        def build_packed():
            row = jax.lax.broadcasted_iota(jnp.int32, (num_peers, capacity), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (num_peers, capacity), 1)
            h = (row * 1103515245 + col * 40503) & 0x7FFFFFFF

            def mix(salt, mod):
                return ((h ^ salt) * 1664525 & 0x7FFFFFFF) % mod

            cls = mix(1, 4)
            cv = (cls << 28) | mix(4, 1 << 20)
            if impl == "rank1":
                # rank 0 = absent; live ranks spread over the 31-bit gap
                # space like a real RankIndex would — the rank is the
                # WHOLE entry (4 B), no payload column
                return Rank1Table(
                    rank=jnp.where(cls > 0, mix(8, 1 << 30) + 1, 0)
                )
            if impl == "rank":
                # rank 0 = absent (cls 0); live ranks spread over the 31-bit
                # gap space like a real RankIndex would
                return RankTable(
                    rank=jnp.where(cls > 0, mix(8, 1 << 30) + 1, 0), cv=cv
                )
            return PackedTable(
                khi=mix(2, 2000) - 1000, klo=mix(3, 2000) - 1000, cv=cv
            )

        from bullet_tpu.ops.packed import (
            ring_multiround_packed_traced,
            ring_window_packed_traced,
            stripe_fuse,
            stripe_window,
        )

        # M rounds fuse per block-load. Two fused kernels, same bit-exact
        # contract (state after k*M fused blocks == k*M classic rounds,
        # tested in interpret mode AND on hardware):
        # - window-join (ring_window_packed_traced): m rounds as a
        #   radius-m window join in O(log m) 3-way joins — the merge is an
        #   idempotent lattice join, so m Jacobi rounds ≡ one radius-m
        #   window. rank1 m=120: 9.0 T merges/s; rank m=40: 2.6 T.
        # - sequential multiround (stripe_fuse-deep): packed nf=3, whose
        #   window body exceeds scoped VMEM at this stripe — 93.7 B at M=8.
        # Honesty bound: total rounds stay under the P/2=512 ring diameter,
        # so every simulated round genuinely advances the protocol state
        # (past the diameter the table is at its fixed point and "rounds"
        # would be free no-ops).
        nf = {"packed": 3, "rank": 2, "rank1": 1}[impl]
        window = stripe_window(nf)
        if window:
            fuse = window
            rounds = 4 * fuse if impl == "rank1" else 480 // fuse * fuse
            rounds = min(rounds, num_peers // 2 // fuse * fuse)
        else:
            fuse = stripe_fuse(nf)
            # >= 6 fused blocks (multiple of the fuse depth): the ~60 ms
            # of fixed dispatch+readback overhead through the tunnel must
            # be amortized or it shaves ~20% off the steady-state rate
            rounds = max(rounds, 6 * fuse)
            rounds -= rounds % fuse

        def packed_round(_, t):
            # traced (not the jit wrapper): the pallas in->out aliasing makes
            # the donated fori carry update fully in place
            if window:
                t2, _c = ring_window_packed_traced(t, True, fuse, False)
            else:
                t2, _c = ring_multiround_packed_traced(t, True, fuse, False)
            return t2

        import functools

        # the table must be DONATED and RETURNED: at 12.9 GB a fori-carry
        # copy exceeds HBM, and a donated input only aliases in place when a
        # matching output exists. Rebuild (one cheap fused jit) per run.
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_packed(t):
            out = jax.lax.fori_loop(0, rounds // fuse, packed_round, t)
            return jnp.sum(out[-1]), out

        s, warm_out = run_packed(build_packed())  # compile + warm
        int(s)
        del warm_out
        ptable = build_packed()
        int(jnp.sum(ptable[-1][:1, :128]))  # force build before timing
        t0 = time.perf_counter()
        s, out = run_packed(ptable)
        int(s)  # scalar readback = real completion
        dt = time.perf_counter() - t0
        del out
        # windowed=True ⇒ the count is LOGICAL merge decisions (rounds
        # advanced × entries × 2 neighbors); the window kernel performs
        # O(log m) physical joins per m logical rounds (see docs/
        # tpu-performance.md) — the JSON label must say so.
        return (
            2 * num_peers * capacity * rounds / dt,
            num_peers,
            capacity,
            bool(window),
        )

    def one_round(_, t):
        if impl == "lean":
            t2, _c = ring_round_pallas_lean(t, wrap=True)
            return t2
        if impl == "fused":
            t2, _c = ring_round_pallas(t, mode="reference", wrap=True)
            return t2
        merge = merge_tables_pallas if impl == "pallas" else merge_tables_xla
        m1, _c1 = merge(t, TableState(*(jnp.roll(f, 1, axis=0) for f in t)), mode="reference")
        m2, _c2 = merge(m1, TableState(*(jnp.roll(f, -1, axis=0) for f in t)), mode="reference")
        return m2

    @jax.jit
    def run(t):
        out = jax.lax.fori_loop(0, rounds, one_round, t)
        return jnp.sum(out.vid)  # scalar result forces full execution

    table = make_table(num_peers, capacity)
    int(run(table))  # compile + warm

    t0 = time.perf_counter()
    int(run(table))  # timed: scalar readback = real completion
    dt = time.perf_counter() - t0
    return 2 * num_peers * capacity * rounds / dt, num_peers, capacity, False


def main() -> None:
    import jax

    _enable_compile_cache()
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    if on_tpu:
        # the compact-layout impls round this up to >= 2 fused blocks of
        # their tuned per-arity fuse depth (stripe_fuse)
        num_peers, capacity, rounds = 256, 1 << 18, 32
        # ordered best-first; the rest are FALLBACKS only (each impl costs
        # minutes of compile through the tunnel, and the measured order is
        # stable: rank1 (4 B/entry, window-join fused) 9.0T >
        # rank (8 B/entry, window-join fused) 2.6T > packed+multiround
        # 93.7B > lean 17.6B > fused 9.7B > xla 5.1B)
        impls = ["rank1", "rank", "packed", "lean", "fused", "xla"]
    else:  # CPU smoke sizing
        num_peers, capacity, rounds = 16, 1 << 14, 5
        impls = ["xla"]

    # BULLET_BENCH_ALL=1 measures every impl and reports the true best —
    # for regression hunting (e.g. if 'packed' ever drops below 'lean').
    # The default reports the FIRST impl that runs: each extra impl costs
    # minutes of compile through the device tunnel, and the ordering above
    # is measured-stable.
    bench_all = os.environ.get("BULLET_BENCH_ALL", "0") == "1"
    best = 0.0
    best_impl = None
    best_shape = (num_peers, capacity)
    best_windowed = False
    errors = []
    for impl in impls:
        try:
            rate, bp, bn, windowed = bench_gossip(num_peers, capacity, rounds, impl)
        except Exception as err:  # noqa: BLE001 - report the impl that works
            errors.append((impl, err))
            continue
        if rate > best:
            best, best_impl, best_shape = rate, impl, (bp, bn)
            best_windowed = windowed
        if not bench_all:
            break  # first success is the headline; don't pay 3 more compiles

    if best_impl is None:
        # every impl raised: fail loudly instead of printing a zero metric
        import sys
        import traceback

        for impl, err in errors:
            print(f"bench impl '{impl}' failed:", file=sys.stderr)
            traceback.print_exception(type(err), err, err.__traceback__)
        raise SystemExit(1)

    north_star = 100e6  # BASELINE.json north_star: >100M merged ops/sec
    # Window-join runs count LOGICAL merge decisions (m rounds advanced ×
    # entries × 2 neighbors) computed via O(log m) physical joins; the
    # label and unit say so explicitly so the recorded number is
    # self-describing (docs/tpu-performance.md has the full accounting).
    kind = "windowed (logical) merges" if best_windowed else "merges"
    print(
        json.dumps(
            {
                "metric": f"merged graph ops/sec/chip (ring gossip, {best_impl}, "
                f"{kind}, P={best_shape[0]}, N={best_shape[1]}, "
                f"backend={backend})",
                "value": round(best),
                "unit": f"{kind}/s",
                "vs_baseline": round(best / north_star, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
