"""AOT memory audit of the north-star-shape device programs.

The packed table at 1,024 peers x 1M slots is ~12.9 GB — most of a v5e
chip's HBM — so every program that touches it must alias in place with
temp ~= 0 (CLAUDE.md invariant: ONE table-sized allocation; XLA:TPU
scatter always copies its operand, which is why the apply path chunks).
This script compiles (without running) the convergence, reconcile, and
probe programs at the full shape and asserts their temp allocations stay
under 256 MB. Compile-only: safe to run even when HBM is busy.

Usage: python benchmarks/memcheck.py   (needs the TPU backend for the
Mosaic kernels; prints one line per program + OK)
"""

import os
import sys

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _enable_compile_cache  # noqa: E402

_enable_compile_cache()

from bullet_tpu.ops.packed import (  # noqa: E402
    PackedTable,
    _reconcile_packed_jit,
    count_changes_round_packed,
    frontier_fuse,
    gossip_frontier_packed,
    gossip_until_converged_packed,
    ring_multiround_packed_traced,
    ring_window_packed_traced,
    stripe_fuse,
    stripe_window,
)

P, N = 1024, 1 << 20
TEMP_CAP = 1 << 28  # 256 MB — table is ~12.9 GB; temp must be tiny
GB = 1 << 30


def audit(name, lowered):
    mem = lowered.compile().memory_analysis()
    print(
        f"{name}: args {mem.argument_size_in_bytes / GB:.2f} GB, "
        f"alias {mem.alias_size_in_bytes / GB:.2f} GB, "
        f"temp {mem.temp_size_in_bytes / (1 << 20):.1f} MB",
        flush=True,
    )
    assert mem.temp_size_in_bytes < TEMP_CAP, (name, mem.temp_size_in_bytes)


def audit_stripe(name, table, nf):
    """The bench/sweep stripe multiround kernel at its shipped depth —
    scoped-vmem fit is Mosaic-side, so only an AOT compile catches a
    depth that stopped fitting (rank's nf=2 body grows ~2 MB of stack
    per unrolled round and capped at M=5; a silent M=8 regression here
    once broke bench.py's rank impl without any test noticing)."""
    audit(
        f"{name} stripe multiround (fuse={stripe_fuse(nf)})",
        jax.jit(
            ring_multiround_packed_traced,
            static_argnames=("wrap", "m", "interpret"),
            donate_argnums=(0,),
        ).lower(table, True, stripe_fuse(nf), False),
    )


def audit_window(name, table, nf):
    """The bench window-join kernel at its shipped depth. Scoped-vmem
    limits the JOIN-STEP count (a 7th unrolled step spills to HBM and
    collapses throughput ~10x without failing the compile), so this
    audit is necessary but not sufficient — depth changes also need one
    hardware timing run (see stripe_window's tuning table)."""
    w = stripe_window(nf)
    if not w:
        return
    audit(
        f"{name} stripe window (m={w})",
        jax.jit(
            ring_window_packed_traced,
            static_argnames=("wrap", "m", "interpret"),
            donate_argnums=(0,),
        ).lower(table, True, w, False),
    )


def main() -> None:
    tbl = jax.ShapeDtypeStruct((P, N), jnp.int32)
    table = PackedTable(tbl, tbl, tbl)
    t_total = N // 128
    dirty = jax.ShapeDtypeStruct((t_total,), jnp.bool_)
    nb = jax.ShapeDtypeStruct((P, 2), jnp.int32)

    audit(
        f"frontier fused (fuse={frontier_fuse(3)})",
        jax.jit(
            gossip_frontier_packed,
            static_argnames=("wrap", "max_rounds", "interpret", "fuse"),
            donate_argnums=(0,),
        ).lower(table, dirty, True, P + 2, False, frontier_fuse(3)),
    )
    audit(
        "frontier single-round",
        jax.jit(
            gossip_frontier_packed,
            static_argnames=("wrap", "max_rounds", "interpret", "fuse"),
            donate_argnums=(0,),
        ).lower(table, dirty, True, P + 2, False, 1),
    )
    audit(
        "classic converge (pallas)",
        jax.jit(
            gossip_until_converged_packed,
            static_argnames=("kind", "max_rounds", "use_pallas", "spmd_mesh"),
            donate_argnums=(0,),
        ).lower(table, nb, "ring", P + 2, True, None),
    )
    audit(
        "reconcile",
        jax.jit(
            _reconcile_packed_jit,
            static_argnames=("interpret",),
            donate_argnums=(0,),
        ).lower(table, False),
    )
    audit(
        "converged() probe",
        jax.jit(
            count_changes_round_packed,
            static_argnames=("wrap", "interpret"),
        ).lower(table, True, False),
    )
    audit_stripe("packed", table, 3)

    # rank layout (8 B/entry, ~8.6 GB at this shape): the same programs
    # must hold the ONE-table invariant on the 2-field tables
    from bullet_tpu.ops.rank import RankTable

    rtable = RankTable(tbl, tbl)
    # rank's fuse is capped at 5 by the frontier body's scoped-vmem stack
    # (~2 MB per unrolled round on nf=2; 16 MB limit) — frontier_fuse(2)
    audit(
        f"rank frontier fused (fuse={frontier_fuse(2)})",
        jax.jit(
            gossip_frontier_packed,
            static_argnames=("wrap", "max_rounds", "interpret", "fuse"),
            donate_argnums=(0,),
        ).lower(rtable, dirty, True, P + 2, False, frontier_fuse(2)),
    )
    audit(
        "rank reconcile",
        jax.jit(
            _reconcile_packed_jit,
            static_argnames=("interpret",),
            donate_argnums=(0,),
        ).lower(rtable, False),
    )
    audit(
        "rank converged() probe",
        jax.jit(
            count_changes_round_packed,
            static_argnames=("wrap", "interpret"),
        ).lower(rtable, True, False),
    )
    audit_stripe("rank", rtable, 2)
    audit_window("rank", rtable, 2)

    # rank1 layout (4 B/entry, ~4.3 GB at this shape): the 1-field table
    # through the same programs
    from bullet_tpu.ops.rank import Rank1Table

    r1table = Rank1Table(tbl)
    audit(
        f"rank1 frontier fused (fuse={frontier_fuse(1)})",
        jax.jit(
            gossip_frontier_packed,
            static_argnames=("wrap", "max_rounds", "interpret", "fuse"),
            donate_argnums=(0,),
        ).lower(r1table, dirty, True, P + 2, False, frontier_fuse(1)),
    )
    audit(
        "rank1 reconcile",
        jax.jit(
            _reconcile_packed_jit,
            static_argnames=("interpret",),
            donate_argnums=(0,),
        ).lower(r1table, False),
    )
    audit(
        "rank1 converged() probe",
        jax.jit(
            count_changes_round_packed,
            static_argnames=("wrap", "interpret"),
        ).lower(r1table, True, False),
    )
    audit_stripe("rank1", r1table, 1)
    audit_window("rank1", r1table, 1)

    # the arity-aware window budget extends full-P window stripes to
    # P=4096 for nf=1 (tile 128 = 2 MB/array) — audit that cell too
    big = jax.ShapeDtypeStruct((4096, 1 << 18), jnp.int32)
    audit(
        f"rank1 stripe window P=4096 (m={stripe_window(1)})",
        jax.jit(
            ring_window_packed_traced,
            static_argnames=("wrap", "m", "interpret"),
            donate_argnums=(0,),
        ).lower(Rank1Table(big), True, stripe_window(1), False),
    )

    # windowed HALO cells (P past the stripe budget): the boundary
    # snapshots are a REAL temp — 2*depth*(p/tile_p) rows of [n] per
    # field, by design ~12% of the table at P=8192 nf=1 — so these audit
    # against a snapshot-aware cap (table * 0.15 per field), not the
    # near-zero stripe cap
    from bullet_tpu.ops.packed import (
        halo_window,
        ring_window_halo_packed_traced,
        window_halo_tiles,
    )
    from bullet_tpu.ops.rank import RankTable

    for name, nf, p_halo, n_halo, mk in (
        ("rank1", 1, 8192, 1 << 18, lambda s: Rank1Table(s)),
        # rank's 2 fields at 2^18 slots would be 17.2 GB — past HBM; its
        # P=8192 halo cell ships at 2^17 slots (8.6 GB)
        ("rank", 2, 8192, 1 << 17, lambda s: RankTable(s, s)),
        # packed nf=3 has no full-P stripe window at ANY depth, so its
        # halo cell is the north-star shape itself (12.9 GB): the halo
        # window is packed fast_forward's blind-jump route there
        ("packed", 3, 1024, 1 << 20, lambda s: PackedTable(s, s, s)),
    ):
        depth = halo_window(nf)
        p8 = jax.ShapeDtypeStruct((p_halo, n_halo), jnp.int32)
        tile_p, tile_n = window_halo_tiles(p_halo, n_halo, nf, depth)
        # design bound: the snapshots themselves (2*depth*(p/tile_p) rows
        # of [n] per field) plus one side's un-fused roll copy (measured:
        # XLA materializes tops+bottoms and one roll temp — 1.51 GB at
        # nf=1 = exactly 2.5 sides vs 1.0 GB of snapshots; cap at 1.6x
        # so a second un-fused roll FAILS the audit)
        snap_bytes = 2 * depth * (p_halo // tile_p) * n_halo * 4 * nf
        lowered = jax.jit(
            ring_window_halo_packed_traced,
            static_argnames=("wrap", "m", "interpret"),
            donate_argnums=(0,),
        ).lower(mk(p8), True, depth, False)
        mem = lowered.compile().memory_analysis()
        print(
            f"{name} halo window P={p_halo} (m={depth}, tile_p={tile_p}): "
            f"args {mem.argument_size_in_bytes / GB:.2f} GB, "
            f"alias {mem.alias_size_in_bytes / GB:.2f} GB, "
            f"temp {mem.temp_size_in_bytes / GB:.2f} GB",
            flush=True,
        )
        assert mem.temp_size_in_bytes < snap_bytes * 1.6, (
            name, mem.temp_size_in_bytes, snap_bytes)

    print("memcheck OK: every north-star program stays within one table")


if __name__ == "__main__":
    main()
