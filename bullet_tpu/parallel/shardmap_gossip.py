"""Explicit SPMD gossip: shard_map + ppermute/all_gather over the device mesh.

The jit+sharding path (parallel.gossip) lets XLA infer collectives from
``jnp.roll``/gathers on the sharded peer axis. This module is the explicit
alternative — per-shard local compute plus hand-placed collectives — the
pattern SURVEY §2 names as the NCCL-equivalent slot:

* ring/chain — ``ppermute`` of exactly the boundary rows (one peer row per
  direction per device; minimal ICI payload by construction).
* full mesh — recursive doubling: log2(P) rounds of global-roll-by-2^k,
  each roll at most two block ``ppermute``s (whole-block hop + remainder
  splice). Bit-identical to ``gossip_round_mesh`` including change counts.
* star — lattice all-reduce for the hub (local row-reduce → ``all_gather``
  of one row per device → device reduce) + one-row hub broadcast for the
  spokes. O(N·D) ICI traffic instead of gathering P rows.
* generic (bridge, partitions, random graphs) — masked ``all_gather``: the
  full table is gathered per neighbor column and merged under the adjacency
  mask, reproducing ``gossip_round_generic`` bit-identically (including its
  within-round propagation through already-merged rows). Traffic is O(N·P)
  per device — intended for the moderate peer counts these irregular
  topologies model (the reference bridge example is 11 peers).

Results are bit-identical to the unsharded kernels (tested on the virtual
CPU mesh); star's change count is the strict-improvement count against the
pre-round hub (zero iff the unsharded count is zero).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.merge import TableState, merge_tables_xla
from .mesh import PEER_AXIS

_lexmax = merge_tables_xla  # per-shard local merge is exactly the XLA merge


def _ring_exchange(ctor, merge, wrap: bool, block):
    """Shared ring/chain block body for any table tuple type: local shifts
    plus ppermute'd boundary rows, two lattice merges, psum'd change count.

    Chain masking note: zeroing from_prev on the globally-first device (and
    from_next on the last) is sufficient — those rows ARE the up/down
    neighbors of the global edge rows, so no second intra-block mask is
    needed (up[0] is from_prev by construction)."""
    axis_size = jax.lax.axis_size(PEER_AXIS)
    idx = jax.lax.axis_index(PEER_AXIS)
    fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]

    def boundary(rows, perm):
        return ctor(*(jax.lax.ppermute(f, PEER_AXIS, perm) for f in rows))

    from_prev = boundary(ctor(*(f[-1:, :] for f in block)), fwd)
    from_next = boundary(ctor(*(f[:1, :] for f in block)), bwd)

    if not wrap:
        # chain: the global edge devices must not receive wrapped rows
        is_first = idx == 0
        is_last = idx == axis_size - 1
        from_prev = ctor(
            *(jnp.where(is_first, jnp.zeros_like(f), f) for f in from_prev)
        )
        from_next = ctor(
            *(jnp.where(is_last, jnp.zeros_like(f), f) for f in from_next)
        )

    up = ctor(
        *(
            jnp.concatenate([fp, f[:-1, :]], axis=0)
            for f, fp in zip(block, from_prev)
        )
    )
    down = ctor(
        *(
            jnp.concatenate([f[1:, :], fn], axis=0)
            for f, fn in zip(block, from_next)
        )
    )
    m1, c1 = merge(block, up)
    m2, c2 = merge(m1, down)
    changed = jax.lax.psum(c1 + c2, PEER_AXIS)
    return (*m2, changed)


def _ring_block(mode: str, wrap: bool, *fields):
    """Per-shard body: local shifts + ppermute'd boundary rows."""
    return _ring_exchange(
        TableState, lambda a, b: _lexmax(a, b, mode), wrap, TableState(*fields)
    )


@functools.partial(jax.jit, static_argnames=("mesh", "mode", "wrap"))
def ring_round_shardmap(
    table: TableState, mesh, mode: str = "reference", wrap: bool = True
) -> Tuple[TableState, jax.Array]:
    """One ring (wrap=True) / chain (wrap=False) round, explicitly SPMD."""
    fn = jax.shard_map(
        functools.partial(_ring_block, mode, wrap),
        mesh=mesh,
        in_specs=tuple(P(PEER_AXIS, None) for _ in range(7)),
        out_specs=(*[P(PEER_AXIS, None)] * 7, P()),
    )
    *fields, changed = fn(*table)
    return TableState(*fields), changed


# ---------------------------------------------------------------- full mesh


def _global_roll(block, s: int, axis_size: int, b: int, ctor=TableState):
    """Global ``jnp.roll(·, s, axis=0)`` over the sharded peer axis: rows hop
    ``s // b`` whole devices by ppermute, the ``s % b`` remainder splices the
    boundary between two permuted blocks."""
    s %= axis_size * b
    d, r = divmod(s, b)

    def permute(tbl, hops: int):
        if hops % axis_size == 0:
            return tbl
        perm = [(i, (i + hops) % axis_size) for i in range(axis_size)]
        return ctor(
            *(jax.lax.ppermute(f, PEER_AXIS, perm) for f in tbl)
        )

    from_d = permute(block, d)
    if r == 0:
        return from_d
    from_d1 = permute(block, d + 1)
    return ctor(
        *(
            jnp.concatenate([f1[b - r :], f0[: b - r]], axis=0)
            for f0, f1 in zip(from_d, from_d1)
        )
    )


def _mesh_exchange(ctor, merge, steps: int, axis_size: int, block):
    """Recursive doubling (matches gossip_round_mesh exactly): merge with the
    current table rolled by 2^k, k = 0..steps-1. The loop is a static unroll
    because each step's ppermute permutation differs (log2(P) steps)."""
    b = block[0].shape[0]
    total = jnp.int32(0)
    for k in range(steps):
        rolled = _global_roll(block, 1 << k, axis_size, b, ctor)
        block, c = merge(block, rolled)
        total = total + c
    return (*block, jax.lax.psum(total, PEER_AXIS))


def _mesh_block(mode: str, steps: int, axis_size: int, *fields):
    return _mesh_exchange(
        TableState, lambda a, b: _lexmax(a, b, mode), steps, axis_size,
        TableState(*fields),
    )


@functools.partial(jax.jit, static_argnames=("mesh", "mode"))
def mesh_round_shardmap(
    table: TableState, mesh, mode: str = "reference"
) -> Tuple[TableState, jax.Array]:
    """One full-mesh round, explicitly SPMD (bit-identical to the unsharded
    ``gossip_round_mesh``, change counts included)."""
    num_peers = table.cls.shape[0]
    steps = max(1, (num_peers - 1).bit_length())
    fn = jax.shard_map(
        functools.partial(_mesh_block, mode, steps, mesh.devices.size),
        mesh=mesh,
        in_specs=tuple(P(PEER_AXIS, None) for _ in range(7)),
        out_specs=(*[P(PEER_AXIS, None)] * 7, P()),
    )
    *fields, changed = fn(*table)
    return TableState(*fields), changed


# --------------------------------------------------------------------- star


def _star_exchange(ctor, merge, hub_dev: int, hub_row: int, block):
    """Hub = lattice max of all rows (local reduce → all_gather of one row
    per device → device reduce); spokes merge the hub's PRE-round row."""
    b = block[0].shape[0]
    idx = jax.lax.axis_index(PEER_AXIS)
    on_hub_dev = idx == hub_dev

    # hub's pre-round row: every device contributes its local hub_row
    # candidate; the all_gather stack is indexed at the owning device
    cand = ctor(*(f[hub_row : hub_row + 1] for f in block))
    stack = ctor(
        *(
            jax.lax.all_gather(f, PEER_AXIS, axis=0, tiled=True)
            for f in cand
        )
    )  # [D, N]
    hub_old = ctor(*(f[hub_dev : hub_dev + 1] for f in stack))

    # spokes merge hub_old (the hub row merging itself is an idempotent
    # no-op contributing zero to the change count)
    bcast = ctor(
        *(jnp.broadcast_to(f, (b, f.shape[1])) for f in hub_old)
    )
    merged, c_spokes = merge(block, bcast)

    # hub's new row: lattice max over ALL peer rows (includes hub itself)
    def row_reduce(k, acc):
        row = ctor(*(jax.lax.dynamic_slice_in_dim(f, k, 1) for f in block))
        m, _ = merge(acc, row)
        return m

    local_max = ctor(*(f[0:1] for f in block))
    local_max = jax.lax.fori_loop(1, b, row_reduce, local_max)
    gstack = ctor(
        *(
            jax.lax.all_gather(f, PEER_AXIS, axis=0, tiled=True)
            for f in local_max
        )
    )  # [D, N]

    def dev_reduce(k, acc):
        row = ctor(*(jax.lax.dynamic_slice_in_dim(f, k, 1) for f in gstack))
        m, _ = merge(acc, row)
        return m

    gmax = ctor(*(f[0:1] for f in gstack))
    gmax = jax.lax.fori_loop(1, gstack[0].shape[0], dev_reduce, gmax)
    new_hub, c_hub = merge(hub_old, gmax)

    rows = jnp.arange(b)[:, None]
    sel = on_hub_dev & (rows == hub_row)
    out = ctor(
        *(
            jnp.where(sel, jnp.broadcast_to(nh, f.shape), f)
            for f, nh in zip(merged, new_hub)
        )
    )
    changed = jax.lax.psum(
        c_spokes + jnp.where(on_hub_dev, c_hub, 0), PEER_AXIS
    )
    return (*out, changed)


def _star_block(mode: str, hub_dev: int, hub_row: int, *fields):
    return _star_exchange(
        TableState, lambda a, b: _lexmax(a, b, mode), hub_dev, hub_row,
        TableState(*fields),
    )


@functools.partial(jax.jit, static_argnames=("mesh", "mode", "hub"))
def star_round_shardmap(
    table: TableState, mesh, mode: str = "reference", hub: int = 0
) -> Tuple[TableState, jax.Array]:
    """One star round, explicitly SPMD. Converged values are identical to the
    unsharded generic round (lattice max is merge-order-free); the change
    count is the strict-improvement count vs the pre-round hub (zero iff the
    unsharded count is zero)."""
    b = table.cls.shape[0] // mesh.devices.size
    hub_dev, hub_row = divmod(hub, b)
    fn = jax.shard_map(
        functools.partial(_star_block, mode, hub_dev, hub_row),
        mesh=mesh,
        in_specs=tuple(P(PEER_AXIS, None) for _ in range(7)),
        out_specs=(*[P(PEER_AXIS, None)] * 7, P()),
    )
    *fields, changed = fn(*table)
    return TableState(*fields), changed


# ---------------------------------------------------- generic (masked AG)


def _generic_exchange(ctor, merge, neighbors, block):
    """Masked all_gather: per neighbor column, gather the CURRENT full table
    (so within-round propagation through already-merged rows matches
    ``gossip_round_generic`` bit-exactly) and merge under the adjacency
    mask. Padded (-1) neighbors are masked to ABSENT and cannot win."""
    b = block[0].shape[0]
    idx = jax.lax.axis_index(PEER_AXIS)
    my_rows = idx * b + jnp.arange(b)
    my_nbrs = neighbors[my_rows]  # [b, max_deg]

    def body(k, carry):
        blk, total = carry
        full = ctor(
            *(
                jax.lax.all_gather(f, PEER_AXIS, axis=0, tiled=True)
                for f in blk
            )
        )  # [P, N]
        col = jax.lax.dynamic_index_in_dim(my_nbrs, k, axis=1, keepdims=False)
        valid = (col >= 0)[:, None]
        safe = jnp.where(col >= 0, col, 0)
        gathered = ctor(
            *(jnp.where(valid, f[safe], jnp.zeros_like(f[safe])) for f in full)
        )
        blk, c = merge(blk, gathered)
        return blk, total + c

    # the count carry must enter the loop already device-varying, or the
    # carry types mismatch once a varying c is added (shard_map typing)
    zero = jax.lax.pcast(jnp.int32(0), PEER_AXIS, to="varying")
    block, total = jax.lax.fori_loop(0, my_nbrs.shape[1], body, (block, zero))
    return (*block, jax.lax.psum(total, PEER_AXIS))


def _generic_block(mode: str, *args):
    neighbors, fields = args[0], args[1:]
    return _generic_exchange(
        TableState, lambda a, b: _lexmax(a, b, mode), neighbors,
        TableState(*fields),
    )


@functools.partial(jax.jit, static_argnames=("mesh", "mode"))
def generic_round_shardmap(
    table: TableState, neighbors: jax.Array, mesh, mode: str = "reference"
) -> Tuple[TableState, jax.Array]:
    """One round over an arbitrary adjacency (bridge, partitioned, random),
    explicitly SPMD; bit-identical to ``gossip_round_generic`` including
    change counts. O(N·P) gather traffic per device — for the moderate P
    these irregular topologies model."""
    fn = jax.shard_map(
        functools.partial(_generic_block, mode),
        mesh=mesh,
        in_specs=(P(), *[P(PEER_AXIS, None)] * 7),
        out_specs=(*[P(PEER_AXIS, None)] * 7, P()),
    )
    *fields, changed = fn(neighbors, *table)
    return TableState(*fields), changed


# ------------------------------------------------------------------ packed


def _ring_block_packed(tcls, wrap: bool, *fields):
    """Packed-family ring/chain block: the shared exchange body over the
    layout's field tuple (packed 3-array or rank 2-array)."""
    from ..ops.packed import merge_packed_xla

    return _ring_exchange(
        tcls, merge_packed_xla, wrap, tcls(*fields)
    )


@functools.partial(jax.jit, static_argnames=("mesh", "wrap"))
def ring_round_shardmap_packed(table, mesh, wrap: bool = True):
    """One explicit-SPMD ring/chain round on the packed family — boundary
    traffic is 12 B/entry/row (packed) or 8 (rank) over ICI, vs 28 for
    dense."""
    nf, tcls = len(table), type(table)
    fn = jax.shard_map(
        functools.partial(_ring_block_packed, tcls, wrap),
        mesh=mesh,
        in_specs=tuple(P(PEER_AXIS, None) for _ in range(nf)),
        out_specs=(*[P(PEER_AXIS, None)] * nf, P()),
    )
    *fields, changed = fn(*table)
    return tcls(*fields), changed


def _window_block_packed(tcls, wrap: bool, m: int, *fields):
    """Per-device window-join body: ONE m-row boundary exchange buys m
    ring/chain rounds. Each device ppermutes its m edge rows per direction
    (the same total boundary bytes as m single rounds, but ONE collective
    latency instead of m), extends its local block to [m + local_p + m]
    rows, and computes the radius-m window join in O(log m) 3-way joins
    (the merge is an idempotent lattice join, so m Jacobi rounds ≡ one
    radius-m window — ops/packed._window_stripe_fullp's proof). Ext-edge
    shifts zero-fill: rows within r of the ext edge are invalid at radius
    r, and the trapezoid argument (valid(q, r+s) needs valid(q±s, r))
    keeps every CENTER row exact because the halo is exactly m deep; on
    the global chain edges the zero-masked halos are not garbage but the
    exact identity the classic chain round uses. The final round runs
    classically so the psum'd count is the exact classic round-m residual
    over center rows. Requires m ≤ local rows (the slab comes from ONE
    neighbor)."""
    from ..ops.packed import _lex_gt_packed, _window_chain, table_keys

    axis_size = jax.lax.axis_size(PEER_AXIS)
    idx = jax.lax.axis_index(PEER_AXIS)
    fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]
    block = list(fields)
    local_p = block[0].shape[0]

    from_prev = [
        jax.lax.ppermute(f[-m:, :], PEER_AXIS, fwd) for f in block
    ]
    from_next = [jax.lax.ppermute(f[:m, :], PEER_AXIS, bwd) for f in block]
    if not wrap:
        is_first = idx == 0
        is_last = idx == axis_size - 1
        from_prev = [
            jnp.where(is_first, jnp.zeros_like(f), f) for f in from_prev
        ]
        from_next = [
            jnp.where(is_last, jnp.zeros_like(f), f) for f in from_next
        ]
    ext = [
        jnp.concatenate([fp, f, fn], axis=0)
        for fp, f, fn in zip(from_prev, block, from_next)
    ]

    ext_p = local_p + 2 * m
    row = jax.lax.broadcasted_iota(jnp.int32, ext[0].shape, 0)

    def shifted(vs, s: int):
        out = []
        for f in vs:
            rolled = jnp.roll(f, s, axis=0)
            edge = row < s if s > 0 else row >= ext_p + s
            out.append(jnp.where(edge, 0, rolled))
        return out

    def lexmax(a_vals, b_vals):
        gt = _lex_gt_packed(
            table_keys(tuple(b_vals)), table_keys(tuple(a_vals))
        )
        return [jnp.where(gt, b, a) for a, b in zip(a_vals, b_vals)], gt

    vals = ext
    for s in _window_chain(m - 1):
        vals, _ = lexmax(vals, shifted(vals, +s))
        vals, _ = lexmax(vals, shifted(vals, -s))
    m1, gt1 = lexmax(vals, shifted(vals, +1))
    m2, gt2 = lexmax(m1, shifted(m1, -1))
    center = (row >= m) & (row < m + local_p)
    c = jnp.sum((gt1 & center).astype(jnp.int32)) + jnp.sum(
        (gt2 & center).astype(jnp.int32)
    )
    changed = jax.lax.psum(c, PEER_AXIS)
    return (*(v[m : m + local_p, :] for v in m2), changed)


@functools.partial(jax.jit, static_argnames=("mesh", "wrap", "m"))
def ring_window_shardmap_packed(table, mesh, wrap: bool, m: int):
    """m explicit-SPMD ring/chain rounds per ONE boundary collective
    round-trip: the multi-chip twin of ops/packed.ring_window_packed_traced
    — bit-identical state to m classic rounds, exact classic round-m
    residual (psum over devices). m must not exceed the per-device row
    count; the sim's fast_forward caps its passes accordingly."""
    nf, tcls = len(table), type(table)
    assert m <= table[0].shape[0] // mesh.devices.size, (
        "window depth exceeds per-device rows"
    )
    fn = jax.shard_map(
        functools.partial(_window_block_packed, tcls, wrap, m),
        mesh=mesh,
        in_specs=tuple(P(PEER_AXIS, None) for _ in range(nf)),
        out_specs=(*[P(PEER_AXIS, None)] * nf, P()),
    )
    *fields, changed = fn(*table)
    return tcls(*fields), changed


def _mesh_block_packed(tcls, steps: int, axis_size: int, *fields):
    from ..ops.packed import merge_packed_xla

    return _mesh_exchange(
        tcls, merge_packed_xla, steps, axis_size, tcls(*fields)
    )


@functools.partial(jax.jit, static_argnames=("mesh",))
def mesh_round_shardmap_packed(table, mesh):
    """One full-mesh round on the packed layout, explicitly SPMD
    (recursive-doubling ppermute; bit-identical to the unsharded packed
    mesh round, change counts included)."""
    nf, tcls = len(table), type(table)
    num_peers = table[0].shape[0]
    steps = max(1, (num_peers - 1).bit_length())
    fn = jax.shard_map(
        functools.partial(_mesh_block_packed, tcls, steps, mesh.devices.size),
        mesh=mesh,
        in_specs=tuple(P(PEER_AXIS, None) for _ in range(nf)),
        out_specs=(*[P(PEER_AXIS, None)] * nf, P()),
    )
    *fields, changed = fn(*table)
    return tcls(*fields), changed


def _star_block_packed(tcls, hub_dev: int, hub_row: int, *fields):
    from ..ops.packed import merge_packed_xla

    return _star_exchange(
        tcls, merge_packed_xla, hub_dev, hub_row, tcls(*fields)
    )


@functools.partial(jax.jit, static_argnames=("mesh", "hub"))
def star_round_shardmap_packed(table, mesh, hub: int = 0):
    """One star round on the packed layout (lattice all-reduce hub + one-row
    hub broadcast), explicitly SPMD; same change-count convention as the
    dense star collective."""
    nf, tcls = len(table), type(table)
    b = table[0].shape[0] // mesh.devices.size
    hub_dev, hub_row = divmod(hub, b)
    fn = jax.shard_map(
        functools.partial(_star_block_packed, tcls, hub_dev, hub_row),
        mesh=mesh,
        in_specs=tuple(P(PEER_AXIS, None) for _ in range(nf)),
        out_specs=(*[P(PEER_AXIS, None)] * nf, P()),
    )
    *fields, changed = fn(*table)
    return tcls(*fields), changed


def _generic_block_packed(tcls, *args):
    from ..ops.packed import merge_packed_xla

    neighbors, fields = args[0], args[1:]
    return _generic_exchange(
        tcls, merge_packed_xla, neighbors, tcls(*fields)
    )


@functools.partial(jax.jit, static_argnames=("mesh",))
def generic_round_shardmap_packed(table, neighbors: jax.Array, mesh):
    """One round over an arbitrary adjacency on the packed layout (masked
    all_gather); bit-identical to the unsharded generic packed round."""
    nf, tcls = len(table), type(table)
    fn = jax.shard_map(
        functools.partial(_generic_block_packed, tcls),
        mesh=mesh,
        in_specs=(P(), *[P(PEER_AXIS, None)] * nf),
        out_specs=(*[P(PEER_AXIS, None)] * nf, P()),
    )
    *fields, changed = fn(neighbors, *table)
    return tcls(*fields), changed


def shardmap_round_packed(table, topology, mesh):
    """Dispatch one explicit-SPMD round for any topology on the packed
    layout — the packed twin of ``shardmap_round`` (ppermute ring/chain,
    recursive-doubling mesh, lattice+hub star, masked all_gather
    otherwise)."""
    import numpy as np

    if topology.kind in ("ring", "chain"):
        return ring_round_shardmap_packed(
            table, mesh, wrap=topology.kind == "ring"
        )
    if topology.kind == "mesh":
        return mesh_round_shardmap_packed(table, mesh)
    if topology.name == "star":
        hub = int(np.argmax(topology.degree()))
        return star_round_shardmap_packed(table, mesh, hub=hub)
    return generic_round_shardmap_packed(
        table, jnp.asarray(topology.neighbors), mesh
    )


def _frontier_ring_block_packed(tcls, wrap: bool, interpret: bool, ids,
                                *fields, tile_n: int = 0):
    """Per-device frontier ring/chain body: ppermute the boundary rows,
    then a local Pallas frontier round over only the stripes in the
    prefetched ``ids`` array; counts psum across devices so every shard
    agrees on the next frontier. ``tile_n`` overrides the stripe tile
    (the window-fused loop drives the tail at ITS tile so one ids array
    serves both phases)."""
    from ..ops.packed import frontier_shard_round_packed

    block = tcls(*fields)
    axis_size = jax.lax.axis_size(PEER_AXIS)
    idx = jax.lax.axis_index(PEER_AXIS)
    fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]
    from_prev = [
        jax.lax.ppermute(f[-1:, :], PEER_AXIS, fwd) for f in block
    ]
    from_next = [
        jax.lax.ppermute(f[:1, :], PEER_AXIS, bwd) for f in block
    ]
    if not wrap:
        is_first = idx == 0
        is_last = idx == axis_size - 1
        from_prev = [
            jnp.where(is_first, jnp.zeros_like(f), f) for f in from_prev
        ]
        from_next = [
            jnp.where(is_last, jnp.zeros_like(f), f) for f in from_next
        ]
    n = block[0].shape[1]
    pad7 = jnp.zeros((7, n), jnp.int32)
    tops = tuple(jnp.concatenate([pad7, fp], axis=0) for fp in from_prev)
    bottoms = tuple(jnp.concatenate([fn, pad7], axis=0) for fn in from_next)
    new_block, counts = frontier_shard_round_packed(
        block, tops, bottoms, ids, interpret, vma={PEER_AXIS},
        tile_n=tile_n,
    )
    return (*new_block, jax.lax.psum(counts, PEER_AXIS))


def _frontier_ring_block_window_packed(tcls, wrap: bool, m: int,
                                       tile_n: int, interpret: bool, ids,
                                       *fields):
    """Per-device WINDOW frontier body: ppermute the FULL m-row boundary
    slabs ONCE, then run m gossip rounds locally as one distance-tracking
    radius-m window join (O(log m) doubling steps) over the active
    stripes — ONE collective round-trip per m rounds instead of per 8
    (_frontier_ring_block_multiround_packed), attacking the term that
    dominates real multi-chip wall clock: ICI/collective latency. The
    per-entry last-change distances make the classic round counts exact
    (s ≤ r+1 composition — ops/packed.py _window_dist_chain). Changed
    counts psum across devices; last-change rounds pmax."""
    from ..ops.packed import frontier_shard_window_packed

    block = tcls(*fields)
    axis_size = jax.lax.axis_size(PEER_AXIS)
    idx = jax.lax.axis_index(PEER_AXIS)
    fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]
    from_prev = [
        jax.lax.ppermute(f[-m:, :], PEER_AXIS, fwd) for f in block
    ]
    from_next = [
        jax.lax.ppermute(f[:m, :], PEER_AXIS, bwd) for f in block
    ]
    if not wrap:
        # zeroed slabs are exact absent-neighbor semantics: cls 0 is the
        # join identity through every window step
        is_first = idx == 0
        is_last = idx == axis_size - 1
        from_prev = [
            jnp.where(is_first, jnp.zeros_like(f), f) for f in from_prev
        ]
        from_next = [
            jnp.where(is_last, jnp.zeros_like(f), f) for f in from_next
        ]
    new_block, stats = frontier_shard_window_packed(
        block, tuple(from_prev), tuple(from_next), ids, m, tile_n,
        interpret, vma={PEER_AXIS},
    )
    agreed = jnp.concatenate([
        jax.lax.psum(stats[0:1], PEER_AXIS),
        jax.lax.pmax(stats[1:2], PEER_AXIS),
    ])
    return (*new_block, agreed)


def _frontier_ring_block_dense(wrap: bool, mode: str, interpret: bool, ids,
                               *fields):
    """Per-device DENSE frontier ring/chain body (nf=4 lean or nf=7 full
    metadata): ppermute one boundary row per direction (padded into 8-row
    snapshots), run the local dense frontier kernel over the stripes in
    ``ids``, psum per-stripe counts."""
    from ..ops.ring_kernel import frontier_shard_round_dense

    nf = len(fields)
    axis_size = jax.lax.axis_size(PEER_AXIS)
    idx = jax.lax.axis_index(PEER_AXIS)
    fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]
    from_prev = [
        jax.lax.ppermute(f[-1:, :], PEER_AXIS, fwd) for f in fields
    ]
    from_next = [
        jax.lax.ppermute(f[:1, :], PEER_AXIS, bwd) for f in fields
    ]
    if not wrap:
        is_first = idx == 0
        is_last = idx == axis_size - 1
        from_prev = [
            jnp.where(is_first, jnp.zeros_like(f), f) for f in from_prev
        ]
        from_next = [
            jnp.where(is_last, jnp.zeros_like(f), f) for f in from_next
        ]
    n = fields[0].shape[1]
    pad7 = jnp.zeros((7, n), jnp.int32)
    tops = tuple(jnp.concatenate([pad7, fp], axis=0) for fp in from_prev)
    bottoms = tuple(jnp.concatenate([fn, pad7], axis=0) for fn in from_next)
    new_fields, counts = frontier_shard_round_dense(
        fields, tops, bottoms, ids, mode, interpret, vma={PEER_AXIS}
    )
    return (*new_fields, jax.lax.psum(counts, PEER_AXIS))


def _frontier_ring_block_multiround_dense(wrap: bool, mode: str,
                                          interpret: bool, ids, *fields):
    """FUSED per-device DENSE frontier body: ppermute the FULL 8-row
    boundary blocks once, then run HALO_FUSE rounds entirely in VMEM
    (trapezoidal time-tiling — the dense twin of
    _frontier_ring_block_multiround_packed). One collective round-trip
    per 8 gossip rounds; per-round per-stripe counts psum across
    devices."""
    from ..ops.ring_kernel import frontier_shard_multiround_dense

    axis_size = jax.lax.axis_size(PEER_AXIS)
    idx = jax.lax.axis_index(PEER_AXIS)
    fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]
    from_prev = [
        jax.lax.ppermute(f[-8:, :], PEER_AXIS, fwd) for f in fields
    ]
    from_next = [
        jax.lax.ppermute(f[:8, :], PEER_AXIS, bwd) for f in fields
    ]
    if not wrap:
        # zeroed snapshots are exact absent-neighbor semantics: an
        # all-zero row is the bottom of both priority orders through
        # every fused round
        is_first = idx == 0
        is_last = idx == axis_size - 1
        from_prev = [
            jnp.where(is_first, jnp.zeros_like(f), f) for f in from_prev
        ]
        from_next = [
            jnp.where(is_last, jnp.zeros_like(f), f) for f in from_next
        ]
    new_fields, counts = frontier_shard_multiround_dense(
        fields, tuple(from_prev), tuple(from_next), ids, mode, interpret,
        vma={PEER_AXIS},
    )
    return (*new_fields, jax.lax.psum(counts, PEER_AXIS))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "wrap", "mode", "lean", "max_rounds",
                     "interpret", "fuse"),
    donate_argnums=(0,),
)
def gossip_frontier_shardmap_dense(
    table: TableState, dirty: jax.Array, mesh, wrap: bool, mode: str,
    lean: bool, max_rounds: int, interpret: bool = False, fuse: int = 1,
):
    """Dense-layout frontier convergence over the device mesh (ring/chain)
    — the dense twin of gossip_frontier_shardmap_packed's single-round
    loop: compacted prefetch ids carried across rounds, per-stripe counts
    psum'd, one-grid-step compaction kernel, no per-round XLA
    nonzero/cumsum/concat chain. Lean sims exchange only the four
    value-key arrays; writer/ctr/tick stay device-local and untouched
    (the lean gossip contract).

    ``fuse`` > 1 (must be HALO_FUSE) runs 8 gossip rounds per collective
    round-trip, exactly like the packed spmd loop: the body ppermutes the
    FULL 8-row boundary blocks and the per-device kernel time-tiles 8
    rounds in VMEM; exact classic round counts and last-round residuals
    via the shared frontier_fused_loop driver."""
    from ..ops.packed import (
        HALO_FUSE,
        compact_counts_multiround_packed,
        compact_counts_packed,
        frontier_fused_loop,
        frontier_ids_compact,
    )
    from ..ops.ring_kernel import frontier_tile_n_dense_sharded

    fields = (
        (table.cls, table.khi, table.klo, table.vid)
        if lean else tuple(table)
    )
    nf = len(fields)
    fn = jax.shard_map(
        functools.partial(_frontier_ring_block_dense, wrap, mode, interpret),
        mesh=mesh,
        in_specs=(P(), *[P(PEER_AXIS, None)] * nf),
        out_specs=(*[P(PEER_AXIS, None)] * nf, P()),
    )
    p, n = table.cls.shape
    t_total = n // frontier_tile_n_dense_sharded(
        p, n, mesh.devices.size, lean
    )

    def round1(flds, ids):
        *new_fields, counts = fn(ids, *flds)
        return (
            tuple(new_fields),
            compact_counts_packed(counts, interpret=interpret),
        )

    def finish(fields, rounds, last_changed):
        if lean:
            tbl = table._replace(
                cls=fields[0], khi=fields[1], klo=fields[2], vid=fields[3]
            )
        else:
            tbl = TableState(*fields)
        return tbl, rounds, last_changed

    if fuse > 1:
        assert fuse == HALO_FUSE, (
            "the 8-row boundary exchange pins the spmd fuse depth"
        )
        fn_m = jax.shard_map(
            functools.partial(
                _frontier_ring_block_multiround_dense, wrap, mode, interpret
            ),
            mesh=mesh,
            in_specs=(P(), *[P(PEER_AXIS, None)] * nf),
            out_specs=(*[P(PEER_AXIS, None)] * nf, P()),
        )

        def roundm(flds, ids):
            *new_fields, counts = fn_m(ids, *flds)
            return (
                tuple(new_fields),
                compact_counts_multiround_packed(counts, interpret=interpret),
            )

        return finish(*frontier_fused_loop(
            fields, dirty, t_total, max_rounds, HALO_FUSE, round1, roundm
        ))

    def cond(state):
        _, ids, rounds, _ = state
        return (ids[t_total] > 0) & (rounds < max_rounds)

    def body(state):
        flds, ids, rounds, _ = state
        flds, ids_next = round1(flds, ids)
        return flds, ids_next, rounds + 1, ids_next[t_total + 1]

    ids0 = frontier_ids_compact(dirty, t_total)
    fields, ids_f, rounds, last_changed = jax.lax.while_loop(
        cond, body, (fields, ids0, jnp.int32(0), jnp.int32(1))
    )
    last_changed = jnp.where(ids_f[t_total] > 0, last_changed, 0)
    return finish(fields, rounds, last_changed)


def _frontier_ring_block_multiround_packed(tcls, wrap: bool,
                                           interpret: bool, ids, *fields):
    """FUSED per-device frontier body: ppermute the FULL 8-row boundary
    blocks once, then run HALO_FUSE rounds entirely in VMEM (trapezoidal
    time-tiling — the 8-row snapshots buy exactly 8 exact rounds for the
    center). One collective round-trip per 8 gossip rounds instead of per
    round: same total boundary bytes, 8x fewer collective latencies and
    block DMAs. Per-round per-stripe counts psum across devices."""
    from ..ops.packed import frontier_shard_multiround_packed

    block = tcls(*fields)
    axis_size = jax.lax.axis_size(PEER_AXIS)
    idx = jax.lax.axis_index(PEER_AXIS)
    fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]
    from_prev = [
        jax.lax.ppermute(f[-8:, :], PEER_AXIS, fwd) for f in block
    ]
    from_next = [
        jax.lax.ppermute(f[:8, :], PEER_AXIS, bwd) for f in block
    ]
    if not wrap:
        # zeroed snapshots are exact absent-neighbor semantics: cls=0 is
        # the join identity through every fused round
        is_first = idx == 0
        is_last = idx == axis_size - 1
        from_prev = [
            jnp.where(is_first, jnp.zeros_like(f), f) for f in from_prev
        ]
        from_next = [
            jnp.where(is_last, jnp.zeros_like(f), f) for f in from_next
        ]
    new_block, counts = frontier_shard_multiround_packed(
        block, tuple(from_prev), tuple(from_next), ids, interpret,
        vma={PEER_AXIS},
    )
    return (*new_block, jax.lax.psum(counts, PEER_AXIS))


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "wrap", "max_rounds", "interpret", "fuse", "window_fuse",
        "window_tile",
    ),
    donate_argnums=(0,),
)
def gossip_frontier_shardmap_packed(
    table, dirty: jax.Array, mesh, wrap: bool, max_rounds: int,
    interpret: bool = False, fuse: int = 1, window_fuse: int = 0,
    window_tile: int = 0,
):
    """Frontier convergence over the device mesh (packed ring/chain): each
    round ppermutes one boundary row per direction and runs the local
    frontier kernel over only the stripes still changing anywhere. The
    loop carries the COMPACTED prefetch ids array, not per-stripe flags:
    the round kernel emits per-stripe change counts, a psum agrees them
    across devices, and one grid-step compaction kernel
    (compact_counts_packed) rebuilds the next round's ids — the body is
    two pallas_calls plus collectives, with no per-round XLA
    nonzero/cumsum/concat chain (the multi-chip twin of the single-chip
    in-kernel compaction, ops/packed.py _frontier_round_kernel_packed).
    Settled stripes cost no DMA or compute on ANY device. Bit-identical
    final state and round count to the unsharded loops (same
    one-round-per-iteration lattice advance).

    ``fuse`` > 1 (must be HALO_FUSE) runs 8 gossip rounds per collective
    round-trip: the body ppermutes the FULL 8-row boundary blocks and the
    per-device kernel time-tiles 8 rounds in VMEM
    (_frontier_shard_multiround_kernel_packed). Exact classic round counts
    and last-round residuals are reconstructed via the shared
    frontier_fused_loop driver (fused phase stops strictly before
    max_rounds; a single-round tail finishes).

    ``window_fuse`` = m > 0 (with its matching ``window_tile`` from
    ops.packed.window_frontier_params) runs m rounds per collective
    round-trip instead: ONE m-row slab ppermute + a local distance-exact
    radius-m window join (O(log m) joins). Same exact-round-count and
    cutoff-residual contract through the same fused-loop driver; the
    single-round tail runs at the window tile so one ids array drives
    both phases. Mutually exclusive with ``fuse`` > 1."""
    from ..ops.packed import (
        HALO_FUSE,
        _stripe_tile_n,
        compact_counts_multiround_packed,
        compact_counts_packed,
        compact_counts_window_packed,
        frontier_fused_loop,
        frontier_ids_compact,
    )

    nf, tcls = len(table), type(table)
    n = table[0].shape[1]
    block_p = table[0].shape[0] // mesh.devices.size
    if window_fuse > 0:
        assert fuse == 1, "window_fuse and fuse>1 are mutually exclusive"
        assert window_tile > 0 and n % window_tile == 0
    tile_n = window_tile if window_fuse > 0 else _stripe_tile_n(block_p, n)
    fn = jax.shard_map(
        functools.partial(
            _frontier_ring_block_packed, tcls, wrap, interpret,
            tile_n=window_tile if window_fuse > 0 else 0,
        ),
        mesh=mesh,
        in_specs=(P(), *[P(PEER_AXIS, None)] * nf),
        out_specs=(*[P(PEER_AXIS, None)] * nf, P()),
    )
    t_total = n // tile_n

    def round1(tbl, ids):
        *fields, counts = fn(ids, *tbl)
        return (
            tcls(*fields),
            compact_counts_packed(counts, interpret=interpret),
        )

    if window_fuse > 0:
        fn_w = jax.shard_map(
            functools.partial(
                _frontier_ring_block_window_packed, tcls, wrap,
                window_fuse, window_tile, interpret,
            ),
            mesh=mesh,
            in_specs=(P(), *[P(PEER_AXIS, None)] * nf),
            out_specs=(*[P(PEER_AXIS, None)] * nf, P()),
        )

        def roundw(tbl, ids):
            *fields, stats = fn_w(ids, *tbl)
            return (
                tcls(*fields),
                compact_counts_window_packed(
                    stats, window_fuse, interpret=interpret
                ),
            )

        return frontier_fused_loop(
            table, dirty, t_total, max_rounds, window_fuse, round1, roundw
        )

    if fuse > 1:
        assert fuse == HALO_FUSE, (
            "the 8-row boundary exchange pins the spmd fuse depth"
        )
        fn_m = jax.shard_map(
            functools.partial(
                _frontier_ring_block_multiround_packed, tcls, wrap, interpret
            ),
            mesh=mesh,
            in_specs=(P(), *[P(PEER_AXIS, None)] * nf),
            out_specs=(*[P(PEER_AXIS, None)] * nf, P()),
        )

        def roundm(tbl, ids):
            *fields, counts = fn_m(ids, *tbl)
            return (
                tcls(*fields),
                compact_counts_multiround_packed(
                    counts, interpret=interpret
                ),
            )

        return frontier_fused_loop(
            table, dirty, t_total, max_rounds, HALO_FUSE, round1, roundm
        )

    def cond(state):
        _, ids, rounds, _ = state
        return (ids[t_total] > 0) & (rounds < max_rounds)

    def body(state):
        tbl, ids, rounds, _ = state
        tbl, ids_next = round1(tbl, ids)
        return tbl, ids_next, rounds + 1, ids_next[t_total + 1]

    ids0 = frontier_ids_compact(dirty, t_total)
    table, ids_f, rounds, last_changed = jax.lax.while_loop(
        cond, body, (table, ids0, jnp.int32(0), jnp.int32(1))
    )
    # honest residual, matching the unsharded loops: 0 IFF the frontier is
    # empty at exit (covers the nothing-dirty-at-entry case, where the
    # init sentinel 1 would otherwise leak out as last_residual)
    last_changed = jnp.where(ids_f[t_total] > 0, last_changed, 0)
    return table, rounds, last_changed


def shardmap_round(
    table: TableState, topology, mesh, mode: str = "reference"
) -> Tuple[TableState, jax.Array]:
    """Dispatch one explicit-SPMD round for any topology (SURVEY §2:
    ppermute for ring/chain, recursive-doubling ppermute for mesh, lattice
    all-reduce for star, masked all_gather otherwise)."""
    import numpy as np

    if topology.kind in ("ring", "chain"):
        return ring_round_shardmap(
            table, mesh, mode=mode, wrap=topology.kind == "ring"
        )
    if topology.kind == "mesh":
        return mesh_round_shardmap(table, mesh, mode=mode)
    if topology.name == "star":
        hub = int(np.argmax(topology.degree()))
        return star_round_shardmap(table, mesh, mode=mode, hub=hub)
    return generic_round_shardmap(
        table, jnp.asarray(topology.neighbors), mesh, mode=mode
    )
