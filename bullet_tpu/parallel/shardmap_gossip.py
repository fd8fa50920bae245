"""Explicit SPMD gossip: shard_map + ppermute over the device mesh.

The jit+sharding path (parallel.gossip) lets XLA infer collectives from
``jnp.roll``/gathers on the sharded peer axis. This module is the explicit
alternative — per-shard local compute plus hand-placed
``jax.lax.ppermute`` of exactly the boundary rows over ICI — the pattern
SURVEY §2 names as the NCCL-equivalent slot. Boundary traffic is one peer
row per direction per device, so the ICI payload is minimal by
construction (the jit path may all-gather more).

Used for ring and chain topologies when the table is sharded; results are
bit-identical to the unsharded kernels (tested on the virtual CPU mesh).
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


def _ring_block(mode: str, wrap: bool, *fields):
    """Per-shard body: local shifts + ppermute'd boundary rows."""
    block = TableState(*fields)
    axis_size = jax.lax.axis_size(PEER_AXIS)
    idx = jax.lax.axis_index(PEER_AXIS)
    fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]

    def boundary(rows: TableState, perm):
        return TableState(
            *(jax.lax.ppermute(f, PEER_AXIS, perm) for f in rows)
        )

    last = TableState(*(f[-1:, :] for f in block))
    first = TableState(*(f[:1, :] for f in block))
    from_prev = boundary(last, fwd)  # previous device's last row
    from_next = boundary(first, bwd)  # next device's first row

    if not wrap:
        # chain: the global edge devices must not receive wrapped rows
        zero_prev = TableState(*(jnp.zeros_like(f) for f in from_prev))
        zero_next = TableState(*(jnp.zeros_like(f) for f in from_next))
        is_first = idx == 0
        is_last = idx == axis_size - 1
        from_prev = TableState(
            *(jnp.where(is_first, z, f) for f, z in zip(from_prev, zero_prev))
        )
        from_next = TableState(
            *(jnp.where(is_last, z, f) for f, z in zip(from_next, zero_next))
        )

    up = TableState(
        *(
            jnp.concatenate([fp, f[:-1, :]], axis=0)
            for f, fp in zip(block, from_prev)
        )
    )
    down = TableState(
        *(
            jnp.concatenate([f[1:, :], fn], axis=0)
            for f, fn in zip(block, from_next)
        )
    )
    if not wrap:
        # also mask the intra-block edge rows on the global edge devices
        rows = jnp.arange(block.cls.shape[0])[:, None]
        first_global = (idx == 0) & (rows == 0)
        last_global = (idx == axis_size - 1) & (rows == block.cls.shape[0] - 1)
        up = TableState(*(jnp.where(first_global, 0, f) for f in up))
        down = TableState(*(jnp.where(last_global, 0, f) for f in down))

    m1, c1 = _lexmax(block, up, mode)
    m2, c2 = _lexmax(m1, down, mode)
    changed = jax.lax.psum(c1 + c2, PEER_AXIS)
    return (*m2, changed)


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
