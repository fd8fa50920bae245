"""Apply per-peer op batches to the replica tables.

This is the device half of the write path (SURVEY §3.2): each simulated peer
applies its queued local puts. Per DESIGN.md the local-put rule is the same
winner-select as the merge, so application is order-free within a batch and
implemented as a scan of per-row gather → lexmax → scatter (one column of ops
across all P peers at a time; no host round-trips).

Padding convention: a no-op is ``cls=0`` (ABSENT always loses), so padded
batches need no masks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .merge import TableState, lex_gt


class OpBatch(NamedTuple):
    """A step's local writes, dense [P, B] int32 (B = max ops/peer/step).

    ``slot`` is the interned leaf-path id; ``cls/khi/klo/vid`` the encoded
    value; ``ctr`` the writer's Lamport stamp; writer is implicit (row p),
    tick is the step counter (scalar, passed to ``apply_ops``).
    """

    slot: jax.Array
    cls: jax.Array
    khi: jax.Array
    klo: jax.Array
    vid: jax.Array
    ctr: jax.Array


def _op_keys(op_cls, op_khi, op_klo, op_vid, op_writer, op_ctr, mode: str):
    if mode == "reference":
        return (op_cls, op_khi, op_klo, op_vid, op_writer, op_ctr)
    return (op_ctr, op_cls, op_khi, op_klo, op_vid, op_writer)


@functools.partial(jax.jit, static_argnames=("mode",))
def apply_ops(
    table: TableState, ops: OpBatch, tick: jax.Array, mode: str = "reference"
) -> Tuple[TableState, jax.Array]:
    """Apply a [P, B] op batch; returns (table, applied_count).

    Matches the reference write path outcome: an op lands iff it strictly
    beats the current entry under the mode's priority order (quirk Q2's
    value-LWW in reference mode; timestamp order in lww mode).
    """
    num_peers = table.cls.shape[0]
    rows = jnp.arange(num_peers, dtype=jnp.int32)
    tick = jnp.asarray(tick, dtype=jnp.int32)

    def body(carry, op_col):
        tbl, applied = carry
        slot, ocls, okhi, oklo, ovid, octr = op_col
        cur = tuple(f[rows, slot] for f in tbl)  # [P] per field
        cur_keys = _op_keys(cur[0], cur[1], cur[2], cur[3], cur[4], cur[5], mode)
        op_keys = _op_keys(ocls, okhi, oklo, ovid, rows, octr, mode)
        # padding ops are cls=0 (ABSENT) and must never land — without this
        # gate they'd win writer tie-breaks against absent entries
        win = lex_gt(op_keys, cur_keys) & (ocls > 0)
        new_vals = (
            jnp.where(win, ocls, cur[0]),
            jnp.where(win, okhi, cur[1]),
            jnp.where(win, oklo, cur[2]),
            jnp.where(win, ovid, cur[3]),
            jnp.where(win, rows, cur[4]),
            jnp.where(win, octr, cur[5]),
            jnp.where(win, tick, cur[6]),
        )
        tbl = TableState(
            *(f.at[rows, slot].set(v) for f, v in zip(tbl, new_vals))
        )
        return (tbl, applied + jnp.sum(win.astype(jnp.int32))), None

    cols = tuple(jnp.moveaxis(f, 1, 0) for f in ops)  # [B, P] per field
    (table, applied), _ = jax.lax.scan(
        body, (table, jnp.int32(0)), cols
    )
    return table, applied


def pad_ops(ops_list, num_peers: int, batch: int):
    """Host helper: list of per-peer op tuples -> dense numpy OpBatch arrays.

    ``ops_list[p]`` is a list of (slot, cls, khi, klo, vid, ctr). Padding is
    all-zeros (cls=0 ⇒ guaranteed loser), slot 0 — harmless by construction.
    """
    import numpy as np

    out = [np.zeros((num_peers, batch), dtype=np.int32) for _ in range(6)]
    for p, ops in enumerate(ops_list):
        for b, op in enumerate(ops):
            for f in range(6):
                out[f][p, b] = op[f]
    return OpBatch(*out)
