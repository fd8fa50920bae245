"""Vectorized query scans over the device tables.

The engine's replacement for the reference's Map-based hash indexes
(/root/reference/src/bullet-query.js:30-45): there is no index to maintain —
``equals``/``range``/``count`` are jit-compiled compare+reduce scans over the
columnar table, O(N) on the VPU and fused by XLA. Path structure rides in
three device arrays (parent, grandparent, last-segment id) built by the host
interner.

Query shapes (matching bullet-query.js):
* field form  — children of ``base`` having field ``f`` with value v:
  leaf slots with grandparent == base and segment == f
* leaf form   — direct children of ``base`` with value v
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..utils.encode import CLS_NUMBER
from .merge import TableState


class PathStruct(NamedTuple):
    """Per-slot path structure, int32 [N] (-1 where absent)."""

    parent: jax.Array  # parent path id
    parent2: jax.Array  # grandparent path id
    seg: jax.Array  # interned id of the last path segment


@functools.partial(jax.jit, static_argnames=())
def equals_field_mask(
    table: TableState, struct: PathStruct, base: jax.Array, field: jax.Array, vid: jax.Array
) -> jax.Array:
    """[P, N] mask: leaf ``base/*/field`` slots whose value id equals vid."""
    structural = (struct.parent2 == base) & (struct.seg == field)
    return structural[None, :] & (table.vid == vid)


@functools.partial(jax.jit, static_argnames=())
def equals_leaf_mask(
    table: TableState, struct: PathStruct, base: jax.Array, vid: jax.Array
) -> jax.Array:
    """[P, N] mask: direct-child leaves of ``base`` whose value id equals vid."""
    return (struct.parent == base)[None, :] & (table.vid == vid)


@functools.partial(jax.jit, static_argnames=())
def range_field_mask(
    table: TableState,
    struct: PathStruct,
    base: jax.Array,
    field: jax.Array,
    lo_hi: jax.Array,
    lo_lo: jax.Array,
    hi_hi: jax.Array,
    hi_lo: jax.Array,
) -> jax.Array:
    """[P, N] mask: numeric values in [lo, hi] (inclusive), field form.

    Bounds are (khi, klo) encoded keys — exact float64 ordering.
    """
    structural = (struct.parent2 == base) & (struct.seg == field)
    numeric = table.cls == CLS_NUMBER
    ge_lo = (table.khi > lo_hi) | ((table.khi == lo_hi) & (table.klo >= lo_lo))
    le_hi = (table.khi < hi_hi) | ((table.khi == hi_hi) & (table.klo <= hi_lo))
    return structural[None, :] & numeric & ge_lo & le_hi


@functools.partial(jax.jit, static_argnames=())
def range_leaf_mask(
    table: TableState,
    struct: PathStruct,
    base: jax.Array,
    lo_hi: jax.Array,
    lo_lo: jax.Array,
    hi_hi: jax.Array,
    hi_lo: jax.Array,
) -> jax.Array:
    structural = struct.parent == base
    numeric = table.cls == CLS_NUMBER
    ge_lo = (table.khi > lo_hi) | ((table.khi == lo_hi) & (table.klo >= lo_lo))
    le_hi = (table.khi < hi_hi) | ((table.khi == hi_hi) & (table.klo <= hi_lo))
    return structural[None, :] & numeric & ge_lo & le_hi


@jax.jit
def count_mask(mask: jax.Array) -> jax.Array:
    return jnp.sum(mask.astype(jnp.int32), axis=-1)


# --------------------------------------------------------- single-peer rows
# Per-peer queries slice one replica row first — O(N) instead of O(P*N).


class RowView(NamedTuple):
    cls: jax.Array  # [N]
    khi: jax.Array
    klo: jax.Array
    vid: jax.Array


@jax.jit
def peer_row(table: TableState, peer: jax.Array) -> RowView:
    return RowView(
        table.cls[peer], table.khi[peer], table.klo[peer], table.vid[peer]
    )


@jax.jit
def equals_field_mask_row(row: RowView, struct: PathStruct, base, field, vid):
    structural = (struct.parent2 == base) & (struct.seg == field)
    return structural & (row.vid == vid)


@jax.jit
def equals_leaf_mask_row(row: RowView, struct: PathStruct, base, vid):
    return (struct.parent == base) & (row.vid == vid)


def _row_range(row: RowView, lo_hi, lo_lo, hi_hi, hi_lo):
    numeric = row.cls == CLS_NUMBER
    ge_lo = (row.khi > lo_hi) | ((row.khi == lo_hi) & (row.klo >= lo_lo))
    le_hi = (row.khi < hi_hi) | ((row.khi == hi_hi) & (row.klo <= hi_lo))
    return numeric & ge_lo & le_hi


@jax.jit
def range_field_mask_row(row: RowView, struct: PathStruct, base, field,
                         lo_hi, lo_lo, hi_hi, hi_lo):
    structural = (struct.parent2 == base) & (struct.seg == field)
    return structural & _row_range(row, lo_hi, lo_lo, hi_hi, hi_lo)


@jax.jit
def range_leaf_mask_row(row: RowView, struct: PathStruct, base,
                        lo_hi, lo_lo, hi_hi, hi_lo):
    return (struct.parent == base) & _row_range(row, lo_hi, lo_lo, hi_hi, hi_lo)


@jax.jit
def equals_field_count_row(row: RowView, struct: PathStruct, base, field,
                           vid):
    """Scalar match count: mask + sum fused into one program, so ``count``
    pays a single scalar readback instead of the [N] mask transfer + host
    path reconstruction that ``equals`` needs."""
    return jnp.sum(
        equals_field_mask_row(row, struct, base, field, vid).astype(jnp.int32)
    )


@jax.jit
def equals_leaf_count_row(row: RowView, struct: PathStruct, base, vid):
    return jnp.sum(
        equals_leaf_mask_row(row, struct, base, vid).astype(jnp.int32)
    )


@jax.jit
def subtree_leaf_mask(table: TableState, member: jax.Array) -> jax.Array:
    """[P, N] mask of present leaves restricted to a precomputed membership
    mask [N] (host-computed descendants of a path)."""
    return member[None, :] & (table.cls > 0)


# ------------------------------------------------------- rank-native rows
# The rank1 layout's queries skip the RowView rebuild entirely: ranks are
# strictly monotone in (cls, khi, klo, vid), so value equality is ONE rank
# compare and a numeric range is ONE rank interval (bounds computed on the
# host by RankIndex.rank_bounds). No LUT gathers, no device binary search.


@jax.jit
def equals_field_mask_rank(rank_row, struct: PathStruct, base, field, rank):
    structural = (struct.parent2 == base) & (struct.seg == field)
    return structural & (rank_row == rank)


@jax.jit
def equals_leaf_mask_rank(rank_row, struct: PathStruct, base, rank):
    return (struct.parent == base) & (rank_row == rank)


@jax.jit
def range_field_mask_rank(rank_row, struct: PathStruct, base, field,
                          lo_rank, hi_rank):
    structural = (struct.parent2 == base) & (struct.seg == field)
    return structural & (rank_row >= lo_rank) & (rank_row <= hi_rank)


@jax.jit
def range_leaf_mask_rank(rank_row, struct: PathStruct, base,
                         lo_rank, hi_rank):
    return (
        (struct.parent == base) & (rank_row >= lo_rank)
        & (rank_row <= hi_rank)
    )


@jax.jit
def equals_field_count_rank(rank_row, struct: PathStruct, base, field, rank):
    return jnp.sum(
        equals_field_mask_rank(rank_row, struct, base, field, rank).astype(
            jnp.int32
        )
    )


@jax.jit
def equals_leaf_count_rank(rank_row, struct: PathStruct, base, rank):
    return jnp.sum(
        equals_leaf_mask_rank(rank_row, struct, base, rank).astype(jnp.int32)
    )
