"""The CRT merge: a lexicographic-max select over encoded tables.

This is the engine's replacement for the reference's ``resolve`` hot loop
(/root/reference/src/bullet-crt.js:164-279). Per DESIGN.md, the reference's
converged semantics reduce to a join-semilattice, so merging two replica
tables is a pure elementwise winner-select under a total order:

* ``mode="reference"`` — priority ``(cls, khi, klo, vid, writer, ctr)``:
  comparator value-max, matching the reference's converged states.
* ``mode="lww"``      — priority ``(ctr, cls, khi, klo, vid, writer)``:
  Lamport last-writer-wins (the documented fix of quirk Q2).

Both are associative/commutative/idempotent ⇒ gossip order cannot change the
fixed point. Two implementations: a pure-XLA fallback (fuses fine anywhere)
and a Pallas TPU kernel that streams all 7 field pairs through VMEM in one
pass and accumulates the per-block changed-entry count on the fly (the
convergence residual), saving a second pass over HBM.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

FIELDS = ("cls", "khi", "klo", "vid", "writer", "ctr", "tick")


class TableState(NamedTuple):
    """One replica table per simulated peer: all arrays are int32 [P, N].

    ``cls/khi/klo/vid`` encode the leaf value (bullet_tpu.utils.encode);
    ``writer`` is the peer id of the winning write, ``ctr`` its Lamport
    counter, ``tick`` the sim step of last modification (the engine's
    ``meta.lastModified``, /root/reference/src/bullet.js:198-203).
    """

    cls: jax.Array
    khi: jax.Array
    klo: jax.Array
    vid: jax.Array
    writer: jax.Array
    ctr: jax.Array
    tick: jax.Array


def init_table(num_peers: int, capacity: int) -> TableState:
    """All-absent table (cls=0 loses to every real value)."""
    z = jnp.zeros((num_peers, capacity), dtype=jnp.int32)
    return TableState(z, z, z, z, z, z, z)


def priority_keys(t: TableState, mode: str) -> Tuple[jax.Array, ...]:
    if mode == "reference":
        return (t.cls, t.khi, t.klo, t.vid, t.writer, t.ctr)
    if mode == "lww":
        return (t.ctr, t.cls, t.khi, t.klo, t.vid, t.writer)
    raise ValueError(f"unknown merge mode: {mode}")


def lex_gt(a_keys: Sequence[jax.Array], b_keys: Sequence[jax.Array]) -> jax.Array:
    """Elementwise ``a > b`` under lexicographic order of the key chain."""
    gt = jnp.zeros_like(a_keys[0], dtype=jnp.bool_)
    eq = jnp.ones_like(a_keys[0], dtype=jnp.bool_)
    for a, b in zip(a_keys, b_keys):
        gt = gt | (eq & (a > b))
        eq = eq & (a == b)
    return gt


def merge_tables_xla(
    a: TableState, b: TableState, mode: str = "reference"
) -> Tuple[TableState, jax.Array]:
    """XLA reference implementation: winner-select + changed count.

    ``changed`` counts entries where ``b`` strictly beat ``a`` — exactly the
    entries a real peer would have applied (``doUpdate``), and the gossip
    convergence residual.
    """
    take_b = lex_gt(priority_keys(b, mode), priority_keys(a, mode))
    merged = TableState(*(jnp.where(take_b, fb, fa) for fa, fb in zip(a, b)))
    return merged, jnp.sum(take_b.astype(jnp.int32))


# --------------------------------------------------------------------- pallas


def _merge_kernel(mode: str, *refs):
    """Pallas kernel body: 14 inputs (a fields, b fields), 8 outputs
    (merged fields + accumulated changed count).

    The TPU grid executes sequentially, so the residual accumulates into a
    single SMEM scalar: program (0,0) zeroes it, every program adds its
    block's strict-win count."""
    import jax.experimental.pallas as pl

    a_refs, b_refs = refs[:7], refs[7:14]
    out_refs, count_ref = refs[14:21], refs[21]

    a_vals = [r[...] for r in a_refs]
    b_vals = [r[...] for r in b_refs]

    def keys(vals):
        cls, khi, klo, vid, writer, ctr, _tick = vals
        if mode == "reference":
            return (cls, khi, klo, vid, writer, ctr)
        return (ctr, cls, khi, klo, vid, writer)

    a_keys, b_keys = keys(a_vals), keys(b_vals)
    gt = jnp.zeros_like(a_vals[0], dtype=jnp.bool_)
    eq = jnp.ones_like(a_vals[0], dtype=jnp.bool_)
    for ka, kb in zip(a_keys, b_keys):
        gt = gt | (eq & (kb > ka))
        eq = eq & (ka == kb)

    for out, va, vb in zip(out_refs, a_vals, b_vals):
        out[...] = jnp.where(gt, vb, va)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        count_ref[0, 0] = 0

    count_ref[0, 0] += jnp.sum(gt.astype(jnp.int32))


def _pick_tiles(p: int, n: int) -> Tuple[int, int]:
    """Block shape: lane-aligned slot tiles, sized so that 21 buffers
    (14 in + 7 out) double-buffered stay well under the ~16 MB VMEM budget:
    cap tile at 32K int32 elements (128 KB) → ~5.4 MB total."""

    def best(total, target, align):
        if total <= target:
            return total
        t = target
        while t > align and total % t:
            t -= align
        return t if total % t == 0 else total

    tile_n = best(n, 4096, 128)
    tile_p = best(p, max(1, (1 << 15) // max(tile_n, 1)), 8)
    return tile_p, tile_n


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def merge_tables_pallas(
    a: TableState, b: TableState, mode: str = "reference", interpret: bool = False
) -> Tuple[TableState, jax.Array]:
    """Pallas TPU kernel: one fused pass over all 14 input streams.

    HBM traffic is the whole cost (no FLOPs to speak of): 14 reads + 7
    writes of [P, N] int32 — the kernel exists to guarantee the single-pass
    fusion plus the fused residual reduction.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p, n = a.cls.shape
    tile_p, tile_n = _pick_tiles(p, n)
    grid = (p // tile_p, n // tile_n)

    data_spec = pl.BlockSpec(
        (tile_p, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    count_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)

    out_shapes = tuple(
        jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(7)
    ) + (jax.ShapeDtypeStruct((1, 1), jnp.int32),)

    outs = pl.pallas_call(
        functools.partial(_merge_kernel, mode),
        grid=grid,
        in_specs=[data_spec] * 14,
        out_specs=tuple([data_spec] * 7) + (count_spec,),
        out_shape=out_shapes,
        interpret=interpret,
    )(*a, *b)
    merged = TableState(*outs[:7])
    return merged, outs[7][0, 0]


def merge_tables(
    a: TableState,
    b: TableState,
    mode: str = "reference",
    use_pallas: bool | None = None,
) -> Tuple[TableState, jax.Array]:
    """Dispatch: Pallas on TPU, XLA elsewhere (or force with ``use_pallas``)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return merge_tables_pallas(a, b, mode=mode)
    return merge_tables_xla(a, b, mode=mode)
