"""Fused ring/chain gossip-round Pallas kernel.

One gossip round on a ring is ``merge(merge(t, roll(t,+1)), roll(t,-1))``.
Composed from generic merges (or XLA fusion) that costs ~3 reads + 1 write
of the table per round; this kernel reads each entry once and writes once
(~56 B/entry/round vs ~168 B), computing ``lexmax(self, up, down)`` in one
pass with 8-row halo blocks supplying the cross-tile neighbor rows.

The peer axis is tiled in multiples of 8 (sublane granularity); halo blocks
wrap modularly for rings, and chain ends mask the wrapped contribution to
ABSENT in-kernel. The convergence residual accumulates into an SMEM scalar
(the TPU grid is sequential).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .merge import TableState

_HALO = 8  # sublane granularity


def _keys(vals, writer, ctr, mode: str):
    cls, khi, klo, vid = vals
    if mode == "reference":
        return (cls, khi, klo, vid, writer, ctr)
    return (ctr, cls, khi, klo, vid, writer)


def _lexmax_vals(a_keys, b_keys, a_vals, b_vals):
    """Elementwise winner-select under the lexicographic key order; returns
    (selected values, b-strictly-won mask). Shared by all kernel bodies."""
    gt = jnp.zeros_like(a_vals[0], dtype=jnp.bool_)
    eq = jnp.ones_like(a_vals[0], dtype=jnp.bool_)
    for ka, kb in zip(a_keys, b_keys):
        gt = gt | (eq & (kb > ka))
        eq = eq & (ka == kb)
    return [jnp.where(gt, b, a) for a, b in zip(a_vals, b_vals)], gt


def _ring_round_kernel(mode: str, wrap: bool, tile_p: int, num_peers: int, *refs):
    import jax.experimental.pallas as pl

    c_refs = refs[:7]  # center blocks
    t_refs = refs[7:14]  # top halo (8 rows above)
    b_refs = refs[14:21]  # bottom halo (8 rows below)
    out_refs, count_ref = refs[21:28], refs[28]

    i = pl.program_id(0)
    center = [r[...] for r in c_refs]

    row_in_block = jax.lax.broadcasted_iota(jnp.int32, center[0].shape, 0)
    global_row = i * tile_p + row_in_block

    def shifted(direction: int):
        """Neighbor view: direction=+1 -> 'up' neighbor (row r-1),
        direction=-1 -> 'down' neighbor (row r+1)."""
        out = []
        for f in range(7):
            c = center[f]
            if direction == +1:
                rolled = jnp.roll(c, 1, axis=0)
                halo_row = t_refs[f][_HALO - 1 : _HALO, :]
                fixed = jnp.where(row_in_block == 0, halo_row, rolled)
                if not wrap:
                    fixed = jnp.where(global_row == 0, 0, fixed)
            else:
                rolled = jnp.roll(c, -1, axis=0)
                halo_row = b_refs[f][0:1, :]
                fixed = jnp.where(row_in_block == tile_p - 1, halo_row, rolled)
                if not wrap:
                    fixed = jnp.where(global_row == num_peers - 1, 0, fixed)
            out.append(fixed)
        return out

    def lexmax(a_vals, b_vals):
        ak = _keys(a_vals[:4], a_vals[4], a_vals[5], mode)
        bk = _keys(b_vals[:4], b_vals[4], b_vals[5], mode)
        return _lexmax_vals(ak, bk, a_vals, b_vals)

    m1, gt1 = lexmax(center, shifted(+1))
    m2, gt2 = lexmax(m1, shifted(-1))

    for out, v in zip(out_refs, m2):
        out[...] = v

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        count_ref[0, 0] = 0

    count_ref[0, 0] += jnp.sum(gt1.astype(jnp.int32)) + jnp.sum(
        gt2.astype(jnp.int32)
    )


def _fullp_round_kernel(mode: str, wrap: bool, num_peers: int, *refs):
    """Full-peer-axis variant: the block spans all P rows, so the roll wraps
    correctly inside the block and no halo reads are needed — traffic is
    exactly 7 reads + 7 writes per entry."""
    import jax.experimental.pallas as pl

    c_refs, out_refs, count_ref = refs[:7], refs[7:14], refs[14]
    center = [r[...] for r in c_refs]
    row = jax.lax.broadcasted_iota(jnp.int32, center[0].shape, 0)

    def shifted(direction: int):
        out = []
        for f in range(7):
            rolled = jnp.roll(center[f], direction, axis=0)
            if not wrap:
                edge = row == (0 if direction == +1 else num_peers - 1)
                rolled = jnp.where(edge, 0, rolled)
            out.append(rolled)
        return out

    def lexmax(a_vals, b_vals):
        ak = _keys(a_vals[:4], a_vals[4], a_vals[5], mode)
        bk = _keys(b_vals[:4], b_vals[4], b_vals[5], mode)
        return _lexmax_vals(ak, bk, a_vals, b_vals)

    m1, gt1 = lexmax(center, shifted(+1))
    m2, gt2 = lexmax(m1, shifted(-1))
    for out, v in zip(out_refs, m2):
        out[...] = v

    @pl.when(pl.program_id(0) == 0)
    def _():
        count_ref[0, 0] = 0

    count_ref[0, 0] += jnp.sum(gt1.astype(jnp.int32)) + jnp.sum(
        gt2.astype(jnp.int32)
    )


# largest P for which 14 double-buffered full-P (P, 128)-lane tiles fit VMEM
_FULLP_MAX_ELEMS = 1 << 16  # 64K int32 = 256 KB/buffer → ~7.2 MB total


def _fullp_round_kernel_lean(wrap: bool, num_peers: int, *refs):
    """Lean variant: only the 4 value-key arrays (cls, khi, klo, vid) are
    exchanged and merged — reference-mode priority is exactly those keys, and
    writer/ctr/tick are local bookkeeping the reference also discards on
    receive (meta.source becomes "network", bullet.js:198-203). Traffic
    drops from 56 to 32 B/entry/round."""
    import jax.experimental.pallas as pl

    c_refs, out_refs, count_ref = refs[:4], refs[4:8], refs[8]
    center = [r[...] for r in c_refs]
    row = jax.lax.broadcasted_iota(jnp.int32, center[0].shape, 0)

    def shifted(direction: int):
        out = []
        for f in range(4):
            rolled = jnp.roll(center[f], direction, axis=0)
            if not wrap:
                edge = row == (0 if direction == +1 else num_peers - 1)
                rolled = jnp.where(edge, 0, rolled)
            out.append(rolled)
        return out

    def lexmax(a_vals, b_vals):
        return _lexmax_vals(a_vals, b_vals, a_vals, b_vals)

    m1, gt1 = lexmax(center, shifted(+1))
    m2, gt2 = lexmax(m1, shifted(-1))
    for out, v in zip(out_refs, m2):
        out[...] = v

    @pl.when(pl.program_id(0) == 0)
    def _():
        count_ref[0, 0] = 0

    count_ref[0, 0] += jnp.sum(gt1.astype(jnp.int32)) + jnp.sum(
        gt2.astype(jnp.int32)
    )


def _halo_round_kernel_lean(wrap: bool, tile_p: int, num_peers: int, *refs):
    """Lean halo variant: 4 value-key arrays with 8-row halo blocks for the
    cross-tile neighbor rows — lean throughput at any P (the full-P lean
    kernel is VMEM-bound to P*128 ≤ 2*_FULLP_MAX_ELEMS)."""
    import jax.experimental.pallas as pl

    c_refs = refs[:4]
    t_refs = refs[4:8]  # top halo (8 rows above)
    b_refs = refs[8:12]  # bottom halo (8 rows below)
    out_refs, count_ref = refs[12:16], refs[16]

    i = pl.program_id(0)
    center = [r[...] for r in c_refs]
    row_in_block = jax.lax.broadcasted_iota(jnp.int32, center[0].shape, 0)
    global_row = i * tile_p + row_in_block

    def shifted(direction: int):
        out = []
        for f in range(4):
            c = center[f]
            if direction == +1:
                rolled = jnp.roll(c, 1, axis=0)
                halo_row = t_refs[f][_HALO - 1 : _HALO, :]
                fixed = jnp.where(row_in_block == 0, halo_row, rolled)
                if not wrap:
                    fixed = jnp.where(global_row == 0, 0, fixed)
            else:
                rolled = jnp.roll(c, -1, axis=0)
                halo_row = b_refs[f][0:1, :]
                fixed = jnp.where(row_in_block == tile_p - 1, halo_row, rolled)
                if not wrap:
                    fixed = jnp.where(global_row == num_peers - 1, 0, fixed)
            out.append(fixed)
        return out

    up = shifted(+1)
    down = shifted(-1)
    m1, gt1 = _lexmax_vals(center, up, center, up)
    m2, gt2 = _lexmax_vals(m1, down, m1, down)
    for out, v in zip(out_refs, m2):
        out[...] = v

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        count_ref[0, 0] = 0

    count_ref[0, 0] += jnp.sum(gt1.astype(jnp.int32)) + jnp.sum(
        gt2.astype(jnp.int32)
    )


def lean_supported(p: int, n: int) -> bool:
    # full-P variant, or the halo variant (needs 8-aligned P and ≥2 tiles)
    tile_n = _lean_tile_n(p, n)
    if p * tile_n <= _FULLP_MAX_ELEMS * 2 and n % tile_n == 0 and n % 128 == 0:
        return True
    return p % _HALO == 0 and p >= 2 * _HALO and n % 128 == 0


def _lean_tile_n(p: int, n: int) -> int:
    t = min(max(128, (_FULLP_MAX_ELEMS * 2) // p), n)
    while t > 128 and n % t:
        t -= 128
    return t if n % t == 0 else n


def _lean_halo_tiles(p: int, n: int) -> Tuple[int, int]:
    """tile_p: 8-aligned divisor of p; tile at most 2^17 elements so 8
    double-buffered center buffers + halos stay well under VMEM."""

    def best_n(total, target):
        t = min(target, total)
        while t > 128 and total % t:
            t -= 128
        return t if total % t == 0 else total

    tile_n = best_n(n, 2048)
    target_p = max(_HALO, (1 << 17) // max(tile_n, 1))
    tile_p = _HALO
    cand = _HALO
    while cand <= min(p, target_p):
        if p % cand == 0:
            tile_p = cand
        cand += _HALO
    return tile_p, tile_n


def ring_round_pallas_lean(
    table: TableState, wrap: bool = True, interpret: bool | None = None
) -> Tuple[TableState, jax.Array]:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _ring_round_pallas_lean_jit(table, wrap, interpret)


@functools.partial(jax.jit, static_argnames=("wrap", "interpret"))
def _ring_round_pallas_lean_jit(
    table: TableState, wrap: bool = True, interpret: bool = False
) -> Tuple[TableState, jax.Array]:
    """Fused lean ring/chain round (reference mode only): merges the value
    keys, leaves writer/ctr/tick untouched. Requires reference-mode
    semantics — ctr never decides there (a vid tie means equal values).
    Check ``lean_supported(p, n)`` before calling."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p, n = table.cls.shape
    keys = (table.cls, table.khi, table.klo, table.vid)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(4)
    ) + (jax.ShapeDtypeStruct((1, 1), jnp.int32),)

    # full-P fast path: no halo traffic (8 data buffers -> bigger tiles fit)
    tile_n = _lean_tile_n(p, n)
    if p * tile_n <= _FULLP_MAX_ELEMS * 2 and n % tile_n == 0:
        grid = (n // tile_n,)
        data_spec = pl.BlockSpec(
            (p, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM
        )
        count_spec = pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM)
        outs = pl.pallas_call(
            functools.partial(_fullp_round_kernel_lean, wrap, p),
            grid=grid,
            in_specs=[data_spec] * 4,
            out_specs=tuple([data_spec] * 4) + (count_spec,),
            out_shape=out_shapes,
            interpret=interpret,
        )(*keys)
        merged = table._replace(cls=outs[0], khi=outs[1], klo=outs[2], vid=outs[3])
        return merged, outs[4][0, 0]

    # halo path for big P
    tile_p, tile_n = _lean_halo_tiles(p, n)
    grid = (p // tile_p, n // tile_n)
    p_halo_blocks = p // _HALO
    blocks_per_tile = tile_p // _HALO
    center_spec = pl.BlockSpec(
        (tile_p, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    top_spec = pl.BlockSpec(
        (_HALO, tile_n),
        lambda i, j: ((i * blocks_per_tile - 1) % p_halo_blocks, j),
        memory_space=pltpu.VMEM,
    )
    bottom_spec = pl.BlockSpec(
        (_HALO, tile_n),
        lambda i, j: (((i + 1) * blocks_per_tile) % p_halo_blocks, j),
        memory_space=pltpu.VMEM,
    )
    count_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        functools.partial(_halo_round_kernel_lean, wrap, tile_p, p),
        grid=grid,
        in_specs=[center_spec] * 4 + [top_spec] * 4 + [bottom_spec] * 4,
        out_specs=tuple([center_spec] * 4) + (count_spec,),
        out_shape=out_shapes,
        interpret=interpret,
    )(*keys, *keys, *keys)
    merged = table._replace(cls=outs[0], khi=outs[1], klo=outs[2], vid=outs[3])
    return merged, outs[4][0, 0]


def _pick_tiles(p: int, n: int) -> Tuple[int, int]:
    """tile_n divides n (lane-aligned); tile_p divides p AND is a multiple of
    _HALO — the halo index maps assume 8-row block granularity, so any other
    tile_p silently merges wrong neighbor rows."""

    def best_n(total, target):
        if total <= target:
            return total
        t = target
        while t > 128 and total % t:
            t -= 128
        return t if total % t == 0 else total

    tile_n = best_n(n, 4096)
    target_p = max(_HALO, (1 << 15) // max(tile_n, 1))
    tile_p = _HALO  # always valid: ring_round_supported requires p % 8 == 0
    cand = _HALO
    while cand <= min(p, target_p):
        if p % cand == 0:
            tile_p = cand
        cand += _HALO
    return tile_p, tile_n


def ring_round_supported(table: TableState) -> bool:
    p, n = table.cls.shape
    return p >= _HALO and p % _HALO == 0 and n % 128 == 0


def ring_round_pallas(
    table: TableState, mode: str = "reference", wrap: bool = True,
    interpret: bool | None = None
) -> Tuple[TableState, jax.Array]:
    """One fused ring (wrap=True) or chain (wrap=False) gossip round.
    Off-TPU backends run the kernel in interpret mode automatically; shapes
    the kernel can't tile (p not a multiple of 8, n not lane-aligned) fall
    back to the XLA implementation rather than erroring."""
    if not ring_round_supported(table):
        from ..parallel.gossip import gossip_round_chain, gossip_round_ring

        return (gossip_round_ring if wrap else gossip_round_chain)(table, mode)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _ring_round_pallas_jit(table, mode, wrap, interpret)


@functools.partial(jax.jit, static_argnames=("mode", "wrap", "interpret"))
def _ring_round_pallas_jit(
    table: TableState, mode: str = "reference", wrap: bool = True, interpret: bool = False
) -> Tuple[TableState, jax.Array]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p, n = table.cls.shape

    # full-P fast path: no halo traffic at all
    def best_n(target):
        t = min(target, n)
        while t > 128 and n % t:
            t -= 128
        return t if n % t == 0 else n

    fullp_tile_n = best_n(max(128, _FULLP_MAX_ELEMS // p))
    if p * fullp_tile_n <= _FULLP_MAX_ELEMS and n % fullp_tile_n == 0:
        grid = (n // fullp_tile_n,)
        data_spec = pl.BlockSpec(
            (p, fullp_tile_n), lambda j: (0, j), memory_space=pltpu.VMEM
        )
        count_spec = pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM)
        out_shapes = tuple(
            jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(7)
        ) + (jax.ShapeDtypeStruct((1, 1), jnp.int32),)
        outs = pl.pallas_call(
            functools.partial(_fullp_round_kernel, mode, wrap, p),
            grid=grid,
            in_specs=[data_spec] * 7,
            out_specs=tuple([data_spec] * 7) + (count_spec,),
            out_shape=out_shapes,
            interpret=interpret,
        )(*table)
        return TableState(*outs[:7]), outs[7][0, 0]

    tile_p, tile_n = _pick_tiles(p, n)
    grid = (p // tile_p, n // tile_n)
    p_halo_blocks = p // _HALO
    blocks_per_tile = tile_p // _HALO

    center_spec = pl.BlockSpec(
        (tile_p, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    top_spec = pl.BlockSpec(
        (_HALO, tile_n),
        lambda i, j: ((i * blocks_per_tile - 1) % p_halo_blocks, j),
        memory_space=pltpu.VMEM,
    )
    bottom_spec = pl.BlockSpec(
        (_HALO, tile_n),
        lambda i, j: (((i + 1) * blocks_per_tile) % p_halo_blocks, j),
        memory_space=pltpu.VMEM,
    )
    count_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)

    out_shapes = tuple(
        jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(7)
    ) + (jax.ShapeDtypeStruct((1, 1), jnp.int32),)

    outs = pl.pallas_call(
        functools.partial(_ring_round_kernel, mode, wrap, tile_p, p),
        grid=grid,
        in_specs=[center_spec] * 7 + [top_spec] * 7 + [bottom_spec] * 7,
        out_specs=tuple([center_spec] * 7) + (count_spec,),
        out_shape=out_shapes,
        interpret=interpret,
    )(*table, *table, *table)
    return TableState(*outs[:7]), outs[7][0, 0]


# ------------------------------------------- frontier convergence (dense)


def _merge_stripe_fullp_dense(center, nf: int, mode: str, wrap: bool,
                              num_peers: int):
    """Shared dense full-P stripe merge body: one ring/chain round on a
    [P, tile] block (rolls wrap inside the block); nf=7 merges all metadata
    under the mode's priority order, nf=4 is the lean variant. Returns
    (merged fields, changed count)."""
    row = jax.lax.broadcasted_iota(jnp.int32, center[0].shape, 0)

    def shifted(direction: int):
        out = []
        for f in range(nf):
            rolled = jnp.roll(center[f], direction, axis=0)
            if not wrap:
                edge = row == (0 if direction == +1 else num_peers - 1)
                rolled = jnp.where(edge, 0, rolled)
            out.append(rolled)
        return out

    def keys_of(vals):
        if nf == 4:
            return vals
        return _keys(vals[:4], vals[4], vals[5], mode)

    def lexmax(a_vals, b_vals):
        return _lexmax_vals(keys_of(a_vals), keys_of(b_vals), a_vals, b_vals)

    m1, gt1 = lexmax(center, shifted(+1))
    m2, gt2 = lexmax(m1, shifted(-1))
    return m2, jnp.sum(gt1.astype(jnp.int32)) + jnp.sum(gt2.astype(jnp.int32))


def _frontier_fullp_kernel_dense(nf: int, mode: str, wrap: bool,
                                 num_peers: int, t_total: int, m: int,
                                 *refs):
    """Full-P stripe frontier rounds over the dense layout, processing ONLY
    the active stripes (same prefetched grid remapping and in-kernel
    frontier compaction as the packed frontier — see ops.packed). With
    m > 1, M rounds fuse per block-load and the ids output carries the
    max-last-change cell for exact round reconstruction, mirroring
    _frontier_multiround_kernel_packed."""
    import jax.experimental.pallas as pl

    ids_ref = refs[0]
    c_refs = refs[1 : 1 + nf]
    out_refs, ids_out = refs[1 + nf : 1 + 2 * nf], refs[1 + 2 * nf]

    j = pl.program_id(0)
    count = ids_ref[t_total]

    @pl.when(j == 0)
    def _():
        ids_out[0, t_total] = 0
        ids_out[0, t_total + 1] = 0
        if m > 1:
            ids_out[0, t_total + 2] = 0

    @pl.when(j < count)
    def _():
        stripe = ids_ref[j]
        vals = [r[...] for r in c_refs]
        total = jnp.int32(0)
        stripe_last = jnp.int32(0)
        for k in range(1, m + 1):
            vals, c = _merge_stripe_fullp_dense(vals, nf, mode, wrap,
                                                num_peers)
            stripe_last = jnp.where(c > 0, jnp.int32(k), stripe_last)
            total += c
        for out, v in zip(out_refs, vals):
            out[...] = v

        @pl.when(stripe_last == m)
        def _():
            k_ = ids_out[0, t_total]
            ids_out[0, k_] = stripe
            ids_out[0, t_total] = k_ + 1

        ids_out[0, t_total + 1] += total
        if m > 1:
            ids_out[0, t_total + 2] = jnp.maximum(
                ids_out[0, t_total + 2], stripe_last
            )


def _frontier_shard_kernel_dense(nf: int, mode: str, b: int, t_total: int,
                                 *refs):
    """Per-device dense frontier ring/chain round (shard_map body twin of
    ops.packed._frontier_halo_kernel_counts with tiles=1): boundary rows
    come from the ppermuted 8-row snapshots (row 7 above / row 0 below,
    already zero-masked at the chain's global edges — all-zero rows are
    the bottom of both priority orders, so they never win), only stripes
    in the prefetched ids array are processed, and per-stripe change
    counts are emitted for the caller to psum across devices."""
    import jax.experimental.pallas as pl

    ids_ref = refs[0]
    c_refs = refs[1 : 1 + nf]
    t_refs = refs[1 + nf : 1 + 2 * nf]
    b_refs = refs[1 + 2 * nf : 1 + 3 * nf]
    out_refs = refs[2 + 3 * nf : 2 + 4 * nf]
    cnt_out = refs[2 + 4 * nf]

    j = pl.program_id(0)
    count = ids_ref[t_total]

    @pl.when(j < count)
    def _():
        stripe = ids_ref[j]
        center = [r[...] for r in c_refs]
        row_in_block = jax.lax.broadcasted_iota(
            jnp.int32, center[0].shape, 0
        )

        def shifted(direction: int):
            out = []
            for f in range(nf):
                c = center[f]
                if direction == +1:
                    rolled = jnp.roll(c, 1, axis=0)
                    fixed = jnp.where(
                        row_in_block == 0, t_refs[f][_HALO - 1 : _HALO, :],
                        rolled,
                    )
                else:
                    rolled = jnp.roll(c, -1, axis=0)
                    fixed = jnp.where(
                        row_in_block == b - 1, b_refs[f][0:1, :], rolled
                    )
                out.append(fixed)
            return out

        def keys_of(vals):
            if nf == 4:
                return vals
            return _keys(vals[:4], vals[4], vals[5], mode)

        def lexmax(a_vals, b_vals):
            return _lexmax_vals(
                keys_of(a_vals), keys_of(b_vals), a_vals, b_vals
            )

        m1, gt1 = lexmax(center, shifted(+1))
        m2, gt2 = lexmax(m1, shifted(-1))
        for out, v in zip(out_refs, m2):
            out[...] = v
        cnt_out[0, stripe] = jnp.sum(gt1.astype(jnp.int32)) + jnp.sum(
            gt2.astype(jnp.int32)
        )


def frontier_shard_round_dense(fields, tops, bottoms, ids_full, mode: str,
                               interpret: bool, vma=None):
    """Per-device dense frontier round body (called inside shard_map).
    ``fields`` is the nf-tuple of device-local [b, n] arrays (nf=4 lean,
    nf=7 full metadata); ``tops``/``bottoms`` are [8, n] ppermuted
    boundary snapshots. Returns (fields, per-stripe change counts)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(fields)
    b, n = fields[0].shape
    tile_n = frontier_tile_n_dense(b, n, nf == 4)
    t_total = n // tile_n

    grid_j = jnp.maximum(ids_full[t_total], 1)
    counts_in = jnp.zeros((1, t_total), jnp.int32)

    center_spec = pl.BlockSpec(
        (b, tile_n), lambda j, ids: (0, ids[j]), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec(
        (_HALO, tile_n), lambda j, ids: (0, ids[j]), memory_space=pltpu.VMEM
    )
    cnt_spec = pl.BlockSpec(
        (1, t_total), lambda j, ids: (0, 0), memory_space=pltpu.SMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_j,),  # dynamic: exactly the active stripes
        in_specs=[center_spec] * nf + [halo_spec] * 2 * nf + [cnt_spec],
        out_specs=[center_spec] * nf + [cnt_spec],
    )
    kw = {} if vma is None else {"vma": frozenset(vma)}
    aliases = {i + 1: i for i in range(nf)}
    aliases[1 + 3 * nf] = nf  # counts_in -> counts_out (zeros for skipped)
    outs = pl.pallas_call(
        functools.partial(
            _frontier_shard_kernel_dense, nf, mode, b, t_total
        ),
        grid_spec=grid_spec,
        out_shape=(
            *(jax.ShapeDtypeStruct((b, n), jnp.int32, **kw)
              for _ in range(nf)),
            jax.ShapeDtypeStruct((1, t_total), jnp.int32, **kw),
        ),
        input_output_aliases=aliases,
        interpret=interpret,
    )(ids_full, *fields, *tops, *bottoms, counts_in)
    return outs[:nf], outs[nf][0, :]


def _merge_ext_round_dense(ext, nf: int, mode: str, b: int):
    """One ring round on an EXTENDED dense tile (8 snapshot rows + b
    center rows + 8 snapshot rows), rolling with wrap INSIDE the extended
    block; returns (merged ext fields, center-only change count). The
    dense twin of ops.packed._merge_ext_round with wrap=True: global chain
    edges arrive as ZEROED snapshots, which is exact because an all-zero
    row is the bottom of both priority orders (cls=0 / ctr=0 never
    strictly wins — the same absent-neighbor semantics as the classic
    dense loops' edge masking), and ext-edge wraparound garbage stays
    outside the trapezoidal validity region for up to 8 fused rounds."""
    row = jax.lax.broadcasted_iota(jnp.int32, ext[0].shape, 0)
    center = (row >= _HALO) & (row < _HALO + b)

    def shifted(direction: int):
        return [jnp.roll(f, direction, axis=0) for f in ext]

    def keys_of(vals):
        if nf == 4:
            return vals
        return _keys(vals[:4], vals[4], vals[5], mode)

    def lexmax(a_vals, b_vals):
        return _lexmax_vals(keys_of(a_vals), keys_of(b_vals), a_vals,
                            b_vals)

    m1, gt1 = lexmax(ext, shifted(+1))
    m2, gt2 = lexmax(m1, shifted(-1))
    c = jnp.sum((gt1 & center).astype(jnp.int32)) + jnp.sum(
        (gt2 & center).astype(jnp.int32)
    )
    return m2, c


def _frontier_shard_multiround_kernel_dense(nf: int, mode: str, m: int,
                                            b: int, t_total: int, *refs):
    """Per-device FUSED dense frontier body: M rounds per block-load on
    the device-local [b, tile] stripe via the same trapezoidal time-tiling
    as the packed shard multiround kernel
    (ops.packed._frontier_shard_multiround_kernel_packed) — the ppermuted
    8-row neighbor snapshots buy exactly 8 exact rounds for the center.
    Emits per-ROUND per-stripe center change counts ([m, t_total] SMEM)
    for the caller to psum across devices."""
    import jax.experimental.pallas as pl

    ids_ref = refs[0]
    c_refs = refs[1 : 1 + nf]
    t_refs = refs[1 + nf : 1 + 2 * nf]
    b_refs = refs[1 + 2 * nf : 1 + 3 * nf]
    out_refs = refs[2 + 3 * nf : 2 + 4 * nf]
    cnt_out = refs[2 + 4 * nf]

    j = pl.program_id(0)
    count = ids_ref[t_total]

    @pl.when(j < count)
    def _():
        stripe = ids_ref[j]
        ext = [
            jnp.concatenate([t[...], c[...], bo[...]], axis=0)
            for t, c, bo in zip(t_refs, c_refs, b_refs)
        ]

        # fori_loop, not a Python unroll: the nf=7 six-key compare chain
        # makes an unrolled m-round body blow up XLA:CPU compile time
        # (the packed twin unrolls, but carries only 3 fields)
        def round_body(k, ext_t):
            new_ext, ck = _merge_ext_round_dense(list(ext_t), nf, mode, b)
            cnt_out[k, stripe] = ck
            return tuple(new_ext)

        ext = jax.lax.fori_loop(0, m, round_body, tuple(ext))
        for out, v in zip(out_refs, ext):
            out[...] = v[_HALO : _HALO + b, :]


def frontier_shard_multiround_dense(fields, tops, bottoms, ids_full,
                                    mode: str, interpret: bool, vma=None):
    """HALO_FUSE-round fused twin of frontier_shard_round_dense: ``tops``
    / ``bottoms`` are the FULL 8-row ppermuted neighbor boundary blocks
    (pre-fused-step snapshots), not 1-row pads. Returns (fields, per-round
    per-stripe counts [HALO_FUSE, t_total]) for the caller to psum."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .packed import HALO_FUSE

    nf = len(fields)
    b, n = fields[0].shape
    tile_n = frontier_tile_n_dense(b, n, nf == 4)
    t_total = n // tile_n

    grid_j = jnp.maximum(ids_full[t_total], 1)
    counts_in = jnp.zeros((HALO_FUSE, t_total), jnp.int32)

    center_spec = pl.BlockSpec(
        (b, tile_n), lambda j, ids: (0, ids[j]), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec(
        (_HALO, tile_n), lambda j, ids: (0, ids[j]), memory_space=pltpu.VMEM
    )
    cnt_spec = pl.BlockSpec(
        (HALO_FUSE, t_total), lambda j, ids: (0, 0), memory_space=pltpu.SMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_j,),  # dynamic: exactly the active stripes
        in_specs=[center_spec] * nf + [halo_spec] * 2 * nf + [cnt_spec],
        out_specs=[center_spec] * nf + [cnt_spec],
    )
    kw = {} if vma is None else {"vma": frozenset(vma)}
    aliases = {i + 1: i for i in range(nf)}
    aliases[1 + 3 * nf] = nf  # counts_in -> counts_out (zeros for skipped)
    outs = pl.pallas_call(
        functools.partial(
            _frontier_shard_multiround_kernel_dense, nf, mode, HALO_FUSE,
            b, t_total
        ),
        grid_spec=grid_spec,
        out_shape=(
            *(jax.ShapeDtypeStruct((b, n), jnp.int32, **kw)
              for _ in range(nf)),
            jax.ShapeDtypeStruct((HALO_FUSE, t_total), jnp.int32, **kw),
        ),
        input_output_aliases=aliases,
        interpret=interpret,
    )(ids_full, *fields, *tops, *bottoms, counts_in)
    return outs[:nf], outs[nf]


def frontier_tile_n_dense_sharded(p: int, n: int, n_devices: int,
                                  lean: bool) -> int:
    """Per-device stripe width for the dense shard_map frontier (0 when
    the local block can't tile) — the dense twin of
    ops.packed.frontier_tile_n_sharded."""
    if n_devices <= 0 or p % n_devices:
        return 0
    per_dev = p // n_devices
    if per_dev % _HALO or per_dev < _HALO or n % 128:
        return 0
    return frontier_tile_n_dense(per_dev, n, lean)


def frontier_tile_n_dense(p: int, n: int, lean: bool) -> int:
    """Stripe width for the dense frontier loop (0 when no full-P stripe
    fits): the lean variant carries 8 buffers so it gets twice the budget
    of the 14-buffer full-metadata variant."""
    if p % _HALO or n % 128:
        return 0
    budget = _FULLP_MAX_ELEMS * (2 if lean else 1)
    start = (budget // max(p, 1)) // 128 * 128
    t = min(max(128, start), n)
    while t >= 128 and n % t:
        t -= 128
    if t < 128 or n % t:
        return 0
    return t if p * t <= budget * 2 else 0


def frontier_round_dense_traced(
    table: TableState, ids: jax.Array, wrap: bool, mode: str, lean: bool,
    interpret: bool, m: int = 1,
):
    """Compacting dense frontier step in place (M rounds fused per
    block-load when m > 1); ``ids`` is the [t_total + 2] compact array
    (ops.packed.frontier_ids_compact), or [t_total + 3] with the
    max-last-change cell when m > 1; returns (table, next ids)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p, n = table.cls.shape
    tile_n = frontier_tile_n_dense(p, n, lean)
    t_total = n // tile_n
    nf = 4 if lean else 7
    fields = (
        (table.cls, table.khi, table.klo, table.vid) if lean else tuple(table)
    )
    grid_j = jnp.maximum(ids[t_total], 1)
    ids_len = t_total + (3 if m > 1 else 2)

    stripe_spec = pl.BlockSpec(
        (p, tile_n), lambda j, ids_: (0, ids_[j]), memory_space=pltpu.VMEM
    )
    ids_spec = pl.BlockSpec(
        (1, ids_len), lambda j, ids_: (0, 0), memory_space=pltpu.SMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_j,),  # dynamic: exactly the active stripes
        in_specs=[stripe_spec] * nf,
        out_specs=[stripe_spec] * nf + [ids_spec],
    )
    aliases = {i + 1: i for i in range(nf)}
    outs = pl.pallas_call(
        functools.partial(
            _frontier_fullp_kernel_dense, nf, mode, wrap, p, t_total, m
        ),
        grid_spec=grid_spec,
        out_shape=(
            *(jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(nf)),
            jax.ShapeDtypeStruct((1, ids_len), jnp.int32),
        ),
        input_output_aliases=aliases,
        interpret=interpret,
    )(ids, *fields)
    if lean:
        new_table = table._replace(
            cls=outs[0], khi=outs[1], klo=outs[2], vid=outs[3]
        )
    else:
        new_table = TableState(*outs[:7])
    return new_table, outs[nf][0]


@functools.partial(
    jax.jit,
    static_argnames=("wrap", "mode", "lean", "max_rounds", "interpret",
                     "fuse"),
    donate_argnums=(0,),
)
def gossip_frontier_dense(
    table: TableState,
    dirty: jax.Array,
    wrap: bool,
    mode: str,
    lean: bool,
    max_rounds: int,
    interpret: bool = False,
    fuse: int = 1,
) -> Tuple[TableState, jax.Array, jax.Array]:
    """Dense frontier convergence loop (ring/chain): per round only stripes
    still changing are touched, and the kernel compacts the next frontier
    in SMEM (see ops.packed). Bit-identical final state and round count to
    the classic all-stripes loop — including with ``fuse`` > 1, which runs
    FUSE rounds per block-load and reconstructs the exact classic round
    count (same scheme as gossip_frontier_packed)."""
    from .packed import frontier_fused_loop, frontier_ids_compact

    p, n = table.cls.shape
    tile_n = frontier_tile_n_dense(p, n, lean)
    t_total = n // tile_n

    if fuse > 1:
        return frontier_fused_loop(
            table, dirty, t_total, max_rounds, fuse,
            lambda tbl, ids: frontier_round_dense_traced(
                tbl, ids, wrap, mode, lean, interpret
            ),
            lambda tbl, ids: frontier_round_dense_traced(
                tbl, ids, wrap, mode, lean, interpret, m=fuse
            ),
        )

    ids0 = frontier_ids_compact(dirty, t_total)

    def cond(state):
        _, ids, rounds = state
        return (ids[t_total] > 0) & (rounds < max_rounds)

    def body(state):
        tbl, ids, rounds = state
        tbl, ids = frontier_round_dense_traced(
            tbl, ids, wrap, mode, lean, interpret
        )
        return tbl, ids, rounds + 1

    table, ids, rounds = jax.lax.while_loop(
        cond, body, (table, ids0, jnp.int32(0))
    )
    # 0 IFF the frontier is empty at exit (see gossip_frontier_packed)
    last_changed = jnp.where(ids[t_total] == 0, 0, ids[t_total + 1])
    return table, rounds, last_changed
