"""Packed ultra-lean table layout: 12 B/entry, the north-star shape enabler.

The dense layout (ops.merge.TableState) spends 28 B/entry; reference-mode
merge priority only ever reads the four value keys (cls, khi, klo, vid) —
writer/ctr/tick are local bookkeeping the reference discards on receive
(meta.source, /root/reference/src/bullet.js:198-203). Packing cls (3 bits)
and vid (≤ 2^28) into one word ``cv = cls << 28 | vid`` yields a 3-array
layout:

    khi, klo, cv : int32 [P, N]   → 12 B/entry

1,024 peers × 1M slots ≈ 12.9 GB — the BASELINE.json north-star shape fits a
single v5e chip. The merge order is unchanged: lexicographic over
``(cv >> 28, khi, klo, cv)`` ≡ (cls, khi, klo, vid), because equal cls makes
the final cv comparison a vid comparison. Converged states are bit-identical
to dense reference mode (tested); ``applied``/``changed`` counts exclude
metadata-only updates (a dense-mode op that ties on all four value keys but
wins on writer/ctr updates bookkeeping without changing the value).

The fused Pallas ring/chain round streams full-P column stripes with
``input_output_aliases`` — the round is IN-PLACE in HBM, so peak memory is
the table itself (a separate output copy would not fit the north-star shape).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .apply import OpBatch
from .merge import TableState, lex_gt

CV_SHIFT = 28
VID_MASK = (1 << CV_SHIFT) - 1
MAX_VID = VID_MASK  # interner capacity in packed mode: 2^28 distinct values


class PackedTable(NamedTuple):
    """Reference-mode replica tables at 12 B/entry (see module docstring)."""

    khi: jax.Array
    klo: jax.Array
    cv: jax.Array  # cls << 28 | vid


def init_packed(num_peers: int, capacity: int) -> PackedTable:
    # three DISTINCT zero buffers: apply donates the table, and donating one
    # aliased buffer three times is an error
    return PackedTable(
        *(jnp.zeros((num_peers, capacity), dtype=jnp.int32) for _ in range(3))
    )


def pack_cv(cls, vid):
    return (cls << CV_SHIFT) | vid


def pack_table(t: TableState) -> PackedTable:
    """Dense → packed (drops writer/ctr/tick)."""
    return PackedTable(t.khi, t.klo, pack_cv(t.cls, t.vid))


def unpack_table(pt: PackedTable) -> TableState:
    """Packed → dense with zeroed metadata (for interop/serialization)."""
    z = jnp.zeros_like(pt.cv)
    return TableState(
        cls=pt.cv >> CV_SHIFT,
        khi=pt.khi,
        klo=pt.klo,
        vid=pt.cv & VID_MASK,
        writer=z,
        ctr=z,
        tick=z,
    )


def packed_keys(khi, klo, cv):
    """(cls, khi, klo, vid) as a 4-key lex chain on packed fields."""
    return (cv >> CV_SHIFT, khi, klo, cv)


def _lex_gt_packed(b_keys, a_keys):
    """b strictly beats a under the packed key chain. Thin delegation to
    ops.merge.lex_gt — NOTE the argument order: the first argument is the
    CHALLENGER (kept this way because every packed call site asks "does b
    beat a?")."""
    return lex_gt(b_keys, a_keys)


def table_keys(fields):
    """Lex key chain for a packed-FAMILY field tuple, dispatched on length:
    3 fields = the packed layout (khi, klo, cv) → (cls, khi, klo, vid);
    2 fields = the rank layout (rank, cv) → ONE key, the rank;
    1 field = the rank1 layout (rank alone) → the same single key. The
    RankIndex assigns distinct vids distinct ranks in (cls, khi, klo, vid)
    order (a bijection refining the packed chain — see ops.rank), so equal
    ranks mean the SAME vid, hence the same cv: the cv tiebreak can never
    fire, and a single int32 compare decides every merge (~half the VPU
    ops of a 2-key chain on the compute-bound fused paths). Every shared
    kernel body keys through this, making the whole kernel zoo
    layout-generic."""
    if len(fields) <= 2:
        return (fields[0],)
    return packed_keys(*fields)


def op_present(vals):
    """Live-op guard for a packed-family op/entry field tuple. Arity 1 is
    the rank1 layout: the single field IS the rank, and rank 0 = absent
    (live ranks are ≥ 1 by RankIndex construction). Otherwise the last
    field is cv, whose top bits carry cls (cls 0 = absent)."""
    if len(vals) == 1:
        return vals[0] > 0
    return (vals[-1] >> CV_SHIFT) > 0


def merge_packed_xla(
    a: PackedTable, b: PackedTable
) -> Tuple[PackedTable, jax.Array]:
    """Reference-mode winner-select over packed-family tables + changed
    count (layout-generic: works on PackedTable and ops.rank.RankTable)."""
    take_b = _lex_gt_packed(
        table_keys(tuple(b)), table_keys(tuple(a))
    )
    merged = type(a)(*(jnp.where(take_b, fb, fa) for fa, fb in zip(a, b)))
    return merged, jnp.sum(take_b.astype(jnp.int32))


# ---------------------------------------------------------------- op apply


@functools.partial(jax.jit, donate_argnums=(0,))
def apply_ops_packed(
    table: PackedTable, ops: OpBatch, tick: jax.Array
) -> Tuple[PackedTable, jax.Array]:
    """Reference-mode op application on the packed layout.

    An op lands iff its value keys strictly beat the current entry
    (quirk Q2's value-LWW); metadata-only wins (vid tie, higher writer/ctr)
    are value no-ops in dense mode and simply don't exist here.

    The table buffer is DONATED: at the north-star shape the table is most
    of HBM, and a second scan-carry copy does not fit. Callers must not
    reuse their input reference (netsim reassigns ``self.table``).
    """
    num_peers = table.khi.shape[0]
    rows = jnp.arange(num_peers, dtype=jnp.int32)

    def body(carry, op_col):
        tbl, applied = carry
        slot, ocls, okhi, oklo, ovid, _octr = op_col
        cur = tuple(f[rows, slot] for f in tbl)  # (khi, klo, cv) [P]
        ocv = pack_cv(ocls, ovid)
        win = _lex_gt_packed(
            packed_keys(okhi, oklo, ocv), packed_keys(*cur)
        ) & (ocls > 0)
        new_vals = (
            jnp.where(win, okhi, cur[0]),
            jnp.where(win, oklo, cur[1]),
            jnp.where(win, ocv, cur[2]),
        )
        tbl = PackedTable(
            *(f.at[rows, slot].set(v) for f, v in zip(tbl, new_vals))
        )
        return (tbl, applied + jnp.sum(win.astype(jnp.int32))), None

    cols = tuple(jnp.moveaxis(f, 1, 0) for f in ops)
    (table, applied), _ = jax.lax.scan(body, (table, jnp.int32(0)), cols)
    return table, applied


@jax.jit
def _flat_winners(table, peer, slot, vals):
    """Read-only pass: gather current entries, decide winners, emit the [K]
    update values (loser slots re-emit their current value). ``vals`` is
    the op field tuple matching the table layout (last field is always cv,
    whose top bits carry cls — the presence guard)."""
    cur = tuple(f[peer, slot] for f in table)
    win = _lex_gt_packed(
        table_keys(vals), table_keys(cur)
    ) & op_present(vals)
    return (
        tuple(jnp.where(win, v, c) for v, c in zip(vals, cur)),
        jnp.sum(win.astype(jnp.int32)),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_one(arr, peer, slot, values):
    """Scatter into ONE donated array without an array-sized temp.

    XLA:TPU scatter always materializes a copy of its operand (measured:
    temp == operand even with donated, sorted, unique indices) — a 4 GB
    temp per array at the north-star shape, which does not fit. Instead,
    loop over peer-row blocks: slice a block (bounded copy), scatter the
    ops that fall in it (out-of-block rows drop via mode="drop"), and
    dynamic_update_slice it back — the fori carry updates in place.
    """
    p, n = arr.shape
    # block temp ≈ 2 × pb × n × 4 B (slice + its scatter copy); cap ~0.5 GB
    pb = max(8, min(p, (1 << 25) // max(n, 1)))
    while p % pb:
        pb -= 1
    if pb == p:
        return arr.at[peer, slot].set(
            values, unique_indices=True, indices_are_sorted=True
        )

    def body(b, a):
        block = jax.lax.dynamic_slice(a, (b * pb, 0), (pb, n))
        # rows outside this block must DROP — but JAX wraps negative traced
        # indices (adds the axis size) BEFORE mode="drop" applies, so a
        # previous-block op's rel in [-pb, -1] would land in-bounds and
        # corrupt another peer's row. Map out-of-block ops to the positive
        # out-of-bounds sentinel pb instead, which genuinely drops.
        in_block = (peer >= b * pb) & (peer < (b + 1) * pb)
        rel = jnp.where(in_block, peer - b * pb, pb)
        # NO sorted/unique hints here: the sentinel remap interleaves rel=pb
        # entries around the in-block run (unsorted) and two out-of-block
        # ops can share a slot (duplicate index tuples) — asserting the
        # hints anyway is undefined behavior in XLA's TPU scatter lowering
        block = block.at[rel, slot].set(values, mode="drop")
        return jax.lax.dynamic_update_slice(a, block, (b * pb, 0))

    return jax.lax.fori_loop(0, p // pb, body, arr)


def _flat_scatter(table, peer, slot, new_vals):
    return type(table)(
        *(
            _scatter_one(f, peer, slot, v)
            for f, v in zip(table, new_vals)
        )
    )


def apply_flat_packed(
    table: PackedTable,
    peer: jax.Array,
    slot: jax.Array,
    khi: jax.Array,
    klo: jax.Array,
    cv: jax.Array,
) -> Tuple[PackedTable, jax.Array]:
    """One-shot flat apply: K ops with UNIQUE (peer, slot) pairs SORTED by
    (peer, slot) — exactly what ``reduce_flat_ops`` emits; the full-table
    scatter path asserts both properties to XLA. The pre-reduction keeps
    each pair's lattice winner (order-free, so the outcome matches
    sequential application). Gather+compare and scatter run
    as two programs: fusing them forces XLA to copy the table (the scatter
    output aliases a buffer the gather still reads), and at the north-star
    shape that copy alone exceeds HBM. The table buffer is DONATED."""
    new_vals, applied = _flat_winners(table, peer, slot, (khi, klo, cv))
    table = _flat_scatter(table, peer, slot, new_vals)
    return table, applied


@jax.jit
def _unstack_ops(ops):
    return ops[0], ops[1], ops[2], ops[3], ops[4]


def apply_flat_packed_stacked(
    table: PackedTable, ops: jax.Array
) -> Tuple[PackedTable, jax.Array]:
    """apply_flat_packed over a stacked [5, K] op array (rows: peer, slot,
    khi, klo, cv). Callers ship the whole reduced batch as ONE host→device
    transfer — per-transfer latency through the device link is paid once
    instead of five times — and the rows split on device."""
    peer, slot, khi, klo, cv = _unstack_ops(ops)
    return apply_flat_packed(table, peer, slot, khi, klo, cv)


# ------------------------------------------------ chunk-grid apply (Pallas)
# XLA:TPU scatter costs ~2-3M elements/s regardless of locality (measured:
# 68 ms winners gather vs 1.28 s for the three chunked scatters at 1M ops
# on the north-star table). The chunk-grid path instead streams only the
# op-OCCUPIED (8, 128) table blocks through a Pallas kernel whose grid
# runs over 16-op CHUNKS: ops arrive block-sorted (reduce_flat_ops emits
# that order for free), so all chunks of a block are CONSECUTIVE grid
# steps — the output block index is unchanged between them and Pallas
# keeps the block resident in VMEM (the standard reduction-revisit
# pattern; verified in both interpret mode and on hardware). The first
# chunk of each block copies the (aliased, pre-call) input block into the
# output ref; later chunks read-modify-write the output ref directly.
# This removes the previous design's per-block op ceiling entirely: any
# density works — a block with 1,000 ops simply owns 63 consecutive grid
# steps while its 4 KB block stays resident. Matches the reference's hot
# write loop (/root/reference/src/bullet.js:139-155 applying each op via
# /root/reference/src/bullet-crt.js:164-279) at full batch width.

_BLOCK_C = 16  # ops per chunk (meta cnt field: 5 bits)
_CG_BN = 128  # chunk-grid block width: one (8, 128) VPU tile per block

# chunks per pallas_call: TWO scalar-prefetch int32 arrays live in SMEM
# (~1 MB budget) → 2^16 chunks = 512 KB; bigger batches run several
# sequential segments (HBM read-modify-write across calls is safe)
MAX_BLOCK_CHUNKS = 1 << 16


def block_apply_supported(p: int, n: int) -> bool:
    """Chunk-grid geometry: 8-aligned p ≤ 8192 (rb: 10 meta bits),
    128-aligned n ≤ 2^24 (cb: 17 meta bits)."""
    return p % 8 == 0 and 0 < p <= 8192 and n % _CG_BN == 0 and (
        0 < n <= (_CG_BN << 17)
    )


def chunk_block_ops(peer, slot, *vals_and_shape):
    """Host chunking for the chunk-grid apply: BLOCK-SORTED unique ops →
    (meta_rc [n_chunks] = rb | cb<<10, meta_cf [n_chunks] = cnt | first<<5,
    ops5 [n_chunks, C, 2 + nv] int32). ``first`` marks the first chunk of
    each block (the kernel's copy-on-first signal). Any per-block density
    is representable — there is no window ceiling.

    Layout-generic: ``vals_and_shape`` is the op value fields matching the
    table layout (packed: khi, klo, cv; rank: rank, cv — cv always last)
    followed by the table shape (p, n)."""
    import numpy as np

    *vals, p, n = vals_and_shape
    k = len(peer)
    b = (peer.astype(np.int64) >> 3) * (n // _CG_BN) + (
        slot.astype(np.int64) // _CG_BN
    )
    first = np.empty(k, dtype=bool)
    first[0] = True
    np.not_equal(b[1:], b[:-1], out=first[1:])
    starts = np.flatnonzero(first)
    sizes = np.diff(np.append(starts, k))
    within = np.arange(k, dtype=np.int64) - np.repeat(starts, sizes)
    boundary = first | (within % _BLOCK_C == 0)
    cstarts = np.flatnonzero(boundary)
    n_chunks = len(cstarts)
    csizes = np.diff(np.append(cstarts, k)).astype(np.int32)
    rb = (peer[cstarts].astype(np.int32) >> 3)
    cb = (slot[cstarts] // _CG_BN).astype(np.int32)
    meta_rc = rb | (cb << 10)
    meta_cf = csizes | (first[cstarts].astype(np.int32) << 5)
    chunk_of = np.cumsum(boundary) - 1
    pos = (within % _BLOCK_C).astype(np.int64)
    # ONE fused index column (r:3b << 7 | c:7b): the op stream is the
    # apply path's h2d payload and the tunnel runs ~30 MB/s — dropping a
    # column is a direct wall-clock win (VERDICT r4 item 1)
    ops5 = np.zeros((n_chunks, _BLOCK_C, 1 + len(vals)), dtype=np.int32)
    ops5[chunk_of, pos, 0] = ((peer & 7) << 7) | (slot % _CG_BN)
    for f, v in enumerate(vals):
        ops5[chunk_of, pos, 1 + f] = v
    return meta_rc, meta_cf, ops5


def _chunk_apply_kernel(nf: int, *refs):
    """One 16-op CHUNK per grid step, applied to the resident (8, 128)
    block as one-hot winner-selects. The first chunk of a block copies the
    aliased input block into the output ref; later chunks of the same
    block are consecutive steps, so the output block is still resident and
    read-modify-write through it is exact. Win counts accumulate in
    SMEM. Layout-generic over the nf-field table (keyed via table_keys)."""
    import jax.experimental.pallas as pl

    meta_cf_ref = refs[1]  # refs[0] = meta_rc (index maps only)
    ops_ref = refs[2]
    in_refs = refs[3:3 + nf]
    out_refs, count_ref = refs[3 + nf:3 + 2 * nf], refs[3 + 2 * nf]

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        count_ref[0, 0] = 0

    cf = meta_cf_ref[t]
    cnt = cf & 31

    @pl.when((cf >> 5) == 1)
    def _():
        for o, i_ in zip(out_refs, in_refs):
            o[...] = i_[...]

    blk = [o[...] for o in out_refs]
    row_i = jax.lax.broadcasted_iota(jnp.int32, blk[0].shape, 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, blk[0].shape, 1)
    applied = jnp.int32(0)
    for i in range(_BLOCK_C):
        idx = ops_ref[0, 0, i]
        r = idx >> 7
        c = idx & (_CG_BN - 1)
        ovals = tuple(ops_ref[0, 1 + f, i] for f in range(nf))
        onehot = (row_i == r) & (col_i == c) & (i < cnt)
        beats = _lex_gt_packed(
            table_keys(ovals), table_keys(tuple(blk))
        ) & op_present(ovals)
        win = onehot & beats
        blk = [jnp.where(win, ov, b) for ov, b in zip(ovals, blk)]
        applied += jnp.sum(win.astype(jnp.int32))
    for o, v in zip(out_refs, blk):
        o[...] = v
    count_ref[0, 0] += applied


def _bucket_i32(x, min_cap=256):
    """Pad a host int32 array to the next power-of-two length so the
    staged apply jits a BOUNDED set of programs (one per bucket)."""
    import numpy as np

    ln = len(x)
    cap = max(min_cap, 1 << max(0, ln - 1).bit_length())
    if cap == ln:
        return x
    out = np.zeros((cap,) + x.shape[1:], np.int32)
    out[:ln] = x
    return out


def stage_flat_blocked(meta_rc, meta_cf, ops5):
    """Host→device staging half of apply_flat_blocked: segment at chunk
    granularity, bucket-pad, and START every h2d transfer now
    (jnp.asarray dispatches asynchronously). The write path stages at
    ingest time so a later reconcile/step pays only the device kernel
    (VERDICT r4 item 1 / r5 item 3). Returns opaque segments for
    apply_flat_blocked_staged."""
    segs = []
    for s in range(0, len(meta_rc), MAX_BLOCK_CHUNKS):
        e = min(s + MAX_BLOCK_CHUNKS, len(meta_rc))
        cf = meta_cf[s:e]
        if s > 0 and not (cf[0] >> 5):
            cf = cf.copy()
            cf[0] |= 1 << 5  # segment start: force a fresh HBM read
        segs.append((
            jnp.asarray(_bucket_i32(meta_rc[s:e])),
            jnp.asarray(_bucket_i32(cf)),
            jnp.asarray(_bucket_i32(ops5[s:e])),
            e - s,
        ))
    return segs


def apply_flat_blocked_staged(
    table: PackedTable, segs
) -> Tuple[PackedTable, jax.Array]:
    """Device half of apply_flat_blocked over pre-staged segments."""
    interpret = jax.default_backend() != "tpu"
    applied = jnp.int32(0)
    for meta_rc, meta_cf, ops5, n_chunks in segs:
        table, a = _apply_flat_blocked_jit(
            table, meta_rc, meta_cf, ops5, jnp.int32(n_chunks), interpret,
        )
        applied = applied + a
    return table, applied


def apply_flat_blocked(
    table: PackedTable, meta_rc, meta_cf, ops5
) -> Tuple[PackedTable, jax.Array]:
    """Chunk-grid apply over host-chunked ops (see chunk_block_ops).
    Batches past the SMEM chunk budget run as sequential segments split at
    chunk granularity — a block whose chunks straddle a segment boundary
    is simply read-modified-written across two calls (the segment's first
    chunk gets the copy-on-first bit forced, so it re-reads the updated
    HBM block). Each segment pads to a power-of-two bucket so the jit
    compiles a BOUNDED set of programs (the dynamic grid still runs
    exactly n_chunks steps). Returns (table, applied)."""
    if len(meta_rc) == 0:
        # a zero-chunk pallas call would still flush its (uninitialized)
        # padded step's output block over table block (0, 0)
        return table, jnp.int32(0)
    return apply_flat_blocked_staged(
        table, stage_flat_blocked(meta_rc, meta_cf, ops5)
    )


@functools.partial(
    jax.jit, static_argnames=("interpret",), donate_argnums=(0,)
)
def _apply_flat_blocked_jit(
    table: PackedTable, meta_rc, meta_cf, ops5, n_chunks, interpret: bool
) -> Tuple[PackedTable, jax.Array]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(table)
    p, n = table[0].shape
    # device-side expansion to the (8, 128) tile: [NC, C, 2+nf] →
    # [NC, 8, 128] (the compact form crosses the host↔device link; the
    # padded temp is device-local and transient)
    ops_t = jnp.transpose(ops5, (0, 2, 1))  # [NC, 2+nf, C]
    ops_pad = jnp.pad(
        ops_t, ((0, 0), (0, 8 - ops_t.shape[1]), (0, 128 - ops_t.shape[2]))
    )
    grid_t = jnp.maximum(n_chunks, 1)

    def tbl_idx(t, m, cf):
        return m[t] & 0x3FF, m[t] >> 10

    tbl_spec = pl.BlockSpec((8, _CG_BN), tbl_idx, memory_space=pltpu.VMEM)
    ops_spec = pl.BlockSpec(
        (1, 8, 128), lambda t, m, cf: (t, 0, 0), memory_space=pltpu.VMEM
    )
    cnt_spec = pl.BlockSpec(
        (1, 1), lambda t, m, cf: (0, 0), memory_space=pltpu.SMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid_t,),  # dynamic: exactly the occupied chunks
        in_specs=[ops_spec] + [tbl_spec] * nf,
        out_specs=[tbl_spec] * nf + [cnt_spec],
    )
    outs = pl.pallas_call(
        functools.partial(_chunk_apply_kernel, nf),
        grid_spec=grid_spec,
        out_shape=(
            *(jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(nf)),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        # alias indices count the prefetch operands (0=meta_rc, 1=meta_cf)
        # and the ops view (2): tables follow
        input_output_aliases={3 + i: i for i in range(nf)},
        interpret=interpret,
    )(meta_rc, meta_cf, ops_pad, *table)
    # n_chunks >= 1 always (apply_flat_blocked early-outs on empty chunk
    # lists): step 0 is a real chunk and carries first=1, so the output
    # block is always initialized before it is written back
    return type(table)(*outs[:nf]), outs[nf][0, 0]


# ---------------------------------------------- windowed apply (dense, MXU)
# The chunk-grid kernel's per-step floor is DMA-issue latency (~4.6 µs for
# 7 tiny copies, measured) plus ~0.1 µs per scalar VMEM load — fine when a
# batch touches few blocks, but a dense 1M-op batch is ~65k steps. The
# windowed path instead applies 128 ops per grid step to an (8, 1024)
# block, and builds the op one-hots on the MXU instead of looping:
#
#   R[s, j]  = (r_j == s)        — one compare against a sublane iota
#   M[j, L]  = (c_j == L)        — needs c_j down the SUBLANES: transpose
#                                  the lane vector via one MXU matmul
#                                  (contract I_128 with c_row on lanes)
#   U_half   = (R ⊙ v_half_row) @ M   — the dense update block, built per
#                                  16-bit half so every product/sum is
#                                  exact in f32 (targets are unique per
#                                  block, so each output cell sums at most
#                                  one nonzero term; padding rows carry
#                                  all-zero values and cannot perturb it)
#
# then one block-wide packed lexmax merges U into the table. Zero scalar
# loads, 6 value matmuls + 1 transpose per 128 ops, ~7 DMA issues per
# window. Precision.HIGHEST keeps the f32 matmuls exact (default TPU
# precision is bf16-mantissa passes, which would round 16-bit halves).

_WIN_C = 128  # ops per window
_WIN_BN = 1024  # window block width; (8, _WIN_BN) table blocks


def window_apply_supported(p: int, n: int) -> bool:
    """Windowed-apply geometry: 8-aligned p ≤ 8192 (rb: 10 meta bits),
    _WIN_BN-aligned n ≤ 2^20 column blocks (cb: 20 meta bits)."""
    return p % 8 == 0 and 0 < p <= 8192 and n % _WIN_BN == 0 and (
        n // _WIN_BN <= (1 << 20)
    )


def window_block_ops(peer, slot, *vals_and_shape):
    """Host windowing for the dense apply: BLOCK-SORTED unique ops →
    (meta [n_win] = rb | cb<<10 | first<<30, ops5 [n_win, 128, 2+nv]
    int32). Each window holds ≤128 consecutive ops of ONE (8, 1024) block;
    padding rows are all-zero (cls 0 never wins, and zero value halves
    contribute nothing to the one-hot sums). ``first`` marks each block's
    first window (the kernel's copy-on-first signal). The bn=128
    block-major order reduce_flat_ops emits refines (8, 1024)-block order,
    so the same reduced batch feeds either path. Layout-generic like
    chunk_block_ops (trailing args: value fields then p, n)."""
    import numpy as np

    *vals, p, n = vals_and_shape
    k = len(peer)
    b = (peer.astype(np.int64) >> 3) * (n // _WIN_BN) + (
        slot.astype(np.int64) // _WIN_BN
    )
    first = np.empty(k, dtype=bool)
    first[0] = True
    np.not_equal(b[1:], b[:-1], out=first[1:])
    starts = np.flatnonzero(first)
    sizes = np.diff(np.append(starts, k))
    within = np.arange(k, dtype=np.int64) - np.repeat(starts, sizes)
    boundary = first | (within % _WIN_C == 0)
    wstarts = np.flatnonzero(boundary)
    n_win = len(wstarts)
    rb = (peer[wstarts].astype(np.int32) >> 3)
    cb = (slot[wstarts] // _WIN_BN).astype(np.int32)
    meta = rb | (cb << 10) | (first[wstarts].astype(np.int32) << 30)
    win_of = np.cumsum(boundary) - 1
    pos = (within % _WIN_C).astype(np.int64)
    # ONE fused index column (r:3b << 10 | c:10b) — see chunk_block_ops
    ops5 = np.zeros((n_win, _WIN_C, 1 + len(vals)), dtype=np.int32)
    ops5[win_of, pos, 0] = ((peer & 7) << 10) | (slot % _WIN_BN)
    for f, v in enumerate(vals):
        ops5[win_of, pos, 1 + f] = v
    return meta, ops5


def _window_apply_kernel(nf: int, *refs):
    """One 128-op window per grid step, densified onto the resident
    (8, 1024) block via MXU one-hot matmuls (see section comment). Windows
    of the same block are consecutive steps (copy-on-first + RMW through
    the output refs, like the chunk-grid kernel). Layout-generic over the
    nf-field table."""
    import jax.experimental.pallas as pl

    meta_ref = refs[0]
    ops_ref = refs[1]
    in_refs = refs[2:2 + nf]
    out_refs, count_ref = refs[2 + nf:2 + 2 * nf], refs[2 + 2 * nf]

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        count_ref[0, 0] = 0

    @pl.when(((meta_ref[t] >> 30) & 1) == 1)
    def _():
        for o, i_ in zip(out_refs, in_refs):
            o[...] = i_[...]

    ops = ops_ref[0]  # (nf+1, 128): rows idx(r<<10|c), khi, klo, cv
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    c_row = (ops[0:1, :] & (_WIN_BN - 1)).astype(f32)
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (8, _WIN_C), 0)
    rf = (sub_i == (ops[0:1, :] >> 10)).astype(f32)  # R one-hot (8, 128)
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (_WIN_C, _WIN_C), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (_WIN_C, _WIN_C), 1)
    ).astype(f32)
    # transpose the lane vector c_row onto sublanes: contract I's lanes
    # with c_row's lanes on the MXU → (128, 1); c < 1024 is f32-exact
    c_col = jax.lax.dot_general(
        eye, c_row, (((1,), (1,)), ((), ())), precision=hi
    ).astype(jnp.int32)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (_WIN_C, _WIN_BN), 1)
    m = (c_col == lane_i).astype(f32)  # M one-hot (128, 1024)

    def densify(field_row):
        # exact 16-bit halves: hi half sign-extends, lo half is unsigned
        fhi = (field_row >> 16).astype(f32)
        flo = (field_row & 0xFFFF).astype(f32)
        uhi = jax.lax.dot_general(
            rf * fhi, m, (((1,), (0,)), ((), ())), precision=hi
        )
        ulo = jax.lax.dot_general(
            rf * flo, m, (((1,), (0,)), ((), ())), precision=hi
        )
        return (uhi.astype(jnp.int32) << 16) | ulo.astype(jnp.int32)

    u_vals = tuple(densify(ops[1 + f:2 + f, :]) for f in range(nf))

    blk = tuple(o[...] for o in out_refs)
    win = _lex_gt_packed(
        table_keys(u_vals), table_keys(blk)
    ) & op_present(u_vals)
    for o, u, b in zip(out_refs, u_vals, blk):
        o[...] = jnp.where(win, u, b)
    count_ref[0, 0] += jnp.sum(win.astype(jnp.int32))


def stage_flat_windowed(meta, ops5):
    """Host→device staging half of apply_flat_windowed — see
    stage_flat_blocked for the write-path staging contract."""
    segs = []
    for s in range(0, len(meta), MAX_BLOCK_CHUNKS):
        e = min(s + MAX_BLOCK_CHUNKS, len(meta))
        mseg = meta[s:e]
        if s > 0 and not ((mseg[0] >> 30) & 1):
            mseg = mseg.copy()
            mseg[0] |= 1 << 30  # segment start: force a fresh HBM read
        segs.append((
            jnp.asarray(_bucket_i32(mseg)),
            jnp.asarray(_bucket_i32(ops5[s:e])),
            e - s,
        ))
    return segs


def apply_flat_windowed_staged(
    table: PackedTable, segs
) -> Tuple[PackedTable, jax.Array]:
    """Device half of apply_flat_windowed over pre-staged segments."""
    interpret = jax.default_backend() != "tpu"
    applied = jnp.int32(0)
    for meta, ops5, n_win in segs:
        table, a = _apply_flat_windowed_jit(
            table, meta, ops5, jnp.int32(n_win), interpret,
        )
        applied = applied + a
    return table, applied


def apply_flat_windowed(
    table: PackedTable, meta, ops5
) -> Tuple[PackedTable, jax.Array]:
    """Windowed dense apply over host-windowed ops (see window_block_ops);
    segments past the SMEM meta budget like apply_flat_blocked. Returns
    (table, applied)."""
    if len(meta) == 0:
        return table, jnp.int32(0)
    return apply_flat_windowed_staged(
        table, stage_flat_windowed(meta, ops5)
    )


@functools.partial(
    jax.jit, static_argnames=("interpret",), donate_argnums=(0,)
)
def _apply_flat_windowed_jit(
    table: PackedTable, meta, ops5, n_win, interpret: bool
) -> Tuple[PackedTable, jax.Array]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(table)
    p, n = table[0].shape
    # device-side re-layout: [NW, 128, 2+nf] → [NW, 8, 128] (rows = fields)
    ops_t = jnp.transpose(ops5, (0, 2, 1))  # [NW, 2+nf, 128]
    ops_pad = jnp.pad(ops_t, ((0, 0), (0, 8 - ops_t.shape[1]), (0, 0)))
    grid_t = jnp.maximum(n_win, 1)

    def tbl_idx(t, m):
        return m[t] & 0x3FF, (m[t] >> 10) & 0xFFFFF

    tbl_spec = pl.BlockSpec((8, _WIN_BN), tbl_idx, memory_space=pltpu.VMEM)
    ops_spec = pl.BlockSpec(
        (1, 8, _WIN_C), lambda t, m: (t, 0, 0), memory_space=pltpu.VMEM
    )
    cnt_spec = pl.BlockSpec(
        (1, 1), lambda t, m: (0, 0), memory_space=pltpu.SMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_t,),  # dynamic: exactly the occupied windows
        in_specs=[ops_spec] + [tbl_spec] * nf,
        out_specs=[tbl_spec] * nf + [cnt_spec],
    )
    outs = pl.pallas_call(
        functools.partial(_window_apply_kernel, nf),
        grid_spec=grid_spec,
        out_shape=(
            *(jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(nf)),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        # alias indices count the prefetch operand (0=meta) and the ops
        # view (1): tables follow
        input_output_aliases={2 + i: i for i in range(nf)},
        interpret=interpret,
    )(meta, ops_pad, *table)
    return type(table)(*outs[:nf]), outs[nf][0, 0]


# ops per occupied (8, _WIN_BN) block above which the windowed path beats
# the chunk grid (fewer, bigger steps; 2.5 KB/window transfer floor)
WINDOW_MIN_DENSITY = 24


def window_min_density(nf: int) -> int:
    """Windowed-vs-chunk routing density per field-tuple arity, measured
    on v5e at 1024×1M with 1M reduced ops (min of 3, hot): packed (nf=3)
    crosses between density 8 and 32 (24 keeps the historic choice;
    rows within noise at 32+). rank1 (nf=1) crosses HIGHER — at density
    31.9 the chunk grid wins 820 vs 1059 ms, at 63.8 windowed wins 683
    vs 838 — because the windowed kernel's fixed per-window cost is
    schedule- not transfer-bound, so halving nf doesn't shrink it while
    the chunk grid's compact 16-op steps get cheaper."""
    return {1: 48}.get(nf, WINDOW_MIN_DENSITY)


def dense_batch_density(peer, slot, n: int) -> float:
    """Mean ops per occupied (8, _WIN_BN) block (reduced, block-sorted
    ops): routes between the chunk-grid and windowed apply paths."""
    import numpy as np

    if len(peer) == 0:
        return 0.0
    b = (peer.astype(np.int64) >> 3) * (n // _WIN_BN) + (
        slot.astype(np.int64) // _WIN_BN
    )
    blocks = 1 + int(np.count_nonzero(b[1:] != b[:-1]))
    return len(peer) / blocks


def reduce_flat_ops(peer, slot, cls, khi, klo, vid, block_shape=None):
    """Host-side lattice pre-reduction: keep the (cls, khi, klo, vid)-max op
    per (peer, slot).

    One single-key argsort groups rows by a fused (peer, slot) int64; the
    per-group lex-max then falls out of two segmented ``maximum.reduceat``
    passes over fused comparison keys — k1 = cls·2³² + khi_u (35 bits,
    priority (cls, khi)) and k2 = klo_u·2²⁸ + vid (60 bits, priority
    (klo, vid)); the bias-mapped uint halves recombine order-exactly
    (utils.encode.number_key). The winner's fields decode straight from
    (k1, k2max) — no row indirection. ~3× faster than the previous 4-key
    lexsort at 1M ops (one sort pass instead of four).

    ``block_shape=(p, n)`` emits the winners in BLOCK-SORTED order for the
    blocked Pallas apply (primary key = the op's (8, BN) table block; the
    fused key still uniquely identifies (peer, slot), so grouping is
    unchanged) at the same one-argsort cost. Default order stays
    (peer, slot) ascending — the chunked-scatter fallback asserts it.

    The native radix+scan pass (native/__init__.py::reduce_flat_ops,
    ~4x this numpy path at 1M ops) runs first when available; this numpy
    body is the bit-identical fallback (tested)."""
    import numpy as np

    from .. import native

    if block_shape is not None:
        nat_bn, nat_nb = _CG_BN, block_shape[1] // _CG_BN
    else:
        nat_bn = nat_nb = 0
    fast = native.reduce_flat_ops(
        peer, slot, cls, khi, klo, vid, nat_bn, nat_nb, CV_SHIFT, VID_MASK
    )
    if fast is not NotImplemented:
        return fast

    keep = cls > 0
    peer, slot, cls, khi, klo, vid = (
        a[keep] for a in (peer, slot, cls, khi, klo, vid)
    )
    if peer.size == 0:
        return None
    bias = np.int64(1) << 31
    if block_shape is not None:
        p, n = block_shape
        bn, nb = _CG_BN, n // _CG_BN
        block = (peer.astype(np.int64) >> 3) * nb + slot.astype(np.int64) // bn
        # block << 14 | rel_row << 11 | rel_col: unique per (peer, slot),
        # block-major (rel_col < 2^11 for BN ≤ 2048, rel_row < 8)
        pslot = (
            (block << 14)
            | ((peer.astype(np.int64) & 7) << 11)
            | (slot.astype(np.int64) % bn)
        )
    else:
        bn = nb = 0
        pslot = (peer.astype(np.int64) << 32) | slot.astype(np.int64)
    k1 = (cls.astype(np.int64) << 32) | (khi.astype(np.int64) + bias)
    k2 = ((klo.astype(np.int64) + bias) << CV_SHIFT) | vid.astype(np.int64)
    order = np.argsort(pslot)  # winner needs no row identity: any sort kind
    ps = pslot[order]
    first = np.empty(ps.size, dtype=bool)
    first[0] = True
    np.not_equal(ps[1:], ps[:-1], out=first[1:])
    starts = np.flatnonzero(first)
    k1s = k1[order]
    m1 = np.maximum.reduceat(k1s, starts)
    sizes = np.diff(np.concatenate((starts, [ps.size])))
    m1_rows = np.repeat(m1, sizes)
    k2s = np.where(k1s == m1_rows, k2[order], np.int64(-1))
    m2 = np.maximum.reduceat(k2s, starts)
    cls_w = m1 >> 32
    khi_w = ((m1 & np.int64(0xFFFFFFFF)) - bias).astype(np.int32)
    klo_w = ((m2 >> CV_SHIFT) - bias).astype(np.int32)
    cv = ((cls_w << CV_SHIFT) | (m2 & np.int64(VID_MASK))).astype(np.int32)
    keys = ps[starts]
    if block_shape is not None:
        blk = keys >> 14
        peer_w = ((blk // nb) * 8 + ((keys >> 11) & 7)).astype(np.int32)
        slot_w = ((blk % nb) * bn + (keys & np.int64(0x7FF))).astype(np.int32)
    else:
        peer_w = (keys >> 32).astype(np.int32)
        slot_w = (keys & np.int64(0xFFFFFFFF)).astype(np.int32)
    return peer_w, slot_w, khi_w, klo_w, cv


# ------------------------------------------------------------ gossip (XLA)


def _mask_rows(table: PackedTable, valid: jax.Array) -> PackedTable:
    valid = valid[:, None]
    return type(table)(
        *(jnp.where(valid, f, jnp.zeros_like(f)) for f in table)
    )


def gossip_round_ring_packed(table: PackedTable) -> Tuple[PackedTable, jax.Array]:
    roll = lambda s: type(table)(*(jnp.roll(f, s, axis=0) for f in table))
    m1, c1 = merge_packed_xla(table, roll(1))
    m2, c2 = merge_packed_xla(m1, roll(-1))
    return m2, c1 + c2


def gossip_round_chain_packed(table: PackedTable) -> Tuple[PackedTable, jax.Array]:
    num_peers = table[0].shape[0]
    rows = jnp.arange(num_peers)
    roll = lambda s: type(table)(*(jnp.roll(f, s, axis=0) for f in table))
    m1, c1 = merge_packed_xla(table, _mask_rows(roll(1), rows >= 1))
    m2, c2 = merge_packed_xla(m1, _mask_rows(roll(-1), rows < num_peers - 1))
    return m2, c1 + c2


def gossip_round_mesh_packed(table: PackedTable) -> Tuple[PackedTable, jax.Array]:
    num_peers = table[0].shape[0]
    steps = max(1, (num_peers - 1).bit_length())

    def body(k, carry):
        tbl, total = carry
        shift = jnp.left_shift(jnp.int32(1), k)
        rolled = type(tbl)(*(jnp.roll(f, shift, axis=0) for f in tbl))
        tbl, c = merge_packed_xla(tbl, rolled)
        return tbl, total + c

    return jax.lax.fori_loop(0, steps, body, (table, jnp.int32(0)))


def gossip_round_generic_packed(
    table: PackedTable, neighbors: jax.Array
) -> Tuple[PackedTable, jax.Array]:
    def body(k, carry):
        tbl, total = carry
        idx = jax.lax.dynamic_index_in_dim(neighbors, k, axis=1, keepdims=False)
        valid = idx >= 0
        safe = jnp.where(valid, idx, 0)
        gathered = _mask_rows(type(tbl)(*(f[safe] for f in tbl)), valid)
        tbl, c = merge_packed_xla(tbl, gathered)
        return tbl, total + c

    return jax.lax.fori_loop(
        0, neighbors.shape[1], body, (table, jnp.int32(0))
    )


@functools.partial(jax.jit, static_argnames=("kind",))
def _gossip_round_packed_jit(table, neighbors, kind: str):
    if kind == "ring":
        return gossip_round_ring_packed(table)
    if kind == "chain":
        return gossip_round_chain_packed(table)
    if kind == "mesh":
        return gossip_round_mesh_packed(table)
    return gossip_round_generic_packed(table, neighbors)


# --------------------------------------------------------------- pallas


def _fullp_round_kernel_packed(nf: int, wrap: bool, num_peers: int, *refs):
    """Fused in-place ring/chain round on an nf-array layout: the block spans
    all P rows of one slot stripe, so rolls wrap inside the block; inputs and
    outputs alias the same HBM buffers (each stripe is read before written
    and stripes are independent)."""
    import jax.experimental.pallas as pl

    c_refs, out_refs, count_ref = refs[:nf], refs[nf:2 * nf], refs[2 * nf]
    m2, c = _merge_stripe_fullp([r[...] for r in c_refs], wrap, num_peers)
    for out, v in zip(out_refs, m2):
        out[...] = v

    @pl.when(pl.program_id(0) == 0)
    def _():
        count_ref[0, 0] = 0

    count_ref[0, 0] += c


def _fullp_multiround_kernel_packed(nf: int, wrap: bool, num_peers: int,
                                    m: int, *refs):
    """M consecutive ring/chain rounds per block-load (unrolled in VMEM).

    The full-P stripe block holds EVERY peer's rows for its slot stripe, and
    gossip only moves values along the peer axis — so M rounds can run
    entirely in VMEM before writing back, amortizing the block's HBM
    read+write over M rounds. The classic loop is DMA-bound (~3.8 µs DMA vs
    ~2.2 µs merge compute per block-round on v5e); M-round fusion
    approaches the compute roofline. States after k*M fused steps are
    bit-identical to k*M classic rounds; the count output is the total
    changes across all M rounds."""
    import jax.experimental.pallas as pl

    c_refs, out_refs, count_ref = refs[:nf], refs[nf:2 * nf], refs[2 * nf]
    vals = [r[...] for r in c_refs]
    total = jnp.int32(0)
    for _ in range(m):
        vals, c = _merge_stripe_fullp(vals, wrap, num_peers)
        total += c
    for out, v in zip(out_refs, vals):
        out[...] = v

    @pl.when(pl.program_id(0) == 0)
    def _():
        count_ref[0, 0] = 0

    count_ref[0, 0] += total


def ring_multiround_packed_traced(
    table: PackedTable, wrap: bool, m: int, interpret: bool
) -> Tuple[PackedTable, jax.Array]:
    """M fused ring/chain rounds in one in-place pallas_call (see the
    kernel docstring); returns (table, total changed across the M rounds).
    Same shape support as ring_round_packed_traced."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(table)
    p, n = table[0].shape
    tile_n = _stripe_tile_n(p, n)
    grid = (n // tile_n,)
    data_spec = pl.BlockSpec((p, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM)
    count_spec = pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(nf)
    ) + (jax.ShapeDtypeStruct((1, 1), jnp.int32),)
    outs = pl.pallas_call(
        functools.partial(_fullp_multiround_kernel_packed, nf, wrap, p, m),
        grid=grid,
        in_specs=[data_spec] * nf,
        out_specs=tuple([data_spec] * nf) + (count_spec,),
        out_shape=out_shapes,
        input_output_aliases={i: i for i in range(nf)},
        interpret=interpret,
    )(*table)
    return type(table)(*outs[:nf]), outs[nf][0, 0]


def _window_chain(m: int):
    """Static shift schedule whose 3-way joins grow the window radius to
    exactly ``m`` in O(log m) steps: from radius r, joining the window with
    copies of itself shifted by ±s covers radius r+s contiguously for any
    s ≤ 2r+1 (the three arcs overlap or touch, and the join is idempotent,
    so overlap is free) — greedy s = min(m-r, 2r+1) lands on m exactly."""
    steps = []
    r = 0
    while r < m:
        s = min(m - r, 2 * r + 1)
        steps.append(s)
        r += s
    return steps


def _window_stripe_fullp(center, wrap: bool, num_peers: int, m: int):
    """Radius-m window join on a full-P stripe = m ring/chain rounds in
    O(log m) 3-way joins, plus the bit-exact classic round-m residual.

    One classic round is the radius-1 window join (``_merge_stripe_fullp``:
    row p absorbs rows p±1), and the merge is an idempotent/commutative/
    associative lattice join, so m Jacobi rounds ≡ the radius-m window
    join — computable by doubling instead of sequentially. The schedule
    reaches radius m-1 (``_window_chain``), then the FINAL round runs the
    classic single-round body, so the returned count is bit-identical to
    the classic loop's round-m residual (the winner-select count of round
    m alone — NOT the multiround kernel's m-round total).

    Chain edges (wrap=False): shifted copies CLAMP to the edge row's
    accumulated window rather than zero-fill — rows within s of the edge
    still owe the window the edge-clipped coverage their out-of-range
    shift would have carried (zero-filling loses it; caught by the m=13
    parity fuzz). The clamped rows are a subset of the true window, so
    idempotence keeps the join exact. Replaces O(m) merge compute with
    O(log m): the fused stripe kernels are compute-bound (rank1's M=40
    multiround runs at ~8% of HBM roofline), so this is worth ~5-8x on
    hardware at equal fused depth (measured: 663 B → 3.7 T merges/s at
    m=40, 11.3 T at m=120, P=1024 × 1M rank1)."""
    row = jax.lax.broadcasted_iota(jnp.int32, center[0].shape, 0)

    def shifted(vals, s: int):
        out = []
        for f in range(len(vals)):
            rolled = jnp.roll(vals[f], s, axis=0)
            if not wrap:
                if s > 0:
                    rolled = jnp.where(row < s, vals[f][0:1, :], rolled)
                else:
                    rolled = jnp.where(
                        row >= num_peers + s,
                        vals[f][num_peers - 1 :, :],
                        rolled,
                    )
            out.append(rolled)
        return out

    def lexmax(a_vals, b_vals):
        gt = _lex_gt_packed(
            table_keys(tuple(b_vals)), table_keys(tuple(a_vals))
        )
        return [jnp.where(gt, b, a) for a, b in zip(a_vals, b_vals)]

    vals = list(center)
    for s in _window_chain(m - 1):
        vals = lexmax(vals, shifted(vals, +s))
        vals = lexmax(vals, shifted(vals, -s))
    return _merge_stripe_fullp(vals, wrap, num_peers)


@functools.partial(
    jax.jit, static_argnames=("wrap", "m"), donate_argnums=(0,)
)
def ring_window_packed_xla(
    table: PackedTable, wrap: bool, m: int
) -> Tuple[PackedTable, jax.Array]:
    """XLA twin of the window-join stripe kernel: m ring/chain rounds as
    a radius-m window join over the whole table (O(log m) roll+join
    passes), finished by one classic round so the count is the classic
    round-m residual. Works at ANY table shape (no stripe tiling) and on
    any backend — the sim's fast_forward rides this off-TPU and on
    shapes/arities the Pallas window can't tile. Bit-identical to m
    sequential gossip_round_{ring,chain}_packed calls (tested)."""
    p = table[0].shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, table[0].shape, 0)

    def shifted(vals, s: int):
        out = []
        for f in vals:
            rolled = jnp.roll(f, s, axis=0)
            if not wrap:
                if s > 0:
                    rolled = jnp.where(row < s, f[0:1, :], rolled)
                else:
                    rolled = jnp.where(row >= p + s, f[p - 1 :, :], rolled)
            out.append(rolled)
        return out

    def lexmax(a_vals, b_vals):
        gt = _lex_gt_packed(
            table_keys(tuple(b_vals)), table_keys(tuple(a_vals))
        )
        return [jnp.where(gt, b, a) for a, b in zip(a_vals, b_vals)]

    vals = list(table)
    for s in _window_chain(m - 1):
        vals = lexmax(vals, shifted(vals, +s))
        vals = lexmax(vals, shifted(vals, -s))
    t = type(table)(*vals)
    return (gossip_round_ring_packed if wrap else gossip_round_chain_packed)(t)


def _fullp_window_kernel_packed(nf: int, wrap: bool, num_peers: int,
                                m: int, *refs):
    """In-place full-P stripe kernel: m ring/chain rounds per block-load
    via the radius-m window join (see _window_stripe_fullp). The count
    output is the classic round-m residual."""
    import jax.experimental.pallas as pl

    c_refs, out_refs, count_ref = refs[:nf], refs[nf:2 * nf], refs[2 * nf]
    vals, c = _window_stripe_fullp(
        [r[...] for r in c_refs], wrap, num_peers, m
    )
    for out, v in zip(out_refs, vals):
        out[...] = v

    @pl.when(pl.program_id(0) == 0)
    def _():
        count_ref[0, 0] = 0

    count_ref[0, 0] += c


def window_tile_n(p: int, n: int, nf: int) -> int:
    """Stripe width for the WINDOW kernel: the 1-field layout affords 4×
    the multiround budget (measured at P=4096 × 256 K, tile 128 = 2 MB
    per array: 10.1 T merges/s at m=120 — the window body holds only
    O(log m) step temporaries, unlike the M-deep multiround), which
    extends full-P window stripes to P ≤ 4096. nf ≥ 2 keeps the base
    budget (rank's 2-array body fails scoped-vmem AOT at the 4× stripe)."""
    budget = _STRIPE_MAX_ELEMS * (4 if nf == 1 else 1)
    start = (budget // max(p, 1)) // 128 * 128
    t = min(max(128, start), n)
    while t >= 128 and n % t:
        t -= 128
    return t if t >= 128 and n % t == 0 else 0


def window_ring_supported(p: int, n: int, nf: int) -> bool:
    """Shapes the full-P window kernel can tile: 8-aligned peer axis, a
    128-aligned slot tile dividing n, within the arity-aware window
    budget. The bound is STRICT (p*tile ≤ budget, no 2× slack): the
    128-lane tile floor would otherwise admit P=8192 nf=1 blocks at 2×
    the measured P=4096 envelope — an untested cell where the 6-step
    unrolled body plausibly fails scoped-vmem AOT, and fast_forward has
    no fallback past this predicate (it commits to the kernel). Every
    hardware-measured cell (rank1 P≤4096, rank P≤1024) sits exactly at
    or under the strict bound."""
    if p % 8 or n % 128:
        return False
    tile = window_tile_n(p, n, nf)
    budget = _STRIPE_MAX_ELEMS * (4 if nf == 1 else 1)
    return tile > 0 and p * tile <= budget


def ring_window_packed_traced(
    table: PackedTable, wrap: bool, m: int, interpret: bool
) -> Tuple[PackedTable, jax.Array]:
    """m fused ring/chain rounds in one in-place pallas_call, computed as
    a radius-m window join in O(log m) 3-way joins instead of m sequential
    merges (see _window_stripe_fullp). State is bit-identical to m classic
    rounds; the count is the classic ROUND-m residual (the last round's
    winner-select count — 0 iff the table was already at its round-(m-1)
    fixed point). Shape support: window_ring_supported (an arity-aware
    budget — nf=1 tiles up to P=4096); layout-generic over the
    field-tuple arity."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(table)
    p, n = table[0].shape
    tile_n = window_tile_n(p, n, nf)
    grid = (n // tile_n,)
    data_spec = pl.BlockSpec(
        (p, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM
    )
    count_spec = pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(nf)
    ) + (jax.ShapeDtypeStruct((1, 1), jnp.int32),)
    outs = pl.pallas_call(
        functools.partial(_fullp_window_kernel_packed, nf, wrap, p, m),
        grid=grid,
        in_specs=[data_spec] * nf,
        out_specs=tuple([data_spec] * nf) + (count_spec,),
        out_shape=out_shapes,
        input_output_aliases={i: i for i in range(nf)},
        interpret=interpret,
    )(*table)
    return type(table)(*outs[:nf]), outs[nf][0, 0]


# 6 stripe buffers (3 in + 3 out) double-buffered must fit VMEM comfortably:
# cap a stripe at 2^17 int32 (512 KB) → 6 MB total
_STRIPE_MAX_ELEMS = 1 << 17


def _stripe_tile_n(p: int, n: int) -> int:
    """Largest 128-aligned divisor of n with p*tile ≤ the VMEM budget; 0 if
    none exists. The decrement-by-128 search must START 128-aligned or it
    can land on an unaligned divisor (e.g. p=96, n=174720 → 1365), which
    Mosaic rejects at lowering."""
    start = (_STRIPE_MAX_ELEMS // max(p, 1)) // 128 * 128
    t = min(max(128, start), n)
    while t >= 128 and n % t:
        t -= 128
    return t if t >= 128 and n % t == 0 else 0


def packed_ring_supported(p: int, n: int) -> bool:
    """Shapes the full-P stripe kernel can tile: 8-aligned peer axis,
    a 128-aligned slot tile dividing n, all within the VMEM budget.
    Unsupported shapes fall back to XLA (never crash)."""
    if p % 8 or n % 128:
        return False
    tile_n = _stripe_tile_n(p, n)
    return tile_n > 0 and p * tile_n <= _STRIPE_MAX_ELEMS * 2


def ring_round_packed_traced(
    table: PackedTable, wrap: bool, interpret: bool
) -> Tuple[PackedTable, jax.Array]:
    """The raw pallas round, traceable inside any jit/loop. The pallas call
    aliases inputs to outputs — inside a donated while/fori carry the round
    runs fully in place (no inner-jit donation, which an outer trace would
    ignore and which blocks carry aliasing)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(table)
    p, n = table[0].shape
    tile_n = _stripe_tile_n(p, n)
    grid = (n // tile_n,)
    data_spec = pl.BlockSpec((p, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM)
    count_spec = pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(nf)
    ) + (jax.ShapeDtypeStruct((1, 1), jnp.int32),)
    outs = pl.pallas_call(
        functools.partial(_fullp_round_kernel_packed, nf, wrap, p),
        grid=grid,
        in_specs=[data_spec] * nf,
        out_specs=tuple([data_spec] * nf) + (count_spec,),
        out_shape=out_shapes,
        input_output_aliases={i: i for i in range(nf)},
        interpret=interpret,
    )(*table)
    return type(table)(*outs[:nf]), outs[nf][0, 0]


def _changes_round_kernel_packed(nf: int, wrap: bool, num_peers: int, *refs):
    """Count-only ring/chain round probe: computes how many entries ONE
    more round would change, discarding the merged values — no table-sized
    output, so a convergence check at the north-star shape costs zero
    extra HBM (a scratch-copy round would need a second 12.9 GB table)."""
    import jax.experimental.pallas as pl

    c_refs, count_ref = refs[:nf], refs[nf]
    _, c = _merge_stripe_fullp([r[...] for r in c_refs], wrap, num_peers)

    @pl.when(pl.program_id(0) == 0)
    def _():
        count_ref[0, 0] = 0

    count_ref[0, 0] += c


@functools.partial(jax.jit, static_argnames=("wrap", "interpret"))
def count_changes_round_packed(
    table: PackedTable, wrap: bool, interpret: bool
) -> jax.Array:
    """Entries one more ring/chain round would change (read-only probe;
    full-P stripe shapes — check packed_ring_supported)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(table)
    p, n = table[0].shape
    tile_n = _stripe_tile_n(p, n)
    data_spec = pl.BlockSpec(
        (p, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM
    )
    count_spec = pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_changes_round_kernel_packed, nf, wrap, p),
        grid=(n // tile_n,),
        in_specs=[data_spec] * nf,
        out_specs=count_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        interpret=interpret,
    )(*table)
    return out[0, 0]


# ---------------------------------------------------- direct reconcile


def _reconcile_kernel_packed(nf: int, num_peers: int, *refs):
    """Direct join: ceil(log2 P) doubling merges fused in VMEM per stripe.

    For any CONNECTED topology the gossip fixed point is the per-slot
    lattice join of all peers' entries, broadcast everywhere (the merge is
    a commutative/associative/idempotent join, so the converged state is
    topology-independent — a tested invariant). Rolling by 1, 2, 4, …
    accumulates each row's join over 2^k consecutive rows (wrapping), so
    after ceil(log2 P) rounds every row holds the full-column join — ONE
    table read+write instead of diameter-many simulated rounds."""
    c_refs, out_refs = refs[:nf], refs[nf:2 * nf]
    vals = [r[...] for r in c_refs]
    shift = 1
    while shift < num_peers:
        rolled = [jnp.roll(v, shift, axis=0) for v in vals]
        gt = _lex_gt_packed(table_keys(tuple(rolled)), table_keys(tuple(vals)))
        vals = [jnp.where(gt, b, a) for a, b in zip(vals, rolled)]
        shift *= 2
    for out, v in zip(out_refs, vals):
        out[...] = v


def reconcile_packed_traced(
    table: PackedTable, interpret: bool
) -> PackedTable:
    """One-pass direct reconciliation on the packed layout (full-P stripe
    shapes; check packed_ring_supported). In place via aliasing."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(table)
    p, n = table[0].shape
    tile_n = _stripe_tile_n(p, n)
    grid = (n // tile_n,)
    data_spec = pl.BlockSpec(
        (p, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(_reconcile_kernel_packed, nf, p),
        grid=grid,
        in_specs=[data_spec] * nf,
        out_specs=[data_spec] * nf,
        out_shape=tuple(
            jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(nf)
        ),
        input_output_aliases={i: i for i in range(nf)},
        interpret=interpret,
    )(*table)
    return type(table)(*outs)


@functools.partial(jax.jit, donate_argnums=(0,))
def reconcile_packed_xla(table: PackedTable) -> PackedTable:
    """XLA fallback for shapes the stripe kernel can't tile (and for
    sharded tables, where the rolls become collective permutes): the same
    doubling join over whole-table ops."""
    p = table[0].shape[0]

    def body(k, tbl):
        shift = jnp.left_shift(jnp.int32(1), k)
        rolled = type(tbl)(*(jnp.roll(f, shift, axis=0) for f in tbl))
        tbl, _ = merge_packed_xla(tbl, rolled)
        return tbl

    steps = max(1, (p - 1).bit_length())
    return jax.lax.fori_loop(0, steps, body, table)


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0,))
def _reconcile_packed_jit(table: PackedTable, interpret: bool) -> PackedTable:
    return reconcile_packed_traced(table, interpret)


# ------------------------------------------------- frontier convergence


def frontier_ids(dirty: jax.Array, t_total: int):
    """(remap array, grid size) for frontier kernels. The remap array is
    [t_total + 1] int32: entries [0, count) are the dirty stripe ids in
    ascending order (only those are ever read — the grid is dynamic),
    trailing entries are zero-filled, and [t_total] is the count. The grid
    size is max(count, 1) — frontier pallas_calls use a DYNAMIC grid
    (Mosaic supports traced grid bounds), so a mostly-converged table
    costs exactly its active stripes, with no trailing no-op steps; the
    max(·, 1) keeps a zero-dirty direct call valid (the kernel's j < count
    guard skips the one padded step)."""
    count = jnp.sum(dirty.astype(jnp.int32))
    ids = jnp.nonzero(dirty, size=t_total, fill_value=0)[0].astype(jnp.int32)
    ids_full = jnp.concatenate([ids, count[None].astype(jnp.int32)])
    return ids_full, jnp.maximum(count, 1)


# -- in-kernel frontier compaction -----------------------------------------
# The single-chip frontier loops carry the remap array itself instead of
# per-stripe dirty flags: the kernel APPENDS each still-changing stripe's id
# to an SMEM output as it processes it (the TPU grid is sequential, so a
# read-modify-write running count is race-free), producing the NEXT round's
# prefetch array directly. The while_loop body then contains nothing but the
# pallas_call plus two scalar reads — no nonzero/cumsum/concat/where/sum
# chain per round. Layout of the ids array ([t_total + 2] int32):
#   [0, count)       dirty stripe ids, ascending
#   [t_total]        count
#   [t_total + 1]    total entries changed in the round that produced this
# (the shard_map frontier keeps the flag-based form: its dirty set must be
# psum-agreed across devices, which in-kernel local compaction cannot see).


def frontier_ids_compact(dirty: jax.Array, t_total: int) -> jax.Array:
    """Initial ids array for the compacting frontier loops, from seed flags.
    The changed-total cell starts at 1 (any nonzero: it is only read after
    the first round overwrites it)."""
    count = jnp.sum(dirty.astype(jnp.int32))
    ids = jnp.nonzero(dirty, size=t_total, fill_value=0)[0].astype(jnp.int32)
    return jnp.concatenate(
        [ids, count[None].astype(jnp.int32), jnp.ones((1,), jnp.int32)]
    )


def _merge_stripe_fullp(center, wrap: bool, num_peers: int):
    """Shared full-P stripe merge body: one ring/chain round on a [P, tile]
    block (rolls wrap inside the block); returns (merged fields, changed
    count). Layout-generic: keys through table_keys, so the 3-field packed
    and 2-field rank layouts share this body."""
    row = jax.lax.broadcasted_iota(jnp.int32, center[0].shape, 0)

    def shifted(direction: int):
        out = []
        for f in range(len(center)):
            rolled = jnp.roll(center[f], direction, axis=0)
            if not wrap:
                edge = row == (0 if direction == +1 else num_peers - 1)
                rolled = jnp.where(edge, 0, rolled)
            out.append(rolled)
        return out

    def lexmax(a_vals, b_vals):
        gt = _lex_gt_packed(table_keys(tuple(b_vals)), table_keys(tuple(a_vals)))
        return [jnp.where(gt, b, a) for a, b in zip(a_vals, b_vals)], gt

    m1, gt1 = lexmax(center, shifted(+1))
    m2, gt2 = lexmax(m1, shifted(-1))
    return m2, jnp.sum(gt1.astype(jnp.int32)) + jnp.sum(gt2.astype(jnp.int32))


def _merge_stripe_halo(center, t_refs, b_refs, wrap: bool, tile_p: int,
                       num_peers: int, i):
    """Shared halo-tile merge body: one ring/chain round on a [tile_p, tile]
    block whose boundary rows come from the pre-round snapshots ``t_refs``
    (row 7 = the row above) / ``b_refs`` (row 0 = the row below)."""
    row_in_block = jax.lax.broadcasted_iota(jnp.int32, center[0].shape, 0)
    global_row = i * tile_p + row_in_block

    def shifted(direction: int):
        out = []
        for f in range(len(center)):
            c = center[f]
            if direction == +1:
                rolled = jnp.roll(c, 1, axis=0)
                fixed = jnp.where(row_in_block == 0, t_refs[f][7:8, :], rolled)
                if not wrap:
                    fixed = jnp.where(global_row == 0, 0, fixed)
            else:
                rolled = jnp.roll(c, -1, axis=0)
                fixed = jnp.where(
                    row_in_block == tile_p - 1, b_refs[f][0:1, :], rolled
                )
                if not wrap:
                    fixed = jnp.where(global_row == num_peers - 1, 0, fixed)
            out.append(fixed)
        return out

    def lexmax(a_vals, b_vals):
        gt = _lex_gt_packed(table_keys(tuple(b_vals)), table_keys(tuple(a_vals)))
        return [jnp.where(gt, b, a) for a, b in zip(a_vals, b_vals)], gt

    m1, gt1 = lexmax(center, shifted(+1))
    m2, gt2 = lexmax(m1, shifted(-1))
    return m2, jnp.sum(gt1.astype(jnp.int32)) + jnp.sum(gt2.astype(jnp.int32))


def _frontier_round_kernel_packed(nf: int, wrap: bool, num_peers: int,
                                  t_total: int, *refs):
    """Full-P stripe round over ONLY the active stripes, with in-kernel
    frontier compaction.

    Slot stripes are independent (gossip moves values along the peer axis,
    never across slots), and the merge is monotone — a stripe that survives
    a full round unchanged is at its fixed point FOREVER. The grid is
    remapped through the prefetched ids array: steps j < count process the
    dirty stripes. Each still-changing stripe's id is APPENDED to the SMEM
    ids output (grid steps run sequentially, so the running count in
    ``ids_out[0, t_total]`` is race-free), producing the next round's
    prefetch array directly — the convergence loop does no host- or
    XLA-side dirty bookkeeping at all. All data outputs alias their inputs,
    so skipped stripes simply stay as they were."""
    import jax.experimental.pallas as pl

    ids_ref = refs[0]
    c_refs = refs[1:1 + nf]
    out_refs, ids_out = refs[1 + nf:1 + 2 * nf], refs[1 + 2 * nf]

    j = pl.program_id(0)
    count = ids_ref[t_total]

    @pl.when(j == 0)
    def _():
        ids_out[0, t_total] = 0
        ids_out[0, t_total + 1] = 0

    @pl.when(j < count)
    def _():
        stripe = ids_ref[j]
        m2, c = _merge_stripe_fullp(
            [r[...] for r in c_refs], wrap, num_peers
        )
        for out, v in zip(out_refs, m2):
            out[...] = v

        @pl.when(c > 0)
        def _():
            k = ids_out[0, t_total]
            ids_out[0, k] = stripe
            ids_out[0, t_total] = k + 1
            ids_out[0, t_total + 1] += c


def _frontier_halo_kernel_counts(nf: int, wrap: bool, tile_p: int,
                                 num_peers: int, t_total: int, tiles: int,
                                 *refs):
    """Counts-emitting halo frontier round — the shard_map body: per-stripe
    change counts must cross devices (psum) before the next frontier can be
    agreed, so local in-kernel compaction cannot apply. 2-D grid (active
    stripes outer, peer tiles inner); a stripe's count accumulates across
    its peer tiles."""
    import jax.experimental.pallas as pl

    ids_ref = refs[0]
    c_refs = refs[1:1 + nf]
    t_refs = refs[1 + nf:1 + 2 * nf]
    b_refs = refs[1 + 2 * nf:1 + 3 * nf]
    # refs[1 + 3*nf] is the aliased counts input (never read in-kernel)
    out_refs = refs[2 + 3 * nf:2 + 4 * nf]
    cnt_out = refs[2 + 4 * nf]

    j = pl.program_id(0)
    i = pl.program_id(1)
    count = ids_ref[t_total]
    stripe = ids_ref[j]

    @pl.when(j < count)
    def _():
        m2, c = _merge_stripe_halo(
            [r[...] for r in c_refs], t_refs, b_refs, wrap, tile_p,
            num_peers, i,
        )
        for out, v in zip(out_refs, m2):
            out[...] = v

        @pl.when(i == 0)
        def _():
            cnt_out[0, stripe] = c

        @pl.when(i > 0)
        def _():
            cnt_out[0, stripe] += c


def _frontier_halo_kernel_packed(nf: int, wrap: bool, tile_p: int,
                                 num_peers: int, t_total: int, tiles: int,
                                 *refs):
    """Compacting halo frontier round (P beyond the full-P stripe budget):
    2-D grid, active stripes outer, peer tiles inner (the inner index moves
    fastest, so a stripe's tiles run consecutively). A stripe's change
    count accumulates in SMEM scratch across its peer tiles; after the last
    tile, a still-changing stripe's id is appended to the ids output — the
    next round's prefetch array (see _frontier_round_kernel_packed)."""
    import jax.experimental.pallas as pl

    ids_ref = refs[0]
    c_refs = refs[1:1 + nf]
    t_refs = refs[1 + nf:1 + 2 * nf]
    b_refs = refs[1 + 2 * nf:1 + 3 * nf]
    out_refs, ids_out = refs[1 + 3 * nf:1 + 4 * nf], refs[1 + 4 * nf]
    acc = refs[2 + 4 * nf]

    j = pl.program_id(0)
    i = pl.program_id(1)
    count = ids_ref[t_total]

    @pl.when((j == 0) & (i == 0))
    def _():
        ids_out[0, t_total] = 0
        ids_out[0, t_total + 1] = 0

    @pl.when(j < count)
    def _():
        stripe = ids_ref[j]
        m2, c = _merge_stripe_halo(
            [r[...] for r in c_refs], t_refs, b_refs, wrap, tile_p,
            num_peers, i,
        )
        for out, v in zip(out_refs, m2):
            out[...] = v

        @pl.when(i == 0)
        def _():
            acc[0, 0] = c

        @pl.when(i > 0)
        def _():
            acc[0, 0] += c

        @pl.when(i == tiles - 1)
        def _():
            total = acc[0, 0]

            @pl.when(total > 0)
            def _():
                k = ids_out[0, t_total]
                ids_out[0, k] = stripe
                ids_out[0, t_total] = k + 1
                ids_out[0, t_total + 1] += total


# fused rounds per block-load on halo shapes: the 8-row boundary
# snapshots support exactly 8 rounds of trapezoidal time-tiling (validity
# shrinks one row per round from each snapshot edge, and the center tile
# sits 8 rows in)
HALO_FUSE = 8

# fused rounds per block-load on full-P stripe shapes. Swept on v5e at the
# north-star shape (benchmarks/fuse_sweep.py, P=1024 N=1M, 240 rounds):
# M=1 55.8 B merges/s, M=5 93.1, M=8 93.7 (best), M=10 91.2, M=12 91.1,
# M=16 76.6 — a flat compute-bound plateau across 5-12 (the DMA is fully
# amortized by M=5; past M=12 Mosaic's schedule degrades). 8 edges out 5
# and matches the halo fuse depth.
STRIPE_FUSE = 8


def stripe_fuse(nf: int) -> int:
    """Tuned fused-round depth for the full-P ring stripe multiround
    kernel, per field-tuple arity (benchmarks/fuse_sweep.py on v5e at the
    1024x1M north-star shape). packed nf=3: plateau 93.7 B merges/s at
    M=8 (flat 5-12, degrades past 12; AOT-verified compiling). rank1
    nf=1: the single-compare merge cuts compute per round ~3x, so the
    plateau sits much deeper — M=8 617 B, M=24 643 B, M=30/40/48
    661/663/664 B; ship M=40 (within noise of 48, compile 6.6 s
    hot-cache). rank nf=2 is scoped-vmem-capped at 5 — Mosaic's stack
    grows ~2 MB per unrolled round on the 2-field layout for THIS kernel
    too, not only the frontier twin (AOT probe at 1024x1M: M=5 fits,
    M=6 over by 0.78 MB, M=8 by 4.78 MB; the historic 235-238 B at
    'M=8' predates the single-compare merge body)."""
    return {1: 40, 2: 5}.get(nf, STRIPE_FUSE)


def stripe_window(nf: int) -> int:
    """Tuned fused depth for the WINDOW-JOIN stripe kernel
    (ring_window_packed_traced: m rounds per block-load in O(log m)
    3-way joins), per field-tuple arity; 0 = unsupported at full-P-stripe
    shapes (fall back to the sequential multiround). The limit is the
    join-step count, not the depth: Mosaic's scoped-vmem stack holds the
    per-step shifted copies, and a 7th unrolled step spills to HBM.
    Measured on v5e at the 1024x1M north-star shape (480 total rounds,
    under the P/2=512 ring diameter so every simulated round advances
    state): rank1 nf=1 m=120 (6 steps) 9.0 T merges/s — m=160/240 need
    7 steps and collapse to 0.6-0.8 T on spills; rank nf=2 m=40
    (5 steps) 2.6 T — m=60 fails scoped-vmem AOT; packed nf=3 cannot fit
    the window body at the north-star stripe at any depth (m=13 already
    OOMs) and keeps the sequential multiround (stripe_fuse). States are
    bit-identical to m classic rounds and the count is the classic
    round-m residual (hardware-verified both arities, and pinned by
    interpret-mode tests)."""
    return {1: 120, 2: 40}.get(nf, 0)


def frontier_fuse(nf: int) -> int:
    """Fused depth for the COMPACTING FRONTIER multiround kernel
    (_frontier_multiround_kernel_packed) per field-tuple arity. Same
    tuning as stripe_fuse except rank nf=2: the frontier body (per-round
    stripe_last tracking on top of the merge) makes Mosaic's scoped-vmem
    stack grow ~2 MB per unrolled round on the 2-field layout and blow
    the 16 MB limit at M>=6 at the north-star shape (AOT-verified:
    fuse=5 fits, 6 over by 0.8 MB, 8 by 4.8 MB) — rank caps at 5.
    packed nf=3 and rank1 nf=1 fit at their stripe depths (rank1
    AOT-verified through M=40)."""
    return {1: 40, 2: 5}.get(nf, STRIPE_FUSE)


def _merge_ext_round(ext, wrap: bool, tile_p: int, num_peers: int, i, h=8):
    """One ring/chain round on an EXTENDED halo tile (``h`` snapshot rows +
    tile_p center rows + ``h`` snapshot rows). Rolls wrap inside the
    extended block; rows entering from the block edges are garbage, but
    trapezoidal validity keeps them at least (h - round) rows away from the
    center. The change count covers CENTER rows only (each tile owns its
    rows; boundary-region changes are counted by the neighboring tile).
    Returns (merged ext fields, center changed count)."""
    row = jax.lax.broadcasted_iota(jnp.int32, ext[0].shape, 0)
    global_row = i * tile_p - h + row
    center = (row >= h) & (row < h + tile_p)

    def shifted(direction: int):
        out = []
        for f in range(len(ext)):
            rolled = jnp.roll(ext[f], direction, axis=0)
            if not wrap:
                edge = global_row == (
                    0 if direction == +1 else num_peers - 1
                )
                rolled = jnp.where(edge, 0, rolled)
            out.append(rolled)
        return out

    def lexmax(a_vals, b_vals):
        gt = _lex_gt_packed(table_keys(tuple(b_vals)), table_keys(tuple(a_vals)))
        return [jnp.where(gt, b, a) for a, b in zip(a_vals, b_vals)], gt

    m1, gt1 = lexmax(ext, shifted(+1))
    m2, gt2 = lexmax(m1, shifted(-1))
    c = jnp.sum((gt1 & center).astype(jnp.int32)) + jnp.sum(
        (gt2 & center).astype(jnp.int32)
    )
    return m2, c


def _frontier_halo_multiround_kernel_packed(nf: int, wrap: bool, tile_p: int,
                                            num_peers: int, t_total: int,
                                            tiles: int, m: int, *refs):
    """Compacting halo frontier round with M=HALO_FUSE rounds fused per
    block-load (P beyond the full-P stripe budget).

    Each (tile_p, tile_n) center tile extends with its 8-row pre-round
    boundary snapshots and runs M rounds entirely in VMEM (trapezoidal
    time-tiling: after round k the extended rows [k, L-k) are exact, and
    M ≤ 8 keeps the center exact through all M rounds). Per-ROUND center
    change counts accumulate across a stripe's peer tiles in SMEM scratch;
    after the last tile, the stripe's last-changing round reconstructs the
    exact classic round count (ids layout [t_total + 3], see
    _frontier_multiround_kernel_packed) and the stripe stays dirty IFF
    round M still changed something."""
    import jax.experimental.pallas as pl

    ids_ref = refs[0]
    c_refs = refs[1:1 + nf]
    t_refs = refs[1 + nf:1 + 2 * nf]
    b_refs = refs[1 + 2 * nf:1 + 3 * nf]
    out_refs, ids_out = refs[1 + 3 * nf:1 + 4 * nf], refs[1 + 4 * nf]
    acc = refs[2 + 4 * nf]  # SMEM (1, m): per-round center counts across tiles

    j = pl.program_id(0)
    i = pl.program_id(1)
    count = ids_ref[t_total]

    @pl.when((j == 0) & (i == 0))
    def _():
        ids_out[0, t_total] = 0
        ids_out[0, t_total + 1] = 0
        ids_out[0, t_total + 2] = 0

    @pl.when(j < count)
    def _():
        stripe = ids_ref[j]
        ext = [
            jnp.concatenate([t[...], c[...], b[...]], axis=0)
            for t, c, b in zip(t_refs, c_refs, b_refs)
        ]
        counts = []
        for _k in range(m):
            ext, ck = _merge_ext_round(ext, wrap, tile_p, num_peers, i)
            counts.append(ck)
        for out, v in zip(out_refs, ext):
            out[...] = v[8 : 8 + tile_p, :]

        for k in range(m):

            @pl.when(i == 0)
            def _(k=k):
                acc[0, k] = counts[k]

            @pl.when(i > 0)
            def _(k=k):
                acc[0, k] += counts[k]

        @pl.when(i == tiles - 1)
        def _():
            stripe_last = jnp.int32(0)
            total = jnp.int32(0)
            for k in range(m):
                ck = acc[0, k]
                stripe_last = jnp.where(ck > 0, jnp.int32(k + 1), stripe_last)
                total += ck

            @pl.when(stripe_last == m)
            def _():
                k_ = ids_out[0, t_total]
                ids_out[0, k_] = stripe
                ids_out[0, t_total] = k_ + 1

            ids_out[0, t_total + 1] += total
            ids_out[0, t_total + 2] = jnp.maximum(
                ids_out[0, t_total + 2], stripe_last
            )


def frontier_halo_multiround_packed_traced(table, ids, wrap: bool,
                                           interpret: bool):
    """One HALO_FUSE-fused compacting frontier step on halo shapes; ``ids``
    is a [t_total + 3] array (frontier_ids_compact layout plus the
    max-last-change cell); returns (table, next ids)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(table)
    p, n = table[0].shape
    tile_p, tile_n = _halo_tiles_packed(p, n)
    tiles = p // tile_p
    t_total = n // tile_n
    tops, bottoms = _halo_boundary_snapshots(table, tiles, tile_p, n)
    grid_j = jnp.maximum(ids[t_total], 1)

    center_spec = pl.BlockSpec(
        (tile_p, tile_n), lambda j, i, ids_: (i, ids_[j]),
        memory_space=pltpu.VMEM,
    )
    halo_spec = pl.BlockSpec(
        (8, tile_n), lambda j, i, ids_: (i, ids_[j]), memory_space=pltpu.VMEM
    )
    ids_spec = pl.BlockSpec(
        (1, t_total + 3), lambda j, i, ids_: (0, 0), memory_space=pltpu.SMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_j, tiles),  # dynamic: exactly the active stripes
        in_specs=[center_spec] * nf + [halo_spec] * (2 * nf),
        out_specs=[center_spec] * nf + [ids_spec],
        scratch_shapes=[pltpu.SMEM((1, HALO_FUSE), jnp.int32)],
    )
    outs = pl.pallas_call(
        functools.partial(
            _frontier_halo_multiround_kernel_packed, nf, wrap, tile_p, p,
            t_total, tiles, HALO_FUSE,
        ),
        grid_spec=grid_spec,
        out_shape=(
            *(jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(nf)),
            jax.ShapeDtypeStruct((1, t_total + 3), jnp.int32),
        ),
        input_output_aliases={i + 1: i for i in range(nf)},
        interpret=interpret,
    )(ids, *table, *tops, *bottoms)
    return type(table)(*outs[:nf]), outs[nf][0]


def _halo_boundary_snapshots(table, tiles: int, tile_p: int, n: int, h=8):
    """(tops, bottoms) pre-round boundary snapshots for the halo kernels:
    each tile's adjacent ``h``-row blocks from the neighboring tiles,
    [h*tiles, n] per field. Built from static slices + a roll over the
    tiny tile axis — a row GATHER here lowers to a table/8-sized XLA temp,
    which blows the north-star HBM budget."""

    def edges(f):
        v = f.reshape(tiles, tile_p, n)
        last_h = v[:, tile_p - h :, :]  # each tile's last h rows
        first_h = v[:, :h, :]  # each tile's first h rows
        top = jnp.roll(last_h, 1, axis=0).reshape(tiles * h, n)
        bottom = jnp.roll(first_h, -1, axis=0).reshape(tiles * h, n)
        return top, bottom

    return zip(*(edges(f) for f in table))


def halo_window(nf: int) -> int:
    """Tuned fused depth for the WINDOWED HALO kernel
    (ring_window_halo_packed_traced: m rounds per block-load at peer
    counts past the full-P stripe budget), per field-tuple arity; 0 =
    unsupported. Same join-step bound as the stripe window (the limit is
    unrolled join steps, not depth — see stripe_window); the halo ext
    block is much smaller than a full-P stripe, so the depths carry over:
    rank1 nf=1 m=120 (6 join steps), rank nf=2 m=40 (5 steps), packed
    nf=3 m=64 (6 steps). Depths are hardware-gated per CLAUDE.md: v5e
    timing at rank1 P=8192 x 256K (benchmarks/halo_window_bench.py):
    m=40 3.90 T, m=80 6.74 T, m=120 9.49 T logical merges/s (the 8-round
    trapezoidal halo: 599 B); packed at its halo cell — the 1024 x 1M
    north star itself, no full-P stripe window exists at ANY nf=3 depth —
    m=16/24/32/40/48/56/64: 0.26/0.37/0.49/0.59/0.58/0.66/0.74 T
    (the blind 8-round frontier: ~94 B), m=80 OOMs HBM (snapshot roll
    temps 4.4 GB on the 12 GB table > 15.75 GB). AOT memcheck: in-place
    alias, temp = snapshots only (~1.4 GB at nf=1 = 2*depth*(p/tile_p)
    rows of [n] + one roll copy; ~3.5 GB at nf=3 m=64, within the
    snapshot-aware 1.6x cap). Change only with a fresh timing run +
    benchmarks/memcheck.py audit."""
    return {1: 120, 2: 40, 3: 64}.get(nf, 0)


def window_halo_tiles(p: int, n: int, nf: int, depth: int):
    """(tile_p, tile_n) for the windowed halo kernel, or (0, 0).

    Constraints: tile_p an 8-aligned divisor of p with tile_p ≥ depth
    (the chain-edge clamp argument needs every global-edge-clipped VALID
    row to live in the edge tile — see the kernel docstring), tile_n a
    128-aligned divisor of n, and the EXTENDED block
    (tile_p + 2*depth) * tile_n within the arity-aware window budget.
    tile_p is maximized: the boundary snapshots cost 2*depth*(p/tile_p)
    rows of [n] per pass, so fewer, taller tiles keep the snapshot
    gather small (P=8192 depth=120 tile_p=2048 → 11.7% of the table)."""
    if depth <= 0 or p % 8 or n % 128 or depth % 8:
        return 0, 0
    budget = _STRIPE_MAX_ELEMS * (4 if nf == 1 else 1)
    # tile_n = 128 (the native lane width): the snapshots are [*, n] FULL
    # WIDTH regardless of tile_n, so the narrowest block maximizes tile_p
    # under the budget and halves the snapshot HBM cost vs tile_n=256
    # (P=8192 nf=1: tile_p 2048 vs 1024 → 11.7% vs 23% of the table)
    tile_n = 128
    max_tp = (budget // tile_n - 2 * depth) // 8 * 8
    if max_tp < depth:
        return 0, 0
    tile_p = 0
    cand = 8
    while cand <= min(p, max_tp):
        if p % cand == 0:
            tile_p = cand
        cand += 8
    if tile_p < depth:
        return 0, 0
    return tile_p, tile_n


def window_halo_supported(p: int, n: int, nf: int) -> bool:
    """Shapes the windowed halo kernel can tile at this arity's tuned
    depth. Complements window_ring_supported: the router prefers the
    full-P stripe window (no snapshot traffic) and falls to this one
    past the stripe budget (e.g. rank1 P=8192)."""
    depth = halo_window(nf)
    return depth > 0 and window_halo_tiles(p, n, nf, depth)[0] > 0


def _halo_window_kernel_packed(nf: int, wrap: bool, tile_p: int,
                               num_peers: int, h: int, m: int, *refs):
    """Windowed halo tile body: m ring/chain rounds per block-load as a
    radius-m window join over the EXTENDED tile (h snapshot rows +
    tile_p center rows + h snapshot rows), h ≥ m.

    Validity generalizes the 8-round trapezoid to window joins: after
    the accumulated radius reaches r, extended rows [r, L-r) hold their
    exact radius-r windows (each 3-way join consumes rows one step
    closer to the block edges), so the center rows — h ≥ m rows in —
    stay exact through radius m. Chain edges CLAMP shifted copies to
    the row holding the global edge (ext row h / h+tile_p-1; the edge
    row's own accumulated window is edge-clipped exact, and clamping is
    a subset join, so idempotence keeps it exact — zero-filling loses
    edge coverage, same as the stripe window). tile_p ≥ m guarantees a
    VALID row needing the clamp only occurs in the tile that contains
    that global edge row. The count output is the classic round-m
    residual: the final round runs the classic single-round body and
    counts center rows only, summed across tiles in SMEM."""
    import jax.experimental.pallas as pl

    c_refs = refs[:nf]
    t_refs = refs[nf:2 * nf]
    b_refs = refs[2 * nf:3 * nf]
    out_refs, count_ref = refs[3 * nf:4 * nf], refs[4 * nf]

    i = pl.program_id(0)
    ext = [
        jnp.concatenate([t[...], c[...], b[...]], axis=0)
        for t, c, b in zip(t_refs, c_refs, b_refs)
    ]
    row = jax.lax.broadcasted_iota(jnp.int32, ext[0].shape, 0)
    global_row = i * tile_p - h + row

    def shifted(vals, s: int):
        out = []
        for f in range(nf):
            rolled = jnp.roll(vals[f], s, axis=0)
            if not wrap:
                if s > 0:
                    rolled = jnp.where(
                        global_row - s < 0, vals[f][h:h + 1, :], rolled
                    )
                else:
                    rolled = jnp.where(
                        global_row - s > num_peers - 1,
                        vals[f][h + tile_p - 1:h + tile_p, :],
                        rolled,
                    )
            out.append(rolled)
        return out

    def lexmax(a_vals, b_vals):
        gt = _lex_gt_packed(
            table_keys(tuple(b_vals)), table_keys(tuple(a_vals))
        )
        return [jnp.where(gt, b, a) for a, b in zip(a_vals, b_vals)]

    vals = list(ext)
    for s in _window_chain(m - 1):
        vals = lexmax(vals, shifted(vals, +s))
        vals = lexmax(vals, shifted(vals, -s))
    vals, c = _merge_ext_round(vals, wrap, tile_p, num_peers, i, h=h)
    for out, v in zip(out_refs, vals):
        out[...] = v[h:h + tile_p, :]

    @pl.when((i == 0) & (pl.program_id(1) == 0))
    def _():
        count_ref[0, 0] = 0

    count_ref[0, 0] += c


def ring_window_halo_packed_traced(
    table: PackedTable, wrap: bool, m: int, interpret: bool,
    tiles=None,
) -> Tuple[PackedTable, jax.Array]:
    """m fused ring/chain rounds at HALO shapes (P past the full-P stripe
    budget) in one in-place pallas_call: each (tile_p, tile_n) center
    tile extends with m-row-deep boundary snapshots (rounded up to the
    8-row sublane grain) and computes the radius-m window join in
    O(log m) 3-way joins entirely in VMEM. State is bit-identical to m
    classic rounds; the count is the classic ROUND-m residual (same
    contract as ring_window_packed_traced). Shape support:
    window_halo_supported; ``tiles`` overrides (tile_p, tile_n) for
    interpret-mode tests (production callers pass the tuned depth via
    halo_window)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(table)
    p, n = table[0].shape
    h = (m + 7) // 8 * 8  # snapshot depth: radius m on the sublane grain
    if tiles is None:
        tiles = window_halo_tiles(p, n, nf, max(h, halo_window(nf)))
    tile_p, tile_n = tiles
    if not (tile_p and tile_p % 8 == 0 and p % tile_p == 0
            and tile_n and tile_n % 128 == 0 and n % tile_n == 0
            and m <= tile_p and h <= tile_p):
        raise ValueError(
            f"windowed halo cannot tile ({p}, {n}) nf={nf} m={m}: "
            f"tiles={tiles}"
        )
    n_tiles = p // tile_p
    t_total = n // tile_n
    tops, bottoms = _halo_boundary_snapshots(table, n_tiles, tile_p, n, h=h)

    center_spec = pl.BlockSpec(
        (tile_p, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec(
        (h, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    count_spec = pl.BlockSpec(
        (1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
    )
    outs = pl.pallas_call(
        functools.partial(
            _halo_window_kernel_packed, nf, wrap, tile_p, p, h, m
        ),
        grid=(n_tiles, t_total),
        in_specs=[center_spec] * nf + [halo_spec] * (2 * nf),
        out_specs=tuple([center_spec] * nf) + (count_spec,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(nf)
        ) + (jax.ShapeDtypeStruct((1, 1), jnp.int32),),
        input_output_aliases={i: i for i in range(nf)},
        interpret=interpret,
    )(*table, *tops, *bottoms)
    return type(table)(*outs[:nf]), outs[nf][0, 0]


def frontier_halo_round_packed_traced(table, ids, wrap: bool,
                                      interpret: bool):
    """Compacting frontier round via the halo kernel (any 8-aligned P):
    pre-round boundary snapshot (full width — it is ~2/tile_p of the table)
    + 2-D remapped grid over only the active stripes. ``ids`` is the
    [t_total + 2] compact array (see frontier_ids_compact); returns
    (table, next ids)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(table)
    p, n = table[0].shape
    tile_p, tile_n = _halo_tiles_packed(p, n)
    tiles = p // tile_p
    t_total = n // tile_n
    tops, bottoms = _halo_boundary_snapshots(table, tiles, tile_p, n)
    grid_j = jnp.maximum(ids[t_total], 1)

    center_spec = pl.BlockSpec(
        (tile_p, tile_n), lambda j, i, ids_: (i, ids_[j]),
        memory_space=pltpu.VMEM,
    )
    halo_spec = pl.BlockSpec(
        (8, tile_n), lambda j, i, ids_: (i, ids_[j]), memory_space=pltpu.VMEM
    )
    ids_spec = pl.BlockSpec(
        (1, t_total + 2), lambda j, i, ids_: (0, 0), memory_space=pltpu.SMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_j, tiles),  # dynamic: exactly the active stripes
        in_specs=[center_spec] * nf + [halo_spec] * (2 * nf),
        out_specs=[center_spec] * nf + [ids_spec],
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
    )
    outs = pl.pallas_call(
        functools.partial(
            _frontier_halo_kernel_packed, nf, wrap, tile_p, p, t_total, tiles
        ),
        grid_spec=grid_spec,
        out_shape=(
            *(jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(nf)),
            jax.ShapeDtypeStruct((1, t_total + 2), jnp.int32),
        ),
        input_output_aliases={i + 1: i for i in range(nf)},
        interpret=interpret,
    )(ids, *table, *tops, *bottoms)
    return type(table)(*outs[:nf]), outs[nf][0]


def frontier_tile_n(p: int, n: int) -> int:
    """The stripe width the frontier loop would use at this shape (0 when
    no frontier-capable kernel fits) — callers seed dirty flags with it."""
    if packed_ring_supported(p, n):
        return _stripe_tile_n(p, n)
    if packed_halo_supported(p, n):
        return _halo_tiles_packed(p, n)[1]
    return 0


def _frontier_multiround_kernel_packed(nf: int, wrap: bool, num_peers: int,
                                       t_total: int, m: int, *refs):
    """Compacting frontier round with M rounds fused per block-load.

    Per stripe, all M rounds run in VMEM (full-P stripe: rolls wrap inside
    the block) and ``stripe_last`` records the last inner round (1-based)
    that changed anything. By monotonicity a stripe that ran unchanged
    rounds after its last change is at its fixed point, so it stays dirty
    IFF stripe_last == M. The SMEM ids output additionally carries
    [t_total+1] = total changes across the invocation and [t_total+2] =
    max(stripe_last) over processed stripes — the loop reconstructs the
    EXACT classic round count from it (see gossip_frontier_packed)."""
    import jax.experimental.pallas as pl

    ids_ref = refs[0]
    c_refs = refs[1:1 + nf]
    out_refs, ids_out = refs[1 + nf:1 + 2 * nf], refs[1 + 2 * nf]

    j = pl.program_id(0)
    count = ids_ref[t_total]

    @pl.when(j == 0)
    def _():
        ids_out[0, t_total] = 0
        ids_out[0, t_total + 1] = 0
        ids_out[0, t_total + 2] = 0

    @pl.when(j < count)
    def _():
        stripe = ids_ref[j]
        vals = [r[...] for r in c_refs]
        total = jnp.int32(0)
        stripe_last = jnp.int32(0)
        for k in range(1, m + 1):
            vals, c = _merge_stripe_fullp(vals, wrap, num_peers)
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
        ids_out[0, t_total + 2] = jnp.maximum(
            ids_out[0, t_total + 2], stripe_last
        )


def frontier_multiround_packed_traced(table, ids, wrap: bool, m: int,
                                      interpret: bool):
    """One M-fused compacting frontier step (full-P stripe shapes only);
    ``ids`` is a [t_total + 3] array (frontier_ids_compact layout plus the
    max-last-change cell); returns (table, next ids)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(table)
    p, n = table[0].shape
    tile_n = _stripe_tile_n(p, n)
    t_total = n // tile_n
    grid_j = jnp.maximum(ids[t_total], 1)

    stripe_spec = pl.BlockSpec(
        (p, tile_n), lambda j, ids_: (0, ids_[j]), memory_space=pltpu.VMEM
    )
    ids_spec = pl.BlockSpec(
        (1, t_total + 3), lambda j, ids_: (0, 0), memory_space=pltpu.SMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_j,),
        in_specs=[stripe_spec] * nf,
        out_specs=[stripe_spec] * nf + [ids_spec],
    )
    outs = pl.pallas_call(
        functools.partial(
            _frontier_multiround_kernel_packed, nf, wrap, p, t_total, m
        ),
        grid_spec=grid_spec,
        out_shape=(
            *(jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(nf)),
            jax.ShapeDtypeStruct((1, t_total + 3), jnp.int32),
        ),
        input_output_aliases={i + 1: i for i in range(nf)},
        interpret=interpret,
    )(ids, *table)
    return type(table)(*outs[:nf]), outs[nf][0]


def frontier_round_packed_traced(table, ids, wrap: bool, interpret: bool):
    """One compacting frontier round: process the stripes listed in ``ids``
    in place, return (table, next ids) — the kernel emits the next round's
    compact id array itself (see _frontier_round_kernel_packed)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(table)
    p, n = table[0].shape
    if not packed_ring_supported(p, n):
        return frontier_halo_round_packed_traced(table, ids, wrap, interpret)
    tile_n = _stripe_tile_n(p, n)
    t_total = n // tile_n
    grid_j = jnp.maximum(ids[t_total], 1)

    stripe_spec = pl.BlockSpec(
        (p, tile_n), lambda j, ids_: (0, ids_[j]), memory_space=pltpu.VMEM
    )
    # the ids output lives as ONE full-array SMEM block, shaped [1, T+2]:
    # Mosaic rejects (1,1) blocks, and a [T,1] window pads its minor dim to
    # 128 lanes (T*512 B — past the 1 MB SMEM budget at the north-star
    # stripe count); [1, T] pads sublanes to 8 instead (T*32 B). The kernel
    # appends ids dynamically.
    ids_spec = pl.BlockSpec(
        (1, t_total + 2), lambda j, ids_: (0, 0), memory_space=pltpu.SMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_j,),  # dynamic: exactly the active stripes
        in_specs=[stripe_spec] * nf,
        out_specs=[stripe_spec] * nf + [ids_spec],
    )
    outs = pl.pallas_call(
        functools.partial(
            _frontier_round_kernel_packed, nf, wrap, p, t_total
        ),
        grid_spec=grid_spec,
        out_shape=(
            *(jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(nf)),
            jax.ShapeDtypeStruct((1, t_total + 2), jnp.int32),
        ),
        input_output_aliases={i + 1: i for i in range(nf)},
        interpret=interpret,
    )(ids, *table)
    return type(table)(*outs[:nf]), outs[nf][0]


def frontier_fused_loop(table, dirty, t_total: int, max_rounds: int,
                        fuse: int, round1_fn, roundm_fn):
    """Shared fused-phase + single-round-tail convergence driver used by
    both layouts (call inside an outer jit; the loops trace in place).

    ``round1_fn(table, ids)`` runs ONE compacting frontier round over the
    [t_total + 2] ids layout; ``roundm_fn(table, ids)`` runs FUSE rounds
    over the [t_total + 3] layout, whose extra cell carries
    max(stripe_last) for exact round reconstruction. The fused phase runs
    only while a whole fuse-block fits STRICTLY under max_rounds — any
    cutoff therefore ends in the single-round tail, so the reported
    residual is the true last-round change count (matching the classic
    loop exactly, not a fused-block sum). Returns (table, classic rounds,
    last_changed)."""
    ids0 = jnp.concatenate(
        [frontier_ids_compact(dirty, t_total), jnp.zeros((1,), jnp.int32)]
    )

    def cond_f(state):
        _, ids, rounds_done, _ = state
        return (ids[t_total] > 0) & (rounds_done + fuse < max_rounds)

    def body_f(state):
        tbl, ids, rounds_done, last_change = state
        tbl, ids = roundm_fn(tbl, ids)
        mr = ids[t_total + 2]
        last_change = jnp.where(mr > 0, rounds_done + mr, last_change)
        return tbl, ids, rounds_done + fuse, last_change

    table, ids_m, rounds_done, last_change = jax.lax.while_loop(
        cond_f, body_f, (table, ids0, jnp.int32(0), jnp.int32(-1))
    )

    ids1 = ids_m[: t_total + 2]

    def cond_t(state):
        _, ids, rounds_done, _ = state
        return (ids[t_total] > 0) & (rounds_done < max_rounds)

    def body_t(state):
        tbl, ids, rounds_done, last_change = state
        tbl, ids = round1_fn(tbl, ids)
        last_change = jnp.where(
            ids[t_total + 1] > 0, rounds_done + 1, last_change
        )
        return tbl, ids, rounds_done + 1, last_change

    table, ids1, rounds_done, last_change = jax.lax.while_loop(
        cond_t, body_t, (table, ids1, rounds_done, last_change)
    )
    remaining = ids1[t_total]
    # classic round count: the first no-change round = last change + 1
    # (1 if rounds ran but nothing ever changed; rounds_done == the
    # max_rounds cutoff when not converged; 0 if nothing was dirty)
    rounds = jnp.where(
        remaining > 0,
        rounds_done,
        jnp.where(
            rounds_done == 0,
            0,
            jnp.maximum(last_change + 1, 1),
        ),
    )
    last_changed = jnp.where(
        remaining == 0, 0, jnp.maximum(ids1[t_total + 1], 1)
    )
    return table, rounds, last_changed


@functools.partial(
    jax.jit, static_argnames=("wrap", "max_rounds", "interpret", "fuse"),
    donate_argnums=(0,),
)
def gossip_frontier_packed(
    table: PackedTable,
    dirty: jax.Array,
    wrap: bool,
    max_rounds: int,
    interpret: bool = False,
    fuse: int = 1,
) -> Tuple[PackedTable, jax.Array, jax.Array]:
    """Frontier convergence loop (ring/chain, full-P stripe or halo shapes):
    per round, only stripes still changing are touched, and the kernel
    itself compacts the next round's frontier in SMEM. Bit-identical final
    state to the classic loop (every active stripe advances exactly one
    round per iteration; settled stripes are at their fixed point); the
    returned rounds count matches the classic loop exactly — including with
    ``fuse`` > 1, where FUSE rounds run per block-load (DMA amortized, see
    _fullp_multiround_kernel_packed) and the exact classic round count is
    reconstructed from the kernels' max-last-change tracking: a fused phase
    runs while a whole fuse-block fits under max_rounds, then single rounds
    finish the tail. Extra fused rounds past the fixed point are no-ops by
    idempotence, so the final state is still bit-identical."""
    p, n = table[0].shape
    tile_n = frontier_tile_n(p, n)
    t_total = n // tile_n

    # NOTE a distance-tracking window-join fused phase (O(log m) joins per
    # block with exact per-entry last-change rounds) was built and measured
    # here: break-even on all-dirty convergence (0.56 s vs 0.59 s at the
    # north star) and ~20% SLOWER incremental — the distance field triples
    # the per-pass compute (eq-compares + min-distance selects + the d
    # array's VMEM) and erases the log-step win. Reverted; see
    # docs/tpu-performance.md "Where window fusion does NOT pay".
    if fuse > 1 and packed_ring_supported(p, n):
        return frontier_fused_loop(
            table, dirty, t_total, max_rounds, fuse,
            lambda tbl, ids: frontier_round_packed_traced(
                tbl, ids, wrap, interpret
            ),
            lambda tbl, ids: frontier_multiround_packed_traced(
                tbl, ids, wrap, fuse, interpret
            ),
        )
    if fuse > 1 and packed_halo_supported(p, n):
        # halo shapes fuse HALO_FUSE rounds per block-load via 8-deep
        # trapezoidal time-tiling (the snapshot depth pins M=8, not the
        # caller's fuse); same exact-round-count contract
        return frontier_fused_loop(
            table, dirty, t_total, max_rounds, HALO_FUSE,
            lambda tbl, ids: frontier_halo_round_packed_traced(
                tbl, ids, wrap, interpret
            ),
            lambda tbl, ids: frontier_halo_multiround_packed_traced(
                tbl, ids, wrap, interpret
            ),
        )

    ids0 = frontier_ids_compact(dirty, t_total)

    def cond(state):
        _, ids, rounds = state
        return (ids[t_total] > 0) & (rounds < max_rounds)

    def body(state):
        tbl, ids, rounds = state
        tbl, ids = frontier_round_packed_traced(tbl, ids, wrap, interpret)
        return tbl, ids, rounds + 1

    table, ids, rounds = jax.lax.while_loop(
        cond, body, (table, ids0, jnp.int32(0))
    )
    # honest residual: 0 IFF the frontier is empty at exit (true fixed
    # point). A max_rounds cutoff leaves ids[t_total] > 0 and reports the
    # last executed round's changed total — or the init sentinel 1 when
    # max_rounds=0 ran nothing (callers must NOT treat that as converged).
    last_changed = jnp.where(ids[t_total] == 0, 0, ids[t_total + 1])
    return table, rounds, last_changed


def frontier_tile_n_sharded(p: int, n: int, n_devices: int) -> int:
    """Per-device stripe width for the shard_map frontier path (0 when the
    local block can't tile): each device holds p/n_devices rows × all n
    slots, so the stripe budget is computed on the LOCAL shape."""
    if n_devices <= 0 or p % n_devices:
        return 0
    per_dev = p // n_devices
    if per_dev % 8 or per_dev < 8 or n % 128:
        return 0
    return _stripe_tile_n(per_dev, n)


def _compact_counts_kernel(t_total: int, counts_ref, ids_ref):
    """One-grid-step SMEM scan: per-stripe change counts → the next
    round's compacted prefetch ids array ([t_total + 2]: dirty stripe ids
    ascending, count, round change total). Replaces the per-round XLA
    nonzero/cumsum/concat chain in the shard_map frontier loop — the
    multi-device twin of the single-chip kernels' in-kernel appending
    (which cannot apply across devices: the frontier must be psum-agreed
    first, so compaction runs on the REDUCED counts)."""
    import jax.experimental.pallas as pl

    def body(t, carry):
        k, total = carry
        c = counts_ref[0, t]

        @pl.when(c > 0)
        def _():
            ids_ref[0, k] = t

        return k + jnp.where(c > 0, 1, 0).astype(jnp.int32), total + c

    k, total = jax.lax.fori_loop(
        0, t_total, body, (jnp.int32(0), jnp.int32(0))
    )
    ids_ref[0, t_total] = k
    ids_ref[0, t_total + 1] = total


@functools.partial(jax.jit, static_argnames=("interpret",))
def compact_counts_packed(counts, interpret: bool = False):
    """Compact [t_total] per-stripe counts into the [t_total + 2] ids
    layout (see frontier_ids_compact) with one tiny Pallas call. Entries
    past the count are unwritten (never read). Runs on replicated data in
    the global view of the shard_map frontier loop."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_total = counts.shape[0]
    out = pl.pallas_call(
        functools.partial(_compact_counts_kernel, t_total),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(
                (1, t_total), lambda i: (0, 0), memory_space=pltpu.SMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, t_total + 2), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, t_total + 2), jnp.int32),
        interpret=interpret,
    )(counts[None, :])
    return out[0]


def frontier_shard_round_packed(block, tops, bottoms, ids_full,
                                interpret: bool, vma=None,
                                tile_n: int = 0):
    """Per-device frontier ring/chain round body (called inside shard_map).

    ``block`` is the device-local [b, n] peer block; ``tops``/``bottoms``
    are [8, n] snapshots whose row 7 / row 0 hold the neighbor devices'
    ppermuted boundary rows (already zero-masked for the chain's global
    edges — the same convention as ``_ring_exchange``). Only the stripes
    listed in the prefetched ``ids_full`` array ([t_total + 2], see
    frontier_ids_compact — psum-agreed across devices, rebuilt per round
    by compact_counts_packed) are processed, via the same grid remapping
    as ``frontier_round_packed_traced``; returns (block, per-stripe
    change counts) — the caller psums counts across devices to agree on
    the next round's frontier."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(block)
    b, n = block[0].shape
    tile_n = tile_n or _stripe_tile_n(b, n)
    t_total = n // tile_n

    grid_j = jnp.maximum(ids_full[t_total], 1)
    counts_in = jnp.zeros((1, t_total), jnp.int32)

    center_spec = pl.BlockSpec(
        (b, tile_n), lambda j, i, ids: (0, ids[j]), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec(
        (8, tile_n), lambda j, i, ids: (0, ids[j]), memory_space=pltpu.VMEM
    )
    cnt_spec = pl.BlockSpec(
        (1, t_total), lambda j, i, ids: (0, 0), memory_space=pltpu.SMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_j, 1),  # dynamic: exactly the active stripes
        in_specs=[center_spec] * nf + [halo_spec] * (2 * nf) + [cnt_spec],
        out_specs=[center_spec] * nf + [cnt_spec],
    )
    # the counts-emitting halo frontier kernel with tiles=1 and wrap=True
    # is exactly the local body needed: row 0 reads tops[7], row b-1 reads
    # bottoms[0], no global-edge masking in-kernel (the ppermuted rows
    # carry it); counts (not compacted ids) because the frontier must
    # psum-agree across devices before the next round
    # under shard_map (check_vma) every pallas output must declare how it
    # varies over the mesh; callers pass vma={PEER_AXIS}
    kw = {} if vma is None else {"vma": frozenset(vma)}
    aliases = {i + 1: i for i in range(nf)}
    aliases[1 + 3 * nf] = nf
    outs = pl.pallas_call(
        functools.partial(
            _frontier_halo_kernel_counts, nf, True, b, b, t_total, 1
        ),
        grid_spec=grid_spec,
        out_shape=(
            *(jax.ShapeDtypeStruct((b, n), jnp.int32, **kw) for _ in range(nf)),
            jax.ShapeDtypeStruct((1, t_total), jnp.int32, **kw),
        ),
        input_output_aliases=aliases,
        interpret=interpret,
    )(ids_full, *block, *tops, *bottoms, counts_in)
    # processed stripes == ids[0, count) (dynamic grid runs exactly
    # those); unwritten SMEM entries keep the aliased input's zeros
    return type(block)(*outs[:nf]), outs[nf][0, :]


def _frontier_shard_multiround_kernel_packed(nf: int, m: int, b: int,
                                             t_total: int, *refs):
    """Per-device FUSED frontier body: M rounds per block-load on the
    device-local [b, tile] stripe via the same trapezoidal time-tiling as
    the halo fused kernel — the ppermuted 8-row neighbor snapshots buy
    exactly 8 rounds of shrinking ext validity (ext rows [k, L-k) exact
    after round k; the center sits 8 rows in, so M ≤ 8 keeps it exact).
    Chain edges arrive as ZEROED snapshots, which is exact: cls=0 is the
    join identity, so a zero row contributes nothing in any round — the
    same absent-neighbor semantics as the classic loop's edge masking.
    Emits per-ROUND per-stripe center change counts ([m, t_total] SMEM,
    tiles=1 so no cross-tile accumulation) for the caller to psum; the
    compaction into the next fused ids array happens on the REDUCED counts
    (compact_counts_multiround_packed)."""
    import jax.experimental.pallas as pl

    ids_ref = refs[0]
    c_refs = refs[1:1 + nf]
    t_refs = refs[1 + nf:1 + 2 * nf]
    b_refs = refs[1 + 2 * nf:1 + 3 * nf]
    # refs[1 + 3*nf] is the aliased counts input (never read in-kernel)
    out_refs = refs[2 + 3 * nf:2 + 4 * nf]
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
        for k in range(m):
            # wrap=True always: global chain edges ride the zeroed
            # snapshots, and ext-edge wraparound garbage stays outside
            # the validity trapezoid
            ext, ck = _merge_ext_round(ext, True, b, b, 0)
            cnt_out[k, stripe] = ck
        for out, v in zip(out_refs, ext):
            out[...] = v[8 : 8 + b, :]


def frontier_shard_multiround_packed(block, tops, bottoms, ids_full,
                                     interpret: bool, vma=None):
    """HALO_FUSE-round fused twin of frontier_shard_round_packed: ``tops``
    / ``bottoms`` are the FULL 8-row ppermuted neighbor boundary blocks
    (pre-fused-step snapshots), not 1-row pads. Returns (block, per-round
    per-stripe counts [HALO_FUSE, t_total]) for the caller to psum."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(block)
    b, n = block[0].shape
    tile_n = _stripe_tile_n(b, n)
    t_total = n // tile_n

    grid_j = jnp.maximum(ids_full[t_total], 1)
    counts_in = jnp.zeros((HALO_FUSE, t_total), jnp.int32)

    center_spec = pl.BlockSpec(
        (b, tile_n), lambda j, ids: (0, ids[j]), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec(
        (8, tile_n), lambda j, ids: (0, ids[j]), memory_space=pltpu.VMEM
    )
    cnt_spec = pl.BlockSpec(
        (HALO_FUSE, t_total), lambda j, ids: (0, 0),
        memory_space=pltpu.SMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_j,),  # dynamic: exactly the active stripes
        in_specs=[center_spec] * nf + [halo_spec] * (2 * nf) + [cnt_spec],
        out_specs=[center_spec] * nf + [cnt_spec],
    )
    kw = {} if vma is None else {"vma": frozenset(vma)}
    aliases = {i + 1: i for i in range(nf)}
    aliases[1 + 3 * nf] = nf
    outs = pl.pallas_call(
        functools.partial(
            _frontier_shard_multiround_kernel_packed, nf, HALO_FUSE, b,
            t_total,
        ),
        grid_spec=grid_spec,
        out_shape=(
            *(jax.ShapeDtypeStruct((b, n), jnp.int32, **kw) for _ in range(nf)),
            jax.ShapeDtypeStruct((HALO_FUSE, t_total), jnp.int32, **kw),
        ),
        input_output_aliases=aliases,
        interpret=interpret,
    )(ids_full, *block, *tops, *bottoms, counts_in)
    return type(block)(*outs[:nf]), outs[nf]


def _compact_counts_multiround_kernel(m: int, t_total: int, counts_ref,
                                      ids_ref):
    """Psum-reduced [m, t_total] per-round counts → the [t_total + 3]
    fused ids layout: a stripe stays dirty IFF round m still changed it
    somewhere (counts[m-1] > 0); [t_total+1] accumulates the block total
    and [t_total+2] the max last-changing round across stripes — exactly
    what frontier_fused_loop reconstructs classic round counts from."""
    import jax.experimental.pallas as pl

    def body(t, carry):
        k, total, max_last = carry
        stripe_total = jnp.int32(0)
        last = jnp.int32(0)
        for r in range(m):
            c = counts_ref[r, t]
            stripe_total = stripe_total + c
            last = jnp.where(c > 0, jnp.int32(r + 1), last)

        @pl.when(last == m)
        def _():
            ids_ref[0, k] = t

        return (
            k + jnp.where(last == m, 1, 0).astype(jnp.int32),
            total + stripe_total,
            jnp.maximum(max_last, last),
        )

    k, total, max_last = jax.lax.fori_loop(
        0, t_total, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    )
    ids_ref[0, t_total] = k
    ids_ref[0, t_total + 1] = total
    ids_ref[0, t_total + 2] = max_last


@functools.partial(jax.jit, static_argnames=("interpret",))
def compact_counts_multiround_packed(counts, interpret: bool = False):
    """[m, t_total] psum'd per-round counts → [t_total + 3] fused ids
    array, one tiny Pallas call (fused twin of compact_counts_packed)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, t_total = counts.shape
    out = pl.pallas_call(
        functools.partial(_compact_counts_multiround_kernel, m, t_total),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(
                (m, t_total), lambda i: (0, 0), memory_space=pltpu.SMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, t_total + 3), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, t_total + 3), jnp.int32),
        interpret=interpret,
    )(counts)
    return out[0]


# ----------------------------------------- spmd WINDOW frontier (fuse ≫ 8)
#
# m gossip rounds per collective round-trip instead of HALO_FUSE=8: each
# device ppermutes an m-row boundary SLAB once, then computes the radius-m
# window join locally in O(log m) doubling steps (the lattice-join theorem
# behind ring_window_packed_traced), with EXACT per-entry last-change
# tracking: an entry's last-change round within the block equals its ring
# distance to the nearest source of its final value, and that distance
# composes exactly through doubling iff every step obeys s ≤ r+1 (the
# s ≤ 2r+1 value-only schedule overcharges sources in the zone (r, s) —
# docs/tpu-performance.md:199-215 records the theorem; this is the
# "future multi-chip fused frontier" it was recorded for).

_DIST_FILL = 1 << 24  # > any window radius; never survives a live compare


def _keys_eq(b_keys, a_keys) -> jax.Array:
    """Full key-chain equality (same lattice value)."""
    eq = b_keys[0] == a_keys[0]
    for kb, ka in zip(b_keys[1:], a_keys[1:]):
        eq = eq & (kb == ka)
    return eq


def _shift_line(f, s: int, fill):
    """Shift rows of ``f`` down by ``s`` (s<0 = up) with constant fill —
    LINE semantics (no wraparound): the ext block's slabs already carry
    the ring neighborhood, so rolled-in rows must be identity, not wrap."""
    rolled = jnp.roll(f, s, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, f.shape, 0)
    if s > 0:
        return jnp.where(row < s, fill, rolled)
    return jnp.where(row >= f.shape[0] + s, fill, rolled)


def _window_dist_chain(vals, dist, m: int):
    """Join ``vals`` to window radius ``m`` on a line, tracking the exact
    min distance to a source of each entry's current value.

    Invariant at radius r (rows whose radius-r line window is in range):
    ``vals`` = lattice join over the radius-r window, ``dist`` = exact min
    distance to a source (radius-0 value) equal to it. One step joins with
    copies shifted ±s carrying candidate distance d+s; with s ≤ r+1 any
    source the shifted copy over-charges (true distance s−d < s) is
    already covered exactly by the center window, so gt takes the shifted
    distance, full-key EQUALITY takes the min — both exact. Shift fill is
    the absent value (cls 0 / rank 0: the join identity) with _DIST_FILL
    distance, so out-of-line rows never win or tighten a distance."""
    r = 0
    while r < m:
        s = min(m - r, r + 1)
        for sign in (+1, -1):
            sh = [_shift_line(f, sign * s, 0) for f in vals]
            cand = _shift_line(dist, sign * s, _DIST_FILL - s) + s
            kb = table_keys(tuple(sh))
            ka = table_keys(tuple(vals))
            gt = _lex_gt_packed(kb, ka)
            eq = _keys_eq(kb, ka)
            vals = [jnp.where(gt, fb, fa) for fa, fb in zip(vals, sh)]
            dist = jnp.where(
                gt, cand, jnp.where(eq, jnp.minimum(dist, cand), dist)
            )
        r += s
    return vals, dist


def _frontier_shard_window_kernel_packed(nf: int, m: int, b: int,
                                         t_total: int, *refs):
    """Per-device WINDOW frontier body: m rounds per block-load via the
    distance-tracking radius-m window join over [slab_m | center_b |
    slab_m]. Emits per-stripe (changed-entry count, last-change round)
    into a [2, t_total] SMEM block — the caller psums row 0 and pmaxes
    row 1 across devices; compact_counts_window_packed turns the agreed
    stats into the fused ids layout. Chain edges arrive as ZEROED slabs
    (cls 0 = join identity at _DIST_FILL distance — exact absent-neighbor
    semantics, same as the multiround kernel)."""
    import jax.experimental.pallas as pl

    ids_ref = refs[0]
    c_refs = refs[1:1 + nf]
    t_refs = refs[1 + nf:1 + 2 * nf]
    b_refs = refs[1 + 2 * nf:1 + 3 * nf]
    # refs[1 + 3*nf] is the aliased stats input (never read in-kernel)
    out_refs = refs[2 + 3 * nf:2 + 4 * nf]
    st_out = refs[2 + 4 * nf]

    j = pl.program_id(0)
    count = ids_ref[t_total]

    @pl.when(j < count)
    def _():
        stripe = ids_ref[j]
        orig = [c[...] for c in c_refs]
        ext = [
            jnp.concatenate([t[...], o, bo[...]], axis=0)
            for t, o, bo in zip(t_refs, orig, b_refs)
        ]
        dist = jnp.zeros_like(ext[0])
        ext, dist = _window_dist_chain(ext, dist, m)
        new = [e[m:m + b, :] for e in ext]
        changed = _lex_gt_packed(table_keys(tuple(new)), table_keys(tuple(orig)))
        for out, v in zip(out_refs, new):
            out[...] = v
        st_out[0, stripe] = jnp.sum(changed.astype(jnp.int32))
        st_out[1, stripe] = jnp.max(
            jnp.where(changed, dist[m:m + b, :], 0)
        )


def frontier_shard_window_packed(block, tops, bottoms, ids_full, m: int,
                                 tile_n: int, interpret: bool, vma=None):
    """m-round window twin of frontier_shard_multiround_packed: ``tops``/
    ``bottoms`` are the FULL m-row ppermuted neighbor slabs. Returns
    (block, per-stripe stats [2, t_total]: row 0 = changed-entry counts
    to psum, row 1 = last-change rounds to pmax)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(block)
    b, n = block[0].shape
    t_total = n // tile_n

    grid_j = jnp.maximum(ids_full[t_total], 1)
    stats_in = jnp.zeros((2, t_total), jnp.int32)

    center_spec = pl.BlockSpec(
        (b, tile_n), lambda j, ids: (0, ids[j]), memory_space=pltpu.VMEM
    )
    slab_spec = pl.BlockSpec(
        (m, tile_n), lambda j, ids: (0, ids[j]), memory_space=pltpu.VMEM
    )
    st_spec = pl.BlockSpec(
        (2, t_total), lambda j, ids: (0, 0), memory_space=pltpu.SMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_j,),  # dynamic: exactly the active stripes
        in_specs=[center_spec] * nf + [slab_spec] * (2 * nf) + [st_spec],
        out_specs=[center_spec] * nf + [st_spec],
    )
    kw = {} if vma is None else {"vma": frozenset(vma)}
    aliases = {i + 1: i for i in range(nf)}
    aliases[1 + 3 * nf] = nf
    outs = pl.pallas_call(
        functools.partial(
            _frontier_shard_window_kernel_packed, nf, m, b, t_total
        ),
        grid_spec=grid_spec,
        out_shape=(
            *(jax.ShapeDtypeStruct((b, n), jnp.int32, **kw) for _ in range(nf)),
            jax.ShapeDtypeStruct((2, t_total), jnp.int32, **kw),
        ),
        input_output_aliases=aliases,
        interpret=interpret,
    )(ids_full, *block, *tops, *bottoms, stats_in)
    return type(block)(*outs[:nf]), outs[nf]


def _compact_counts_window_kernel(m: int, t_total: int, stats_ref, ids_ref):
    """Agreed [2, t_total] window stats (psum'd changed counts, pmax'd
    last-change rounds) → the [t_total + 3] fused ids layout: a stripe
    stays dirty IFF it still changed at round m (quiet-round theorem: a
    round that changes nothing in a slot column proves the column's fixed
    point); [t_total+1] totals changed ENTRIES (the window path cannot
    count per-round change events — documented stats caveat) and
    [t_total+2] the max last-change round — exactly what
    frontier_fused_loop reconstructs classic round counts from."""
    import jax.experimental.pallas as pl

    def body(t, carry):
        k, total, max_last = carry
        last = stats_ref[1, t]

        @pl.when(last == m)
        def _():
            ids_ref[0, k] = t

        return (
            k + jnp.where(last == m, 1, 0).astype(jnp.int32),
            total + stats_ref[0, t],
            jnp.maximum(max_last, last),
        )

    k, total, max_last = jax.lax.fori_loop(
        0, t_total, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    )
    ids_ref[0, t_total] = k
    ids_ref[0, t_total + 1] = total
    ids_ref[0, t_total + 2] = max_last


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def compact_counts_window_packed(stats, m: int, interpret: bool = False):
    """[2, t_total] agreed window stats → [t_total + 3] fused ids array
    (window twin of compact_counts_multiround_packed)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_total = stats.shape[1]
    out = pl.pallas_call(
        functools.partial(_compact_counts_window_kernel, m, t_total),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(
                (2, t_total), lambda i: (0, 0), memory_space=pltpu.SMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, t_total + 3), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, t_total + 3), jnp.int32),
        interpret=interpret,
    )(stats)
    return out[0]


# live [L, tile] int32 arrays the window-frontier body holds at once:
# ext(nf) + shifted(nf) + orig(nf) + dist + cand, plus compiler slack
_WINDOW_FRONTIER_VMEM = 6 << 20  # bytes; hardware-validated (see docs)


def window_frontier_params(nf: int, b: int, n: int):
    """(m, tile_n) for the SPMD window frontier, or (0, 0) if unsupported.

    m is the deepest of {63, 31, 15} with m ≤ b (slabs come from ONE
    neighbor) such that the body's live arrays fit the VMEM budget at
    some 128-aligned tile dividing n. Both the fused body and the
    single-round tail must use the SAME tile (one ids array drives both),
    so the tile is returned for the caller to thread through."""
    if b % 8 or n % 128 or b < 8:
        return 0, 0
    arrays = 3 * nf + 2
    for m in (63, 31, 15):
        if m > b:
            continue
        budget_rows = arrays * (b + 2 * m) * 4
        tile = min(max(128, (_WINDOW_FRONTIER_VMEM // budget_rows)
                        // 128 * 128), n)
        while tile >= 128 and n % tile:
            tile -= 128
        if tile >= 128 and n % tile == 0:
            return m, tile
    return 0, 0


# ------------------------------------------------------------ halo (big P)


def _halo_round_kernel_packed(nf: int, wrap: bool, tile_p: int,
                              num_peers: int, *refs):
    """In-place halo variant for P beyond the full-P stripe limit.

    The center blocks alias their outputs (in-place in HBM), which makes
    reading neighbor rows from adjacent center tiles UNSAFE — the TPU grid
    is sequential and tile i-1's rows are already overwritten when tile i
    runs. Instead, the pre-round boundary rows (rows k*tile_p - 1 and
    k*tile_p for every tile k) are snapshotted into a small scratch before
    the kernel; halos read the scratch, never other tiles."""
    import jax.experimental.pallas as pl

    c_refs = refs[:nf]
    t_refs = refs[nf:2 * nf]  # [8, tile_n] pre-round rows above this tile (row 7 = adjacent)
    b_refs = refs[2 * nf:3 * nf]  # [8, tile_n] pre-round rows below this tile (row 0 = adjacent)
    out_refs, count_ref = refs[3 * nf:4 * nf], refs[4 * nf]

    i = pl.program_id(0)
    m2, c = _merge_stripe_halo(
        [r[...] for r in c_refs], t_refs, b_refs, wrap, tile_p, num_peers, i
    )
    for out, v in zip(out_refs, m2):
        out[...] = v

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        count_ref[0, 0] = 0

    count_ref[0, 0] += c


def _halo_tiles_packed(p: int, n: int) -> Tuple[int, int]:
    """(tile_p, tile_n): 8-aligned tile_p dividing p, 128-aligned tile_n
    dividing n, tile_p*tile_n within the VMEM budget; (0, 0) if impossible.

    tile_p is maximized (tile_n kept small): the boundary snapshot costs
    16 * (p / tile_p) rows of [n] PER ROUND, so fewer, taller tiles keep
    the scratch gather small (tile_p=1024 → 3% of the table; tile_p=64
    would be 50%)."""
    tile_n = 0
    t = min(256, n)
    t = t // 128 * 128
    while t >= 128 and n % t:
        t -= 128
    if t >= 128 and n % t == 0:
        tile_n = t
    if not tile_n:
        return 0, 0
    target_p = max(8, (_STRIPE_MAX_ELEMS) // tile_n // 8 * 8)
    tile_p = 0
    cand = 8
    while cand <= min(p, target_p):
        if p % cand == 0:
            tile_p = cand
        cand += 8
    return (tile_p, tile_n) if tile_p else (0, 0)


def packed_halo_supported(p: int, n: int) -> bool:
    if p % 8 or n % 128:
        return False
    tile_p, tile_n = _halo_tiles_packed(p, n)
    return tile_p > 0 and p // tile_p >= 2


@functools.partial(jax.jit, static_argnames=("wrap", "interpret"))
def _halo_round_packed_jit(table, wrap: bool, interpret: bool):
    return halo_round_packed_traced(table, wrap, interpret)


def halo_round_packed_traced(
    table: PackedTable, wrap: bool, interpret: bool
) -> Tuple[PackedTable, jax.Array]:
    """In-place ring/chain round for any 8-aligned P: boundary-row snapshot
    (2 rows per tile) + halo kernel whose center blocks alias their outputs.
    Extra traffic ≈ 2/tile_p of the table per round."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = len(table)
    p, n = table[0].shape
    tile_p, tile_n = _halo_tiles_packed(p, n)
    tiles = p // tile_p
    # pre-round boundary snapshot: the 8 rows above and below each tile
    # (Mosaic needs 8-row sublane blocks; only rows 7 / 0 are consumed)
    tops, bottoms = _halo_boundary_snapshots(table, tiles, tile_p, n)

    grid = (tiles, n // tile_n)
    center_spec = pl.BlockSpec(
        (tile_p, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec(
        (8, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    count_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((p, n), jnp.int32) for _ in range(nf)
    ) + (jax.ShapeDtypeStruct((1, 1), jnp.int32),)
    outs = pl.pallas_call(
        functools.partial(_halo_round_kernel_packed, nf, wrap, tile_p, p),
        grid=grid,
        in_specs=[center_spec] * nf + [halo_spec] * (2 * nf),
        out_specs=tuple([center_spec] * nf) + (count_spec,),
        out_shape=out_shapes,
        input_output_aliases={i: i for i in range(nf)},
        interpret=interpret,
    )(*table, *tops, *bottoms)
    return type(table)(*outs[:nf]), outs[nf][0, 0]


def ring_round_packed_pallas(
    table: PackedTable, wrap: bool = True, interpret: bool | None = None
) -> Tuple[PackedTable, jax.Array]:
    """One fused ring/chain round, 24 B/entry of HBM traffic (12 read +
    12 written in place). Check ``packed_ring_supported`` first."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _ring_round_packed_jit(table, wrap, interpret)


@functools.partial(jax.jit, static_argnames=("wrap", "interpret"))
def _ring_round_packed_jit(
    table: PackedTable, wrap: bool, interpret: bool
) -> Tuple[PackedTable, jax.Array]:
    # NOT donated: standalone callers (e.g. converged() probing a scratch
    # round) keep their table; loops that need in-place rounds trace
    # ring_round_packed_traced inside their own donated carry instead
    return ring_round_packed_traced(table, wrap, interpret)


# ----------------------------------------------------------- convergence


def gossip_round_packed(
    table: PackedTable,
    topology,
    use_pallas: bool | None = None,
    mesh=None,
) -> Tuple[PackedTable, jax.Array]:
    """One packed round for any topology (Pallas fused ring/chain on a
    single TPU; explicit shard_map ppermute for ring/chain on a mesh; XLA
    with inferred collectives otherwise)."""
    if mesh is not None and topology.kind in ("ring", "chain"):
        from ..parallel.shardmap_gossip import ring_round_shardmap_packed

        return ring_round_shardmap_packed(
            table, mesh, wrap=topology.kind == "ring"
        )
    p, n = table[0].shape
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and mesh is None
            and len(table[-1].devices()) == 1
            and topology.kind in ("ring", "chain")
            and (packed_ring_supported(p, n) or packed_halo_supported(p, n))
        )
    if use_pallas and topology.kind in ("ring", "chain"):
        if packed_ring_supported(p, n):
            return ring_round_packed_pallas(table, wrap=topology.kind == "ring")
        if packed_halo_supported(p, n):
            return _halo_round_packed_jit(
                table, topology.kind == "ring",
                jax.default_backend() != "tpu",
            )
    return _gossip_round_packed_jit(
        table, jnp.asarray(topology.neighbors), topology.kind
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "kind", "max_rounds", "use_pallas", "spmd_mesh", "topo_name", "hub"
    ),
    donate_argnums=(0,),
)
def gossip_until_converged_packed(
    table: PackedTable,
    neighbors: jax.Array,
    kind: str,
    max_rounds: int,
    use_pallas: bool = False,
    spmd_mesh=None,
    topo_name: str = "",
    hub: int = 0,
) -> Tuple[PackedTable, jax.Array]:
    """Packed convergence loop: compiled while_loop, donated carry — the
    north-star shape runs with a single table-sized HBM allocation. With
    ``spmd_mesh`` the body is the explicit shard_map collective for the
    topology family (ppermute ring/chain, recursive-doubling mesh,
    lattice+hub star when ``topo_name`` says so, masked all_gather
    otherwise) — the packed twin of the dense dispatch."""

    def round_fn(tbl):
        if spmd_mesh is not None:
            from ..parallel import shardmap_gossip as smg

            if kind in ("ring", "chain"):
                return smg.ring_round_shardmap_packed(
                    tbl, spmd_mesh, wrap=kind == "ring"
                )
            if kind == "mesh":
                return smg.mesh_round_shardmap_packed(tbl, spmd_mesh)
            if topo_name == "star":
                return smg.star_round_shardmap_packed(
                    tbl, spmd_mesh, hub=hub
                )
            return smg.generic_round_shardmap_packed(
                tbl, neighbors, spmd_mesh
            )
        if use_pallas and kind in ("ring", "chain"):
            p, n = tbl[0].shape
            interp = jax.default_backend() != "tpu"
            if packed_ring_supported(p, n):
                return ring_round_packed_traced(tbl, kind == "ring", interp)
            if packed_halo_supported(p, n):
                return halo_round_packed_traced(tbl, kind == "ring", interp)
        return _gossip_round_packed_jit(tbl, neighbors, kind)

    def cond(state):
        _, rounds, last_changed = state
        return (rounds < max_rounds) & (last_changed > 0)

    def body(state):
        tbl, rounds, _ = state
        tbl, changed = round_fn(tbl)
        return tbl, rounds + 1, changed

    table, rounds, last_changed = jax.lax.while_loop(
        cond, body, (table, jnp.int32(0), jnp.int32(1))
    )
    return table, rounds, last_changed
