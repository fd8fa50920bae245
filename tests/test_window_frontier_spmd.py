"""Distance-exact SPMD WINDOW frontier (VERDICT r4 item 2): m gossip
rounds per collective round-trip via one m-row slab ppermute + a local
radius-m window join with exact per-entry last-change tracking
(s ≤ r+1 distance composition, ops/packed.py _window_dist_chain).

Contract pinned here (interpret mode on the virtual CPU mesh): state AND
classic round count AND cutoff residuals bit-match both the unsharded
classic loop and the single-round SPMD loop, on ring and chain, from
all-dirty and sparse seeds, across window depths."""

import os

import numpy as np
import pytest

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bullet_tpu.ops.packed import (
    PackedTable,
    gossip_until_converged_packed,
    window_frontier_params,
)
from bullet_tpu.ops.rank import Rank1Table, RankTable
from bullet_tpu.parallel import topology as topo
from bullet_tpu.parallel.mesh import PEER_AXIS
from bullet_tpu.parallel.shardmap_gossip import (
    gossip_frontier_shardmap_packed,
)

needs_devices = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs a multi-device mesh"
)


def _mesh(d):
    return Mesh(np.array(jax.devices()[:d]), (PEER_AXIS,))


def _rand_packed(rng, p, n):
    khi = rng.integers(-1000, 1000, size=(p, n)).astype(np.int32)
    klo = rng.integers(-1000, 1000, size=(p, n)).astype(np.int32)
    cls = rng.integers(0, 4, size=(p, n)).astype(np.int32)
    cv = ((cls << 28) | rng.integers(0, 100, size=(p, n))).astype(np.int32)
    absent = cls == 0
    khi[absent] = 0
    klo[absent] = 0
    cv[absent] = 0
    return khi, klo, cv


def _rand_rank1(rng, p, n):
    rank = rng.integers(0, 50, size=(p, n)).astype(np.int32)
    return (rank,)


def _sharded(fields, tcls, mesh):
    shard = NamedSharding(mesh, P(PEER_AXIS, None))
    return tcls(*(jax.device_put(jnp.array(f), shard) for f in fields))


@needs_devices
@pytest.mark.parametrize("wrap", [True, False])
@pytest.mark.parametrize("m_win", [3, 5, 8])
def test_window_frontier_matches_classic_and_single_round(wrap, m_win):
    p, n, d, tile = 32, 4096, 4, 512
    t_total = n // tile
    rng = np.random.default_rng(100 + m_win)
    fields = _rand_packed(rng, p, n)
    kind = "ring" if wrap else "chain"
    nb = jnp.asarray(getattr(topo, kind)(p).neighbors)
    want, r_want, res_want = gossip_until_converged_packed(
        PackedTable(*(jnp.array(f) for f in fields)), nb, kind, p + 2
    )
    mesh = _mesh(d)
    got, r_got, c_got = gossip_frontier_shardmap_packed(
        _sharded(fields, PackedTable, mesh),
        jnp.ones(t_total, dtype=jnp.bool_), mesh, wrap, p + 2,
        interpret=True, window_fuse=m_win, window_tile=tile,
    )
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(r_want) == int(r_got)
    assert int(res_want) == int(c_got) == 0


@needs_devices
@pytest.mark.parametrize("layout", ["rank", "rank1"])
def test_window_frontier_rank_layouts(layout):
    """Layout-generic: the 1- and 2-field rank layouts drive the same
    kernel through table_keys."""
    p, n, d, tile, m_win = 32, 2048, 4, 256, 5
    t_total = n // tile
    rng = np.random.default_rng(7)
    if layout == "rank1":
        fields = _rand_rank1(rng, p, n)
        tcls = Rank1Table
    else:
        rank = rng.integers(0, 50, size=(p, n)).astype(np.int32)
        cv = np.where(rank > 0, (2 << 28) | 5, 0).astype(np.int32)
        fields = (rank, cv)
        tcls = RankTable
    nb = jnp.asarray(topo.ring(p).neighbors)
    want, r_want, _ = gossip_until_converged_packed(
        tcls(*(jnp.array(f) for f in fields)), nb, "ring", p + 2
    )
    mesh = _mesh(d)
    got, r_got, c_got = gossip_frontier_shardmap_packed(
        _sharded(fields, tcls, mesh),
        jnp.ones(t_total, dtype=jnp.bool_), mesh, True, p + 2,
        interpret=True, window_fuse=m_win, window_tile=tile,
    )
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(r_want) == int(r_got)
    assert int(c_got) == 0


@needs_devices
def test_window_frontier_sparse_seed_and_exact_rounds():
    """From a converged table + one dirtied stripe: identical state, and
    the window loop reports the same round count as the single-round SPMD
    loop (exact reconstruction from in-window distances)."""
    p, n, d, tile, m_win = 32, 4096, 4, 512, 5
    t_total = n // tile
    rng = np.random.default_rng(78)
    fields = _rand_packed(rng, p, n)
    nb = jnp.asarray(topo.ring(p).neighbors)
    base, _, _ = gossip_until_converged_packed(
        PackedTable(*(jnp.array(f) for f in fields)), nb, "ring", p + 2
    )
    upd = base._replace(
        cv=base.cv.at[3, tile + 9].set((2 << 28) | 77),
        khi=base.khi.at[3, tile + 9].set(10**9),
    )
    want, r_want, _ = gossip_until_converged_packed(
        PackedTable(*(jnp.array(f) for f in upd)), nb, "ring", p + 2
    )
    mesh = _mesh(d)
    dirty = jnp.zeros(t_total, dtype=jnp.bool_).at[1].set(True)
    got1, r1, _ = gossip_frontier_shardmap_packed(
        _sharded(tuple(upd), PackedTable, mesh), dirty, mesh, True, p + 2,
        interpret=True,
    )
    gotw, rw, cw = gossip_frontier_shardmap_packed(
        _sharded(tuple(upd), PackedTable, mesh), dirty, mesh, True, p + 2,
        interpret=True, window_fuse=m_win, window_tile=tile,
    )
    for a, b in zip(want, gotw):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(r_want) == int(r1) == int(rw)
    assert int(cw) == 0


@needs_devices
@pytest.mark.parametrize("max_rounds", [1, 3, 7, 11, 14])
def test_window_frontier_cutoff_residuals(max_rounds):
    """max_rounds cutoffs anywhere (mid-window or in the tail) report the
    EXACT classic state, round count, and last-round residual — the fused
    phase stops strictly before max_rounds, so cutoffs end in the
    single-round tail."""
    p, n, d, tile, m_win = 32, 2048, 4, 256, 5
    t_total = n // tile
    rng = np.random.default_rng(9)
    fields = _rand_packed(rng, p, n)
    nb = jnp.asarray(topo.ring(p).neighbors)
    want, r_want, res_want = gossip_until_converged_packed(
        PackedTable(*(jnp.array(f) for f in fields)), nb, "ring", max_rounds
    )
    mesh = _mesh(d)
    got, r_got, c_got = gossip_frontier_shardmap_packed(
        _sharded(fields, PackedTable, mesh),
        jnp.ones(t_total, dtype=jnp.bool_), mesh, True, max_rounds,
        interpret=True, window_fuse=m_win, window_tile=tile,
    )
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(r_want) == int(r_got)
    assert int(res_want) == int(c_got)


@needs_devices
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_window_frontier_fuzz(seed):
    """Random tables, random depth/shape cells, ring+chain — state, round
    count, residual all bit-match the classic loop."""
    rng = np.random.default_rng(1000 + seed)
    p, d = 32, 4
    n = int(rng.choice([1024, 2048]))
    tile = 256
    m_win = int(rng.choice([2, 4, 6, 8]))
    t_total = n // tile
    fields = _rand_packed(rng, p, n)
    wrap = bool(rng.integers(2))
    kind = "ring" if wrap else "chain"
    nb = jnp.asarray(getattr(topo, kind)(p).neighbors)
    want, r_want, _ = gossip_until_converged_packed(
        PackedTable(*(jnp.array(f) for f in fields)), nb, kind, p + 2
    )
    mesh = _mesh(d)
    got, r_got, c_got = gossip_frontier_shardmap_packed(
        _sharded(fields, PackedTable, mesh),
        jnp.ones(t_total, dtype=jnp.bool_), mesh, wrap, p + 2,
        interpret=True, window_fuse=m_win, window_tile=tile,
    )
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(r_want) == int(r_got)
    assert int(c_got) == 0


def test_window_frontier_params_geometry():
    """The production chooser: m ≤ block rows, tile 128-aligned dividing
    n, deepest depth that fits the budget; unsupported shapes -> (0, 0)."""
    m, tile = window_frontier_params(3, 128, 1 << 20)
    assert m in (63, 31, 15) and tile >= 128 and (1 << 20) % tile == 0
    m1, tile1 = window_frontier_params(1, 128, 1 << 20)
    assert m1 == 63 and tile1 >= tile  # 1-field layout affords more
    assert window_frontier_params(3, 8, 1 << 20) == (0, 0)  # m > block rows
    assert window_frontier_params(3, 12, 1 << 20) == (0, 0)  # non-8-aligned
    assert window_frontier_params(3, 128, 100) == (0, 0)  # non-128 n
