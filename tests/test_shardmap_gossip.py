"""Explicit shard_map+ppermute gossip vs the unsharded kernels: bit-identity
on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bullet_tpu.models.netsim import PeerNetworkSim
from bullet_tpu.ops.merge import TableState, init_table
from bullet_tpu.parallel import topology as topo
from bullet_tpu.parallel.gossip import gossip_round_chain, gossip_round_ring
from bullet_tpu.parallel.mesh import make_mesh, shard_table
from bullet_tpu.parallel.shardmap_gossip import ring_round_shardmap

needs_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def random_table(p, n, seed=0):
    """Random but sim-realistic table: absent entries (cls=0) carry all-zero
    fields, as init_table/apply_ops guarantee. (Garbage keys in absent slots
    would expose a harmless masking quirk: gossip_round_generic's zeroed
    padding rows normalize negative-key absent entries, the star collective
    doesn't — unreachable state either way.)"""
    rng = np.random.default_rng(seed)

    def arr(lo, hi):
        return jnp.asarray(rng.integers(lo, hi, (p, n), dtype=np.int32))

    cls = arr(0, 4)
    present = cls > 0
    z = jnp.zeros((p, n), dtype=jnp.int32)

    def masked(a):
        return jnp.where(present, a, z)

    return TableState(
        cls,
        masked(arr(-50, 50)),
        masked(arr(-50, 50)),
        masked(arr(0, 30)),
        masked(arr(0, p)),
        masked(arr(0, 9)),
        masked(arr(0, 5)),
    )


@needs_devices
@pytest.mark.parametrize("mode", ["reference", "lww"])
@pytest.mark.parametrize("wrap", [True, False])
def test_shardmap_matches_xla(mode, wrap):
    t = random_table(16, 128)
    mesh = make_mesh()
    sharded = shard_table(t, mesh)
    ref_fn = gossip_round_ring if wrap else gossip_round_chain
    expected, c_ref = ref_fn(t, mode)
    got, c_got = ring_round_shardmap(sharded, mesh, mode=mode, wrap=wrap)
    for a, b in zip(expected, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(c_ref) == int(c_got)


@needs_devices
def test_sim_with_shard_map_converges_identically():
    def run(**kw):
        sim = PeerNetworkSim(16, capacity=64, topology="ring", **kw)
        rng = np.random.default_rng(3)
        for _ in range(40):
            sim.put(int(rng.integers(16)), f"k/v{int(rng.integers(6))}", int(rng.integers(1000)))
        while sim.step(rounds=1) > 0:
            pass
        return [np.asarray(f) for f in sim.table]

    plain = run()
    spmd = run(mesh_devices=8, use_shard_map=True)
    for a, b in zip(plain, spmd):
        np.testing.assert_array_equal(a, b)


@needs_devices
def test_shardmap_chain_edges():
    """Chain edge devices must not receive wrapped boundary rows."""
    t = init_table(16, 128)
    t = t._replace(cls=t.cls.at[15, 0].set(2), vid=t.vid.at[15, 0].set(9),
                   khi=t.khi.at[15, 0].set(5))
    mesh = make_mesh()
    sharded = shard_table(t, mesh)
    out, _ = ring_round_shardmap(sharded, mesh, wrap=False)
    assert int(out.vid[0, 0]) == 0  # no wraparound from peer 15 to peer 0
    out2, _ = ring_round_shardmap(sharded, mesh, wrap=True)
    assert int(out2.vid[0, 0]) == 9  # ring wraps


def test_multihost_helpers_single_process():
    from bullet_tpu.parallel import multihost

    assert multihost.is_multihost() is False
    info = multihost.host_info()
    assert info["process_count"] == 1
    assert info["global_devices"] >= 1


# ------------------------------------------- mesh / star / bridge (VERDICT r1)


@needs_devices
@pytest.mark.parametrize("mode", ["reference", "lww"])
def test_shardmap_mesh_matches_xla(mode):
    from bullet_tpu.parallel.gossip import gossip_round_mesh
    from bullet_tpu.parallel.shardmap_gossip import mesh_round_shardmap

    t = random_table(16, 128, seed=5)
    mesh = make_mesh()
    expected, c_ref = gossip_round_mesh(t, mode)
    got, c_got = mesh_round_shardmap(shard_table(t, mesh), mesh, mode=mode)
    for a, b in zip(expected, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(c_ref) == int(c_got)


@needs_devices
@pytest.mark.parametrize("mode", ["reference", "lww"])
@pytest.mark.parametrize("hub", [0, 5, 15])
def test_shardmap_star_matches_generic(mode, hub):
    from bullet_tpu.parallel.gossip import gossip_round_generic
    from bullet_tpu.parallel.shardmap_gossip import star_round_shardmap

    t = random_table(16, 128, seed=7 + hub)
    star = topo.star(16, hub=hub)
    mesh = make_mesh()
    expected, c_ref = gossip_round_generic(t, jnp.asarray(star.neighbors), mode)
    got, c_got = star_round_shardmap(shard_table(t, mesh), mesh, mode=mode, hub=hub)
    for a, b in zip(expected, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # change counts are order-dependent for multi-source merges; only the
    # zero/nonzero signal must agree (it drives the convergence loop)
    assert (int(c_ref) > 0) == (int(c_got) > 0)


@needs_devices
@pytest.mark.parametrize("mode", ["reference", "lww"])
@pytest.mark.parametrize("make_topo", [
    lambda: topo.bridge((3, 4), 1),
    lambda: topo.random_graph(16, 3, seed=11),
    lambda: topo.ring(16).drop_links([(3, 4)]),
])
def test_shardmap_generic_matches_xla(mode, make_topo):
    from bullet_tpu.parallel.gossip import gossip_round_generic
    from bullet_tpu.parallel.shardmap_gossip import generic_round_shardmap

    t_opo = make_topo()
    p = t_opo.num_peers
    if p % 8:  # pad rows to the mesh like the sim does
        pad = 8 - p % 8
        arr = np.full((p + pad, t_opo.neighbors.shape[1]), -1, dtype=np.int32)
        arr[:p] = t_opo.neighbors
        neighbors = arr
        p += pad
    else:
        neighbors = t_opo.neighbors
    t = random_table(p, 128, seed=13)
    mesh = make_mesh()
    nb = jnp.asarray(neighbors)
    expected, c_ref = gossip_round_generic(t, nb, mode)
    got, c_got = generic_round_shardmap(shard_table(t, mesh), nb, mesh, mode=mode)
    for a, b in zip(expected, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(c_ref) == int(c_got)


@needs_devices
@pytest.mark.parametrize("topology", ["mesh", "star", "bridge"])
def test_sim_shard_map_all_topologies_converge(topology):
    """End-to-end: sharded sim with explicit SPMD rounds reaches the same
    fixed point as the unsharded sim for every topology family."""
    def run(**kw):
        sim = PeerNetworkSim(16, capacity=64, topology=topology, **kw)
        rng = np.random.default_rng(17)
        for _ in range(40):
            sim.put(int(rng.integers(16)), f"k/v{int(rng.integers(6))}",
                    int(rng.integers(1000)))
        sim.run_until_converged()
        assert sim.tables_equal()
        return [np.asarray(f) for f in sim.table]

    plain = run()
    spmd = run(mesh_devices=8, use_shard_map=True)
    for a, b in zip(plain, spmd):
        np.testing.assert_array_equal(a, b)


@needs_devices
@pytest.mark.parametrize("wrap", [True, False])
def test_frontier_shardmap_bitidentical(wrap):
    """Sharded frontier loop (per-device Pallas frontier kernel + boundary
    ppermute + psum'd dirty flags) reaches the exact fixed point in the
    exact round count of the unsharded classic loop."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bullet_tpu.ops.packed import (
        PackedTable,
        frontier_tile_n_sharded,
        gossip_until_converged_packed,
    )
    from bullet_tpu.parallel.mesh import PEER_AXIS
    from bullet_tpu.parallel.shardmap_gossip import (
        gossip_frontier_shardmap_packed,
    )

    p, n, d = 32, 32768, 4
    tile = frontier_tile_n_sharded(p, n, d)
    t_total = n // tile
    assert t_total >= 2

    rng = np.random.default_rng(77)
    khi = rng.integers(-1000, 1000, size=(p, n)).astype(np.int32)
    klo = rng.integers(-1000, 1000, size=(p, n)).astype(np.int32)
    cls = rng.integers(0, 4, size=(p, n)).astype(np.int32)
    cv = ((cls << 28) | rng.integers(0, 100, size=(p, n))).astype(np.int32)
    absent = cls == 0
    khi[absent] = 0
    klo[absent] = 0
    cv[absent] = 0

    kind = "ring" if wrap else "chain"
    nb = jnp.asarray(getattr(topo, kind)(p).neighbors)
    want, r_want, _ = gossip_until_converged_packed(
        PackedTable(*(jnp.array(f) for f in (khi, klo, cv))), nb, kind, p + 2
    )
    mesh = make_mesh(d)
    shard = NamedSharding(mesh, P(PEER_AXIS, None))
    tbl = PackedTable(
        *(jax.device_put(jnp.array(f), shard) for f in (khi, klo, cv))
    )
    got, r_got, c_got = gossip_frontier_shardmap_packed(
        tbl, jnp.ones(t_total, dtype=jnp.bool_), mesh, wrap, p + 2,
        interpret=True,
    )
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(r_want) == int(r_got)
    assert int(c_got) == 0


@needs_devices
def test_frontier_shardmap_sparse_seed():
    """From a converged sharded table, dirtying one stripe converges with
    only that frontier marked — same state as the classic loop."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bullet_tpu.ops.packed import (
        PackedTable,
        frontier_tile_n_sharded,
        gossip_until_converged_packed,
    )
    from bullet_tpu.parallel.mesh import PEER_AXIS
    from bullet_tpu.parallel.shardmap_gossip import (
        gossip_frontier_shardmap_packed,
    )

    p, n, d = 32, 32768, 4
    tile = frontier_tile_n_sharded(p, n, d)
    t_total = n // tile
    nb = jnp.asarray(topo.ring(p).neighbors)
    rng = np.random.default_rng(78)
    khi = rng.integers(-1000, 1000, size=(p, n)).astype(np.int32)
    klo = np.zeros((p, n), dtype=np.int32)
    cv = np.full((p, n), (2 << 28) | 5, dtype=np.int32)
    base = PackedTable(*(jnp.array(f) for f in (khi, klo, cv)))
    base, _, _ = gossip_until_converged_packed(base, nb, "ring", p + 2)
    upd = base._replace(
        cv=base.cv.at[3, tile + 9].set((2 << 28) | 77),
        khi=base.khi.at[3, tile + 9].set(10**9),
    )
    want, _, _ = gossip_until_converged_packed(
        PackedTable(*(jnp.array(f) for f in upd)), nb, "ring", p + 2
    )
    mesh = make_mesh(d)
    shard = NamedSharding(mesh, P(PEER_AXIS, None))
    tbl = PackedTable(*(jax.device_put(jnp.array(f), shard) for f in upd))
    dirty = jnp.zeros(t_total, dtype=jnp.bool_).at[1].set(True)
    got, rounds, _ = gossip_frontier_shardmap_packed(
        tbl, dirty, mesh, True, p + 2, interpret=True
    )
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(rounds) >= 1

    # FUSED loop from the same sparse seed: same state, same round count
    from bullet_tpu.ops.packed import HALO_FUSE

    tbl2 = PackedTable(*(jax.device_put(jnp.array(f), shard) for f in upd))
    got_f, rounds_f, _ = gossip_frontier_shardmap_packed(
        tbl2, dirty, mesh, True, p + 2, interpret=True, fuse=HALO_FUSE
    )
    for a, b in zip(want, got_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(rounds_f) == int(rounds)


@needs_devices
def test_sim_packed_shardmap_frontier_with_seeding():
    """Sim-level: the sharded packed sim picks the frontier loop (use_pallas
    opt-in on CPU), converges identically to an unsharded sim, and keeps
    the incremental dirty-stripe seeding across convergences."""
    def build(**kw):
        sim = PeerNetworkSim(
            32, capacity=32768, topology="ring", layout="packed", **kw
        )
        rng = np.random.default_rng(79)
        for _ in range(40):
            sim.put(int(rng.integers(32)), f"k/v{int(rng.integers(12))}",
                    int(rng.integers(1000)))
        return sim

    plain = build(use_pallas=False)
    plain.run_until_converged()
    sharded = build(mesh_devices=4, use_shard_map=True, use_pallas=True)
    assert sharded._frontier_tile() > 0
    sharded.run_until_converged()
    assert sharded.tables_equal()
    assert sharded._frontier_dirty is not None
    assert not sharded._frontier_dirty.any()
    for f_a, f_b in zip(plain.table, sharded.table):
        np.testing.assert_array_equal(np.asarray(f_a), np.asarray(f_b))

    # incremental: new op seeds only its stripe, still converges right
    sharded.put(7, "k/v3", 10_000)
    plain.put(7, "k/v3", 10_000)
    sharded.run_until_converged()
    plain.run_until_converged()
    assert sharded.tables_equal()
    assert sharded.get(0, "k/v3") == 10_000
    for f_a, f_b in zip(plain.table, sharded.table):
        np.testing.assert_array_equal(np.asarray(f_a), np.asarray(f_b))


@needs_devices
@pytest.mark.parametrize("wrap", [True, False])
def test_frontier_shardmap_fused_parity(wrap):
    """The FUSED spmd frontier (HALO_FUSE=8 rounds per collective via
    8-row boundary ppermute + trapezoidal time-tiling) must bit-match the
    unsharded classic loop in state, round count, and residual — including
    max_rounds cutoffs landing mid-fuse-block and mid-tail."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bullet_tpu.ops.packed import (
        HALO_FUSE,
        PackedTable,
        frontier_tile_n_sharded,
        gossip_until_converged_packed,
    )
    from bullet_tpu.parallel.mesh import PEER_AXIS
    from bullet_tpu.parallel.shardmap_gossip import (
        gossip_frontier_shardmap_packed,
    )

    p, n, d = 32, 32768, 4
    tile = frontier_tile_n_sharded(p, n, d)
    t_total = n // tile
    assert t_total >= 2

    rng = np.random.default_rng(99)
    khi = rng.integers(-1000, 1000, size=(p, n)).astype(np.int32)
    klo = rng.integers(-1000, 1000, size=(p, n)).astype(np.int32)
    cls = rng.integers(0, 4, size=(p, n)).astype(np.int32)
    cv = ((cls << 28) | rng.integers(0, 100, size=(p, n))).astype(np.int32)
    absent = cls == 0
    khi[absent] = 0
    klo[absent] = 0
    cv[absent] = 0

    kind = "ring" if wrap else "chain"
    nb = jnp.asarray(getattr(topo, kind)(p).neighbors)
    mesh = make_mesh(d)
    shard = NamedSharding(mesh, P(PEER_AXIS, None))

    # p+2 converges; 7 cuts mid-first-fuse-block; 12 cuts mid-tail
    for max_rounds in (p + 2, 7, 12):
        want, r_want, c_want = gossip_until_converged_packed(
            PackedTable(*(jnp.array(f) for f in (khi, klo, cv))), nb, kind,
            max_rounds,
        )
        tbl = PackedTable(
            *(jax.device_put(jnp.array(f), shard) for f in (khi, klo, cv))
        )
        got, r_got, c_got = gossip_frontier_shardmap_packed(
            tbl, jnp.ones(t_total, dtype=jnp.bool_), mesh, wrap, max_rounds,
            interpret=True, fuse=HALO_FUSE,
        )
        for a, b in zip(want, got):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), (wrap, max_rounds))
        assert int(r_want) == int(r_got), (
            wrap, max_rounds, int(r_want), int(r_got))
        assert int(c_want) == int(c_got), (
            wrap, max_rounds, int(c_want), int(c_got))

    # empty frontier: zero rounds, zero residual, untouched table
    tbl = PackedTable(
        *(jax.device_put(jnp.array(f), shard) for f in (khi, klo, cv))
    )
    got, r, c = gossip_frontier_shardmap_packed(
        tbl, jnp.zeros(t_total, dtype=jnp.bool_), mesh, True, p + 2,
        interpret=True, fuse=HALO_FUSE,
    )
    assert int(r) == 0 and int(c) == 0
    for a, b in zip((khi, klo, cv), got):
        np.testing.assert_array_equal(a, np.asarray(b))


# -------------------- packed mesh / star / generic collectives (round 3)


def random_packed(p, n, seed=0):
    from bullet_tpu.ops.packed import PackedTable

    rng = np.random.default_rng(seed)
    cls = rng.integers(0, 4, size=(p, n)).astype(np.int32)
    present = cls > 0
    khi = np.where(present, rng.integers(-1000, 1000, (p, n)), 0)
    klo = np.where(present, rng.integers(-1000, 1000, (p, n)), 0)
    cv = np.where(present, (cls << 28) | rng.integers(0, 100, (p, n)), 0)
    return PackedTable(
        jnp.asarray(khi.astype(np.int32)),
        jnp.asarray(klo.astype(np.int32)),
        jnp.asarray(cv.astype(np.int32)),
    )


def shard_packed(t, mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bullet_tpu.ops.packed import PackedTable
    from bullet_tpu.parallel.mesh import PEER_AXIS

    s = NamedSharding(mesh, P(PEER_AXIS, None))
    return PackedTable(*(jax.device_put(f, s) for f in t))


@needs_devices
def test_shardmap_mesh_packed_matches_xla():
    from bullet_tpu.ops.packed import gossip_round_mesh_packed
    from bullet_tpu.parallel.shardmap_gossip import mesh_round_shardmap_packed

    t = random_packed(16, 128, seed=21)
    mesh = make_mesh()
    expected, c_ref = gossip_round_mesh_packed(t)
    got, c_got = mesh_round_shardmap_packed(shard_packed(t, mesh), mesh)
    for a, b in zip(expected, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(c_ref) == int(c_got)


@needs_devices
@pytest.mark.parametrize("hub", [0, 5, 15])
def test_shardmap_star_packed_matches_generic(hub):
    from bullet_tpu.ops.packed import gossip_round_generic_packed
    from bullet_tpu.parallel.shardmap_gossip import star_round_shardmap_packed

    t = random_packed(16, 128, seed=23 + hub)
    star = topo.star(16, hub=hub)
    mesh = make_mesh()
    expected, c_ref = gossip_round_generic_packed(
        t, jnp.asarray(star.neighbors)
    )
    got, c_got = star_round_shardmap_packed(
        shard_packed(t, mesh), mesh, hub=hub
    )
    for a, b in zip(expected, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # star count convention: zero/nonzero must agree (drives the loop)
    assert (int(c_ref) > 0) == (int(c_got) > 0)


@needs_devices
@pytest.mark.parametrize("make_topo", [
    lambda: topo.bridge((3, 4), 1),
    lambda: topo.random_graph(16, 3, seed=31),
    lambda: topo.ring(16).drop_links([(3, 4)]),
])
def test_shardmap_generic_packed_matches_xla(make_topo):
    from bullet_tpu.ops.packed import gossip_round_generic_packed
    from bullet_tpu.parallel.shardmap_gossip import (
        generic_round_shardmap_packed,
    )

    t_opo = make_topo()
    p = t_opo.num_peers
    if p % 8:
        pad = 8 - p % 8
        arr = np.full((p + pad, t_opo.neighbors.shape[1]), -1, dtype=np.int32)
        arr[:p] = t_opo.neighbors
        neighbors = arr
        p += pad
    else:
        neighbors = t_opo.neighbors
    t = random_packed(p, 128, seed=33)
    mesh = make_mesh()
    nb = jnp.asarray(neighbors)
    expected, c_ref = gossip_round_generic_packed(t, nb)
    got, c_got = generic_round_shardmap_packed(shard_packed(t, mesh), nb, mesh)
    for a, b in zip(expected, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(c_ref) == int(c_got)


@needs_devices
@pytest.mark.parametrize("topology", ["mesh", "star", "bridge"])
def test_sim_packed_shardmap_all_topologies(topology):
    """Sim-level: the packed sharded sim's per-topology collectives reach
    the same fixed point as the unsharded packed sim."""
    def run(**kw):
        sim = PeerNetworkSim(
            16, capacity=64, topology=topology, layout="packed", **kw
        )
        rng = np.random.default_rng(37)
        for _ in range(40):
            sim.put(int(rng.integers(sim.num_peers)),
                    f"k/v{int(rng.integers(6))}", int(rng.integers(1000)))
        sim.run_until_converged()
        assert sim.tables_equal()
        return [np.asarray(f) for f in sim.table]

    plain = run()
    spmd = run(mesh_devices=8, use_shard_map=True)
    for a, b in zip(plain, spmd):
        np.testing.assert_array_equal(a, b)


# --------------------------- dense spmd frontier (round 3)


@needs_devices
@pytest.mark.parametrize("wrap", [True, False])
@pytest.mark.parametrize("mode,lean", [
    ("reference", False), ("lww", False), ("reference", True),
])
def test_frontier_shardmap_dense_bitidentical(wrap, mode, lean):
    """Dense sharded frontier loop (per-device dense frontier kernel +
    boundary ppermute + psum'd counts + compaction kernel) reaches the
    exact fixed point in the exact round count of the unsharded classic
    dense loop, for full-metadata reference/lww and lean."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bullet_tpu.ops.ring_kernel import frontier_tile_n_dense_sharded
    from bullet_tpu.parallel.gossip import gossip_until_converged_device
    from bullet_tpu.parallel.mesh import PEER_AXIS
    from bullet_tpu.parallel.shardmap_gossip import (
        gossip_frontier_shardmap_dense,
    )

    p, n, d = 32, 16384, 4
    tile = frontier_tile_n_dense_sharded(p, n, d, lean)
    assert tile > 0
    t_total = n // tile

    t = random_table(p, n, seed=55)
    kind = "ring" if wrap else "chain"
    nb = jnp.asarray(getattr(topo, kind)(p).neighbors)
    want, r_want, c_want = gossip_until_converged_device(
        TableState(*(jnp.array(f) for f in t)), nb, kind, mode, p + 2,
        use_pallas=False, lean=lean,
    )
    mesh = make_mesh(d)
    shard = NamedSharding(mesh, P(PEER_AXIS, None))
    tbl = TableState(*(jax.device_put(jnp.array(f), shard) for f in t))
    got, r_got, c_got = gossip_frontier_shardmap_dense(
        tbl, jnp.ones(t_total, dtype=jnp.bool_), mesh, wrap, mode, lean,
        p + 2, interpret=True,
    )
    cmp_want = want[:4] if lean else tuple(want)
    cmp_got = got[:4] if lean else tuple(got)
    for name, a, b in zip(TableState._fields, cmp_want, cmp_got):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), (name, wrap, mode, lean))
    assert int(r_want) == int(r_got), (wrap, mode, lean)
    assert int(c_got) == 0
    if lean:
        # lean contract: writer/ctr/tick stay device-local and untouched
        for a, b in zip(t[4:], got[4:]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@needs_devices
def test_sim_dense_shardmap_frontier_matches_unsharded():
    """Sim-level: the dense sharded frontier sim converges identically to
    an unsharded dense sim (lww mode exercises clock sync too)."""
    def build(**kw):
        sim = PeerNetworkSim(
            32, capacity=16384, topology="ring", mode="lww", **kw
        )
        rng = np.random.default_rng(41)
        for _ in range(60):
            sim.put(int(rng.integers(32)), f"k/v{int(rng.integers(8))}",
                    int(rng.integers(1000)))
        return sim

    plain = build(use_pallas=False)
    plain.run_until_converged()
    sharded = build(mesh_devices=4, use_shard_map=True, use_pallas=True)
    assert sharded._convergence_strategy()[0] == "dense-frontier-spmd"
    sharded.run_until_converged()
    assert sharded.tables_equal()
    for f_a, f_b in zip(plain.table, sharded.table):
        np.testing.assert_array_equal(np.asarray(f_a), np.asarray(f_b))


@needs_devices
@pytest.mark.parametrize("wrap", [True, False])
@pytest.mark.parametrize("mode,lean", [
    ("reference", False), ("lww", False), ("reference", True),
])
def test_frontier_shardmap_dense_fused_parity(wrap, mode, lean):
    """The FUSED dense spmd frontier (HALO_FUSE=8 rounds per collective
    via full 8-row boundary ppermute + trapezoidal time-tiling) must
    bit-match the unsharded classic dense loop in state, round count, and
    residual — including max_rounds cutoffs landing mid-fuse-block and
    mid-tail (the dense twin of test_frontier_shardmap_fused_parity)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bullet_tpu.ops.packed import HALO_FUSE
    from bullet_tpu.ops.ring_kernel import frontier_tile_n_dense_sharded
    from bullet_tpu.parallel.gossip import gossip_until_converged_device
    from bullet_tpu.parallel.mesh import PEER_AXIS
    from bullet_tpu.parallel.shardmap_gossip import (
        gossip_frontier_shardmap_dense,
    )

    p, n, d = 32, 16384, 4
    tile = frontier_tile_n_dense_sharded(p, n, d, lean)
    assert tile > 0
    t_total = n // tile

    t = random_table(p, n, seed=71)
    kind = "ring" if wrap else "chain"
    nb = jnp.asarray(getattr(topo, kind)(p).neighbors)
    mesh = make_mesh(d)
    shard = NamedSharding(mesh, P(PEER_AXIS, None))

    # p+2 converges; 7 cuts mid-first-fuse-block; 12 cuts mid-tail.
    # Lean's baseline is the lean Pallas loop (use_pallas=lean): the XLA
    # loop always merges metadata, so its cutoff residuals count 6-key
    # wins the 4-key lean merge doesn't see (test_dense_frontier.py
    # convention).
    for max_rounds in (p + 2, 7, 12):
        want, r_want, c_want = gossip_until_converged_device(
            TableState(*(jnp.array(f) for f in t)), nb, kind, mode,
            max_rounds, use_pallas=lean, lean=lean,
        )
        tbl = TableState(
            *(jax.device_put(jnp.array(f), shard) for f in t)
        )
        got, r_got, c_got = gossip_frontier_shardmap_dense(
            tbl, jnp.ones(t_total, dtype=jnp.bool_), mesh, wrap, mode,
            lean, max_rounds, interpret=True, fuse=HALO_FUSE,
        )
        cmp_want = want[:4] if lean else tuple(want)
        cmp_got = got[:4] if lean else tuple(got)
        for name, a, b in zip(TableState._fields, cmp_want, cmp_got):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                (name, wrap, mode, lean, max_rounds))
        assert int(r_want) == int(r_got), (
            wrap, mode, lean, max_rounds, int(r_want), int(r_got))
        assert int(c_want) == int(c_got), (
            wrap, mode, lean, max_rounds, int(c_want), int(c_got))
        if lean:
            for a, b in zip(t[4:], got[4:]):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # empty frontier: zero rounds, zero residual, untouched table
    tbl = TableState(*(jax.device_put(jnp.array(f), shard) for f in t))
    got, r, c = gossip_frontier_shardmap_dense(
        tbl, jnp.zeros(t_total, dtype=jnp.bool_), mesh, True, mode, lean,
        p + 2, interpret=True, fuse=HALO_FUSE,
    )
    assert int(r) == 0 and int(c) == 0
    for a, b in zip(t, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@needs_devices
def test_frontier_shardmap_dense_fused_sparse_seed():
    """Dense FUSED spmd loop from a converged table + one dirtied stripe:
    lands on the classic loop's state with only that frontier marked, and
    reports the same round count as the single-round spmd loop."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bullet_tpu.ops.packed import HALO_FUSE
    from bullet_tpu.ops.ring_kernel import frontier_tile_n_dense_sharded
    from bullet_tpu.parallel.gossip import gossip_until_converged_device
    from bullet_tpu.parallel.mesh import PEER_AXIS
    from bullet_tpu.parallel.shardmap_gossip import (
        gossip_frontier_shardmap_dense,
    )

    p, n, d = 32, 16384, 4
    tile = frontier_tile_n_dense_sharded(p, n, d, False)
    t_total = n // tile
    assert t_total >= 2
    nb = jnp.asarray(topo.ring(p).neighbors)
    t = random_table(p, n, seed=83)
    base, _, _ = gossip_until_converged_device(
        TableState(*(jnp.array(f) for f in t)), nb, "ring", "reference",
        p + 2, use_pallas=False,
    )
    upd = base._replace(
        cls=base.cls.at[3, tile + 9].set(3),
        khi=base.khi.at[3, tile + 9].set(10**9),
    )
    want, _, _ = gossip_until_converged_device(
        TableState(*(jnp.array(f) for f in upd)), nb, "ring", "reference",
        p + 2, use_pallas=False,
    )
    mesh = make_mesh(d)
    shard = NamedSharding(mesh, P(PEER_AXIS, None))
    dirty = jnp.zeros(t_total, dtype=jnp.bool_).at[1].set(True)

    results = []
    for fuse in (1, HALO_FUSE):
        tbl = TableState(
            *(jax.device_put(jnp.array(f), shard) for f in upd)
        )
        got, rounds, _ = gossip_frontier_shardmap_dense(
            tbl, dirty, mesh, True, "reference", False, p + 2,
            interpret=True, fuse=fuse,
        )
        for a, b in zip(want, got):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), fuse)
        assert int(rounds) >= 1
        results.append(int(rounds))
    assert results[0] == results[1], results


@needs_devices
def test_sim_shardmap_partition_and_heal():
    """Fault injection on the sharded sim: a dropped bridge peer blocks
    cross-cluster convergence under the generic shard_map collective;
    healing the topology converges — matching the unsharded twin."""
    t = topo.bridge((4, 3), 1)
    sim = PeerNetworkSim(t.num_peers, capacity=64, topology=t,
                         mesh_devices=8, use_shard_map=True)
    bridge_peer = t.num_peers - 1
    sim.topology = t.drop_peer(bridge_peer)
    sim.put(0, "left", 1)
    sim.put(4, "right", 2)
    sim.run_until_converged(max_rounds=10)
    assert sim.get(4, "left") is None  # did not cross the partition
    assert sim.get(0, "right") is None
    sim.topology = t  # heal
    sim.run_until_converged()
    assert sim.tables_equal()
    assert sim.get(4, "left") == 1
    assert sim.get(0, "right") == 2
