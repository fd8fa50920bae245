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
