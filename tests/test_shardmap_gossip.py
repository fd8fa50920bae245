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
    rng = np.random.default_rng(seed)

    def arr(lo, hi):
        return jnp.asarray(rng.integers(lo, hi, (p, n), dtype=np.int32))

    return TableState(
        arr(0, 4), arr(-50, 50), arr(-50, 50), arr(0, 30), arr(0, p), arr(0, 9), arr(0, 5)
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
