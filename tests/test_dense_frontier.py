"""Dense-layout frontier convergence: bit-identity with the classic loops
(full metadata in both modes, lean value-keys variant), sparse seeding, and
sim-level selection + incremental dirty-stripe bookkeeping."""

import numpy as np

import jax.numpy as jnp

from bullet_tpu.models.netsim import PeerNetworkSim
from bullet_tpu.ops.merge import TableState
from bullet_tpu.ops.ring_kernel import (
    frontier_tile_n_dense,
    gossip_frontier_dense,
)
from bullet_tpu.parallel import topology as topo
from bullet_tpu.parallel.gossip import gossip_until_converged_device


def _random_table(p, n, seed):
    rng = np.random.default_rng(seed)

    def arr(lo, hi):
        return rng.integers(lo, hi, (p, n)).astype(np.int32)

    cls = arr(0, 4)
    present = cls > 0

    def m(a):
        return jnp.asarray(np.where(present, a, 0).astype(np.int32))

    return TableState(
        jnp.asarray(cls), m(arr(-50, 50)), m(arr(-50, 50)), m(arr(0, 30)),
        m(arr(0, p)), m(arr(0, 9)), m(arr(0, 5)),
    )


def test_dense_frontier_bitidentical_to_classic():
    """Same fixed point, same round count as the all-stripes loop — full
    metadata (reference + lww) against the XLA loop, lean against the lean
    Pallas loop (lean's baseline IS the pallas path: the XLA loop always
    merges metadata)."""
    p, n = 64, 4096
    t = _random_table(p, n, seed=9)
    for mode, lean in (("reference", False), ("reference", True),
                       ("lww", False)):
        tile = frontier_tile_n_dense(p, n, lean)
        t_total = n // tile
        assert t_total >= 2
        for kind, wrap in (("ring", True), ("chain", False)):
            nb = jnp.asarray(getattr(topo, kind)(p).neighbors)
            want, r_want, _ = gossip_until_converged_device(
                TableState(*(jnp.array(f) for f in t)), nb, kind, mode,
                p + 2, use_pallas=lean, lean=lean,
            )
            got, r_got, c_got = gossip_frontier_dense(
                TableState(*(jnp.array(f) for f in t)),
                jnp.ones(t_total, dtype=jnp.bool_), wrap, mode, lean, p + 2,
                interpret=True,
            )
            for a, b in zip(want, got):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert int(r_want) == int(r_got), (mode, lean, kind)
            assert int(c_got) == 0


def test_dense_frontier_sparse_seed():
    """From a converged table, dirtying one stripe converges with only that
    frontier marked — same state as the classic loop."""
    p, n = 64, 4096
    t = _random_table(p, n, seed=10)
    tile = frontier_tile_n_dense(p, n, False)
    t_total = n // tile
    nb = jnp.asarray(topo.ring(p).neighbors)
    base, _, _ = gossip_until_converged_device(
        TableState(*(jnp.array(f) for f in t)), nb, "ring", "reference", p + 2
    )
    upd = base._replace(
        khi=base.khi.at[5, tile + 3].set(10**9),
        cls=base.cls.at[5, tile + 3].set(3),
    )
    want, _, _ = gossip_until_converged_device(
        TableState(*(jnp.array(f) for f in upd)), nb, "ring", "reference",
        p + 2,
    )
    dirty = jnp.zeros(t_total, dtype=jnp.bool_).at[1].set(True)
    got, rounds, _ = gossip_frontier_dense(
        TableState(*(jnp.array(f) for f in upd)), dirty, True, "reference",
        False, p + 2, interpret=True,
    )
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(rounds) >= 1


def test_sim_dense_frontier_matches_and_seeds():
    """Sim-level: the dense sim picks the frontier loop when use_pallas is
    set (CPU interpret), matches the XLA run, and keeps incremental
    dirty-stripe seeding across convergences."""

    def run(**kw):
        sim = PeerNetworkSim(
            16, capacity=16384, topology="ring", mode="reference", **kw
        )
        rng = np.random.default_rng(33)
        for _ in range(50):
            sim.put(int(rng.integers(16)), f"w/k{int(rng.integers(6))}",
                    int(rng.integers(1000)))
        r = sim.run_until_converged()
        assert sim.tables_equal()
        return r, sim

    r1, plain = run(use_pallas=False)
    r2, sim = run(use_pallas=True)
    assert sim._frontier_tile() > 0
    assert r1 == r2
    for a, b in zip(plain.table, sim.table):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert sim._frontier_dirty is not None
    assert not sim._frontier_dirty.any()

    # incremental: the next put seeds only its stripe; results still exact
    sim.put(3, "w/k2", 10**6)
    plain.put(3, "w/k2", 10**6)
    sim.run_until_converged()
    plain.run_until_converged()
    assert sim.tables_equal()
    assert sim.get(0, "w/k2") == 10**6
    for a, b in zip(plain.table, sim.table):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sim_dense_frontier_lean_value_keys_match():
    """Lean dense frontier: value keys converge identically to the XLA loop
    (writer/ctr/tick stay local by lean's design)."""

    def run(**kw):
        sim = PeerNetworkSim(
            16, capacity=16384, topology="chain", mode="reference",
            lean_gossip=True, **kw
        )
        rng = np.random.default_rng(34)
        for _ in range(40):
            sim.put(int(rng.integers(16)), f"l/k{int(rng.integers(5))}",
                    int(rng.integers(1000)))
        sim.run_until_converged()
        assert sim.tables_equal()
        return sim

    lean_frontier = run(use_pallas=True)
    lean_xla = run(use_pallas=False)
    for a, b in zip(lean_frontier.table[:4], lean_xla.table[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dense_frontier_traced_put_invalidates_seed():
    """Registered traced put transforms may move slots, so the incremental
    seed must be dropped (conservative all-dirty next convergence)."""
    sim = PeerNetworkSim(16, capacity=16384, topology="ring",
                         mode="reference", use_pallas=True)
    sim.put(0, "x/a", 1)
    sim.run_until_converged()
    assert sim._frontier_dirty is not None

    from bullet_tpu.ops.apply import OpBatch

    def bump(ops: OpBatch, struct) -> OpBatch:
        return ops  # identity, but its presence must force invalidation

    sim.hooks.use_traced_put(bump)
    sim.put(1, "x/a", 2)
    sim.run_until_converged()
    assert sim.tables_equal() and sim.get(5, "x/a") == 2


def test_dense_frontier_fused_round_parity():
    """fuse>1 dense frontier: exact classic round counts and bit-identical
    state across modes/lean, cutoffs, and fuse offsets (same scheme as the
    packed fused loop)."""
    p, n = 16, 1024
    for mode, lean, cutoffs in (
        ("reference", False, (p + 2, 3)),
        ("reference", True, (p + 2,)),
        ("lww", False, (5,)),
    ):
        tile = frontier_tile_n_dense(p, n, lean)
        t_total = n // tile
        t = _random_table(p, n, seed=21)
        nb = jnp.asarray(topo.ring(p).neighbors)
        for max_rounds in cutoffs:
            want, r_want, c_want = gossip_until_converged_device(
                TableState(*(jnp.array(f) for f in t)), nb, "ring", mode,
                max_rounds, use_pallas=lean, lean=lean,
            )
            for fuse in (5,):
                got, r_got, c_got = gossip_frontier_dense(
                    TableState(*(jnp.array(f) for f in t)),
                    jnp.ones(t_total, dtype=jnp.bool_), True, mode, lean,
                    max_rounds, interpret=True, fuse=fuse,
                )
                if lean:
                    cmp_want, cmp_got = want[:4], got[:4]
                else:
                    cmp_want, cmp_got = want, got
                for a, b in zip(cmp_want, cmp_got):
                    np.testing.assert_array_equal(
                        np.asarray(a), np.asarray(b),
                        (mode, lean, max_rounds, fuse))
                assert int(r_want) == int(r_got), (
                    mode, lean, max_rounds, fuse, int(r_want), int(r_got))
                assert int(c_want) == int(c_got), (mode, lean, max_rounds)
