"""Packed 12 B/entry layout (ops/packed.py): bit-identity with dense
reference mode, the fused in-place Pallas round, and sim integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bullet_tpu.models.netsim import PeerNetworkSim
from bullet_tpu.ops.merge import TableState, merge_tables_xla
from bullet_tpu.ops.packed import (
    CV_SHIFT,
    VID_MASK,
    PackedTable,
    apply_ops_packed,
    gossip_round_chain_packed,
    gossip_round_generic_packed,
    gossip_round_mesh_packed,
    gossip_round_ring_packed,
    merge_packed_xla,
    pack_table,
    ring_round_packed_pallas,
    unpack_table,
)
from bullet_tpu.parallel import topology as topo
from bullet_tpu.parallel.gossip import (
    gossip_round_chain,
    gossip_round_generic,
    gossip_round_mesh,
    gossip_round_ring,
)


def random_dense(p, n, seed=0):
    """Sim-realistic dense table: absent entries all-zero, metadata zeroed
    (packed mode drops it, so value-state comparisons need it zero)."""
    rng = np.random.default_rng(seed)

    def arr(lo, hi):
        return jnp.asarray(rng.integers(lo, hi, (p, n), dtype=np.int32))

    cls = arr(0, 4)
    present = cls > 0
    z = jnp.zeros((p, n), dtype=jnp.int32)
    m = lambda a: jnp.where(present, a, z)
    return TableState(cls, m(arr(-50, 50)), m(arr(-50, 50)), m(arr(0, 30)), z, z, z)


def value_state(t: TableState):
    return [np.asarray(f) for f in (t.cls, t.khi, t.klo, t.vid)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_merge_packed_matches_dense(seed):
    a, b = random_dense(16, 256, seed), random_dense(16, 256, seed + 100)
    dm, dc = merge_tables_xla(a, b, "reference")
    pm, pc = merge_packed_xla(pack_table(a), pack_table(b))
    for x, y in zip(value_state(dm), value_state(unpack_table(pm))):
        np.testing.assert_array_equal(x, y)
    assert int(dc) == int(pc)


@pytest.mark.parametrize("maker_pair", [
    (gossip_round_ring, gossip_round_ring_packed),
    (gossip_round_chain, gossip_round_chain_packed),
    (gossip_round_mesh, gossip_round_mesh_packed),
])
def test_rounds_match_dense(maker_pair):
    dense_fn, packed_fn = maker_pair
    t = random_dense(16, 256, seed=3)
    dm, dc = dense_fn(t, "reference")
    pm, pc = packed_fn(pack_table(t))
    for x, y in zip(value_state(dm), value_state(unpack_table(pm))):
        np.testing.assert_array_equal(x, y)
    assert int(dc) == int(pc)


def test_generic_round_matches_dense():
    t = random_dense(11, 256, seed=4)
    nb = jnp.asarray(topo.bridge((5, 5), 1).neighbors)
    dm, dc = gossip_round_generic(t, nb, "reference")
    pm, pc = gossip_round_generic_packed(pack_table(t), nb)
    for x, y in zip(value_state(dm), value_state(unpack_table(pm))):
        np.testing.assert_array_equal(x, y)
    assert int(dc) == int(pc)


@pytest.mark.parametrize("wrap", [True, False])
def test_pallas_round_matches_xla(wrap):
    """Interpret-mode bit-identity of the fused in-place stripe kernel."""
    t = pack_table(random_dense(16, 256, seed=5))
    ref_fn = gossip_round_ring_packed if wrap else gossip_round_chain_packed
    expected, c_ref = ref_fn(t)
    got, c_got = ring_round_packed_pallas(t, wrap=wrap, interpret=True)
    for a, b in zip(expected, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(c_ref) == int(c_got)


def test_apply_matches_dense_values():
    """Value state after packed apply == dense apply (metadata aside).
    Note packed 'applied' may be lower: dense counts metadata-only wins."""
    from bullet_tpu.ops.apply import OpBatch, apply_ops
    from bullet_tpu.ops.merge import init_table
    from bullet_tpu.ops.packed import init_packed

    rng = np.random.default_rng(6)
    p, n, b = 8, 64, 5
    ops = OpBatch(
        slot=jnp.asarray(rng.integers(0, n, (p, b), dtype=np.int32)),
        cls=jnp.asarray(rng.integers(0, 4, (p, b), dtype=np.int32)),
        khi=jnp.asarray(rng.integers(-50, 50, (p, b), dtype=np.int32)),
        klo=jnp.asarray(rng.integers(-50, 50, (p, b), dtype=np.int32)),
        vid=jnp.asarray(rng.integers(0, 30, (p, b), dtype=np.int32)),
        ctr=jnp.asarray(rng.integers(1, 9, (p, b), dtype=np.int32)),
    )
    dense, _ = apply_ops(init_table(p, n), ops, jnp.int32(1), mode="reference")
    packed, _ = apply_ops_packed(init_packed(p, n), ops, jnp.int32(1))
    for x, y in zip(value_state(dense), value_state(unpack_table(packed))):
        np.testing.assert_array_equal(x, y)


# ------------------------------------------------------------- sim e2e


@pytest.mark.parametrize("topology", ["ring", "chain", "mesh", "star", "bridge"])
def test_sim_packed_matches_dense(topology):
    def run(layout):
        sim = PeerNetworkSim(11, capacity=64, topology=topology, layout=layout)
        rng = np.random.default_rng(8)
        for _ in range(60):
            sim.put(int(rng.integers(11)), f"g/k{int(rng.integers(8))}",
                    float(rng.integers(100)))
        sim.put(0, "g/name", "zeta")
        sim.put(5, "g/name", "alpha")
        sim.run_until_converged()
        assert sim.tables_equal()
        return sim.get(3, "g")

    assert run("packed") == run("dense")


def test_sim_packed_strings_rekey_and_queries():
    """String interning triggers rank rebalances; packed re-keying must track
    them, and queries must work off the packed rows."""
    sim = PeerNetworkSim(4, capacity=64, topology="ring", layout="packed")
    names = [f"u{i:02d}" for i in range(20)]
    for i, nm in enumerate(names):
        sim.put(i % 4, f"users/m{i}/name", nm)
        sim.put(i % 4, f"users/m{i}/age", float(20 + i))
    sim.run_until_converged()
    assert sim.tables_equal()
    assert sim.equals(0, "users", "name", "u07") == ["users/m7"]
    assert sim.range(2, "users", "age", 25, 27) == [
        "users/m5", "users/m6", "users/m7"
    ]
    assert sim.count(1, "users", "name", "u03") == 1


def test_sim_packed_capacity_growth():
    sim = PeerNetworkSim(4, capacity=8, topology="ring", layout="packed")
    for i in range(40):
        sim.put(i % 4, f"deep/k{i}", i)
    sim.run_until_converged()
    assert sim.capacity >= 40
    assert sim.get(3, "deep/k39") == 39


def test_sim_packed_checkpoint_roundtrip(tmp_path):
    sim = PeerNetworkSim(4, capacity=64, topology="ring", layout="packed")
    sim.put(0, "a/b", 5)
    sim.put(2, "a/s", "str")
    sim.run_until_converged()
    sim.save_checkpoint(str(tmp_path / "ck"))
    loaded = PeerNetworkSim.load_checkpoint(str(tmp_path / "ck"))
    assert loaded.layout == "packed"
    assert loaded.get(1, "a") == sim.get(1, "a")
    loaded.put(3, "a/b", 50)
    loaded.run_until_converged()
    assert loaded.get(0, "a/b") == 50


def test_sim_packed_validation_ingress():
    """Device validation veto composes with the packed layout (masks run on
    the OpBatch before packing)."""
    sim = PeerNetworkSim(4, capacity=64, topology="ring", layout="packed")
    sim.define_schema("m", {"properties": {"v": {"type": "number", "min": 0}}})
    sim.apply_schema("items", "m")
    sim.put_bulk(np.array([0, 1], dtype=np.int32),
                 ["items/a/v", "items/b/v"], np.array([5.0, -5.0]))
    sim.run_until_converged()
    assert sim.stats["ops_rejected"] == 1
    assert sim.get(2, "items/a/v") == 5.0
    assert sim.get(2, "items/b/v") is None


def test_packed_rejects_lww():
    with pytest.raises(ValueError):
        PeerNetworkSim(4, layout="packed", mode="lww")


def test_packed_sharded_matches_unsharded():
    """Packed layout over the virtual 8-device mesh: jit-inferred and
    explicit shard_map paths both converge to the unsharded fixed point."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")

    def run(**kw):
        sim = PeerNetworkSim(16, capacity=64, topology="ring",
                             layout="packed", **kw)
        rng = np.random.default_rng(21)
        for _ in range(50):
            sim.put(int(rng.integers(16)), f"k/v{int(rng.integers(6))}",
                    int(rng.integers(1000)))
        sim.run_until_converged()
        assert sim.tables_equal()
        return [np.asarray(f) for f in sim.table]

    plain = run()
    inferred = run(mesh_devices=8)
    spmd = run(mesh_devices=8, use_shard_map=True)
    for a, b, c in zip(plain, inferred, spmd):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)


def test_packed_shardmap_round_bitidentical():
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from bullet_tpu.parallel.mesh import make_mesh, shard_table
    from bullet_tpu.parallel.shardmap_gossip import ring_round_shardmap_packed

    t = pack_table(random_dense(16, 128, seed=9))
    mesh = make_mesh()
    for wrap, ref_fn in ((True, gossip_round_ring_packed),
                         (False, gossip_round_chain_packed)):
        expected, c_ref = ref_fn(t)
        got, c_got = ring_round_shardmap_packed(
            shard_table(t, mesh), mesh, wrap=wrap)
        for a, b in zip(expected, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(c_ref) == int(c_got)


def test_flat_scatter_blocked_path_no_cross_block_corruption():
    """Code-review r2 (critical): with block size pb < P, an op's negative
    relative row index wrapped in-bounds (JAX normalizes negatives BEFORE
    mode='drop'), scattering into the NEXT block and corrupting an unrelated
    peer's row. Force the blocked path and check every row."""
    from bullet_tpu.ops.packed import _scatter_one, apply_flat_packed, init_packed

    p, n = 32, 1 << 21  # pb = max(8, 2^25/2^21) = 16 < 32 -> blocked path
    import bullet_tpu.ops.packed as pk

    pb = max(8, min(p, (1 << 25) // n))
    assert pb < p, "test must exercise the blocked path"

    tbl = init_packed(p, n)
    # one op per peer, each to a distinct slot, value = peer+1
    peer = jnp.arange(p, dtype=jnp.int32)
    slot = jnp.arange(p, dtype=jnp.int32) * 7
    khi = peer + 1
    klo = jnp.zeros(p, dtype=jnp.int32)
    cv = (jnp.full(p, 2, dtype=jnp.int32) << 28) | (peer + 2)
    out, applied = apply_flat_packed(tbl, peer, slot, khi, klo, cv)
    assert int(applied) == p
    got_khi = np.asarray(out.khi)
    got_cv = np.asarray(out.cv)
    for q in range(p):
        row_hits = np.nonzero(got_cv[q])[0]
        assert row_hits.tolist() == [q * 7], (q, row_hits)  # no foreign rows
        assert got_khi[q, q * 7] == q + 1


@pytest.mark.parametrize("wrap", [True, False])
def test_packed_halo_round_matches_xla(wrap):
    """In-place halo variant (for P beyond the full-P stripe limit):
    interpret-mode bit-identity with the XLA round, multiple tiles."""
    from bullet_tpu.ops.packed import (
        _halo_tiles_packed,
        halo_round_packed_traced,
        packed_halo_supported,
    )

    p, n = 4096, 256  # beyond the full-P stripe budget -> halo territory
    from bullet_tpu.ops.packed import packed_ring_supported as _prs
    assert not _prs(p, n)
    assert packed_halo_supported(p, n)
    tile_p, _ = _halo_tiles_packed(p, n)
    assert p // tile_p >= 2, "test must span multiple tiles"
    t = pack_table(random_dense(p, n, seed=11))
    ref_fn = gossip_round_ring_packed if wrap else gossip_round_chain_packed
    expected, c_ref = ref_fn(t)
    got, c_got = jax.jit(
        halo_round_packed_traced, static_argnums=(1, 2)
    )(t, wrap, True)
    for a, b in zip(expected, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(c_ref) == int(c_got)


def test_packed_halo_convergence_loop():
    """The convergence while_loop dispatches to the halo kernel for big-P
    shapes and reaches the same fixed point as XLA."""
    from bullet_tpu.ops.packed import (
        gossip_until_converged_packed,
        packed_halo_supported,
        packed_ring_supported,
    )
    from bullet_tpu.parallel import topology as topo2

    p, n = 4096, 256  # halo territory (full-P stripe unsupported)
    t = pack_table(random_dense(p, n, seed=12))
    nb = jnp.asarray(topo2.ring(p).neighbors)
    # capped rounds: per-round bit-identity implies loop identity, and an
    # interpret-mode run to a 4096-peer fixed point is minutes of CPU
    want, r_want, c_want = gossip_until_converged_packed(
        PackedTable(*(jnp.array(f) for f in t)), nb, "ring", 3,
        use_pallas=False)
    got, r_got, c_got = gossip_until_converged_packed(
        PackedTable(*(jnp.array(f) for f in t)), nb, "ring", 3,
        use_pallas=True)
    assert packed_halo_supported(p, n) or packed_ring_supported(p, n)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(r_want) == int(r_got)


def test_frontier_loop_bitidentical_to_classic():
    """Frontier convergence (settled stripes skipped per round) must reach
    the exact same fixed point in the exact same round count as the classic
    all-stripes loop."""
    from bullet_tpu.ops.packed import (
        gossip_frontier_packed,
        gossip_until_converged_packed,
        _stripe_tile_n,
    )
    from bullet_tpu.parallel import topology as topo2

    for wrap, kind in ((True, "ring"), (False, "chain")):
        p, n = 64, 8192  # 4 stripes at this shape
        t = pack_table(random_dense(p, n, seed=31))
        nb = jnp.asarray(getattr(topo2, kind)(p).neighbors)
        want, r_want, _ = gossip_until_converged_packed(
            PackedTable(*(jnp.array(f) for f in t)), nb, kind, p + 2,
            use_pallas=True)
        t_total = n // _stripe_tile_n(p, n)
        assert t_total >= 2
        got, r_got, c_got = gossip_frontier_packed(
            PackedTable(*(jnp.array(f) for f in t)),
            jnp.ones(t_total, dtype=jnp.bool_), wrap, p + 2, interpret=True)
        for a, b in zip(want, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), kind)
        assert int(r_want) == int(r_got)
        assert int(c_got) == 0


def test_frontier_sparse_start():
    """Starting with only the truly-dirty stripes marked converges to the
    same state (writes confined to marked stripes)."""
    from bullet_tpu.ops.packed import (
        _stripe_tile_n,
        gossip_frontier_packed,
        gossip_until_converged_packed,
    )
    from bullet_tpu.parallel import topology as topo2

    p, n = 64, 8192
    tile_n = _stripe_tile_n(p, n)
    t_total = n // tile_n
    base = pack_table(random_dense(p, n, seed=32))
    # make all stripes ALREADY converged, then dirty exactly one stripe
    nb = jnp.asarray(topo2.ring(p).neighbors)
    base, _, _ = gossip_until_converged_packed(base, nb, "ring", p + 2)
    upd = base._replace(
        cv=base.cv.at[3, 2 * tile_n + 7].set((2 << 28) | 12345),
        khi=base.khi.at[3, 2 * tile_n + 7].set(99999),
    )
    dirty = jnp.zeros(t_total, dtype=jnp.bool_).at[2].set(True)
    got, rounds, _ = gossip_frontier_packed(
        PackedTable(*(jnp.array(f) for f in upd)), dirty, True, p + 2,
        interpret=True)
    want, _, _ = gossip_until_converged_packed(
        PackedTable(*(jnp.array(f) for f in upd)), nb, "ring", p + 2)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sim_packed_uses_frontier_and_matches_xla():
    def run(**kw):
        sim = PeerNetworkSim(16, capacity=512, topology="ring",
                             layout="packed", **kw)
        rng = np.random.default_rng(33)
        for _ in range(50):
            sim.put(int(rng.integers(16)), f"w/k{int(rng.integers(6))}",
                    int(rng.integers(1000)))
        r = sim.run_until_converged()
        assert sim.tables_equal()
        return r, [np.asarray(f) for f in sim.table]

    r1, plain = run(use_pallas=False)
    r2, frontier = run(use_pallas=True)  # frontier path on CPU interpret
    assert r1 == r2
    for a, b in zip(plain, frontier):
        np.testing.assert_array_equal(a, b)


def test_frontier_incremental_seed():
    """After a completed convergence, the next run_until_converged seeds the
    frontier from the stripes the new ops touched — and still reaches the
    exact state a from-scratch sim produces."""
    def final_state(ops):
        sim = PeerNetworkSim(16, capacity=2048, topology="ring",
                             layout="packed", use_pallas=True)
        for peer, path, value in ops:
            sim.put(peer, path, value)
        sim.run_until_converged()
        assert sim.tables_equal()
        return [np.asarray(f) for f in sim.table]

    first = [(i % 16, f"a/k{i % 40}", i) for i in range(100)]
    second = [(3, "a/k7", 10_000), (9, "b/new", 42)]

    sim = PeerNetworkSim(16, capacity=2048, topology="ring",
                         layout="packed", use_pallas=True)
    for peer, path, value in first:
        sim.put(peer, path, value)
    sim.run_until_converged()
    assert sim._frontier_dirty is not None and not sim._frontier_dirty.any()
    for peer, path, value in second:
        sim.put(peer, path, value)
    sim.run_until_converged()
    assert sim.tables_equal()
    want = final_state(first + second)
    for a, b in zip(want, sim.table):
        np.testing.assert_array_equal(a, np.asarray(b))
    # reads still correct
    assert sim.get(0, "a/k7") == 10_000
    assert sim.get(15, "b/new") == 42


def test_frontier_seed_invalidation_paths():
    """Manual step rounds, capacity growth, and restore must forget the
    clean-stripe knowledge (conservatively re-running the full frontier)."""
    sim = PeerNetworkSim(16, capacity=256, topology="ring",
                         layout="packed", use_pallas=True)
    sim.put(0, "x/a", 1)
    sim.run_until_converged()
    assert sim._frontier_dirty is not None
    sim.put(1, "x/a", 2)
    sim.step()  # untracked gossip
    assert sim._frontier_dirty is None
    sim.run_until_converged()
    assert sim.tables_equal()
    snap = sim.snapshot()
    sim.restore(snap)
    assert sim._frontier_dirty is None
    sim.run_until_converged()
    assert sim.tables_equal() and sim.get(5, "x/a") == 2


def test_frontier_halo_bitidentical():
    """Halo-variant frontier (big P): same fixed point and rounds as the
    classic loop, from all-dirty and from a sparse seed."""
    from bullet_tpu.ops.packed import (
        frontier_tile_n,
        gossip_frontier_packed,
        gossip_until_converged_packed,
        packed_halo_supported,
        packed_ring_supported,
    )
    from bullet_tpu.parallel import topology as topo2

    p, n = 4096, 1024  # halo territory, 4 stripes
    assert not packed_ring_supported(p, n) and packed_halo_supported(p, n)
    t_total = n // frontier_tile_n(p, n)
    assert t_total >= 2
    t = pack_table(random_dense(p, n, seed=41))
    nb = jnp.asarray(topo2.ring(p).neighbors)
    want, r_want, _ = gossip_until_converged_packed(
        PackedTable(*(jnp.array(f) for f in t)), nb, "ring", 3,
        use_pallas=False)
    got, r_got, _ = gossip_frontier_packed(
        PackedTable(*(jnp.array(f) for f in t)),
        jnp.ones(t_total, dtype=jnp.bool_), True, 3, interpret=True)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(r_want) == int(r_got)


@pytest.mark.parametrize("wrap", [True, False])
def test_multiround_fused_matches_sequential(wrap):
    """M rounds fused per block-load (the bench fast path) must be
    bit-identical to M sequential rounds, with the summed change count."""
    from bullet_tpu.ops.packed import (
        ring_multiround_packed_traced,
        ring_round_packed_traced,
    )

    for m in (1, 2, 3, 5):
        t0 = pack_table(random_dense(64, 1024, seed=5))
        a = PackedTable(*(jnp.array(f) for f in t0))
        total = 0
        for _ in range(m):
            a, c = jax.jit(
                ring_round_packed_traced, static_argnums=(1, 2)
            )(a, wrap, True)
            total += int(c)
        b, cb = jax.jit(
            ring_multiround_packed_traced, static_argnums=(1, 2, 3)
        )(PackedTable(*(jnp.array(f) for f in t0)), wrap, m, True)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert total == int(cb), (wrap, m)


@pytest.mark.parametrize("wrap", [True, False])
def test_window_matches_sequential(wrap):
    """The radius-m window-join kernel (m rounds in O(log m) 3-way joins)
    must be bit-identical to m sequential classic rounds, and its count
    must be the classic ROUND-m residual (the last round's winner-select
    count alone). m=70 > P=64 pins the saturated-window case (the ring
    window wraps onto itself; chain windows clip at the edges)."""
    from bullet_tpu.ops.packed import (
        ring_round_packed_traced,
        ring_window_packed_traced,
    )

    for m in (1, 2, 3, 5, 13, 40, 70):
        t0 = pack_table(random_dense(64, 1024, seed=7))
        a = PackedTable(*(jnp.array(f) for f in t0))
        last = 0
        for _ in range(m):
            a, c = jax.jit(
                ring_round_packed_traced, static_argnums=(1, 2)
            )(a, wrap, True)
            last = int(c)
        b, cb = jax.jit(
            ring_window_packed_traced, static_argnums=(1, 2, 3)
        )(PackedTable(*(jnp.array(f) for f in t0)), wrap, m, True)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert last == int(cb), (wrap, m)


@pytest.mark.parametrize("wrap", [True, False])
def test_window_halo_matches_sequential(wrap):
    """The windowed HALO kernel (m rounds per block-load via radius-m
    window joins over m-row boundary snapshots — the big-P twin of the
    stripe window) must be bit-identical to m sequential classic rounds
    with the classic round-m residual. tiles=(16, 128) forces 4 peer
    tiles at P=64, covering inter-tile snapshots, the chain global-edge
    clamp, and m == tile_p (the deepest window a tile admits)."""
    from bullet_tpu.ops.packed import (
        ring_round_packed_traced,
        ring_window_halo_packed_traced,
    )

    for m in (1, 2, 3, 5, 8, 13, 16):
        t0 = pack_table(random_dense(64, 256, seed=21))
        a = PackedTable(*(jnp.array(f) for f in t0))
        last = 0
        for _ in range(m):
            a, c = jax.jit(
                ring_round_packed_traced, static_argnums=(1, 2)
            )(a, wrap, True)
            last = int(c)
        b, cb = ring_window_halo_packed_traced(
            PackedTable(*(jnp.array(f) for f in t0)), wrap, m, True,
            tiles=(16, 128),
        )
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y), (wrap, m))
        assert last == int(cb), (wrap, m)


@pytest.mark.parametrize("wrap", [True, False])
def test_window_halo_packed_shipped_depth(wrap):
    """Bit-parity at the SHIPPED packed depth (halo_window(3) = 64, the
    round-5 hardware-timed value): 64 rounds as one radius-64 window
    join (6 join steps — one more than m=40's schedule) must bit-match
    64 sequential classic rounds with the classic round-64 residual.
    tiles=(64, 128) keeps tile_p ≥ m (the chain-edge clamp locality
    invariant) with 2 peer tiles at P=128, so inter-tile snapshots at
    full depth are exercised."""
    from bullet_tpu.ops.packed import (
        halo_window,
        ring_round_packed_traced,
        ring_window_halo_packed_traced,
    )

    m = halo_window(3)
    assert m == 64
    t0 = pack_table(random_dense(128, 256, seed=47))
    a = PackedTable(*(jnp.array(f) for f in t0))
    step = jax.jit(ring_round_packed_traced, static_argnums=(1, 2))
    last = 0
    for _ in range(m):
        a, c = step(a, wrap, True)
        last = int(c)
    b, cb = ring_window_halo_packed_traced(
        PackedTable(*(jnp.array(f) for f in t0)), wrap, m, True,
        tiles=(64, 128),
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), wrap)
    assert last == int(cb), wrap


def test_window_halo_tiles_bounds():
    """Tile selection: 8-aligned tile_p ≥ depth dividing p, 128-aligned
    tile_n dividing n, extended block within the arity-aware budget;
    (0, 0) when impossible. P=8192 rank1 (the post-stripe-budget cell the
    router sends here) must tile."""
    from bullet_tpu.ops.packed import (
        _STRIPE_MAX_ELEMS,
        halo_window,
        window_halo_supported,
        window_halo_tiles,
    )

    tp, tn = window_halo_tiles(8192, 1 << 18, 1, 120)
    assert tp > 0, "P=8192 rank1 must tile (wrong: falls to 8-round halo)"
    assert tp % 8 == 0 and 8192 % tp == 0 and tp >= 120
    assert tn % 128 == 0 and (1 << 18) % tn == 0
    assert (tp + 240) * tn <= _STRIPE_MAX_ELEMS * 4
    assert window_halo_supported(8192, 1 << 18, 1)
    assert window_halo_supported(8192, 1 << 18, 2)  # rank, depth 40
    # packed nf=3: hardware-validated depth 64 (m=80 OOMs HBM at the
    # north star; see halo_window's timing table) — the 1024 x 1M north
    # star itself is packed's halo cell
    assert halo_window(3) == 64
    assert window_halo_supported(1024, 1 << 20, 3)
    assert window_halo_supported(8192, 1 << 18, 3)
    assert window_halo_tiles(8192, 1 << 18, 1, 0) == (0, 0)
    assert window_halo_tiles(8191, 1 << 18, 1, 120) == (0, 0)  # p % 8
    assert window_halo_tiles(8192, 100, 1, 120) == (0, 0)  # n % 128


@pytest.mark.parametrize("wrap", [True, False])
def test_window_xla_matches_sequential(wrap):
    """The whole-table XLA window twin (fast_forward's off-TPU path, any
    shape — including non-stripe-tileable ones) must match m sequential
    XLA rounds in state AND round-m residual."""
    from bullet_tpu.ops.packed import (
        gossip_round_chain_packed,
        gossip_round_ring_packed,
        ring_window_packed_xla,
    )

    round_fn = gossip_round_ring_packed if wrap else gossip_round_chain_packed
    for m in (1, 2, 5, 13, 40):
        # P=12 is NOT 8-aligned: the XLA twin has no tiling constraint
        t0 = pack_table(random_dense(12, 96, seed=9))
        a = PackedTable(*(jnp.array(f) for f in t0))
        last = 0
        for _ in range(m):
            a, c = round_fn(a)
            last = int(c)
        b, cb = ring_window_packed_xla(
            PackedTable(*(jnp.array(f) for f in t0)), wrap, m
        )
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert last == int(cb), (wrap, m)


@pytest.mark.parametrize("wrap", [True, False])
def test_frontier_halo_fused_round_parity(wrap):
    """The fused halo frontier (HALO_FUSE=8 rounds per block-load via
    trapezoidal time-tiling) must report the EXACT classic round count,
    residual, and bit-identical state — across convergence lengths landing
    inside and outside fuse blocks, and max_rounds cutoffs."""
    from bullet_tpu.ops.packed import (
        frontier_tile_n,
        gossip_frontier_packed,
        gossip_until_converged_packed,
        packed_halo_supported,
        packed_ring_supported,
    )
    from bullet_tpu.parallel import topology as topo2

    p, n = 2560, 512  # halo territory (full-P stripe budget exceeded)
    assert not packed_ring_supported(p, n) and packed_halo_supported(p, n)
    t_total = n // frontier_tile_n(p, n)
    assert t_total >= 2
    kind = "ring" if wrap else "chain"
    nb = jnp.asarray(
        (topo2.ring(p) if wrap else topo2.chain(p)).neighbors
    )

    # quick-converging table: one superior row replicated everywhere, then
    # a few INFERIOR rows — each heals from its neighbors in ~1-2 rounds,
    # so true convergence lands inside the first fuse block
    base = pack_table(random_dense(1, n, seed=11))
    quick = PackedTable(*(np.repeat(np.asarray(f), p, axis=0) for f in base))
    qarr = [np.array(f) for f in quick]
    for f in qarr:
        f[100:108] = 0
        f[2000:2002] = 0
    quick = PackedTable(*(jnp.asarray(f) for f in qarr))

    rand = pack_table(random_dense(p, n, seed=42))  # long convergence

    for tbl, max_rounds_list in (
        (quick, (0, 2, 5, 9, 20)),
        (rand, (3, 7)),  # cutoffs mid-fuse-block and mid-tail
    ):
        for max_rounds in max_rounds_list:
            want, r_want, c_want = gossip_until_converged_packed(
                PackedTable(*(jnp.array(f) for f in tbl)), nb, kind,
                max_rounds, use_pallas=False)
            got, r_got, c_got = gossip_frontier_packed(
                PackedTable(*(jnp.array(f) for f in tbl)),
                jnp.ones(t_total, dtype=jnp.bool_), wrap, max_rounds,
                interpret=True, fuse=5)
            for a, b in zip(want, got):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), (wrap, max_rounds))
            assert int(r_want) == int(r_got), (
                wrap, max_rounds, int(r_want), int(r_got))
            assert int(c_want) == int(c_got), (wrap, max_rounds)


def test_frontier_fused_round_parity():
    """The fuse>1 frontier loop must report the EXACT classic round count
    and bit-identical state — across convergence lengths that land at every
    offset within a fuse block, max_rounds cutoffs, and empty frontiers."""
    from bullet_tpu.ops.packed import (
        _stripe_tile_n,
        gossip_frontier_packed,
        gossip_until_converged_packed,
    )
    from bullet_tpu.parallel import topology as topo2

    p, n = 16, 2048
    t_total = n // _stripe_tile_n(p, n)
    nb = jnp.asarray(topo2.ring(p).neighbors)
    for seed in range(2):
        t = pack_table(random_dense(p, n, seed=60 + seed))
        for max_rounds in (p + 2, 7, 3, 0):
            want, r_want, c_want = gossip_until_converged_packed(
                PackedTable(*(jnp.array(f) for f in t)), nb, "ring",
                max_rounds, use_pallas=True)
            for fuse in (2, 5):
                got, r_got, c_got = gossip_frontier_packed(
                    PackedTable(*(jnp.array(f) for f in t)),
                    jnp.ones(t_total, dtype=jnp.bool_), True, max_rounds,
                    interpret=True, fuse=fuse)
                for a, b in zip(want, got):
                    np.testing.assert_array_equal(
                        np.asarray(a), np.asarray(b), (seed, max_rounds, fuse))
                assert int(r_want) == int(r_got), (seed, max_rounds, fuse,
                                                   int(r_want), int(r_got))
                # cutoffs end in the single-round tail, so the residual is
                # the true last-round count — exact, not a fused-block sum
                assert int(c_want) == int(c_got), (seed, max_rounds, fuse)

    # empty frontier: zero rounds, zero residual
    t = pack_table(random_dense(p, n, seed=70))
    got, r, c = gossip_frontier_packed(
        PackedTable(*(jnp.array(f) for f in t)),
        jnp.zeros(t_total, dtype=jnp.bool_), True, p + 2,
        interpret=True, fuse=5)
    assert int(r) == 0 and int(c) == 0
    for a, b in zip(t, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reconcile_kernel_bitidentical_to_xla():
    """The VMEM doubling-join reconcile kernel must bit-match the XLA
    doubling fallback (interpret mode — CLAUDE.md Pallas invariant)."""
    from bullet_tpu.ops.packed import (
        reconcile_packed_traced,
        reconcile_packed_xla,
    )

    for p, n in ((64, 1024), (8, 256), (48, 2048)):
        t = pack_table(random_dense(p, n, seed=90 + p))
        want = reconcile_packed_xla(PackedTable(*(jnp.array(f) for f in t)))
        got = jax.jit(reconcile_packed_traced, static_argnums=(1,))(
            PackedTable(*(jnp.array(f) for f in t)), True
        )
        for a, b in zip(want, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), (p, n))
        # join really is global: every row equals row 0
        for f in got:
            np.testing.assert_array_equal(
                np.asarray(f), np.tile(np.asarray(f)[:1], (p, 1))
            )


@pytest.mark.parametrize("wrap", [True, False])
def test_count_changes_probe_matches_round(wrap):
    """The read-only converged() probe must report exactly the change
    count a real round produces — without touching the table."""
    from bullet_tpu.ops.packed import count_changes_round_packed

    t = pack_table(random_dense(16, 512, seed=44))
    before = [np.asarray(f).copy() for f in t]
    _, c_real = ring_round_packed_pallas(t, wrap=wrap, interpret=True)
    c_probe = count_changes_round_packed(
        PackedTable(*(jnp.array(f) for f in before)), wrap, True
    )
    assert int(c_real) == int(c_probe)
    # converged table probes 0
    from bullet_tpu.ops.packed import gossip_until_converged_packed
    nb = jnp.asarray(topo.ring(16).neighbors)
    done, _, _ = gossip_until_converged_packed(
        PackedTable(*(jnp.array(f) for f in before)), nb,
        "ring" if wrap else "chain", 20)
    assert int(count_changes_round_packed(done, wrap, True)) == 0


def test_sim_converged_probe():
    sim = PeerNetworkSim(8, capacity=256, topology="ring", layout="packed")
    sim.put(0, "c/x", 3)
    sim.step(rounds=0)  # apply only
    assert not sim.converged()
    sim.run_until_converged()
    assert sim.converged() and sim.tables_equal()


def _blocked_vs_scatter(p, n, peer, slot, cls, khi, klo, vid, base):
    """Run the same raw batch through the chunk-grid Pallas apply and the
    winners+scatter path; assert bit-identical tables and applied counts."""
    from bullet_tpu.ops.packed import (
        apply_flat_blocked,
        apply_flat_packed,
        chunk_block_ops,
        reduce_flat_ops,
    )

    sorted_r = reduce_flat_ops(peer, slot, cls, khi, klo, vid)
    want, want_applied = apply_flat_packed(
        PackedTable(*(jnp.array(f) for f in base)),
        *(jnp.asarray(a) for a in sorted_r),
    )
    blocked_r = reduce_flat_ops(peer, slot, cls, khi, klo, vid,
                                block_shape=(p, n))
    # same winner set, different order
    assert len(blocked_r[0]) == len(sorted_r[0])
    got, got_applied = apply_flat_blocked(
        PackedTable(*(jnp.array(f) for f in base)),
        *chunk_block_ops(*blocked_r, p, n),
    )
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), (p, n))
    assert int(want_applied) == int(got_applied), (p, n)
    return got


def test_blocked_apply_bitidentical_to_scatter():
    """The chunk-grid Pallas apply (fused win-select + one-hot scatter over
    op-occupied blocks) must produce the exact table and applied count of
    the winners+chunked-scatter path, across duplicate-free and
    multi-chunk-per-block batches."""
    from bullet_tpu.ops.packed import (
        apply_flat_blocked,
        block_apply_supported,
        chunk_block_ops,
        init_packed,
        reduce_flat_ops,
    )

    rng = np.random.default_rng(17)
    for p, n, k, slots_hi in ((16, 512, 60, 512), (64, 2048, 200, 2048),
                              (8, 256, 30, 256)):
        assert block_apply_supported(p, n)
        base = pack_table(random_dense(p, n, seed=p))
        peer = rng.integers(0, p, k).astype(np.int32)
        slot = rng.integers(0, min(n, slots_hi), k).astype(np.int32)
        cls = rng.integers(0, 5, k).astype(np.int32)
        khi = rng.integers(-10**6, 10**6, k).astype(np.int32)
        klo = rng.integers(-10**6, 10**6, k).astype(np.int32)
        vid = rng.integers(0, 1 << 20, k).astype(np.int32)
        _blocked_vs_scatter(p, n, peer, slot, cls, khi, klo, vid, base)

    # forced multi-chunk block: >16 ops into one (8, 128) block (40 ops =
    # three consecutive grid steps read-modify-writing the resident block)
    p, n = 8, 256
    base = init_packed(p, n)
    k = 40
    peer = np.zeros(k, dtype=np.int32)
    slot = np.arange(k, dtype=np.int32)  # all in block (0, 0)
    cls = np.full(k, 2, dtype=np.int32)
    khi = np.arange(k, dtype=np.int32)
    klo = np.zeros(k, dtype=np.int32)
    vid = np.arange(k, dtype=np.int32)
    blocked_r = reduce_flat_ops(peer, slot, cls, khi, klo, vid,
                                block_shape=(p, n))
    meta_rc, meta_cf, ops5 = chunk_block_ops(*blocked_r, p, n)
    assert len(ops5) == 3  # 40 ops in one block = 3 chunks
    assert (meta_cf[0] >> 5) == 1 and (meta_cf[1] >> 5) == 0
    got, applied = apply_flat_blocked(
        PackedTable(*(jnp.array(f) for f in base)), meta_rc, meta_cf, ops5
    )
    assert int(applied) == k
    g = np.asarray(got.khi)
    np.testing.assert_array_equal(g[0, :k], np.arange(k))


def test_blocked_apply_dense_batches():
    """Dense key ranges pack hundreds of ops per block — the chunk-grid
    apply has no per-block window ceiling (the previous design's W=3
    refusal), so dense mega-batches ride the blocked path bit-identically
    instead of falling back to the chunked scatter."""
    p, n, k = 16, 4096, 6000
    rng = np.random.default_rng(23)
    peer = rng.integers(0, p, k).astype(np.int32)
    slot = rng.integers(0, 256, k).astype(np.int32)  # concentrated keys
    cls = np.full(k, 2, dtype=np.int32)
    khi = rng.integers(-10**6, 10**6, k).astype(np.int32)
    klo = rng.integers(-10**6, 10**6, k).astype(np.int32)
    vid = rng.integers(0, 1 << 20, k).astype(np.int32)
    base = pack_table(random_dense(p, n, seed=77))
    _blocked_vs_scatter(p, n, peer, slot, cls, khi, klo, vid, base)

    # FULL blocks: every (peer, slot) of the first two column blocks,
    # beating everything (cls 5) — 2048 ops, 128 consecutive steps on one
    # row band
    full_p, full_n = 8, 512
    peer2, slot2 = np.meshgrid(np.arange(8), np.arange(256), indexing="ij")
    peer2 = peer2.ravel().astype(np.int32)
    slot2 = slot2.ravel().astype(np.int32)
    k2 = len(peer2)
    base2 = pack_table(random_dense(full_p, full_n, seed=5))
    _blocked_vs_scatter(
        full_p, full_n, peer2, slot2, np.full(k2, 5, np.int32),
        rng.integers(-10, 10, k2).astype(np.int32),
        rng.integers(-10, 10, k2).astype(np.int32),
        rng.integers(0, 1 << 20, k2).astype(np.int32), base2,
    )


def _windowed_vs_scatter(p, n, peer, slot, cls, khi, klo, vid, base):
    """Run the same raw batch through the MXU windowed apply and the
    winners+scatter path; assert bit-identical tables and applied counts."""
    from bullet_tpu.ops.packed import (
        apply_flat_packed,
        apply_flat_windowed,
        reduce_flat_ops,
        window_apply_supported,
        window_block_ops,
    )

    assert window_apply_supported(p, n)
    sorted_r = reduce_flat_ops(peer, slot, cls, khi, klo, vid)
    want, want_applied = apply_flat_packed(
        PackedTable(*(jnp.array(f) for f in base)),
        *(jnp.asarray(a) for a in sorted_r),
    )
    blocked_r = reduce_flat_ops(peer, slot, cls, khi, klo, vid,
                                block_shape=(p, n))
    got, got_applied = apply_flat_windowed(
        PackedTable(*(jnp.array(f) for f in base)),
        *window_block_ops(*blocked_r, p, n),
    )
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), (p, n))
    assert int(want_applied) == int(got_applied), (p, n)
    return got


def test_windowed_apply_bitidentical_to_scatter():
    """The MXU windowed apply (one-hot matmul densify + block lexmax) must
    bit-match the winners+scatter path: random batches, full-range keys
    (negative khi/klo exercise the 16-bit-half exactness), multi-window
    blocks, and all-padding tails."""
    rng = np.random.default_rng(41)
    for p, n, k, slots_hi in ((16, 2048, 500, 2048), (8, 1024, 300, 1024),
                              (64, 4096, 2000, 512)):
        peer = rng.integers(0, p, k).astype(np.int32)
        slot = rng.integers(0, min(n, slots_hi), k).astype(np.int32)
        cls = rng.integers(0, 6, k).astype(np.int32)
        khi = rng.integers(-(2**31), 2**31, k, dtype=np.int64).astype(np.int32)
        klo = rng.integers(-(2**31), 2**31, k, dtype=np.int64).astype(np.int32)
        vid = rng.integers(0, 1 << 28, k).astype(np.int32)
        base = pack_table(random_dense(p, n, seed=p + 1))
        _windowed_vs_scatter(p, n, peer, slot, cls, khi, klo, vid, base)

    # >128 ops in one (8, 1024) block: multiple consecutive windows
    # read-modify-write the resident block
    p, n = 8, 1024
    peer2, slot2 = np.meshgrid(np.arange(8), np.arange(40), indexing="ij")
    k2 = peer2.size
    _windowed_vs_scatter(
        p, n, peer2.ravel().astype(np.int32), slot2.ravel().astype(np.int32),
        np.full(k2, 5, np.int32),
        rng.integers(-10, 10, k2).astype(np.int32),
        rng.integers(-10, 10, k2).astype(np.int32),
        rng.integers(0, 1 << 20, k2).astype(np.int32),
        pack_table(random_dense(p, n, seed=3)),
    )


def test_windowed_apply_padding_cannot_clobber_origin():
    """Window padding rows are all-zero and map to cell (0, 0) — the
    one-hot sums there must still reproduce a real op targeting (0, 0)
    exactly (zero halves contribute nothing)."""
    p, n = 8, 1024
    peer = np.array([0, 3], dtype=np.int32)
    slot = np.array([0, 7], dtype=np.int32)  # a real op at (0, 0)
    cls = np.array([4, 2], dtype=np.int32)
    khi = np.array([-123456789, 77], dtype=np.int32)
    klo = np.array([987654321, -9], dtype=np.int32)
    vid = np.array([42, 11], dtype=np.int32)
    from bullet_tpu.ops.packed import init_packed

    got = _windowed_vs_scatter(p, n, peer, slot, cls, khi, klo, vid,
                               init_packed(p, n))
    assert int(np.asarray(got.khi)[0, 0]) == -123456789
    assert int(np.asarray(got.cv)[3, 7]) == (2 << 28) | 11


def test_blocked_apply_segmented():
    """Batches past the per-call SMEM chunk budget split into sequential
    segments at chunk granularity; a block straddling the boundary is
    read-modified-written across two pallas calls (the forced first-bit
    re-reads the updated HBM block)."""
    import bullet_tpu.ops.packed as pk

    p, n, k = 8, 1024, 900
    rng = np.random.default_rng(3)
    peer = rng.integers(0, p, k).astype(np.int32)
    slot = rng.integers(0, n, k).astype(np.int32)
    cls = rng.integers(1, 5, k).astype(np.int32)
    khi = rng.integers(-10**6, 10**6, k).astype(np.int32)
    klo = rng.integers(-10**6, 10**6, k).astype(np.int32)
    vid = rng.integers(0, 1 << 20, k).astype(np.int32)
    base = pack_table(random_dense(p, n, seed=9))

    old = pk.MAX_BLOCK_CHUNKS
    pk.MAX_BLOCK_CHUNKS = 8  # force many segments, incl. mid-block splits
    try:
        _blocked_vs_scatter(p, n, peer, slot, cls, khi, klo, vid, base)
    finally:
        pk.MAX_BLOCK_CHUNKS = old
