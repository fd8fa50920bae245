"""Rank layout demo: the 8 B/entry table with single-compare merges.

Runs the SAME workload through layout="packed" (12 B/entry, 4-key merge
chain) and layout="rank" (8 B/entry — a host-maintained 31-bit gap rank
over the interned values turns every merge into one int32 compare), and
verifies the converged states are bit-identical. Also demonstrates the two
host-side maintenance events unique to the rank layout:

* a RANK RESPREAD (gap exhaustion → even re-spread + one device re-key
  through the vid → rank LUT), forced here by shrinking the rank space;
* a STRING REBALANCE, which on the rank layout needs NO device work at
  all (the table stores no key bits, and rebalances preserve value order).

Self-verifying; run `python examples/rank_layout_example.py`.
"""

import _env  # noqa: F401  (repo path + CPU backend)

import numpy as np

from bullet_tpu.models.netsim import PeerNetworkSim
from bullet_tpu.ops import rank as rank_ops


def seeded(layout: str, seed: int = 7) -> PeerNetworkSim:
    sim = PeerNetworkSim(8, capacity=256, topology="ring", layout=layout)
    rng = np.random.default_rng(seed)
    values = ["ada", "grace", 3.25, -17, 0, True, False, None, "linus"]
    for _ in range(200):
        sim.put(
            int(rng.integers(0, 8)),
            f"crew/c{int(rng.integers(0, 20))}/v{int(rng.integers(0, 3))}",
            values[int(rng.integers(0, len(values)))],
        )
    return sim


def main() -> None:
    packed = seeded("packed")
    ranked = seeded("rank")
    rank1 = seeded("rank1")

    rp = packed.run_until_converged()
    rr = ranked.run_until_converged()
    r1 = rank1.run_until_converged()
    assert rp == rr == r1, (rp, rr, r1)
    assert np.array_equal(
        np.asarray(packed.table.cv), np.asarray(ranked.table.cv)
    ), "rank and packed disagree"
    # rank1 stores ONLY the rank — its ranks must match the 2-array rank
    # sim's, and its reads decode to the same values
    assert np.array_equal(
        np.asarray(rank1.table.rank), np.asarray(ranked.table.rank)
    ), "rank1 and rank disagree"
    assert rank1.get(5) == packed.get(5)
    assert packed.tables_equal() and ranked.tables_equal()
    assert rank1.tables_equal()

    bytes_packed = sum(np.asarray(f).nbytes for f in packed.table)
    bytes_rank = sum(np.asarray(f).nbytes for f in ranked.table)
    bytes_rank1 = sum(np.asarray(f).nbytes for f in rank1.table)
    print(f"converged in {rr} rounds; tables bit-identical")
    print(f"device bytes: packed {bytes_packed:,} vs rank {bytes_rank:,} "
          f"vs rank1 {bytes_rank1:,} "
          f"({bytes_packed / bytes_rank1:.2f}x smaller than packed)")

    # --- forced rank respread: shrink the gap space so inserts exhaust it
    rank_ops_span = rank_ops.RANK_SPAN
    rank_ops.RANK_SPAN = 4095
    try:
        tiny = PeerNetworkSim(4, capacity=256, topology="ring", layout="rank")
        twin = PeerNetworkSim(4, capacity=256, topology="ring",
                              layout="packed")
        rng = np.random.default_rng(11)
        for round_ in range(5):
            for _ in range(40):
                peer = int(rng.integers(0, 4))
                path = f"m/k{int(rng.integers(0, 9))}"
                val = float(rng.random())  # fresh vids keep splitting gaps
                tiny.put(peer, path, val)
                twin.put(peer, path, val)
            tiny.run_until_converged()
            twin.run_until_converged()
            assert np.array_equal(
                np.asarray(tiny.table.cv), np.asarray(twin.table.cv)
            ), f"diverged after respread round {round_}"
        assert tiny.rank_index.epoch > 1, "expected at least one respread"
        print(f"rank respreads survived: epoch={tiny.rank_index.epoch}, "
              f"still bit-identical to packed")
    finally:
        rank_ops.RANK_SPAN = rank_ops_span

    # --- string rebalance: out-of-order string interning forces string
    # rank respreads; the rank table needs no device re-key for them
    sim = PeerNetworkSim(4, capacity=512, topology="ring", layout="rank")
    ref = PeerNetworkSim(4, capacity=512, topology="ring", layout="packed")
    import random

    names = [f"name{i:04d}" for i in range(250)]
    random.Random(3).shuffle(names)
    for i, s in enumerate(names):
        sim.put(i % 4, f"s/p{i % 31}", s)
        ref.put(i % 4, f"s/p{i % 31}", s)
    sim.run_until_converged()
    ref.run_until_converged()
    assert np.array_equal(np.asarray(sim.table.cv), np.asarray(ref.table.cv))
    assert sim.get(2, f"s/p{5}") == ref.get(2, f"s/p{5}")
    print("string rebalances: rank table stayed exact with zero device "
          "re-keys for key bits")
    print("OK")


if __name__ == "__main__":
    main()
