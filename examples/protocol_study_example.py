"""Protocol-dynamics study: exact convergence curves via fast_forward.

The reference can only observe convergence by polling live processes at
a 3-second cadence (/root/reference/examples/bullet-sync-example.js:175-218).
The engine turns the question into a measurement: ``sim.fast_forward(k)``
advances EXACTLY k gossip rounds bit-identically to k sequential rounds
— in O(log k) window joins — and returns the classic residual of round k
alone (the number of winner-selects the k-th round performed). Jumping
geometrically therefore samples the exact residual-vs-round curve of the
protocol in O(log² diameter) work, where stepping would pay the full
diameter per data point.

Self-verifying: the sampled curve must be reproduced exactly by a
step()-driven twin, decay to zero by the ring diameter, and converge to
the reconcile() fixed point.

Run: python examples/protocol_study_example.py
"""

import _env  # noqa: F401  (repo path + CPU default)

import numpy as np

from bullet_tpu.models.netsim import PeerNetworkSim


def sample_curve(sim, checkpoints):
    """Exact residual at each round in ``checkpoints`` (ascending), by
    jumping the gaps: residual(k) = fast_forward(k - prev)."""
    curve = []
    done = 0
    for k in checkpoints:
        residual = sim.fast_forward(k - done)
        done = k
        curve.append((k, residual))
    return curve


def main() -> None:
    peers, cap = 64, 1024
    rng = np.random.default_rng(7)

    def build():
        sim = PeerNetworkSim(peers, capacity=cap, topology="ring",
                             layout="rank1")
        for _ in range(800):
            sim.put(int(rng.integers(peers)),
                    f"doc/k{int(rng.integers(200))}",
                    float(rng.integers(1 << 20)))
        return sim

    diameter = peers // 2
    checkpoints = [1, 2, 4, 8, 16, 24, 32, diameter + 1]

    rng = np.random.default_rng(7)
    fast = build()
    rng = np.random.default_rng(7)
    slow = build()

    curve = sample_curve(fast, checkpoints)

    # twin driven by sequential rounds — must reproduce the curve exactly
    done = 0
    for k, residual in curve:
        want = slow.step(k - done)
        done = k
        assert want == residual, (k, want, residual)

    width = 46
    peak = max(r for _, r in curve) or 1
    print(f"ring of {peers} peers, {cap} slots, 800 writes — exact "
          f"residual by round (diameter {diameter}):")
    for k, residual in curve:
        bar = "#" * max(residual * width // peak, 1 if residual else 0)
        print(f"  round {k:4d}  {residual:6d}  {bar}")

    assert curve[-1][1] == 0, "must be converged past the diameter"
    assert all(r > 0 for _, r in curve[:3]), "early rounds must be active"

    # the jumped state IS the fixed point
    fast.reconcile()
    assert fast.tables_equal()
    slow.run_until_converged()
    for f, s in zip(fast.table, slow.table):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(s))

    print("protocol study OK: geometric fast_forward sampling matched the "
          "step-driven twin exactly and landed on the fixed point")


if __name__ == "__main__":
    main()
