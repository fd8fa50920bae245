"""Observability: step metrics, residual history, event hooks, sync stats.

Covers the monitoring surface from SURVEY §5 on both runtimes: the db
layer's event bus + sync stats, and the engine's StepObserver.
"""

import _env  # noqa: F401 - backend selection
import random

import bullet_tpu as bt
from bullet_tpu.models.netsim import PeerNetworkSim
from bullet_tpu.utils.observe import StepObserver


def db_observability() -> None:
    print("— db layer —")
    b = bt.create({"disable_network": True, "storage": False})
    counts = {}
    b.on("all", lambda event, data: counts.__setitem__(event, counts.get(event, 0) + 1))
    for i in range(20):
        b.get(f"metrics/m{i % 5}").put(i)
    b.get("metrics/m0").value()
    print("event counts:", counts)
    print("op log entries:", len(b.log), "(capped at 1000)")
    b.close()


def engine_observability() -> None:
    print("\n— engine —")
    sim = PeerNetworkSim(16, capacity=128, topology="ring")
    obs = StepObserver.attach(sim)
    obs.on_step(
        lambda e: print(
            f"  [{e['kind']}] tick={e['tick']} residual={e['residual']} "
            f"wall={e['wall_s']*1000:.1f}ms"
            + (f" rounds={e['rounds']}" if "rounds" in e else "")
        )
    )

    rng = random.Random(0)
    for step in range(3):
        for _ in range(8):
            sim.put(rng.randrange(16), f"data/k{rng.randrange(12)}", rng.randrange(1000))
        sim.step(rounds=2)
    sim.run_until_converged()

    print("summary:", obs.summary())
    print("engine stats:", sim.stats)
    assert sim.tables_equal()


def main() -> None:
    db_observability()
    engine_observability()
    print("\nObservability example completed")


if __name__ == "__main__":
    main()
