"""StepObserver metrics and event hooks."""

from bullet_tpu.models.netsim import PeerNetworkSim
from bullet_tpu.utils.observe import StepObserver


def test_observer_records_steps_and_events():
    sim = PeerNetworkSim(4, capacity=32, topology="ring")
    obs = StepObserver.attach(sim)
    events = []
    obs.on_step(events.append)

    sim.put(0, "a", 1)
    sim.step(rounds=1)
    sim.put(1, "b", 2)
    sim.run_until_converged()

    assert len(obs.history) == 2
    assert obs.history[0]["kind"] == "step"
    assert obs.history[1]["kind"] == "converge"
    assert obs.history[1]["rounds"] >= 1
    assert events == obs.history
    summary = obs.summary()
    assert summary["steps"] == 1 and summary["events"] == 2
    assert summary["total_wall_s"] > 0

    obs.detach()
    sim.put(2, "c", 3)
    sim.step()
    assert len(obs.history) == 2  # detached
