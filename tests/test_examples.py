"""Every example must stay runnable (they are self-verifying: each asserts
its expected outcomes and exits nonzero on failure)."""

import os
import subprocess
import sys

import pytest

EXAMPLES = [
    "basic_example.py",
    "query_example.py",
    "validation_example.py",
    "middleware_example.py",
    "serializer_example.py",
    "circle_network_example.py",
    "chain_example.py",
    "bridge_example.py",
    "netsim_scale_example.py",
    "observability_example.py",
    ("sync_example.py", ["--items", "300"]),
    "engine_pipeline_example.py",
    "ws_interop_example.py",
    "incremental_example.py",
    "serving_example.py",
    "protocol_study_example.py",
    "rank_layout_example.py",
    "monitor_example.py",
]

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.mark.parametrize("spec", EXAMPLES, ids=lambda s: s[0] if isinstance(s, tuple) else s)
def test_example_runs(spec):
    name, args = spec if isinstance(spec, tuple) else (spec, [])
    repo_root = os.path.abspath(os.path.join(EXAMPLES_DIR, ".."))
    env = dict(os.environ, BULLET_BACKEND="cpu")
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run(
        [sys.executable, name, *args],
        cwd=EXAMPLES_DIR,
        env=env,
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert result.returncode == 0, (
        f"{name} failed:\n{result.stdout[-2000:]}\n{result.stderr[-2000:]}"
    )
