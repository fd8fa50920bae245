"""Test configuration.

Engine tests run on a virtual 8-device CPU mesh (the driver dry-runs the real
multi-chip path separately). NOTE: this environment pins JAX_PLATFORMS=axon
at a level that overrides the env var, so platform selection must go through
jax.config.update — and XLA_FLAGS must be set before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# SIGSEGV mitigation (ROUND5_NOTES.md "full-suite segfault"): XLA:CPU splits
# each program into up to 32 LLVM modules compiled in parallel, and every
# split's ORC object __register_frame()s its eh_frame into libgcc. This
# image ships libgcc 12.2.0, whose lock-free eh_frame btree has known
# insert/lookup races (fixed upstream in GCC 12.3) — after ~690 tests of
# accumulated registrations, loading the suite's largest program
# (interpret-mode Pallas under shard_map) died inside libgcc's FDE
# classification (faulting PC between _Unwind_Backtrace and
# __register_frame_info_bases, i.e. the static btree/classify helpers),
# manifesting as SIGSEGV in jax's backend_compile_and_load. One module per
# program ⇒ one registration per load ⇒ no concurrent btree writers.
if "xla_cpu_parallel_codegen_split_count" not in os.environ.get(
    "XLA_FLAGS", ""
):
    os.environ["XLA_FLAGS"] = (
        os.environ["XLA_FLAGS"]
        + " --xla_cpu_parallel_codegen_split_count=1"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import threading  # noqa: E402
import time  # noqa: E402

import pytest  # noqa: E402

# Second SIGSEGV mitigation (same libgcc 12.2 eh_frame btree bug): even with
# codegen splits serialized, a full-suite run crashed loading THIS module's
# programs — the largest single LLVM modules the suite builds (interpret-mode
# Pallas window joins under shard_map on the 8-device mesh) — after ~700
# tests of register/deregister churn had grown the FDE btree. Every observed
# crash (rounds 4 and 5, three distinct runs) was in this one module at the
# suite tail; the same tests pass when run first. So compile the giant
# programs on a FRESH btree: front-load the module. Behavioral risk is nil —
# tests are order-independent by design (each builds its own sims/tables),
# and the suite's order-independence is itself an invariant we test for.
_FRONTLOAD_FILES = ("test_window_frontier_spmd.py",)


def pytest_collection_modifyitems(config, items):
    front = [
        it for it in items
        if any(it.path.name == f for f in _FRONTLOAD_FILES)
    ]
    if front:
        front_ids = set(id(it) for it in front)
        rest = [it for it in items if id(it) not in front_ids]
        items[:] = front + rest

# Network threads are named bullet-{accept,read,write,handshake,dial,status}.
# BulletNetwork.close() joins all of them; a test that leaves any alive is a
# teardown bug (the round-4 suite accumulated 100 leaked threads by test #674,
# masking a segfault's stack). Fail loudly instead.
_LEAK_PREFIX = "bullet-"


def _live_bullet_threads():
    return [
        t for t in threading.enumerate()
        if t.name.startswith(_LEAK_PREFIX) and t.is_alive()
    ]


@pytest.fixture(autouse=True)
def _no_leaked_network_threads(request):
    before = set(id(t) for t in _live_bullet_threads())
    yield
    deadline = time.time() + 5.0  # grace for in-flight teardown
    leaked = [t for t in _live_bullet_threads() if id(t) not in before]
    while leaked and time.time() < deadline:
        time.sleep(0.05)
        leaked = [t for t in _live_bullet_threads() if id(t) not in before]
    if leaked:
        names = sorted(t.name for t in leaked)
        pytest.fail(
            f"{request.node.nodeid} leaked {len(leaked)} network thread(s): "
            f"{names} — some BulletNetwork/StatusServer was not close()d",
            pytrace=False,
        )


@pytest.fixture
def bullet_factory():
    """Factory for storage-less, network-less Bullet instances with cleanup."""
    import bullet_tpu as bt

    created = []

    def make(**options):
        opts = {"storage": False, "disable_network": True}
        opts.update(options)
        b = bt.create(opts)
        created.append(b)
        return b

    yield make
    for b in created:
        b.close()
