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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import threading  # noqa: E402
import time  # noqa: E402

import pytest  # noqa: E402

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
