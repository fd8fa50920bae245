"""Test configuration.

The engine tests run on a virtual 8-device CPU mesh (the driver dry-runs the
real multi-chip path separately); these env vars must be set before jax is
imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


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
