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
