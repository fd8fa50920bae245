"""Example environment setup: default to CPU (fast for host-driven demo
loops; this image's TPU is behind a high-latency tunnel). Set
BULLET_BACKEND=tpu to run on the TPU instead.

Import this before anything that imports jax.
"""

import os

if os.environ.get("BULLET_BACKEND", "cpu").lower() != "tpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
