"""Example environment setup: default to CPU (fast for host-driven demo
loops; this image's TPU is behind a high-latency tunnel). Set
BULLET_BACKEND=tpu to run on the TPU instead.

Import this before anything that imports jax. Also puts the repo root on
sys.path so ``python examples/<any>_example.py`` works from any cwd
without installing the package.
"""

import os
import sys

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _root not in sys.path:
    sys.path.insert(0, _root)

if os.environ.get("BULLET_BACKEND", "cpu").lower() != "tpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
