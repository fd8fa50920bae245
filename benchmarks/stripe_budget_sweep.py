"""Sweep the stripe VMEM budget per layout arity on hardware.

`_STRIPE_MAX_ELEMS` (ops/packed.py) bounds p*tile_n PER FIELD and was
tuned for the 3-field packed layout. rank (2 fields) and rank1 (1 field)
leave 1/3 resp. 2/3 of that VMEM unused — this sweep monkeypatches the
budget to k× and re-times the fused stripe loop, to decide whether an
arity-aware budget is worth shipping (bigger stripes amortize block-load
DMA further and raise the full-P threshold past P=1024 before the halo
kernel takes over).

Run on the TPU (tunnel): BULLET_SWEEP_LAYOUT=rank1 python
benchmarks/stripe_budget_sweep.py. Compile cost per (budget, fuse) cell
is minutes through the tunnel — the sweep keeps the cell count small.
"""

import json
import os
import sys
import time

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _REPO_ROOT)

from bench import _enable_compile_cache  # noqa: E402

_enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.fuse_sweep import build_packed  # noqa: E402


def time_budget(num_peers, capacity, scale, fuse, layout):
    import functools

    from bullet_tpu.ops import packed as pk

    old = pk._STRIPE_MAX_ELEMS
    pk._STRIPE_MAX_ELEMS = int(old * scale)
    try:
        if not pk.packed_ring_supported(num_peers, capacity):
            return None
        tile = pk._stripe_tile_n(num_peers, capacity)
        rounds = 240
        while rounds % fuse:
            fuse -= 1

        def round_(_, t):
            t2, _c = pk.ring_multiround_packed_traced(t, True, fuse, False)
            return t2

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(t):
            out = jax.lax.fori_loop(0, rounds // fuse, round_, t)
            return jnp.sum(out[-1]), out

        build = build_packed(num_peers, capacity, layout)
        s, warm = run(build())
        int(s)
        del warm
        t0 = time.perf_counter()
        s, out = run(build())
        int(s)
        dt = time.perf_counter() - t0
        del out
        return {
            "scale": scale, "tile_n": tile, "fuse": fuse,
            "merges_per_s": round(2 * num_peers * capacity * rounds / dt),
            "us_per_round": round(dt / rounds * 1e6, 1),
        }
    finally:
        pk._STRIPE_MAX_ELEMS = old


def main():
    layout = os.environ.get("BULLET_SWEEP_LAYOUT", "rank1")
    # budget scales: 1.0 = shipped; 3/nf = the arity-principled budget
    scales = {"packed": [1.0], "rank": [1.0, 1.5],
              "rank1": [1.0, 2.0, 3.0]}[layout]
    num_peers, capacity = 1024, 1 << 20
    from bullet_tpu.ops.packed import STRIPE_FUSE

    for scale in scales:
        r = time_budget(num_peers, capacity, scale, STRIPE_FUSE, layout)
        print(json.dumps({"layout": layout, **(r or {"scale": scale,
                                                     "supported": False})}),
              flush=True)


if __name__ == "__main__":
    main()
