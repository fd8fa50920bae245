"""Phase-level profile of the fresh-1M-op apply path (VERDICT r4 item 1).

Breaks `_apply_pending_packed` into its host/device phases at the
north-star shape so optimization work attacks the measured bottleneck:
drain/concat -> (rank stamp) -> native reduce -> stack -> h2d -> device
apply. Run with BULLET_BACKEND=tpu for hardware numbers (default), or on
CPU at a smaller shape for smoke.

Usage: python benchmarks/apply_profile.py [--layout packed|rank|rank1]
"""

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402

from bench import _enable_compile_cache  # noqa: E402

_enable_compile_cache()

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layout", default="packed",
                    choices=["packed", "rank", "rank1"])
    ap.add_argument("--writes", type=int, default=1 << 20)
    args = ap.parse_args()

    import jax.numpy as jnp

    from bullet_tpu.models.netsim import PeerNetworkSim, _pad_flat_ops
    from bullet_tpu.parallel import topology as topo

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        num_peers, capacity, keys, writes = 1024, 1 << 20, 1 << 16, args.writes
    else:
        num_peers, capacity, keys, writes = 64, 1 << 12, 1 << 10, 1 << 16

    sim = PeerNetworkSim(num_peers, capacity=capacity,
                         topology=topo.ring(num_peers), layout=args.layout)
    slots = sim.host.intern_batch([f"g/k{i}" for i in range(keys)])
    rng = np.random.default_rng(0)

    def load():
        sim.put_bulk(
            rng.integers(0, num_peers, writes).astype(np.int32),
            slots[rng.integers(0, keys, writes)],
            rng.integers(0, 1 << 30, writes).astype(np.float64),
        )

    out = {"backend": jax.default_backend(), "layout": args.layout,
           "writes": writes, "peers": num_peers, "capacity": capacity}

    # warm every compiled program on a first load
    load()
    t0 = time.time()
    sim.step(rounds=0)
    _ = int(np.asarray(sim.table[-1][0, 0]))
    out["warm_apply_s"] = round(time.time() - t0, 3)

    # instrumented second load
    t0 = time.time()
    load()
    out["ingest_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    flat = sim._drain_flat()
    out["drain_s"] = round(time.time() - t0, 4)
    peer, slot, cls, khi, klo, vid = flat

    p_, n_ = sim.table[0].shape
    from bullet_tpu.ops.packed import block_apply_supported as _bas

    _use_blocked = _bas(p_, n_) and on_tpu
    _bshape = (p_, n_) if _use_blocked else None
    if args.layout in ("rank", "rank1"):
        from bullet_tpu.ops.packed import CV_SHIFT

        t0 = time.time()
        sim._sync_rank_index()
        out["rank_sync_s"] = round(time.time() - t0, 4)
        t0 = time.time()
        rmap = sim.rank_index.rank_map()
        out["rank_map_s"] = round(time.time() - t0, 4)
        t0 = time.time()
        rank_f = rmap[vid]
        cv_f = ((cls.astype(np.int64) << CV_SHIFT) | vid).astype(np.int32)
        out["rank_stamp_s"] = round(time.time() - t0, 4)
        from bullet_tpu.ops.rank import reduce_flat_ops_rank

        t0 = time.time()
        reduced = reduce_flat_ops_rank(peer, slot, rank_f, cv_f, block_shape=_bshape)
        out["reduce_s"] = round(time.time() - t0, 4)
        if args.layout == "rank1":
            reduced = reduced[:3]
    else:
        from bullet_tpu.ops.packed import reduce_flat_ops

        t0 = time.time()
        reduced = reduce_flat_ops(peer, slot, cls, khi, klo, vid, block_shape=_bshape)
        out["reduce_s"] = round(time.time() - t0, 4)
    out["reduced_k"] = int(len(reduced[0]))

    # route exactly like _apply_pending_packed on this backend
    from bullet_tpu.ops.packed import (
        apply_flat_blocked,
        apply_flat_windowed,
        block_apply_supported,
        chunk_block_ops,
        dense_batch_density,
        window_apply_supported,
        window_block_ops,
        window_min_density,
    )

    use_blocked = _use_blocked
    out["use_blocked"] = bool(use_blocked)
    if use_blocked:
        nf = {"packed": 3, "rank": 2, "rank1": 1}[args.layout]
        dens = dense_batch_density(reduced[0], reduced[1], n_)
        out["density"] = round(dens, 1)
        windowed = (
            window_apply_supported(p_, n_)
            and dens >= window_min_density(nf)
        )
        out["windowed"] = bool(windowed)
        t0 = time.time()
        if windowed:
            blocked = window_block_ops(*reduced, p_, n_)
        else:
            blocked = chunk_block_ops(*reduced, p_, n_)
        out["block_prep_s"] = round(time.time() - t0, 4)
        out["h2d_bytes"] = int(sum(np.asarray(b).nbytes for b in blocked))
        t0 = time.time()
        dev = [jnp.asarray(b) for b in blocked]
        _ = int(dev[-1][0].ravel()[0])  # force the transfer
        out["h2d_s"] = round(time.time() - t0, 4)
        t0 = time.time()
        if windowed:
            sim.table, applied = apply_flat_windowed(sim.table, *dev)
        else:
            sim.table, applied = apply_flat_blocked(sim.table, *dev)
        out["applied"] = int(applied)
        out["device_apply_s"] = round(time.time() - t0, 4)
    else:
        t0 = time.time()
        reduced = _pad_flat_ops(reduced, p_, n_)
        stacked = np.stack(reduced)
        out["stack_s"] = round(time.time() - t0, 4)
        out["h2d_bytes"] = int(stacked.nbytes)

        t0 = time.time()
        dev = jnp.asarray(stacked)
        dev.block_until_ready()
        _ = int(dev[0, 0])  # force through the tunnel
        out["h2d_s"] = round(time.time() - t0, 4)

        if args.layout == "rank1":
            from bullet_tpu.ops.rank import (
                apply_flat_rank1_stacked as apply_fn,
            )
        elif args.layout == "rank":
            from bullet_tpu.ops.rank import apply_flat_rank_stacked as apply_fn
        else:
            from bullet_tpu.ops.packed import (
                apply_flat_packed_stacked as apply_fn,
            )

        t0 = time.time()
        sim.table, applied = apply_fn(sim.table, dev)
        out["applied"] = int(applied)  # scalar readback forces completion
        out["device_apply_s"] = round(time.time() - t0, 4)

    phases = [k for k in out if k.endswith("_s") and k not in
              ("warm_apply_s", "ingest_s")]
    out["apply_total_s"] = round(sum(out[k] for k in phases), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
