"""Worker for the multi-process jax.distributed smoke test (spawned by
tests/test_multihost_smoke.py, one OS process per simulated host).

Each process brings 2 virtual CPU devices; jax.distributed stitches them
into one 4-device global mesh. The worker builds a globally-sharded table,
runs one explicit shard_map ring round over it, and checks its addressable
shards bit-match the unsharded round computed locally.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    coordinator, process_id = sys.argv[1], int(sys.argv[2])

    from bullet_tpu.parallel.multihost import (
        global_mesh,
        host_info,
        initialize_multihost,
        is_multihost,
    )

    initialize_multihost(coordinator, num_processes=2, process_id=process_id)
    assert is_multihost(), host_info()
    info = host_info()
    assert info["process_count"] == 2, info
    assert info["local_devices"] == 2, info
    assert info["global_devices"] == 4, info

    import numpy as np

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from bullet_tpu.ops.merge import TableState
    from bullet_tpu.parallel.gossip import gossip_round_ring
    from bullet_tpu.parallel.mesh import PEER_AXIS
    from bullet_tpu.parallel.shardmap_gossip import ring_round_shardmap

    mesh = global_mesh()
    assert mesh.devices.size == 4, mesh

    p, n = 8, 64
    rng = np.random.default_rng(0)  # same seed on every process

    def field(lo, hi):
        return rng.integers(lo, hi, (p, n), dtype=np.int32)

    cls = field(0, 4)
    host_table = [cls]
    for lo, hi in ((-50, 50), (-50, 50), (0, 30), (0, p), (0, 9), (0, 5)):
        host_table.append(np.where(cls > 0, field(lo, hi), 0))

    sharding = NamedSharding(mesh, PartitionSpec(PEER_AXIS, None))
    global_table = TableState(
        *(
            jax.make_array_from_callback(
                (p, n), sharding, lambda idx, f=f: f[idx]
            )
            for f in host_table
        )
    )

    merged, changed = ring_round_shardmap(global_table, mesh, mode="reference")

    # expected: the unsharded round on the full table, computed locally
    expected, c_ref = gossip_round_ring(
        TableState(*(jnp.asarray(f) for f in host_table)), "reference"
    )
    assert int(changed) == int(c_ref), (int(changed), int(c_ref))
    for name, got_f, exp_f in zip(TableState._fields, merged, expected):
        exp_np = np.asarray(exp_f)
        for shard in got_f.addressable_shards:
            rows = shard.index[0]
            np.testing.assert_array_equal(
                np.asarray(shard.data), exp_np[rows], err_msg=name
            )

    print(f"worker {process_id}: OK", flush=True)


if __name__ == "__main__":
    main()
