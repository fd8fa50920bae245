"""Op-batch application semantics."""

import numpy as np

import jax.numpy as jnp

from bullet_tpu.ops.apply import OpBatch, apply_ops
from bullet_tpu.ops.merge import init_table


def ops_from(rows):
    """rows: list of [P] lists per field (slot, cls, khi, klo, vid, ctr)."""
    return OpBatch(*(jnp.asarray(np.asarray(f, dtype=np.int32)) for f in rows))


def test_apply_lands_and_counts():
    t = init_table(2, 128)
    ops = ops_from([
        [[3], [7]],   # slot
        [[2], [2]],   # cls
        [[5], [9]],   # khi
        [[0], [0]],   # klo
        [[1], [2]],   # vid
        [[1], [1]],   # ctr
    ])
    t, applied = apply_ops(t, ops, jnp.int32(1), mode="reference")
    assert int(applied) == 2
    assert int(t.vid[0, 3]) == 1 and int(t.vid[1, 7]) == 2
    assert int(t.writer[1, 7]) == 1  # writer = peer row
    assert int(t.tick[0, 3]) == 1


def test_padding_ops_never_land():
    t = init_table(4, 64)
    ops = OpBatch(*(jnp.zeros((4, 3), dtype=jnp.int32) for _ in range(6)))
    t2, applied = apply_ops(t, ops, jnp.int32(1), mode="reference")
    assert int(applied) == 0
    for f, f2 in zip(t, t2):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(f2))


def test_in_batch_order_free_value_max():
    """Multiple ops to the same slot in one batch: winner = value order
    regardless of position (quirk Q2 semantics)."""

    def run(khis, vids):
        t = init_table(1, 16)
        b = len(khis)
        ops = OpBatch(
            slot=jnp.zeros((1, b), dtype=jnp.int32),
            cls=jnp.full((1, b), 2, dtype=jnp.int32),
            khi=jnp.asarray([khis], dtype=jnp.int32),
            klo=jnp.zeros((1, b), dtype=jnp.int32),
            vid=jnp.asarray([vids], dtype=jnp.int32),
            ctr=jnp.asarray([list(range(1, b + 1))], dtype=jnp.int32),
        )
        t, _ = apply_ops(t, ops, jnp.int32(1), mode="reference")
        return int(t.vid[0, 0])

    assert run([5, 9, 3], [1, 2, 3]) == 2
    assert run([9, 5, 3], [2, 1, 3]) == 2
    assert run([3, 5, 9], [3, 1, 2]) == 2


def test_lww_mode_last_ctr_wins():
    t = init_table(1, 16)
    ops = OpBatch(
        slot=jnp.zeros((1, 2), dtype=jnp.int32),
        cls=jnp.full((1, 2), 2, dtype=jnp.int32),
        khi=jnp.asarray([[9, 5]], dtype=jnp.int32),  # later value smaller
        klo=jnp.zeros((1, 2), dtype=jnp.int32),
        vid=jnp.asarray([[1, 2]], dtype=jnp.int32),
        ctr=jnp.asarray([[1, 2]], dtype=jnp.int32),
    )
    t, _ = apply_ops(t, ops, jnp.int32(1), mode="lww")
    assert int(t.vid[0, 0]) == 2


def test_smaller_reput_does_not_land_reference():
    t = init_table(1, 16)

    def one(khi, vid, ctr):
        return OpBatch(
            slot=jnp.zeros((1, 1), dtype=jnp.int32),
            cls=jnp.full((1, 1), 2, dtype=jnp.int32),
            khi=jnp.full((1, 1), khi, dtype=jnp.int32),
            klo=jnp.zeros((1, 1), dtype=jnp.int32),
            vid=jnp.full((1, 1), vid, dtype=jnp.int32),
            ctr=jnp.full((1, 1), ctr, dtype=jnp.int32),
        )

    t, a1 = apply_ops(t, one(9, 1, 1), jnp.int32(1), mode="reference")
    t, a2 = apply_ops(t, one(5, 2, 2), jnp.int32(2), mode="reference")
    assert int(a1) == 1 and int(a2) == 0
    assert int(t.vid[0, 0]) == 1
    assert int(t.tick[0, 0]) == 1  # untouched
