"""Worker for the real two-process jax.distributed test (test_multiprocess.py).

Each process: initialize jax.distributed over localhost, build a global
batch from process-local shards (`make_array_from_process_local_data` via
`shard_batch`), compute a cross-host reduction under jit (the gradient
all-reduce the sharded train step relies on), and merge a SemSegEvaluator
across hosts with `process_allgather` — the collectives the reference does
with torch.distributed (ref: sem_seg_evaluation.py:256-265).
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import numpy as np

    from combo_avs_tpu.evaluation.evaluator import SemSegEvaluator
    from combo_avs_tpu.parallel.distributed import (
        initialize,
        merge_evaluator_across_hosts,
    )
    from combo_avs_tpu.parallel.mesh import make_mesh, shard_batch

    assert initialize(coordinator_address=addr, num_processes=nproc,
                      process_id=pid) == pid
    assert jax.process_count() == nproc

    mesh = make_mesh()
    # each host holds 2 distinct rows of the 4-row global batch
    local = (np.arange(6, dtype=np.float32).reshape(2, 3) + 100.0 * pid)
    batch = shard_batch({"x": local}, mesh)

    import jax.numpy as jnp

    total = float(jax.jit(lambda b: jnp.sum(b["x"]))(batch))

    # replicated params, batch-sharded data: grad forces the cross-host psum
    p = jnp.ones((3,), jnp.float32)
    grad = jax.jit(jax.grad(lambda p, b: jnp.mean((b["x"] @ p) ** 2)))(p, batch)
    grad = np.asarray(grad).tolist()

    ev = SemSegEvaluator()
    rng = np.random.RandomState(pid)
    for _ in range(2):
        ev.process(rng.rand(2, 2, 8, 8), rng.randint(0, 2, (2, 8, 8)))
    merge_evaluator_across_hosts(ev)
    res = ev.evaluate()

    print(json.dumps({"pid": pid, "total": total, "grad": grad,
                      "count": ev._count, "res": res}))


if __name__ == "__main__":
    main()
