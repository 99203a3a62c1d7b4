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


def tiny_eval_cfg(S: int = 64):
    """Shared tiny-model eval config for the multi-host eval-fan-out test
    (worker and test process must build identical cfgs/models)."""
    from combo_avs_tpu.config import get_cfg

    cfg = get_cfg()
    m = cfg.MODEL
    m.BACKBONE.NAME = "tiny_resnet"
    m.PRE_SAM.USE_PRE_SAM = False
    m.AUDIO.WIDTH_MULT = 0.125
    m.FUSE_CONFIG.FUSION_STEP = "late"
    m.FUSE_CONFIG.TYPE = "MHA-B"
    m.FUSE_CONFIG.AUDIO_DIM = 128
    m.FUSE_CONFIG.FUSED_BACKBONE = ["res2"]
    m.FUSE_CONFIG.FUSED_BACKBONE_DIM = [32]
    m.MASK_FORMER.HIDDEN_DIM = 32
    m.MASK_FORMER.NHEADS = 2
    m.MASK_FORMER.DIM_FEEDFORWARD = 64
    m.MASK_FORMER.DEC_LAYERS = 2
    m.MASK_FORMER.NUM_OBJECT_QUERIES = 8
    m.SEM_SEG_HEAD.MASK_DIM = 32
    m.SEM_SEG_HEAD.CONVS_DIM = 32
    m.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = 1
    cfg.INPUT.SIZE_DIVISIBILITY = S
    cfg.TEST.BF16 = False  # identical numerics on every host/pass
    cfg.OUTPUT_DIR = ""
    return cfg


def eval_fanout(dataset_root: str):
    """Multi-host eval: records shard per host, each host fans its batches
    over its LOCAL devices (needs XLA_FLAGS=--xla_force_host_platform_
    device_count=2 in this process). Returns the merged metrics dict."""
    import numpy as np

    from combo_avs_tpu.data.catalogs import load_avss4_records, register
    from combo_avs_tpu.models.meta_arch import build_model
    from combo_avs_tpu.parallel.mesh import make_mesh
    from combo_avs_tpu.train.trainer import evaluate

    register(
        "mp_s4_val",
        lambda: load_avss4_records(dataset_root, "val", None),
        {"stuff_classes": ["background", "object"], "ignore_label": 255,
         "evaluator_type": "sem_seg", "num_frames": 5},
    )
    cfg = tiny_eval_cfg()
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        (rng.rand(1, 5, 64, 64, 3) * 255).astype(np.float32),
        rng.randn(1, 5, 96, 64).astype(np.float32), None)
    mesh = make_mesh()  # GLOBAL mesh: evaluate() must drop to the local slice
    res = evaluate(cfg, model, variables["params"], variables.get("frozen", {}),
                   "mp_s4_val", mesh=mesh)
    return res["sem_seg"]


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

    row = {"pid": pid, "total": total, "grad": grad,
           "count": ev._count, "res": res}
    if len(sys.argv) > 4:  # eval-fan-out phase: argv[4] = dataset root
        row["eval"] = eval_fanout(sys.argv[4])
        row["local_devices"] = jax.local_device_count()
    print(json.dumps(row))


if __name__ == "__main__":
    main()
