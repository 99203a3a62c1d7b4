import jax
import jax.numpy as jnp
import numpy as np

from combo_avs_tpu.config import get_cfg
from combo_avs_tpu.losses.criterion import SetCriterion
from combo_avs_tpu.losses.matcher import HungarianMatcher
from combo_avs_tpu.models.meta_arch import MaskFormer
from combo_avs_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from combo_avs_tpu.train.optim import build_optimizer, classify_param, warmup_poly_schedule
from combo_avs_tpu.train.train_step import TrainState, create_train_state, make_train_step


def test_warmup_poly_schedule():
    s = warmup_poly_schedule(base_lr=1e-4, max_iter=1000, warmup_iters=0, power=0.9)
    np.testing.assert_allclose(float(s(0)), 1e-4, rtol=1e-6)
    assert float(s(500)) < 1e-4
    np.testing.assert_allclose(float(s(500)), 1e-4 * (0.5**0.9), rtol=1e-5)
    assert float(s(1000)) == 0.0
    sw = warmup_poly_schedule(1e-4, 1000, warmup_iters=10, warmup_factor=0.1)
    assert float(sw(0)) < float(sw(10))


def test_classify_param_rules():
    import jax.tree_util as jtu

    tree = {
        "backbone": {"res2_block0": {"conv1": {"kernel": 1}}},
        "pre_sam_backbone": {"stem_conv1": {"kernel": 1}},
        "audio_backbone": {"fc0": {"kernel": 1}},
        "sem_seg_head": {
            "predictor": {
                "query_feat": 1,
                "cross_norm0": {"scale": 1, "bias": 1},
                "ffn_linear1_0": {"kernel": 1, "bias": 1},
            }
        },
    }
    flat = jtu.tree_flatten_with_path(tree)[0]
    info = {"/".join(str(getattr(p, "key", p)) for p in path): classify_param(path)
            for path, _ in flat}
    assert info["backbone/res2_block0/conv1/kernel"]["backbone"]
    assert info["pre_sam_backbone/stem_conv1/kernel"]["backbone"]
    assert info["audio_backbone/fc0/kernel"]["frozen"]
    assert info["sem_seg_head/predictor/query_feat"]["no_wd"]
    assert info["sem_seg_head/predictor/cross_norm0/scale"]["no_wd"]
    assert not info["sem_seg_head/predictor/ffn_linear1_0/kernel"]["no_wd"]
    # plain linear bias keeps weight decay (d2 behavior)
    assert not info["sem_seg_head/predictor/ffn_linear1_0/bias"]["no_wd"]


def _setup_tiny():
    model = MaskFormer(dec_layers=1, enc_layers=1, num_queries=4, deterministic=False)
    rng = np.random.RandomState(0)
    B, T, S, K = 2, 2, 32, 2
    batch = {
        "images": (rng.rand(B, T, S, S, 3) * 255).astype(np.float32),
        "audio_log_mel": rng.randn(B, T, 96, 64).astype(np.float32),
        "pre_masks": (rng.rand(B, T, S, S, 3) * 255).astype(np.float32),
        "labels": np.zeros((B, T, K), np.int32),
        "masks": (rng.rand(B, T, K, S, S) > 0.5).astype(np.float32),
        "valid": np.ones((B, T, K), bool),
        "gt_temporal_mask": np.ones((B, T), np.float32),
    }
    cfg = get_cfg()
    cfg.SOLVER.MAX_ITER = 100
    criterion = SetCriterion(2, HungarianMatcher(num_points=64), num_points=64,
                             cosine_n_frame=2)
    wd = {}
    for s in ("", "_0"):
        wd.update({f"loss_ce{s}": 2.0, f"loss_mask{s}": 5.0, f"loss_dice{s}": 5.0})
    wd["loss_cosine_0"] = 10.0
    return model, batch, cfg, criterion, wd


def test_train_step_updates_and_freezes():
    model, batch, cfg, criterion, wd = _setup_tiny()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["images"], batch["audio_log_mel"], batch["pre_masks"], None)
    optimizer, _ = build_optimizer(cfg, variables["params"])
    state = create_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, criterion, wd, optimizer)

    # the step donates its input state (buffers reused in place) — snapshot
    # the comparison leaves to host first
    a0 = np.asarray(jax.tree.leaves(state.params["audio_backbone"])[0])
    d0 = np.asarray(jax.tree.leaves(state.params["sem_seg_head"])[0])
    f0 = np.asarray(jax.tree.leaves(state.frozen)[0])
    new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
    # vggish params unchanged (multiplier 0)
    a1 = jax.tree.leaves(new_state.params["audio_backbone"])[0]
    np.testing.assert_array_equal(a0, np.asarray(a1))
    # decoder params changed
    d1 = jax.tree.leaves(new_state.params["sem_seg_head"])[0]
    assert np.abs(d0 - np.asarray(d1)).max() > 0
    # frozen BN untouched
    f1 = jax.tree.leaves(new_state.frozen)[0]
    np.testing.assert_array_equal(f0, np.asarray(f1))


def test_train_step_sharded_on_mesh():
    # drop compiled executables + live buffers from the earlier single-device
    # tests: the 8-virtual-device sharded execution after them can abort in
    # the XLA:CPU runtime (SIGABRT at result fetch) when the process carries
    # their state; a fresh cache is also what real multi-process runs see
    jax.clear_caches()
    model, batch, cfg, criterion, wd = _setup_tiny()
    mesh = make_mesh(8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["images"], batch["audio_log_mel"], batch["pre_masks"], None)
    optimizer, _ = build_optimizer(cfg, variables["params"])
    # batch of 8 videos sharded across 8 devices
    batch8 = jax.tree.map(lambda x: np.concatenate([x] * 4, axis=0), batch)
    with mesh:
        state = create_train_state(model, optimizer, batch8, jax.random.PRNGKey(0))
        state = replicate(state, mesh)
        sbatch = shard_batch(batch8, mesh)
        # donate=False: donated buffers + the virtual 8-device CPU mesh can
        # SIGABRT in the XLA:CPU runtime depending on preceding-test state
        step = make_train_step(model, criterion, wd, optimizer, donate=False)
        new_state, metrics = step(state, sbatch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(new_state.step) == 1
