"""Component-wise on-chip timing of the S4 train step (COMBO-R50, bs8, fp32).

Splits the 0.57 s/step into: model forward, model forward+backward,
criterion forward (matcher + PointRend/dice/CE/cosine over 10 decoder
layers), criterion forward+backward (w.r.t. model outputs), matcher alone,
and the AdamW+clip update. Uses the axon-safe device_timer.

Usage: python scripts/profile_train.py [--bs N]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax

    if "--tiny" in sys.argv:  # CPU smoke (JAX_PLATFORMS env is ignored here)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from combo_avs_tpu.config import get_cfg
    from combo_avs_tpu.losses.criterion import SetCriterion, build_weight_dict, total_loss
    from combo_avs_tpu.losses.matcher import HungarianMatcher
    from combo_avs_tpu.models.meta_arch import MaskFormer
    from combo_avs_tpu.train.optim import build_optimizer
    from combo_avs_tpu.train.train_step import (
        _flatten_targets, create_train_state, make_train_step)
    from combo_avs_tpu.utils.profiling import device_timer

    tiny = "--tiny" in sys.argv  # CPU smoke of the measurement graphs
    B = 2 if tiny else 8
    if "--bs" in sys.argv:
        B = int(sys.argv[sys.argv.index("--bs") + 1])
    T, S, K = 5, (64 if tiny else 224), 3
    if tiny:
        model = MaskFormer(
            deterministic=False, num_classes=2, backbone_name="tiny_resnet",
            pre_sam_dim=(32, 64, 128, 256), vggish_width=0.125, hidden_dim=32,
            nheads=2, dim_feedforward=64, mask_dim=32, conv_dim=32,
            audio_out_dim=32, dec_layers=2, enc_layers=1, num_queries=8)
    else:
        model = MaskFormer(deterministic=False, num_classes=2)
    rng = np.random.RandomState(0)
    batch = {
        "images": (rng.rand(B, T, S, S, 3) * 255).astype(np.float32),
        "audio_log_mel": rng.randn(B, T, 96, 64).astype(np.float32),
        "pre_masks": (rng.rand(B, T, S, S, 3) * 255).astype(np.float32),
        "labels": rng.randint(0, 2, (B, T, K)).astype(np.int32),
        "masks": (rng.rand(B, T, K, S, S) > 0.5).astype(np.float32),
        "valid": np.zeros((B, T, K), bool),
        "gt_temporal_mask": np.tile(
            np.array([1.0] + [0.0] * (T - 1), np.float32), (B, 1)),
    }
    batch["valid"][:, :, :2] = True

    cfg = get_cfg()
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 10
    matcher = HungarianMatcher()
    criterion = SetCriterion(num_classes=2, matcher=matcher, cosine_n_frame=T)
    wd = build_weight_dict(cfg)

    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["images"], batch["audio_log_mel"], batch["pre_masks"], None,
    )
    optimizer, _ = build_optimizer(cfg, variables["params"])
    state = create_train_state(model, optimizer, batch, jax.random.PRNGKey(0),
                               variables=variables)
    train_step = make_train_step(model, criterion, wd, optimizer)
    batch = jax.device_put(batch)
    rows = []

    # 1. full step — return the UPDATED param tree, not just the loss:
    # device_timer's carry only chains what fn returns, and XLA dead-code
    # eliminates everything the returned scalar doesn't need (returning only
    # the loss metric DCE'd the whole backward+optimizer: 237 ms vs the real
    # 589 ms, caught round 4 on-chip)
    def full(state, batch):
        s2, m = train_step(state, batch, jax.random.PRNGKey(7))
        return (s2.params, m["total_loss"])
    rows.append(("FULL train step", device_timer(full, state, batch, iters=4)))
    print(f"{rows[-1][1] * 1e3:9.1f} ms  FULL", flush=True)

    params, frozen = state.params, state.frozen

    def fwd_model(params, batch):
        return model.apply(
            {"params": params, "frozen": frozen}, batch["images"],
            batch["audio_log_mel"], batch["pre_masks"], None,
            rngs={"dropout": jax.random.PRNGKey(3)})

    # 2. model forward only (sum outputs)
    def fwd_only(params, batch):
        out = fwd_model(params, batch)
        return sum(jnp.sum(l) for l in jax.tree.leaves(out))
    rows.append(("model forward", device_timer(fwd_only, params, batch, iters=8)))
    print(f"{rows[-1][1] * 1e3:9.1f} ms  model fwd", flush=True)

    # 3. model forward+backward (no criterion); return the full grad tree
    # (a single grad element would let XLA DCE the other params' backward)
    gfn = jax.grad(fwd_only)
    def fwd_bwd(params, batch):
        return gfn(params, batch)
    rows.append(("model fwd+bwd", device_timer(fwd_bwd, params, batch, iters=4)))
    print(f"{rows[-1][1] * 1e3:9.1f} ms  model fwd+bwd", flush=True)

    # criterion on fixed outputs
    outputs = jax.jit(fwd_model)(params, batch)
    targets = {k: jnp.asarray(v) for k, v in _flatten_targets(batch).items()}
    fw = jnp.asarray(batch["gt_temporal_mask"]).reshape(-1)

    def crit(outputs):
        losses = criterion(jax.random.PRNGKey(11), outputs, targets, frame_weight=fw)
        return total_loss(losses, wd)
    rows.append(("criterion fwd (incl matcher)",
                 device_timer(crit, outputs, iters=8)))
    print(f"{rows[-1][1] * 1e3:9.1f} ms  criterion fwd", flush=True)

    cgfn = jax.grad(lambda o: crit(o))
    def crit_bwd(outputs):
        return cgfn(outputs)  # full grad tree — see the DCE note above
    rows.append(("criterion fwd+bwd (w.r.t. outputs)",
                 device_timer(crit_bwd, outputs, iters=4)))
    print(f"{rows[-1][1] * 1e3:9.1f} ms  criterion fwd+bwd", flush=True)

    # matcher alone (frame-level, as the criterion calls it per layer)
    def match_only(outputs):
        a = matcher(jax.random.PRNGKey(13),
                    outputs["pred_logits"], outputs["pred_masks"],
                    targets["labels"], targets["masks"], targets["valid"])
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(a))
    rows.append(("matcher (1 layer)", device_timer(match_only, outputs, iters=8)))
    print(f"{rows[-1][1] * 1e3:9.1f} ms  matcher x1", flush=True)

    # optimizer update alone
    gsample = jax.jit(lambda p: jax.tree.map(lambda x: x * 1e-3, p))(params)
    def opt_only(g, params):
        upd, _ = optimizer.update(g, state.opt_state, params)
        return upd  # full tree — see the DCE note above
    rows.append(("optimizer update (AdamW+clip)",
                 device_timer(opt_only, gsample, params, iters=8)))
    print(f"{rows[-1][1] * 1e3:9.1f} ms  optimizer", flush=True)

    print(f"\n=== bs{B} x {T}f fp32 train step ===")
    for name, dt in rows:
        print(f"{dt * 1e3:9.1f} ms  {name}")


if __name__ == "__main__":
    main()
