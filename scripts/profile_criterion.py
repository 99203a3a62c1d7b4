"""Component-wise on-chip timing of the training criterion (fp32, bs8 x 5f).

profile_train (DCE-fixed) shows the criterion forward at ~158 ms of the
~589 ms S4 train step — more than 2x the model forward. This splits it:

  * criterion fwd (all 10 layers via lax.map)     — the whole thing
  * matcher x1: full call                          — cost matrix + LSAP
  * matcher x1: cost_matrix only                   — point sampling + costs
  * matcher x1: LSAP only (precomputed cost)       — the JV solver
  * loss_masks x1 (fixed assignment)               — PointRend CE+dice
  * uncertainty_sampled_points x1                  — 3x oversample + top-k
  * EXPERIMENT bf16 cost sampling: cost_matrix with pred/tgt masks cast to
    bf16 (matching is no-grad and only needs cost ORDERING; fp32 matmuls on
    the MXU run at ~1/4 the bf16 rate)

Usage: python scripts/profile_criterion.py [--bs N] [--tiny]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax

    if "--tiny" in sys.argv:  # CPU smoke (JAX_PLATFORMS env is ignored here)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from combo_avs_tpu.losses.criterion import (
        SetCriterion, build_weight_dict, total_loss, uncertainty_sampled_points)
    from combo_avs_tpu.losses.matcher import HungarianMatcher
    from combo_avs_tpu.config import get_cfg
    from combo_avs_tpu.ops.lsap import solve_lsap_batch
    from combo_avs_tpu.utils.profiling import device_timer

    tiny = "--tiny" in sys.argv
    B = 2 if tiny else 8
    if "--bs" in sys.argv:
        B = int(sys.argv[sys.argv.index("--bs") + 1])
    T, K = 5, 3
    Q, C = (8, 2) if tiny else (100, 2)
    h = w = 16 if tiny else 56  # pred-mask resolution (224/4)
    H = W = 64 if tiny else 224
    N = B * T
    NPTS = 128 if tiny else 12544

    rng = np.random.RandomState(0)
    # synthetic model outputs at production shapes (10 decoder layers)
    layer = lambda: {  # noqa: E731
        "pred_logits": jnp.asarray(rng.randn(N, Q, C + 1).astype(np.float32)),
        "pred_masks": jnp.asarray(rng.randn(N, Q, h, w).astype(np.float32)),
    }
    final = layer()
    outputs = dict(final)
    outputs["aux_outputs"] = [layer() for _ in range(9)]
    targets = {
        "labels": jnp.asarray(rng.randint(0, C, (N, K)).astype(np.int32)),
        "masks": jnp.asarray((rng.rand(N, K, H, W) > 0.5).astype(np.float32)),
        "valid": jnp.asarray(
            np.broadcast_to(np.array([True, True, False]), (N, K)).copy()),
    }
    fw = jnp.asarray(
        np.tile(np.array([1.0] + [0.0] * (T - 1), np.float32), (B,)))

    cfg = get_cfg()
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 10
    wd = build_weight_dict(cfg)
    matcher = HungarianMatcher(num_points=NPTS)
    criterion = SetCriterion(num_classes=C, matcher=matcher, cosine_n_frame=T,
                             num_points=NPTS)
    key = jax.random.PRNGKey(3)
    rows = []

    def rec(name, fn, *args, iters=8):
        dt = device_timer(fn, *args, iters=iters)
        rows.append((name, dt))
        print(f"{dt * 1e3:9.2f} ms  {name}", flush=True)

    # 1. full criterion (10 layers)
    def crit(outputs):
        return total_loss(
            criterion(key, outputs, targets, frame_weight=fw), wd)
    rec("criterion fwd, 10 layers", crit, outputs, iters=4)

    # 1b. EXPERIMENT: the 10 layers batched with vmap instead of lax.map
    # (same compiled body, 10x fewer dispatches, ~10x live intermediates)
    crit_v = SetCriterion(num_classes=C, matcher=matcher, cosine_n_frame=T,
                          num_points=NPTS, vmap_layers=True)

    def critv(outputs):
        return total_loss(
            crit_v(key, outputs, targets, frame_weight=fw), wd)
    try:
        rec("EXPT criterion fwd, vmap layers", critv, outputs, iters=4)
        lm_ = jax.jit(crit)(outputs)
        lv_ = jax.jit(critv)(outputs)
        print(f"          vmap-vs-map total loss: {float(lm_):.6f} vs "
              f"{float(lv_):.6f}", flush=True)
    except Exception as e:
        print(f"          vmap layers EXPT failed: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    # 2. matcher x1 full
    def match1(o):
        return matcher(key, o["pred_logits"], o["pred_masks"],
                       targets["labels"], targets["masks"], targets["valid"])
    rec("matcher x1 (cost + LSAP)", match1, final)

    # 3. cost matrix only
    def cost1(o):
        return matcher.cost_matrix(
            key, o["pred_logits"], o["pred_masks"],
            targets["labels"], targets["masks"], targets["valid"])
    rec("matcher x1: cost_matrix", cost1, final)

    # 4. LSAP only on a precomputed cost
    cost = jax.jit(cost1)(final)
    def lsap1(cost):
        return solve_lsap_batch(jnp.swapaxes(cost, 1, 2))
    rec("matcher x1: LSAP (JV) only", lsap1, cost, iters=16)

    # 5. one layer's PointRend losses at a fixed assignment
    assign = jax.jit(match1)(final)
    def lm1(o, assign):
        return criterion._loss_masks(
            key, o["pred_masks"], targets["masks"], targets["valid"], assign,
            jnp.float32(N * 2))
    rec("loss_masks x1 (CE+dice points)", lm1, final, assign)

    # 6. point selection alone (no-grad part of loss_masks)
    src = jnp.asarray(rng.randn(N * K, h, w).astype(np.float32))
    def sel1(src):
        return uncertainty_sampled_points(key, src, NPTS, 3.0, 0.75)
    rec("uncertainty point selection x1", sel1, src)

    # 6b. selection sub-split: oversample sampling / approx top-k / gather
    from combo_avs_tpu.ops.dispatch import pallas_available
    from combo_avs_tpu.ops.grid_sample import point_sample

    M_, NS = N * K, int(NPTS * 3.0)
    NU = int(NPTS * 0.75)
    coords = jax.random.uniform(jax.random.PRNGKey(5), (M_, NS, 2))
    def samp_overs(src, coords):
        return point_sample(src[..., None], coords)[..., 0]
    rec("  sel: 3x-oversample sampling", samp_overs, src, coords)
    unc = jax.jit(lambda s, c: -jnp.abs(samp_overs(s, c)))(src, coords)
    def topk_only(unc):
        return jax.lax.approx_max_k(unc, NU, recall_target=0.95)[1]
    rec("  sel: approx_max_k", topk_only, unc, iters=16)
    idx = jax.jit(topk_only)(unc)
    if pallas_available():
        from combo_avs_tpu.ops.gather_pallas import gather_lanes

        def gath(coords, idx):
            flat = jnp.concatenate([coords[..., 0], coords[..., 1]], axis=0)
            return gather_lanes(flat, jnp.concatenate([idx, idx], axis=0))
        rec("  sel: coord gather (lane one-hot)", gath, coords, idx, iters=16)

    # 6c. matcher cost sub-split: pred sampling / tgt sampling / cost math
    from combo_avs_tpu.ops.point_sample_pallas import (
        point_sample_shared_or_fallback)

    pts = jax.random.uniform(jax.random.PRNGKey(7), (N, NPTS, 2))
    predm = jnp.transpose(final["pred_masks"], (0, 2, 3, 1))  # [N, h, w, Q]
    tgtm = jnp.transpose(targets["masks"], (0, 2, 3, 1))  # [N, H, W, K]
    def samp_pred(predm, pts):
        return point_sample_shared_or_fallback(predm, pts)
    rec("  cost: pred sampling (Q ch)", samp_pred, predm, pts, iters=16)
    def samp_tgt(tgtm, pts):
        return point_sample_shared_or_fallback(tgtm, pts)
    rec(f"  cost: tgt sampling (K ch, {H}^2)", samp_tgt, tgtm, pts, iters=16)
    out_pts = jnp.swapaxes(jax.jit(samp_pred)(predm, pts), 1, 2)  # [N, Q, P]
    tgt_pts = jnp.swapaxes(jax.jit(samp_tgt)(tgtm, pts), 1, 2)  # [N, K, P]
    from combo_avs_tpu.losses.matcher import (
        batch_dice_cost, batch_sigmoid_ce_cost)
    def cost_math(o, t):
        return (jax.vmap(batch_sigmoid_ce_cost)(o, t)
                + jax.vmap(batch_dice_cost)(o, t))
    rec("  cost: BCE+dice cost math", cost_math, out_pts, tgt_pts, iters=16)

    # 7. EXPERIMENT: bf16 cost sampling (ordering-only use of the matmuls)
    def cost_bf16(o):
        return matcher.cost_matrix(
            key, o["pred_logits"],
            o["pred_masks"].astype(jnp.bfloat16),
            targets["labels"], targets["masks"].astype(jnp.bfloat16),
            targets["valid"])
    try:
        rec("EXPT cost_matrix bf16 sampling", cost_bf16, final)
        c32 = np.asarray(cost)
        cb = np.asarray(jax.jit(cost_bf16)(final)).astype(np.float32)
        a32 = np.asarray(jax.jit(lambda c: solve_lsap_batch(
            jnp.swapaxes(c, 1, 2)))(jnp.asarray(c32)))
        ab = np.asarray(jax.jit(lambda c: solve_lsap_batch(
            jnp.swapaxes(c, 1, 2)))(jnp.asarray(cb)))
        same = float((a32 == ab).mean())
        print(f"          bf16 cost: max |dC|={np.abs(c32 - cb).max():.4f}, "
              f"assignment agreement={same:.4f}", flush=True)
    except Exception as e:
        print(f"          bf16 cost EXPT failed: {type(e).__name__}: {e}",
              flush=True)

    print(f"\n=== criterion profile bs{B} x {T}f (N={N} frames, Q={Q}, "
          f"K={K}, {NPTS} pts) fp32 ===")
    for name, dt in rows:
        print(f"{dt * 1e3:9.2f} ms  {name}")


if __name__ == "__main__":
    main()
