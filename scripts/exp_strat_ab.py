"""A/B: stratified chunk-sort point selection vs exact top-k — training
OUTCOME, not just recall (VERDICT r4 weak #6).

Production training selects PointRend's uncertain points with a stratified
per-256-lane-chunk sort (recall ~0.957 vs exact top-k,
losses/criterion.py:_stratified_uncertain_coords); the evidence for adopting
it was recall + speed only. This experiment trains tiny-model convergence
TWINS (identical seeds/data/graph except the selection algorithm, both at
the PRODUCTION selection shape: 12544 points, 3x oversample) on the chip and
compares loss trajectories against seed-to-seed variance.

Verdict rule: the |exact - stratified| final-loss gap must sit within the
spread of exact-topk runs across seeds (selection noise ~ seed noise =>
training-outcome neutral).

Usage: python scripts/exp_strat_ab.py [--steps 300] [--tiny]
"""

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_data(rng, B, T, S, K):
    """Learnable synthetic batch set: category-colored squares on noise."""
    n_batches = 8
    batches = []
    for _ in range(n_batches):
        imgs = rng.rand(B, T, S, S, 3).astype(np.float32) * 60.0
        masks = np.zeros((B, T, K, S, S), np.float32)
        labels = np.zeros((B, T, K), np.int32)
        valid = np.zeros((B, T, K), bool)
        for b in range(B):
            cx, cy = rng.randint(8, S - 8, 2)
            r = rng.randint(4, 8)
            color = rng.rand(3) * 150 + 100
            m = np.zeros((S, S), np.float32)
            m[cy - r : cy + r, cx - r : cx + r] = 1.0
            for t in range(T):
                imgs[b, t][m > 0] = color
                masks[b, t, 0] = m
                labels[b, t, 0] = 1
                valid[b, t, 0] = True
        batches.append({
            "images": imgs,
            "audio_log_mel": rng.randn(B, T, 96, 64).astype(np.float32),
            "pre_masks": imgs.copy(),
            "labels": labels, "masks": masks, "valid": valid,
            "gt_temporal_mask": np.ones((B, T), np.float32),
        })
    return batches


def run_twin(exact_topk: bool, seed: int, steps: int, tiny: bool):
    import jax

    from combo_avs_tpu.config import get_cfg
    from combo_avs_tpu.losses.criterion import SetCriterion, build_weight_dict
    from combo_avs_tpu.losses.matcher import HungarianMatcher
    from combo_avs_tpu.models.meta_arch import MaskFormer
    from combo_avs_tpu.train.optim import build_optimizer
    from combo_avs_tpu.train.train_step import create_train_state, make_train_step

    B, T, S, K = 2, 2, 64, 2
    model = MaskFormer(
        deterministic=False, num_classes=2, backbone_name="tiny_resnet",
        pre_sam_dim=(32, 64, 128, 256), vggish_width=0.125, hidden_dim=32,
        nheads=2, dim_feedforward=64, mask_dim=32, conv_dim=32,
        audio_out_dim=32, dec_layers=2, enc_layers=1, num_queries=8)
    rng = np.random.RandomState(100 + seed)
    batches = make_data(rng, B, T, S, K)

    cfg = get_cfg()
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.BASE_LR = 5e-4
    # model dec_layers=2 emits 3 prediction sets (queries + 2 layers), i.e.
    # aux _0 and _1 — the cfg convention counts prediction sets, so 3
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 3
    # PRODUCTION selection shape (12544 pts, 3x oversample) even though the
    # model is tiny — the selection algorithm is the experiment variable
    num_points = 256 if tiny else 12544
    criterion = SetCriterion(
        num_classes=2, matcher=HungarianMatcher(num_points=num_points),
        num_points=num_points, cosine_n_frame=T, exact_topk=exact_topk)
    wd = build_weight_dict(cfg)

    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(seed + 1)},
        batches[0]["images"], batches[0]["audio_log_mel"],
        batches[0]["pre_masks"], None)
    optimizer, _ = build_optimizer(cfg, variables["params"])
    state = create_train_state(model, optimizer, batches[0],
                               jax.random.PRNGKey(seed), variables=variables)
    step = make_train_step(model, criterion, wd, optimizer, donate=False)
    batches = jax.device_put(batches)

    losses = []
    key = jax.random.PRNGKey(777)  # SAME point-selection stream in both arms
    for it in range(steps):
        state, metrics = step(state, batches[it % len(batches)], key)
        if (it + 1) % 10 == 0:
            losses.append(float(metrics["total_loss"]))
    return losses


def main():
    tiny = "--tiny" in sys.argv
    steps = 40 if tiny else 300
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    import jax

    if tiny:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

    runs = {}
    t0 = time.perf_counter()
    for exact in (True, False):
        for seed in (0, 1):
            name = f"{'exact' if exact else 'strat'}_s{seed}"
            tr = run_twin(exact, seed, steps, tiny)
            tail = float(np.mean(tr[-max(2, len(tr) // 4):]))
            runs[name] = {"trajectory": tr, "tail_mean": round(tail, 4)}
            print(f"{name}: tail={tail:.4f} first={tr[0]:.3f} last={tr[-1]:.3f}",
                  flush=True)
            jax.clear_caches()

    seed_spread = abs(runs["exact_s0"]["tail_mean"] - runs["exact_s1"]["tail_mean"])
    algo_gap = max(abs(runs["exact_s0"]["tail_mean"] - runs["strat_s0"]["tail_mean"]),
                   abs(runs["exact_s1"]["tail_mean"] - runs["strat_s1"]["tail_mean"]))
    verdict = "NEUTRAL" if algo_gap <= max(2.0 * seed_spread, 0.05 * abs(
        runs["exact_s0"]["tail_mean"])) else "DIVERGENT"
    out = {"steps": steps, "tiny": tiny,
           "platform": jax.default_backend(),
           "seed_spread_exact": round(seed_spread, 4),
           "algo_gap_max": round(algo_gap, 4),
           "verdict": verdict, "runs": runs,
           "wall_s": round(time.perf_counter() - t0, 1)}
    path = os.path.join(REPO, ".synth", "strat_ab_r5.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "runs"}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
