"""Benchmark: COMBO-AVS TPU — eval throughput and train-step time.

Modes (first JSON line is the driver metric):
  python bench.py                 # S4 eval frames/sec/chip, COMBO-R50, bf16
  python bench.py --fp32          # fp32 eval path
  python bench.py --model pvt     # S4 eval frames/sec/chip, COMBO-PVTv2-B5
  python bench.py --train         # S4 train s/step (bs8 x 5 frames, 224^2,
                                  #   full recipe: matcher + PointRend +
                                  #   cosine + AdamW + global clip)
  python bench.py --train --bs N  # other batch sizes
  python bench.py --train --model pvt     # PVTv2-B5 backbone training
  python bench.py --train --dataset avss  # AVSS v1s/v1m 5-frame bucket:
                                          #   71 classes, bf16 AMP, bs8
  python bench.py --train --dataset avss --frames 10   # AVSS v2 bucket
  python bench.py [--train] --tiny  # CPU-sized smoke of the measurement
                                    #   graph (used by the test gate)

Runs on ONE real chip with synthetic data (datasets/checkpoints are not
shipped in this image), and prints a single JSON line.

Measurement methodology: the step is looped K times ON DEVICE inside a
single jitted call (each iteration data-depends on the previous via the
carried state / a scalar) and a scalar is fetched at the end — this forces
true completion. On the experimental `axon` platform `block_until_ready`
returns before execution finishes, so naive per-call timing only measures
dispatch.

`vs_baseline`: the reference publishes no speed numbers (SURVEY §6), so the
baseline is DERIVED from the model's measured FLOPs (XLA's compiled
cost_analysis of this exact graph): an A100 reference running the same
forward fp32/TF32 at a generous 30% utilization of its 19.5 TFLOP/s fp32
peak (PyTorch eager conv nets typically land at 10-30%). The JSON line also
carries the absolute anchors: measured TFLOP/s and MFU against the chip's
peak (v5e: 197 bf16 TFLOP/s), so the claim is checkable without trusting
the A100 assumption. Train mode compares against an estimated 1.0 s/iter
A100 DDP step at bs8/224^2 (Mask2Former-R50 trains at ~0.8-1.1 s/iter on
A100 in published detectron2 logs; the reference adds a second backbone
tower + VGGish).
"""

import json
import time

import numpy as np

A100_FP32_PEAK_TFLOPS = 19.5
A100_ASSUMED_UTILIZATION = 0.30
V5E_BF16_PEAK_TFLOPS = 197.0
ASSUMED_A100_TRAIN_SEC_PER_ITER = 1.0


def _flag(name, default=None):
    import sys

    if name in sys.argv:
        i = sys.argv.index(name)
        if i + 1 < len(sys.argv) and not sys.argv[i + 1].startswith("--"):
            return sys.argv[i + 1]
        return True
    return default


# --tiny: CPU-sized smoke of the exact measurement graphs (the test gate runs
# both modes in-process, tests/test_bench_smoke.py) so a break in bench.py —
# the driver's official metric — fails CI instead of the round's bench run.
_TINY_MODEL_KWARGS = dict(
    backbone_name="tiny_resnet", pre_sam_dim=(32, 64, 128, 256),
    vggish_width=0.125, hidden_dim=32, nheads=2, dim_feedforward=64,
    mask_dim=32, conv_dim=32, audio_out_dim=32, dec_layers=2, enc_layers=1,
    num_queries=8,
)


def bench_eval():
    import jax
    import jax.numpy as jnp

    from combo_avs_tpu.models.meta_arch import MaskFormer, semantic_inference

    tiny = bool(_flag("--tiny"))
    use_pvt = "pvt" in str(_flag("--model", ""))
    # default eval batch: the r5 sweep (docs/eval_bs_sweep_r5.json) peaks
    # R50 at B=4 and PVT at B=8 (its 196-token stages amortize with rows)
    B = int(_flag("--bs", 2 if tiny else (8 if use_pvt else 4)))
    T, S = 5, (64 if tiny else 224)
    K = 2 if tiny else 8  # on-device loop length per timed call
    bf16 = not _flag("--fp32")
    if tiny:
        model = MaskFormer(**_TINY_MODEL_KWARGS)
    elif use_pvt:
        # COMBO-PVTv2-B5 (BASELINE.md second speed target)
        model = MaskFormer(
            backbone_name="build_pvtv2_b5_backbone",
            pre_sam_dim=(64, 128, 320, 512),
        )
    else:
        model = MaskFormer()  # full COMBO-R50 S4 architecture
    rng = np.random.RandomState(0)
    images = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)
    mel = rng.randn(B, T, 96, 64).astype(np.float32)
    pre = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), images, mel, pre)
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    if bf16:
        variables = jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, variables
        )

    @jax.jit
    def loop_steps(v, images, mel, pre):
        def body(i, carry):
            out = model.apply(v, images + carry.astype(dtype) * 1e-12, mel, pre)
            # masks stay bf16 through the 224^2 upsample (semantic_inference
            # contracts queries and returns fp32)
            sem = semantic_inference(
                out["pred_logits"], out["pred_masks"], out_size=(S, S)
            )
            return sem.mean()

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    cast_in = lambda x: x.astype(dtype)  # noqa: E731
    args = jax.device_put(
        (variables, cast_in(images), cast_in(mel), cast_in(pre))
    )

    # Measured FLOPs. XLA's cost analysis counts every rolled loop body
    # exactly ONCE: handy for the K-step fori (the looped graph's total IS
    # one step's), but it also counts each `nn.scan` stack (the pixel
    # decoder's 6 encoder layers; PVT's 3/6/40/3-block stages x2 towers) as
    # a single body — undercounting by (depth-1) bodies per scan site. So
    # the count comes from lowering (no compile, CPU backend) a twin model
    # with scan_unroll=0 (fully unrolled scans) under force_xla(): the
    # Pallas custom calls can't lower for CPU and would count 0 FLOPs
    # anyway, while the gather-based XLA composition counts the deformable
    # op's honest arithmetic.
    # flops_source self-describes which costing path produced the count so a
    # silent fallback can never masquerade as the honest number again (the
    # r4 MFU rows were corrupted exactly this way, docs/PROFILE_r4.md §6)
    flops_source = "unrolled"
    try:
        from combo_avs_tpu.ops.dispatch import force_xla

        model_cost = model.clone(scan_unroll=0)

        def one_step(v, images, mel, pre):
            out = model_cost.apply(v, images, mel, pre)
            return semantic_inference(
                out["pred_logits"], out["pred_masks"], out_size=(S, S)
            ).mean()

        shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), args
        )
        with force_xla(), jax.default_device(jax.devices("cpu")[0]):
            flops_step = float(
                jax.jit(one_step).lower(*shapes).cost_analysis()["flops"]
            )
    except Exception as e:
        import sys

        print(f"WARNING: unrolled FLOP costing failed ({e!r}); falling back "
              "to the rolled compiled graph (undercounts scan stacks)",
              file=sys.stderr)
        flops_source = "rolled"
        try:
            flops_step = float(
                loop_steps.lower(*args).compile().cost_analysis()["flops"]
            )
        except Exception as e2:
            print(f"WARNING: rolled FLOP costing failed too ({e2!r}); "
                  "FLOPs-derived fields will be null/0", file=sys.stderr)
            flops_source = "none"
            flops_step = 0.0
    float(loop_steps(*args))  # warm up (same jit: compile already done)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop_steps(*args))  # scalar fetch forces completion
        times.append((time.perf_counter() - t0) / K)
    dt = min(times)

    frames_per_sec = B * T / dt
    flops_per_frame = flops_step / (B * T)
    achieved_tflops = flops_per_frame * frames_per_sec / 1e12
    mfu = achieved_tflops / V5E_BF16_PEAK_TFLOPS
    # FLOPs-derived A100 reference estimate (see module docstring)
    a100_fps = (
        A100_ASSUMED_UTILIZATION * A100_FP32_PEAK_TFLOPS * 1e12 / flops_per_frame
        if flops_per_frame
        else 0.0
    )
    print(
        json.dumps(
            {
                "metric": ("TINY-SMOKE " if tiny else "")
                + "S4 eval frames/sec/chip "
                + ("(COMBO-PVTv2" if use_pvt and not tiny else "(COMBO-R50")
                + (", bf16)" if bf16 else ", fp32)"),
                "value": round(frames_per_sec, 2),
                "unit": "frames/s",
                "vs_baseline": round(frames_per_sec / a100_fps, 3) if a100_fps else None,
                "gflops_per_frame": round(flops_per_frame / 1e9, 1),
                "achieved_tflops": round(achieved_tflops, 2),
                "mfu_vs_v5e_bf16_peak": round(mfu, 4),
                "a100_baseline_frames_per_sec_est": round(a100_fps, 1),
                "flops_source": flops_source,
            }
        )
    )


def bench_train():
    """Full training step at reference shapes: forward + Hungarian matching
    + PointRend/dice/CE/cosine losses + backward + global clip + AdamW.

    Variants (matching the reference's training config matrix):
      default            S4 COMBO-R50, bs8 x 5 frames, fp32
                         (ref: configs/avs_s4/COMBO_R50_bs8_90k.yaml)
      --model pvt        S4 COMBO-PVTv2-B5 backbone
      --dataset avss     AVSS regime: 71 classes, temporal masks, bf16 AMP
                         (ref: configs/avs_ss/R50-AVSS-SemanticSegmentation
                         .yaml:44). The production loader buckets records by
                         frame count (catalogs.py: v1s/v1m are 5-frame, v2 is
                         10-frame), so batches are homogeneous: the default
                         times the 5-frame v1s bucket, `--frames 10` the v2
                         bucket. Criterion is built exactly as the Trainer
                         builds it (cosine_n_frame=5, trainer.py:93) and
                         targets use the mapper's 12 instance slots."""
    import jax
    import jax.numpy as jnp

    from combo_avs_tpu.config import get_cfg
    from combo_avs_tpu.losses.criterion import SetCriterion, build_weight_dict
    from combo_avs_tpu.losses.matcher import HungarianMatcher
    from combo_avs_tpu.models.meta_arch import MaskFormer
    from combo_avs_tpu.train.optim import build_optimizer
    from combo_avs_tpu.train.train_step import create_train_state, make_train_step

    tiny = bool(_flag("--tiny"))
    avss = "avss" in str(_flag("--dataset", ""))
    use_pvt = "pvt" in str(_flag("--model", ""))
    force_amp = bool(_flag("--amp"))  # bf16 AMP for S4 too (TPU-native option;
    # the reference recipe keeps S4/MS3 fp32 and only AVSS enables AMP)
    B = int(_flag("--bs", 2 if tiny else 8))  # IMS_PER_BATCH 8 in the recipes
    # frame count: production batches are frame-count homogeneous (the AVSS
    # loader buckets records, catalogs.py:120-127) — v1s/v1m are 5-frame,
    # v2 is 10-frame; S4/MS3 are always 5-frame
    T = int(_flag("--frames", 5))
    # Kslots: instance-slot padding as build_mapper sets it (trainer.py:54) —
    # 3 slots for binary-GT S4/MS3, 12 for AVSS index labels
    S, Kslots = (64 if tiny else 224), (12 if avss else 3)
    num_classes = 71 if avss else 2
    amp = avss or force_amp  # reference enables AMP only for AVSS
    LOOP = 1 if tiny else 4

    kwargs = {}
    if tiny:
        kwargs = dict(_TINY_MODEL_KWARGS)
        if avss:
            # the Hungarian matcher needs num_queries >= the 12 AVSS
            # instance slots (ops/lsap.py expects R <= C)
            kwargs["num_queries"] = 16
    elif use_pvt:
        kwargs = dict(backbone_name="build_pvtv2_b5_backbone",
                      pre_sam_dim=(64, 128, 320, 512))
    policy = str(_flag("--remat-policy", ""))  # "" | "save_deform"
    if policy:
        kwargs["remat_policy"] = policy
    model = MaskFormer(deterministic=False, num_classes=num_classes, **kwargs)
    rng = np.random.RandomState(0)
    batch = {
        "images": (rng.rand(B, T, S, S, 3) * 255).astype(np.float32),
        "audio_log_mel": rng.randn(B, T, 96, 64).astype(np.float32),
        "pre_masks": (rng.rand(B, T, S, S, 3) * 255).astype(np.float32),
        "labels": rng.randint(0, num_classes, (B, T, Kslots)).astype(np.int32),
        "masks": (rng.rand(B, T, Kslots, S, S) > 0.5).astype(np.float32),
        "valid": np.zeros((B, T, Kslots), bool),
    }
    if avss:
        # bucketed batches, all frames real (vid mask all ones): the default
        # T=5 is the v1s/v1m bucket (v1s train has first frame annotated,
        # catalogs.py:120-122); T=10 is the v2 bucket (all annotated)
        batch["vid_temporal_mask"] = np.ones((B, T), np.float32)
        gt = [1.0] + [0.0] * (T - 1) if T == 5 else [1.0] * T
        batch["gt_temporal_mask"] = np.tile(np.array(gt, np.float32), (B, 1))
    else:
        batch["gt_temporal_mask"] = np.tile(
            np.array([1.0] + [0.0] * (T - 1), np.float32), (B, 1)
        )  # S4: first annotated frame only
    batch["valid"][:, :, :2] = True  # ~2 objects per frame

    cfg = get_cfg()
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    matcher = HungarianMatcher()
    criterion = SetCriterion(num_classes=num_classes, matcher=matcher,
                             cosine_n_frame=5,  # trainer.py:93: always 5
                             vmap_layers=bool(_flag("--vmap-criterion")))
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 10
    wd = build_weight_dict(cfg)

    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["images"], batch["audio_log_mel"], batch["pre_masks"],
        batch.get("vid_temporal_mask"),
    )
    optimizer, _ = build_optimizer(cfg, variables["params"])
    state = create_train_state(
        model, optimizer, batch, jax.random.PRNGKey(0), variables=variables
    )
    train_step = make_train_step(model, criterion, wd, optimizer, amp=amp)

    batch = jax.device_put(batch)

    @jax.jit
    def loop_steps(state, batch):
        def body(i, s):
            s2, metrics = train_step(s, batch, jax.random.fold_in(jax.random.PRNGKey(7), i))
            return s2

        final = jax.lax.fori_loop(0, LOOP, body, state)
        return final, jnp.float32(0) + jax.tree.leaves(final.params)[0].ravel()[0]

    state2, scalar = loop_steps(state, batch)
    float(scalar)  # compile + warm up
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, scalar = loop_steps(state, batch)
        float(scalar)
        times.append((time.perf_counter() - t0) / LOOP)
    dt = min(times)

    name = ("TINY-SMOKE " if tiny else "") + (
        "AVSS" if avss else "S4"
    ) + " train s/step (COMBO-" + (
        "PVTv2" if use_pvt and not tiny else "R50"
    ) + f", bs{B} x {T}f, {S}^2" + (", bf16 AMP)" if amp else ")")
    print(
        json.dumps(
            {
                "metric": name,
                "value": round(dt, 3),
                "unit": "s/step",
                "vs_baseline": round(ASSUMED_A100_TRAIN_SEC_PER_ITER / dt, 3),
            }
        )
    )


def main():
    # persistent compile cache: repeated driver/bench runs at the same HEAD
    # skip the 2-15 min tunnel compile (same dir scripts/bench_all.py uses)
    import os

    import jax

    if _flag("--tiny"):
        # standalone tiny smoke must not attach to the (exclusive) chip;
        # JAX_PLATFORMS env is ignored under axon — use the config knob
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized (in-process test harness)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    if _flag("--train"):
        bench_train()
    else:
        bench_eval()


if __name__ == "__main__":
    main()
