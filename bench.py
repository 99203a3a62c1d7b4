"""Benchmark: COMBO-R50 S4 inference throughput (frames/sec/chip).

Runs the flagship eval path (frozen VGGish audio + double ResNet-50 towers +
SEM injection + MSDeformAttn pixel decoder + MHA-B late fusion + 9-layer
masked-attention decoder + semantic inference upsampled to 224^2) on ONE real
chip with synthetic data (datasets/checkpoints are not shipped in this image),
and prints a single JSON line.

Measurement methodology: the model is looped K times ON DEVICE inside a
single jitted call (each iteration data-depends on the previous via a scalar
carry) and a scalar is fetched at the end — this forces true completion. On
the experimental `axon` platform `block_until_ready` returns before execution
finishes, so naive per-call timing only measures dispatch.

The reference publishes no speed numbers (SURVEY §6); `vs_baseline` is the
ratio against an assumed 100 frames/sec/chip for the PyTorch reference on
A100 (conservative estimate for fp32 eval of a ~160M-param Mask2Former-style
model; BASELINE.md notes the reference logs s/iter only).
"""

import json
import time

import numpy as np

ASSUMED_A100_FRAMES_PER_SEC = 100.0


def main():
    import sys

    import jax
    import jax.numpy as jnp

    from combo_avs_tpu.models.meta_arch import MaskFormer, semantic_inference

    B, T, S = 4, 5, 224  # 4 videos x 5 frames, the S4 regime
    K = 8  # on-device loop length per timed call
    use_pvt = "--model" in sys.argv and "pvt" in sys.argv[sys.argv.index("--model") + 1]
    if use_pvt:
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

    @jax.jit
    def loop_steps(v, images, mel, pre):
        def body(i, carry):
            out = model.apply(v, images + carry * 1e-12, mel, pre)
            sem = semantic_inference(
                out["pred_logits"], out["pred_masks"], out_size=(S, S)
            )
            return sem.mean()

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    args = jax.device_put((variables, images, mel, pre))
    float(loop_steps(*args))  # compile + warm up

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop_steps(*args))  # scalar fetch forces completion
        times.append((time.perf_counter() - t0) / K)
    dt = min(times)

    frames_per_sec = B * T / dt
    print(
        json.dumps(
            {
                "metric": "S4 eval frames/sec/chip "
                + ("(COMBO-PVTv2)" if use_pvt else "(COMBO-R50)"),
                "value": round(frames_per_sec, 2),
                "unit": "frames/s",
                "vs_baseline": round(frames_per_sec / ASSUMED_A100_FRAMES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
