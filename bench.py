"""Benchmark: COMBO-R50 S4 inference throughput (frames/sec/chip).

Runs the flagship eval path (frozen VGGish audio + double ResNet-50 towers +
SEM injection + MSDeformAttn pixel decoder + MHA-B late fusion + 9-layer
masked-attention decoder + semantic inference upsampled to 224^2) on ONE real
chip with synthetic data (datasets/checkpoints are not shipped in this image),
and prints a single JSON line.

The reference publishes no speed numbers (SURVEY §6); `vs_baseline` is the
ratio against an assumed 100 frames/sec/chip for the PyTorch reference on
A100 (conservative estimate for bs=2 fp32 eval of a ~160M-param
Mask2Former-style model; BASELINE.md notes the reference logs s/iter only).
"""

import json
import time

import numpy as np

ASSUMED_A100_FRAMES_PER_SEC = 100.0


def main():
    import jax

    from combo_avs_tpu.models.meta_arch import MaskFormer, semantic_inference

    B, T, S = 4, 5, 224  # 4 videos x 5 frames, the S4 regime
    model = MaskFormer()  # full COMBO-R50 S4 architecture
    rng = np.random.RandomState(0)
    images = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)
    mel = rng.randn(B, T, 96, 64).astype(np.float32)
    pre = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), images, mel, pre)

    @jax.jit
    def eval_step(v, images, mel, pre):
        out = model.apply(v, images, mel, pre)
        return semantic_inference(out["pred_logits"], out["pred_masks"], out_size=(S, S))

    # warmup / compile
    jax.block_until_ready(eval_step(variables, images, mel, pre))
    jax.block_until_ready(eval_step(variables, images, mel, pre))

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = eval_step(variables, images, mel, pre)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    frames_per_sec = (B * T * n_iters) / dt
    print(
        json.dumps(
            {
                "metric": "S4 eval frames/sec/chip (COMBO-R50)",
                "value": round(frames_per_sec, 2),
                "unit": "frames/s",
                "vs_baseline": round(frames_per_sec / ASSUMED_A100_FRAMES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
