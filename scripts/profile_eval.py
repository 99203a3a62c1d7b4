"""Component-wise on-chip timing of the bf16 S4 eval step (COMBO-R50).

`jax.profiler` traces are unreliable through the axon tunnel, so this uses
the same honest methodology as bench.py (`utils.profiling.device_timer`:
on-device fori_loop with a scalar data dependency) per component, at the
bench shapes (B=4 videos x 5 frames, 224^2, bf16 params + inputs).

Usage: python scripts/profile_eval.py [--fp32]
Prints one line per component plus the full step, and the residual
(full - sum of parts = fusion glue / reshapes / uncounted ops).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from combo_avs_tpu.models.head import MaskFormerHead
    from combo_avs_tpu.models.layers import SqueezeExcite
    from combo_avs_tpu.models.meta_arch import MaskFormer, semantic_inference
    from combo_avs_tpu.models.resnet import ResNet
    from combo_avs_tpu.models.vggish import VGGish
    from combo_avs_tpu.utils.profiling import device_timer

    bf16 = "--fp32" not in sys.argv
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    B, T, S = 4, 5, 224
    N = B * T
    rng = np.random.RandomState(0)
    images = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)
    mel = rng.randn(B, T, 96, 64).astype(np.float32)
    pre = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)

    def cast(tree):
        return jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree
        )

    rows = []

    def timed(name, module, *args):
        # variables are passed as ARGUMENTS (a closure would inline them as
        # constants — the axon remote-compile upload rejects >100MB programs)
        v = cast(jax.jit(module.init)(jax.random.PRNGKey(0), *args))
        dt = device_timer(lambda v, *a: module.apply(v, *a), v, *cast(args), iters=32)
        rows.append((name, dt))
        return dt

    # 1. full model
    model = MaskFormer()
    vars_full = cast(jax.jit(model.init)(jax.random.PRNGKey(0), images, mel, pre))

    def full_step(v, images, mel, pre):
        out = model.apply(v, images, mel, pre)
        return semantic_inference(out["pred_logits"], out["pred_masks"], out_size=(S, S))

    t_full = device_timer(full_step, vars_full, *cast((images, mel, pre)), iters=16)
    rows.append(("FULL eval step (incl. semantic_inference)", t_full))

    # 2. components
    frames = (images.reshape(N, S, S, 3) - 127.5) / 58.0
    timed("R50 backbone (x1 tower)", ResNet(depth=50), frames.astype(np.float32))
    timed("VGGish audio tower", VGGish(),
          mel.reshape(N, 96, 64, 1).astype(np.float32))

    feats = {
        "res2": rng.randn(N, 56, 56, 256).astype(np.float32),
        "res3": rng.randn(N, 28, 28, 512).astype(np.float32),
        "res4": rng.randn(N, 14, 14, 1024).astype(np.float32),
        "res5": rng.randn(N, 7, 7, 2048).astype(np.float32),
    }
    se = SqueezeExcite(256)
    vse = cast(jax.jit(se.init)(jax.random.PRNGKey(0), feats["res2"]))
    dt = device_timer(lambda v, f: se.apply(v, f) * f + f, vse, cast(feats["res2"]), iters=64)
    rows.append(("SE gate+inject res2 (x4 levels approx 4x)", dt))

    head = MaskFormerHead(num_classes=2)
    audio = rng.randn(N, 1, 128).astype(np.float32)
    vhead = cast(jax.jit(head.init)(jax.random.PRNGKey(0), feats, audio))
    t_head = device_timer(lambda v, f, a: head.apply(v, f, a), vhead, cast(feats), cast(audio), iters=32)
    rows.append(("sem_seg_head (pixel dec + fusion + decoder)", t_head))

    # 2b. pixel decoder alone
    from combo_avs_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder

    pd = MSDeformAttnPixelDecoder()
    vpd = cast(jax.jit(pd.init)(jax.random.PRNGKey(0), feats))
    t_pd = device_timer(lambda v, f: pd.apply(v, f), vpd, cast(feats), iters=32)
    rows.append(("  pixel decoder (6-layer deformable encoder)", t_pd))
    rows.append(("  (head - pixel decoder = fusion + tx decoder)", t_head - t_pd))

    # 3. semantic_inference tail
    logits = rng.randn(N, 100, 3).astype(np.float32)
    masks = rng.randn(N, 100, 56, 56).astype(np.float32)
    t_si = device_timer(
        lambda l, m: semantic_inference(l, m, out_size=(S, S)), cast(logits),
        cast(masks), iters=64,
    )
    rows.append(("semantic_inference (100-mask upsample + einsum)", t_si))

    print(f"\n=== bf16={bf16}  B={B} T={T} S={S}  (s per step, {N} frames) ===")
    for name, dt in rows:
        print(f"{dt * 1e3:9.2f} ms  {dt / t_full * 100:5.1f}%  {name}")
    counted = sum(dt for name, dt in rows[1:] if not name.startswith(" "))
    # R50 tower runs twice (visual + pre-SAM)
    r50 = rows[1][1]
    counted += r50
    print(f"{(t_full - counted) * 1e3:9.2f} ms  residual (glue/reshapes; R50 counted x2)")
    print(f"frames/s: {N / t_full:.1f}")


if __name__ == "__main__":
    main()
