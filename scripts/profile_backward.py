"""Where do the S4 train step's backward milliseconds go?

profile_train (DCE-fixed, docs/PROFILE_r4.md) puts model fwd+bwd at
395.9 ms vs 76.0 ms forward — backward is 4.2x forward, well past the
usual 2-3x. Suspects: the full-layer remat of the deformable encoder
(replays 6 Pallas forward kernels in backward, pixel_decoder.py:211-219),
the heads-fused Pallas backward kernel itself (fp32-HIGHEST accumulation
regardless of AMP), and the two R50 towers' conv backward.

Measures, at the bs8 x 5f production train shape (--bs to change):
  * model fwd / fwd+bwd, fp32 and bf16-AMP-cast
  * one R50 tower fwd / fwd+bwd
  * pixel decoder fwd / fwd+bwd with remat=True vs remat=False
    (remat=False needs ~16.6 GB XLA temps at bs8 — use --bs 4 if it OOMs)
  * the deformable-attention Pallas kernel standalone fwd / fwd+bwd
    per encoder layer-call

Usage: python scripts/profile_backward.py [--bs N] [--tiny]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax

    if "--tiny" in sys.argv:  # CPU smoke (JAX_PLATFORMS env is ignored here)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from combo_avs_tpu.models.meta_arch import MaskFormer
    from combo_avs_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder
    from combo_avs_tpu.models.resnet import ResNet
    from combo_avs_tpu.ops.deform_attn_pallas import ms_deform_attn
    from combo_avs_tpu.utils.profiling import device_timer

    tiny = "--tiny" in sys.argv
    B = 2 if tiny else 8
    if "--bs" in sys.argv:
        B = int(sys.argv[sys.argv.index("--bs") + 1])
    T, S = 5, (64 if tiny else 224)
    N = B * T
    rng = np.random.RandomState(0)
    rows = []

    def rec(name, dt):
        rows.append((name, dt))
        print(f"{dt * 1e3:9.1f} ms  {name}", flush=True)

    def fwd_and_fwdbwd(name, module, variables, *args, iters=4):
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def fwd(params, *a):
            out = module.apply({"params": params, **rest}, *a)
            return sum(jnp.sum(l) for l in jax.tree.leaves(out))

        rec(f"{name} fwd", device_timer(fwd, params, *args, iters=iters * 2))
        gfn = jax.grad(fwd)
        rec(f"{name} fwd+bwd",
            device_timer(lambda p, *a: gfn(p, *a), params, *args, iters=iters))

    # ------------------------------------------------------------------
    # 1/2. full model, fp32 and AMP-cast
    if tiny:
        model = MaskFormer(
            deterministic=False, num_classes=2, backbone_name="tiny_resnet",
            pre_sam_dim=(32, 64, 128, 256), vggish_width=0.125, hidden_dim=32,
            nheads=2, dim_feedforward=64, mask_dim=32, conv_dim=32,
            audio_out_dim=32, dec_layers=2, enc_layers=1, num_queries=8)
    else:
        model = MaskFormer(deterministic=False, num_classes=2)
    images = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)
    mel = rng.randn(B, T, 96, 64).astype(np.float32)
    pre = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, mel, pre, None)
    frozen = variables.get("frozen", {})

    def model_fwd(params, frozen, images, mel, pre):
        out = model.apply({"params": params, "frozen": frozen}, images, mel,
                          pre, None, rngs={"dropout": jax.random.PRNGKey(3)})
        return sum(jnp.sum(l) for l in jax.tree.leaves(out))

    p32 = variables["params"]
    rec("model fwd fp32",
        device_timer(model_fwd, p32, frozen, images, mel, pre, iters=8))
    g32 = jax.grad(model_fwd)
    rec("model fwd+bwd fp32",
        device_timer(lambda *a: g32(*a), p32, frozen, images, mel, pre, iters=4))

    cast = lambda t: jax.tree.map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

    def model_fwd_amp(params, frozen, images, mel, pre):
        return model_fwd(cast(params), cast(frozen), *cast((images, mel, pre)))

    rec("model fwd AMP-bf16",
        device_timer(model_fwd_amp, p32, frozen, images, mel, pre, iters=8))
    gamp = jax.grad(model_fwd_amp)
    rec("model fwd+bwd AMP-bf16",
        device_timer(lambda *a: gamp(*a), p32, frozen, images, mel, pre, iters=4))

    # ------------------------------------------------------------------
    # 3. one R50 tower (the model runs two: visual + pre-SAM)
    if not tiny:
        frames = rng.randn(N, S, S, 3).astype(np.float32)
        r50 = ResNet(depth=50)
        v_r50 = jax.jit(r50.init)(jax.random.PRNGKey(0), frames)
        fwd_and_fwdbwd("R50 tower x1", r50, v_r50, frames)

    # ------------------------------------------------------------------
    # 4. pixel decoder, remat on/off
    dims = (32, 64, 128, 256) if tiny else (256, 512, 1024, 2048)
    feats = {
        f"res{i + 2}": rng.randn(N, S // (4 * 2 ** i), S // (4 * 2 ** i),
                                 dims[i]).astype(np.float32)
        for i in range(4)
    }
    kw = dict(conv_dim=32, mask_dim=32, n_heads=2, enc_layers=1) if tiny else {}
    for remat in (True, False):
        pd = MSDeformAttnPixelDecoder(remat=remat, **kw)
        v_pd = jax.jit(pd.init)(jax.random.PRNGKey(0), feats)
        try:
            fwd_and_fwdbwd(f"pixel decoder (remat={remat})", pd, v_pd, feats)
        except Exception as e:
            print(f"  pixel decoder remat={remat} FAILED: "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)

    # ------------------------------------------------------------------
    # 5. deformable kernel standalone at the encoder layer-call shape
    shapes = ((S // 32, S // 32), (S // 16, S // 16), (S // 8, S // 8))
    Ssum = sum(h * w for h, w in shapes)
    M, D, P = (2, 16, 4) if tiny else (8, 32, 4)
    value = rng.randn(N, Ssum, M, D).astype(np.float32)
    loc = rng.rand(N, Ssum, M, len(shapes), P, 2).astype(np.float32)
    w = rng.rand(N, Ssum, M, len(shapes), P).astype(np.float32)
    w /= w.sum((-1, -2), keepdims=True)
    value, loc, w = jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w)

    def kfwd(value, loc, w):
        return ms_deform_attn(value, shapes, loc, w)

    rec("deform kernel fwd x1 layer",
        device_timer(kfwd, value, loc, w, iters=16))

    def kfwdbwd(value, loc, w):
        def loss(args):
            return ms_deform_attn(args[0], shapes, args[1], args[2]).sum()
        return jax.grad(loss)((value, loc, w))

    rec("deform kernel fwd+bwd x1 layer",
        device_timer(kfwdbwd, value, loc, w, iters=8))

    print(f"\n=== backward profile bs{B} x {T}f ({N} frames, {S}^2) ===")
    for name, dt in rows:
        print(f"{dt * 1e3:9.1f} ms  {name}")


if __name__ == "__main__":
    main()
