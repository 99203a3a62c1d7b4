"""Does saving the deformable-kernel output as a remat residual pay?

docs/PROFILE_r4.md section 8: full-layer remat of the pixel-decoder
encoder costs ~45 ms of backward replay per bs8 train step (323 vs
277.5 ms fwd+bwd), and full no-remat OOMs (16.6 GB XLA temps). Most of
the replay should be the 6 Pallas forward kernel calls (~7-10 ms each),
which backward only needs because output_proj's weight gradient reads the
kernel output. remat_policy="save_deform" names that output
(`checkpoint_name(out, "deform_out")`, pixel_decoder.py) and keeps it as
a residual (`save_only_these_names`): +~168 MB/layer at bs8 fp32
(~1 GB total) to skip the kernel replays.

Measures, at bs8 x 5f production shapes (--bs to change):
  * pixel decoder fwd+bwd: remat_policy="" (production) vs "save_deform"
  * full model fwd+bwd fp32, both policies
  * full model fwd+bwd AMP-bf16-cast with "save_deform"
plus a grad-equality check between the policies at the full production
shape (rematerialization must not change numerics).

Usage: python scripts/exp_remat_policy.py [--bs N] [--tiny]
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

    # ------------------------------------------------------------------
    # 1. pixel decoder standalone, both policies
    dims = (32, 64, 128, 256) if tiny else (256, 512, 1024, 2048)
    feats = {
        f"res{i + 2}": rng.randn(N, S // (4 * 2 ** i), S // (4 * 2 ** i),
                                 dims[i]).astype(np.float32)
        for i in range(4)
    }
    kw = dict(conv_dim=32, mask_dim=32, n_heads=2, enc_layers=1) if tiny else {}
    grads = {}
    for policy in ("", "save_deform"):
        pd = MSDeformAttnPixelDecoder(remat_policy=policy, **kw)
        v_pd = jax.jit(pd.init)(jax.random.PRNGKey(0), feats)

        def fwd(params, feats):
            out = pd.apply({"params": params}, feats)
            return sum(jnp.sum(l) for l in jax.tree.leaves(out))

        gfn = jax.jit(jax.grad(fwd))
        try:
            rec(f"pixel decoder fwd+bwd (policy={policy or 'none'})",
                device_timer(gfn, v_pd["params"], feats, iters=4))
            grads[policy] = jax.tree.map(np.asarray, gfn(v_pd["params"], feats))
        except Exception as e:
            print(f"  policy={policy!r} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    if len(grads) == 2:
        errs = [
            float(np.max(np.abs(a - b)))
            for a, b in zip(jax.tree.leaves(grads[""]),
                            jax.tree.leaves(grads["save_deform"]))
        ]
        print(f"  grad equality: max |dg| = {max(errs):.2e}", flush=True)

    # ------------------------------------------------------------------
    # 2. full model fwd+bwd, both policies, fp32 + AMP
    if tiny:
        base = dict(
            deterministic=False, num_classes=2, backbone_name="tiny_resnet",
            pre_sam_dim=(32, 64, 128, 256), vggish_width=0.125, hidden_dim=32,
            nheads=2, dim_feedforward=64, mask_dim=32, conv_dim=32,
            audio_out_dim=32, dec_layers=2, enc_layers=1, num_queries=8)
    else:
        base = dict(deterministic=False, num_classes=2)
    images = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)
    mel = rng.randn(B, T, 96, 64).astype(np.float32)
    pre = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)

    cast = lambda t: jax.tree.map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

    variables = None
    for policy in ("", "save_deform"):
        model = MaskFormer(remat_policy=policy, **base)
        if variables is None:
            variables = jax.jit(model.init)(
                {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                images, mel, pre, None)
        frozen = variables.get("frozen", {})

        def model_fwd(params, frozen, images, mel, pre):
            out = model.apply({"params": params, "frozen": frozen}, images,
                              mel, pre, None,
                              rngs={"dropout": jax.random.PRNGKey(3)})
            return sum(jnp.sum(l) for l in jax.tree.leaves(out))

        gfn = jax.grad(model_fwd)
        try:
            rec(f"model fwd+bwd fp32 (policy={policy or 'none'})",
                device_timer(lambda *a: gfn(*a), variables["params"], frozen,
                             images, mel, pre, iters=4))
        except Exception as e:
            print(f"  model policy={policy!r} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

        if policy == "save_deform":
            def model_fwd_amp(params, frozen, images, mel, pre):
                return model_fwd(cast(params), cast(frozen),
                                 *cast((images, mel, pre)))

            gamp = jax.grad(model_fwd_amp)
            try:
                rec("model fwd+bwd AMP-bf16 (policy=save_deform)",
                    device_timer(lambda *a: gamp(*a), variables["params"],
                                 frozen, images, mel, pre, iters=4))
            except Exception as e:
                print(f"  AMP save_deform FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    print(f"\n=== remat-policy experiment bs{B} x {T}f ({N} frames, {S}^2) ===")
    for name, dt in rows:
        print(f"{dt * 1e3:9.1f} ms  {name}")


if __name__ == "__main__":
    main()
