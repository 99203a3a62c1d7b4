"""Round-4 on-chip experiments: PROFILE_r3's secondary eval targets.

1. semantic_inference: XLA resize+sigmoid+einsum vs the fused Pallas kernel
   (ops/seminf_pallas.py) at the production S4 eval shape, plus a numerical
   parity check on real Mosaic (interpret-mode parity already in tests).
2. Siamese towers: the visual + pre-SAM R50 towers run as two applies today
   (2.84 ms each, docs/PROFILE_r3.md). Candidates:
     a) two sequential applies (production today)
     b) nn.vmap over stacked params ([2, ...] leaves) — one grouped-conv
        tower pass at 2x batch
     c) one tower at 2x batch with SHARED weights — the pure-batching upper
        bound (wrong numerics; timing only)
3. Full eval step with the seminf kernel enabled (the production dispatch)
   vs r3's 28.5 ms — the number that becomes BENCH_r04.

Run ON THE CHIP (one process at a time — the chip queues):
    python scripts/exp_eval_secondary.py
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from combo_avs_tpu.models.meta_arch import MaskFormer, semantic_inference
    from combo_avs_tpu.models.resnet import ResNet
    from combo_avs_tpu.ops.seminf_pallas import seminf_pallas
    from combo_avs_tpu.utils.profiling import device_timer

    assert jax.default_backend() != "cpu"
    rng = np.random.RandomState(0)
    N, Q, h, w, C, S = 20, 100, 56, 56, 2, 224

    # ---- 1. semantic_inference ----
    logits = jnp.asarray(rng.randn(N, Q, C + 1).astype(np.float32))
    masks = jnp.asarray(rng.randn(N, Q, h, w).astype(np.float32) * 4)
    from combo_avs_tpu.ops.seminf_pallas import resize_matrix

    for dt in (jnp.bfloat16,):
        m = masks.astype(dt)

        def xla_form(lg, mk):
            up = jax.image.resize(mk, (N, Q, S, S), "bilinear")
            cls = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)[..., :-1]
            return jnp.einsum("nqc,nqhw->nchw", cls, jax.nn.sigmoid(up),
                              preferred_element_type=jnp.float32)

        def einsum_form(lg, mk):
            # resize as two explicit MXU contractions with the exact
            # jax.image.resize matrices; sigmoid+contract fuse into the last
            ah = resize_matrix(h, S).astype(mk.dtype)
            awt = resize_matrix(w, S).T.astype(mk.dtype)
            up = jnp.einsum("nqhw,wW->nqhW", mk, awt)
            up = jnp.einsum("Hh,nqhW->nqHW", ah, up)
            cls = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)[..., :-1]
            return jnp.einsum("nqc,nqhw->nchw", cls, jax.nn.sigmoid(up),
                              preferred_element_type=jnp.float32)

        def pallas_form(lg, mk):
            cls = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)[..., :-1]
            return seminf_pallas(cls, mk, (S, S))

        t_x = device_timer(xla_form, logits, m, iters=32)
        t_e = device_timer(einsum_form, logits, m, iters=32)
        t_p = device_timer(pallas_form, logits, m, iters=32)
        ex = np.asarray(jax.jit(xla_form)(logits, m))
        ee = np.asarray(jax.jit(einsum_form)(logits, m))
        ep = np.asarray(jax.jit(pallas_form)(logits, m))
        print(f"[seminf {dt.__name__}] xla {t_x*1e3:.3f} ms"
              f"  einsum {t_e*1e3:.3f} ms ({t_x/t_e:.2f}x, err {np.abs(ex-ee).max():.2e})"
              f"  pallas {t_p*1e3:.3f} ms ({t_x/t_p:.2f}x, err {np.abs(ex-ep).max():.2e})",
              flush=True)

    # ---- 2. dual R50 towers ----
    frames = jnp.asarray(rng.rand(N, S, S, 3).astype(np.float32))
    maskige = jnp.asarray(rng.rand(N, S, S, 3).astype(np.float32))
    net = ResNet(depth=50)
    v1 = net.init(jax.random.PRNGKey(0), frames)
    v2 = net.init(jax.random.PRNGKey(1), frames)

    def two_applies(va, vb, xa, xb):
        fa = net.apply(va, xa)
        fb = net.apply(vb, xb)
        return [fa[k] + fb[k] for k in fa]

    t_two = device_timer(two_applies, v1, v2, frames, maskige, iters=16)
    print(f"[towers] two applies: {t_two*1e3:.3f} ms", flush=True)

    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), v1, v2)
    xs = jnp.stack([frames, maskige])

    def vmapped(vs, x2):
        feats = jax.vmap(net.apply)(vs, x2)
        return [feats[k][0] + feats[k][1] for k in feats]

    t_vm = device_timer(vmapped, stacked, xs, iters=16)
    ra = jax.jit(two_applies)(v1, v2, frames, maskige)
    rb = jax.jit(vmapped)(stacked, xs)
    err = max(float(jnp.abs(a - b).max()) for a, b in zip(ra, rb))
    print(f"[towers] vmap-stacked: {t_vm*1e3:.3f} ms  speedup {t_two/t_vm:.2f}x"
          f"  max_abs_err {err:.2e}", flush=True)

    def shared_2x(va, x2):
        f = net.apply(va, x2.reshape(2 * N, S, S, 3))
        return [f[k][:N] + f[k][N:] for k in f]

    t_sh = device_timer(shared_2x, v1, xs, iters=16)
    print(f"[towers] shared-weights 2x-batch bound: {t_sh*1e3:.3f} ms"
          f"  speedup {t_two/t_sh:.2f}x", flush=True)

    # ---- 2b. VGGish split: conv stack vs FC stack (1.48 ms in r3 at 6% MFU
    # — find whether the convs or the 67M-param FCs are the binding cost) ----
    from combo_avs_tpu.models.vggish import VGGish

    mel20 = jnp.asarray(rng.randn(N, 96, 64, 1).astype(np.float32))
    vgg = VGGish()
    pv = vgg.init(jax.random.PRNGKey(0), mel20)
    t_vgg = device_timer(lambda v, x: vgg.apply(v, x), pv, mel20, iters=64)

    import flax.linen as _nn

    class _Convs(_nn.Module):
        @_nn.compact
        def __call__(self, x):
            from combo_avs_tpu.models.vggish import VGG_LAYERS
            ci = 0
            for v in VGG_LAYERS:
                if v == "M":
                    x = _nn.max_pool(x, (2, 2), strides=(2, 2))
                else:
                    x = _nn.relu(_nn.Conv(int(v), (3, 3), padding="SAME",
                                          name=f"conv{ci}")(x))
                    ci += 1
            return x

    convs = _Convs()
    pc = convs.init(jax.random.PRNGKey(0), mel20)
    t_conv = device_timer(lambda v, x: convs.apply(v, x), pc, mel20, iters=64)
    print(f"[vggish] full {t_vgg*1e3:.3f} ms  convs {t_conv*1e3:.3f} ms"
          f"  fcs ~{(t_vgg-t_conv)*1e3:.3f} ms", flush=True)

    # ---- 3. full eval step with the production dispatch ----
    B, T = 4, 5
    model = MaskFormer()
    images = jnp.asarray((rng.rand(B, T, S, S, 3) * 255).astype(np.float32))
    mel = jnp.asarray(rng.randn(B, T, 96, 64).astype(np.float32))
    pre = jnp.asarray((rng.rand(B, T, S, S, 3) * 255).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), images, mel, pre)
    bf = jnp.bfloat16
    variables = jax.tree.map(
        lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, variables
    )

    def full(v, im, me, pr):
        out = model.apply(v, im, me, pr)
        return semantic_inference(out["pred_logits"], out["pred_masks"],
                                  out_size=(S, S))

    t_full = device_timer(
        full, variables, images.astype(bf), mel.astype(bf), pre.astype(bf),
        iters=16,
    )
    print(f"[full-eval] {t_full*1e3:.3f} ms/step = {B*T/t_full:.1f} f/s"
          f"  (r3 profile: 28.52 ms / 684-701 f/s)", flush=True)


if __name__ == "__main__":
    main()
