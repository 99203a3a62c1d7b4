"""Component-wise on-chip timing of the bf16 S4 eval step for COMBO-PVTv2-B5
(the BASELINE.md north-star model; ref backbone:
/root/reference/models/modeling/backbone/pvtv2.py:17-409).

The PVT config runs TWO PVTv2-B5 towers (visual + pre-SAM maskige,
meta_arch.py:125-133), so the backbone is expected to dominate. This
profiles the full step, one tower, each stage's block stack, and —
for the 40-block stage 3 that carries most of the FLOPs — scan-unroll
and no-remat variants to see if the production `nn.scan(nn.remat(...))`
(pvtv2.py:152-158) leaves loop-overhead or fusion wins on the table.

Methodology matches bench.py: `utils.profiling.device_timer` (on-device
fori_loop + scalar fetch; `block_until_ready` lies on the axon tunnel).

Usage: python scripts/profile_pvt_eval.py [--fp32] [--tiny]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from combo_avs_tpu.models.head import MaskFormerHead
    from combo_avs_tpu.models.meta_arch import MaskFormer, semantic_inference
    from combo_avs_tpu.models.pvtv2 import PVTBlock, pvtv2_b5
    from combo_avs_tpu.models.vggish import VGGish
    from combo_avs_tpu.utils.profiling import device_timer

    bf16 = "--fp32" not in sys.argv
    tiny = "--tiny" in sys.argv  # CPU smoke of the measurement graphs
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    B, T, S = (1, 2, 64) if tiny else (4, 5, 224)
    N = B * T
    iters = 2 if tiny else 16
    rng = np.random.RandomState(0)
    images = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)
    mel = rng.randn(B, T, 96, 64).astype(np.float32)
    pre = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)

    def cast(tree):
        return jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree
        )

    rows = []

    # 1. full model (both PVT towers + vggish + head + semantic_inference)
    model = MaskFormer(
        backbone_name="build_pvtv2_b5_backbone", pre_sam_dim=(64, 128, 320, 512)
    )
    vars_full = cast(jax.jit(model.init)(jax.random.PRNGKey(0), images, mel, pre))

    def full_step(v, images, mel, pre):
        out = model.apply(v, images, mel, pre)
        return semantic_inference(
            out["pred_logits"], out["pred_masks"], out_size=(S, S)
        )

    t_full = device_timer(
        full_step, vars_full, *cast((images, mel, pre)), iters=max(2, iters // 2)
    )
    rows.append(("FULL eval step (incl. semantic_inference)", t_full))
    print(f"{t_full * 1e3:9.2f} ms  FULL", flush=True)

    def timed(name, module, *args, n=iters):
        # variables as ARGUMENTS (closure constants would push the axon
        # remote-compile upload past its 100MB program limit)
        v = cast(jax.jit(module.init)(jax.random.PRNGKey(0), *args))
        dt = device_timer(
            lambda v, *a: module.apply(v, *a), v, *cast(args), iters=n
        )
        rows.append((name, dt))
        print(f"{dt * 1e3:9.2f} ms  {name}", flush=True)
        return dt

    # 2. one PVT tower
    frames = ((images.reshape(N, S, S, 3) - 127.5) / 58.0).astype(np.float32)
    t_tower = timed("PVTv2-B5 tower (x1; model runs 2)", pvtv2_b5(), frames)

    # 3. per-stage block stacks at production shapes (patch embeds excluded —
    #    they are 4 strided convs, counted in the tower row)
    dims = (64, 128, 320, 512)
    heads = (1, 2, 5, 8)
    depths = (3, 6, 40, 3)
    srs = (8, 4, 2, 1)
    strides = (4, 8, 16, 32)

    class StageStack(nn.Module):
        """One stage's scanned block stack, mirroring pvtv2.py:152-166."""

        i: int
        unroll: int = 1
        remat: bool = True

        @nn.compact
        def __call__(self, x):
            i = self.i
            Hs = S // strides[i]
            rates = jnp.zeros((depths[i],), jnp.float32)
            Block = nn.remat(PVTBlock) if self.remat else PVTBlock
            Blocks = nn.scan(
                Block,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=0,
                length=depths[i],
                unroll=self.unroll,
            )
            x, _ = Blocks(
                dim=dims[i], num_heads=heads[i], sr_ratio=srs[i],
                mlp_ratio=4, spatial=(Hs, Hs), name=f"block{i + 1}",
            )(x, rates)
            return x

    stage_ts = []
    for i in range(4):
        Hs = S // strides[i]
        xin = rng.randn(N, Hs * Hs, dims[i]).astype(np.float32)
        stage_ts.append(
            timed(
                f"  stage{i + 1} blocks x{depths[i]} ({Hs}x{Hs}, C={dims[i]}, "
                f"sr{srs[i]})",
                StageStack(i=i),
                xin,
            )
        )

    # 4. stage-3 variants (the 40-block hot stage)
    Hs3 = S // strides[2]
    x3 = rng.randn(N, Hs3 * Hs3, dims[2]).astype(np.float32)
    for unroll, remat in ((2, True), (4, True), (1, False), (4, False)):
        timed(
            f"  stage3 variant: unroll={unroll}, remat={remat}",
            StageStack(i=2, unroll=unroll, remat=remat),
            x3,
        )

    # 5. the rest of the step
    timed("VGGish audio tower", VGGish(), mel.reshape(N, 96, 64, 1))
    feats = {
        f"res{i + 2}": rng.randn(
            N, S // strides[i], S // strides[i], dims[i]
        ).astype(np.float32)
        for i in range(4)
    }
    audio = rng.randn(N, 1, 128).astype(np.float32)
    t_head = timed(
        "sem_seg_head (pixel dec + fusion + decoder)",
        MaskFormerHead(num_classes=2), feats, audio,
    )

    logits = rng.randn(N, 100, 3).astype(np.float32)
    masks = rng.randn(N, 100, S // 4, S // 4).astype(np.float32)
    t_si = device_timer(
        lambda l, m: semantic_inference(l, m, out_size=(S, S)),
        cast(logits), cast(masks), iters=iters * 2,
    )
    rows.append(("semantic_inference", t_si))
    print(f"{t_si * 1e3:9.2f} ms  semantic_inference", flush=True)

    print(f"\n=== PVTv2-B5 bf16={bf16}  B={B} T={T} S={S} ({N} frames/step) ===")
    for name, dt in rows:
        print(f"{dt * 1e3:9.2f} ms  {dt / t_full * 100:5.1f}%  {name}")
    counted = 2 * t_tower + rows[-3][1] + t_head + t_si  # vggish is rows[-3]
    print(
        f"{(t_full - counted) * 1e3:9.2f} ms  residual "
        f"(glue/SE gates/normalize; PVT tower counted x2)"
    )
    print(f"frames/s: {N / t_full:.1f}")


if __name__ == "__main__":
    main()
