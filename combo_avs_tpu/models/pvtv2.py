"""PVTv2 visual backbone (flax / NHWC), including the B5 used by COMBO.

Same architecture as the reference's `PyramidVisionTransformerV2`
(ref: models/modeling/backbone/pvtv2.py:17-374, B5 registration :391-409):
4 stages of OverlapPatchEmbed + transformer blocks with spatial-reduction
attention (K/V downsampled by an sr_ratio-strided conv + LayerNorm) and
MLPs carrying a 3x3 depthwise conv, with stochastic depth decayed linearly
over all blocks. B5: dims [64,128,320,512], heads [1,2,5,8], depths
[3,6,40,3], sr [8,4,2,1], qkv bias, LN eps 1e-6, drop path 0.1.

TPU design: each stage's homogeneous block stack runs under `nn.scan`
(params stacked on a leading depth axis) so the 40-block stage 3 traces and
compiles as ONE block — compile time stays flat and XLA pipelines the loop.
All GELUs are exact (erf) to match torch numerics.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from combo_avs_tpu.models.layers import DropPath, gelu_exact

LN_EPS = 1e-6


class SRAttention(nn.Module):
    """Spatial-reduction attention (ref: pvtv2.py:60-132, non-linear path)."""

    dim: int
    num_heads: int
    sr_ratio: int
    qkv_bias: bool = True
    spatial: Tuple[int, int] = (56, 56)  # static H, W of this stage

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        H, W = self.spatial
        hd = C // self.num_heads
        q = nn.Dense(C, use_bias=self.qkv_bias, name="q")(x)
        q = q.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)

        kv_in = x
        if self.sr_ratio > 1:
            xm = x.reshape(B, H, W, C)
            xm = nn.Conv(
                C,
                (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
                padding="VALID",
                name="sr",
            )(xm)
            kv_in = nn.LayerNorm(epsilon=LN_EPS, name="sr_norm")(xm.reshape(B, -1, C))
        kv = nn.Dense(2 * C, use_bias=self.qkv_bias, name="kv")(kv_in)
        kv = kv.reshape(B, -1, 2, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        attn = jnp.einsum("bmnd,bmkd->bmnk", q, k) * (hd**-0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bmnk,bmkd->bmnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, name="proj")(out)


class ConvMlp(nn.Module):
    """fc1 -> 3x3 depthwise conv -> GELU -> fc2 (ref: pvtv2.py:17-57,377-388)."""

    dim: int
    hidden: int
    spatial: Tuple[int, int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        H, W = self.spatial
        x = nn.Dense(self.hidden, name="fc1")(x)
        xm = x.reshape(B, H, W, self.hidden)
        xm = nn.Conv(
            self.hidden,
            (3, 3),
            padding="SAME",
            feature_group_count=self.hidden,
            name="dwconv",
        )(xm)
        x = gelu_exact(xm.reshape(B, N, self.hidden))
        return nn.Dense(self.dim, name="fc2")(x)


class PVTBlock(nn.Module):
    """Pre-norm transformer block; scan-compatible signature
    (carry=x, scanned input=drop-path rate)."""

    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int
    spatial: Tuple[int, int]
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, dp_rate: jnp.ndarray):
        h = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(x)
        h = SRAttention(
            self.dim, self.num_heads, self.sr_ratio, spatial=self.spatial, name="attn"
        )(h)
        x = x + DropPath(name="dp1")(h, deterministic=self.deterministic, rate=dp_rate)
        h = nn.LayerNorm(epsilon=LN_EPS, name="norm2")(x)
        h = ConvMlp(self.dim, self.dim * self.mlp_ratio, self.spatial, name="mlp")(h)
        x = x + DropPath(name="dp2")(h, deterministic=self.deterministic, rate=dp_rate)
        return x, None


class PVTv2(nn.Module):
    """Returns {"res2": [B,H/4,W/4,C0], ..., "res5": [B,H/32,W/32,C3]}."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    depths: Sequence[int] = (3, 6, 40, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    drop_path_rate: float = 0.1
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    deterministic: bool = True
    # lax.scan unroll factor for each stage's block stack; 0 = fully unroll
    # (used by bench.py's FLOP-costing twin — XLA cost_analysis counts a
    # rolled while-loop body exactly once, so the rolled lowering
    # undercounts a depth-d stage by d-1 bodies)
    scan_unroll: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        B = x.shape[0]
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        outputs = {}
        for i, depth in enumerate(self.depths):
            patch, stride = (7, 4) if i == 0 else (3, 2)
            pad = patch // 2
            x = nn.Conv(
                self.embed_dims[i],
                (patch, patch),
                strides=(stride, stride),
                padding=((pad, pad), (pad, pad)),
                name=f"patch_embed{i + 1}",
            )(x)
            _, H, W, C = x.shape
            x = x.reshape(B, H * W, C)
            x = nn.LayerNorm(epsilon=LN_EPS, name=f"patch_norm{i + 1}")(x)

            rates = jnp.asarray(dpr[cur : cur + depth], jnp.float32)
            cur += depth
            Blocks = nn.scan(
                nn.remat(PVTBlock),
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=0,
                length=depth,
                unroll=depth if self.scan_unroll <= 0 else self.scan_unroll,
            )
            x, _ = Blocks(
                dim=self.embed_dims[i],
                num_heads=self.num_heads[i],
                sr_ratio=self.sr_ratios[i],
                mlp_ratio=self.mlp_ratios[i],
                spatial=(H, W),
                deterministic=self.deterministic,
                name=f"block{i + 1}",
            )(x, rates)
            x = nn.LayerNorm(epsilon=LN_EPS, name=f"norm{i + 1}")(x)
            x = x.reshape(B, H, W, C)
            name = f"res{i + 2}"
            if name in self.out_features:
                outputs[name] = x
        return outputs

    @staticmethod
    def output_shape() -> Dict[str, Tuple[int, int]]:
        return {"res2": (64, 4), "res3": (128, 8), "res4": (320, 16), "res5": (512, 32)}


def pvtv2_b5(deterministic: bool = True, out_features=("res2", "res3", "res4", "res5")) -> PVTv2:
    """B5 configuration (ref: pvtv2.py:391-409)."""
    return PVTv2(deterministic=deterministic, out_features=out_features)
