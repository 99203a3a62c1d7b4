"""Multi-scale deformable-attention pixel decoder (Mask2Former-style).

Reimplements the reference's `MSDeformAttnPixelDecoder`
(ref: models/modeling/pixel_decoder/msdeformattn.py:168-359):

* 1x1 projections + GroupNorm(32) of [res5, res4, res3] (top-down order)
  into conv_dim channels,
* a 6-layer deformable-DETR encoder (d_model 256, FFN 1024 hardcoded —
  ref :309, post-norm, ReLU, 8 heads x 4 points x 3 levels) over the
  flattened multi-scale tokens,
* split back into maps, one extra FPN step down to stride 4 (lateral 1x1 +
  GN on res2, bilinear-upsampled add, 3x3 GN ReLU output conv),
* a 1x1 `mask_features` conv, returning
  (mask_features [stride 4], encoder res5 map, 3 multi-scale maps).

TPU design decisions:
* Input sizes are static, and AVS never pads inputs, so the reference's
  valid-ratio machinery (ref :55-95) collapses: reference points are a
  compile-time numpy constant.
* The 6 encoder layers run under `nn.scan` (stacked params) so the deformable
  gather compiles once.
* The deformable attention core is the shared `ops.deform_attn` composition
  (same math as the reference CUDA kernel); its Pallas specialization plugs in
  behind the same function signature.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from combo_avs_tpu.models.position_encoding import sine_position_encoding
from combo_avs_tpu.ops.deform_attn_pallas import ms_deform_attn
from combo_avs_tpu.utils.registry import SEM_SEG_HEADS_REGISTRY


def _directional_offset_bias(n_heads: int, n_levels: int, n_points: int):
    """Bias init of the sampling-offset linear: ring of unit directions per
    head, radius growing with point index (ref: ops/modules/ms_deform_attn.py:68-84)."""

    def init(key, shape, dtype=jnp.float32):
        thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * np.pi / n_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
        for i in range(n_points):
            grid[:, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype)

    return init


class MSDeformAttn(nn.Module):
    """Deformable attention module (ref: ops/modules/ms_deform_attn.py:28-129)."""

    d_model: int
    spatial_shapes: Tuple[Tuple[int, int], ...]
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Lq, C]
        reference_points: jnp.ndarray,  # [Lq, L, 2] in [0, 1]
        value_src: jnp.ndarray,  # [B, S, C]
    ) -> jnp.ndarray:
        B, Lq, C = query.shape
        L = len(self.spatial_shapes)
        M, P = self.n_heads, self.n_points

        value = nn.Dense(
            self.d_model, kernel_init=nn.initializers.xavier_uniform(), name="value_proj"
        )(value_src)
        value = value.reshape(B, -1, M, self.d_model // M)

        offsets = nn.Dense(
            M * L * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_directional_offset_bias(M, L, P),
            name="sampling_offsets",
        )(query).reshape(B, Lq, M, L, P, 2)

        weights = nn.Dense(
            M * L * P, kernel_init=nn.initializers.zeros, name="attention_weights"
        )(query).reshape(B, Lq, M, L * P)
        weights = nn.softmax(weights, axis=-1).reshape(B, Lq, M, L, P)

        # normalize offsets by (W, H) per level (ref: ms_deform_attn.py:110-113)
        normalizer = jnp.asarray(
            [[w, h] for h, w in self.spatial_shapes], jnp.float32
        )  # [L, 2]
        loc = (
            reference_points[None, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )

        out = ms_deform_attn(value, self.spatial_shapes, loc, weights)
        # Named so the `save_deform` remat policy can keep it as a residual:
        # output_proj's backward then reads its input here instead of
        # replaying the Pallas forward kernel (docs/PROFILE_r4.md section 12).
        out = checkpoint_name(out, "deform_out")
        return nn.Dense(
            self.d_model, kernel_init=nn.initializers.xavier_uniform(), name="output_proj"
        )(out)


class _EncoderFFN(nn.Module):
    """linear1 -> ReLU -> linear2 (ref: msdeformattn.py:125-130). Split out
    as its own remat unit: the hidden activation [B, S, d_ffn] is 4x the
    token stream; even inside the layer-level remat the inner checkpoint
    keeps the backward-replay peak down to one [B, S, C] residual."""

    d_model: int
    d_ffn: int

    @nn.compact
    def __call__(self, src):
        h = nn.relu(nn.Dense(self.d_ffn, name="linear1")(src))
        return nn.Dense(self.d_model, name="linear2")(h)


class DeformableEncoderLayer(nn.Module):
    """Post-norm deformable self-attention + FFN
    (ref: msdeformattn.py:99-137); scan-compatible signature."""

    d_model: int
    d_ffn: int
    spatial_shapes: Tuple[Tuple[int, int], ...]
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(self, carry, _):
        src, pos, reference_points = carry
        q = src + pos
        src2 = MSDeformAttn(
            d_model=self.d_model,
            spatial_shapes=self.spatial_shapes,
            n_heads=self.n_heads,
            n_points=self.n_points,
            name="self_attn",
        )(q, reference_points, src)
        src = nn.LayerNorm(name="norm1")(src + src2)
        ffn = nn.remat(_EncoderFFN)(d_model=self.d_model, d_ffn=self.d_ffn, name="ffn")
        src = nn.LayerNorm(name="norm2")(src + ffn(src))
        return (src, pos, reference_points), None


@functools.lru_cache(maxsize=None)
def encoder_reference_points(spatial_shapes: Tuple[Tuple[int, int], ...]) -> np.ndarray:
    """Pixel-center reference points, [S, L, 2]; valid ratios are identically
    one for unpadded inputs (ref: msdeformattn.py:143-157)."""
    pts = []
    for h, w in spatial_shapes:
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = np.concatenate(pts, axis=0)  # [S, 2]
    return np.broadcast_to(ref[:, None, :], (ref.shape[0], len(spatial_shapes), 2)).copy()


@SEM_SEG_HEADS_REGISTRY.register(name="MSDeformAttnPixelDecoder")
class MSDeformAttnPixelDecoder(nn.Module):
    """features {res2..res5: NHWC} ->
    (mask_features [B, H/4, W/4, mask_dim], encoder res5 map, 3 multi-scale maps)."""

    conv_dim: int = 256
    mask_dim: int = 256
    transformer_in_features: Sequence[str] = ("res3", "res4", "res5")
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    common_stride: int = 4
    feature_strides: Dict[str, int] = None  # e.g. {"res2": 4, ...}
    enc_layers: int = 6
    n_heads: int = 8
    n_points: int = 4
    d_ffn: int = 1024  # hardcoded in the reference (msdeformattn.py:309)
    # encoder scan unroll factor; 0 = fully unroll (bench FLOP-costing twin)
    scan_unroll: int = 1
    # False = save every encoder-layer activation instead of recomputing in
    # backward (needs ~16.6 GB XLA temp at bs8 — OOM on 16 GB v5e; fits at
    # smaller batch; exists for profiling the remat-replay cost)
    remat: bool = True
    # "" = plain remat (save only the scan carry); "save_deform" (default —
    # adopted r5, -48 ms/step at S4 bs8 with bit-identical grads, fits HBM
    # at every production regime incl. AVSS AMP; exp_remat_policy.py) = also
    # keep each layer's deformable-kernel output ([B, S, C], ~168 MB/layer
    # at bs8 fp32) so the backward replay skips the 6 Pallas forward calls
    remat_policy: str = "save_deform"

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        strides = self.feature_strides or {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
        # top-down order: lowest resolution first (ref: msdeformattn.py:316-321)
        tif = list(self.transformer_in_features)[::-1]
        L = len(tif)

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (L, self.conv_dim)
        )

        srcs, poss, shapes = [], [], []
        for idx, f in enumerate(tif):
            x = features[f]
            B, H, W, _ = x.shape
            x = nn.Conv(self.conv_dim, (1, 1), kernel_init=nn.initializers.xavier_uniform(),
                        name=f"input_proj{idx}")(x)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"input_norm{idx}")(x)
            srcs.append(x.reshape(B, H * W, self.conv_dim))
            pe = sine_position_encoding(H, W, self.conv_dim // 2).reshape(1, H * W, -1)
            poss.append(jnp.asarray(pe, x.dtype) + level_embed[idx][None, None, :])
            shapes.append((H, W))

        spatial_shapes = tuple(shapes)
        src = jnp.concatenate(srcs, axis=1)
        pos = jnp.concatenate(poss, axis=1)
        ref = jnp.asarray(encoder_reference_points(spatial_shapes))

        # Full-layer remat: only the scan carry (src, [B, S, C]) is saved per
        # layer; attention projections, the Pallas deformable kernel's VJP
        # residuals (value/loc/weights, ~0.7 GB/layer at bs8) and the FFN all
        # recompute in backward. Cuts the bs8 train step's XLA temp
        # allocation from 16.6 GB (OOM on 16 GB v5e) to 10.1 GB.
        # (An earlier XLA:TPU RET_CHECK with remat around Pallas calls —
        # b/399810917 — no longer reproduces on this stack.)
        if self.remat:
            policy = (
                jax.checkpoint_policies.save_only_these_names("deform_out")
                if self.remat_policy == "save_deform"
                else None
            )
            body = nn.remat(DeformableEncoderLayer, policy=policy)
        else:
            body = DeformableEncoderLayer
        Layers = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0,
            length=self.enc_layers,
            unroll=self.enc_layers if self.scan_unroll <= 0 else self.scan_unroll,
        )
        (src, _, _), _ = Layers(
            d_model=self.conv_dim,
            d_ffn=self.d_ffn,
            spatial_shapes=spatial_shapes,
            n_heads=self.n_heads,
            n_points=self.n_points,
            name="encoder",
        )((src, pos, ref), jnp.zeros((self.enc_layers,)))

        # split tokens back into maps
        out = []
        start = 0
        for (H, W) in spatial_shapes:
            out.append(src[:, start : start + H * W].reshape(-1, H, W, self.conv_dim))
            start += H * W

        # extra FPN levels down to common_stride (ref: msdeformattn.py:265-297,342-352)
        min_tf_stride = min(strides[f] for f in self.transformer_in_features)
        num_fpn = int(np.log2(min_tf_stride) - np.log2(self.common_stride))
        fpn_feats = list(self.in_features)[:num_fpn][::-1]
        for idx, f in enumerate(fpn_feats):
            x = features[f]
            lat = nn.Conv(self.conv_dim, (1, 1), use_bias=False,
                          kernel_init=nn.initializers.xavier_uniform(),
                          name=f"adapter{idx}")(x)
            lat = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"adapter_norm{idx}")(lat)
            up = jax.image.resize(
                out[-1], (out[-1].shape[0], x.shape[1], x.shape[2], self.conv_dim), "bilinear"
            )
            y = lat + up
            y = nn.Conv(self.conv_dim, (3, 3), use_bias=False,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f"layer{idx}")(y)
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"layer_norm{idx}")(y)
            out.append(nn.relu(y))

        mask_features = nn.Conv(
            self.mask_dim, (1, 1), kernel_init=nn.initializers.xavier_uniform(),
            name="mask_features",
        )(out[-1])
        multi_scale_features = out[:3]
        return mask_features, out[0], multi_scale_features
