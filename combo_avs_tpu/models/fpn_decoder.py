"""FPN pixel decoders (registry alternatives to MSDeformAttnPixelDecoder).

Reimplements the reference's `BasePixelDecoder` (plain FPN,
ref: models/modeling/pixel_decoder/fpn.py:38-155) and
`TransformerEncoderPixelDecoder` (FPN + 6-layer standard transformer encoder
on res5, ref: fpn.py:157-304). Neither is selected by the shipped COMBO
configs (`PIXEL_DECODER_NAME: MSDeformAttnPixelDecoder`) but both remain
selectable via `MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME`.

Top-down pass: the lowest-resolution map takes a 3x3 GN-ReLU output conv
directly; every finer level adds a 1x1 GN lateral to the NEAREST-upsampled
running map, then a 3x3 GN-ReLU output conv. `mask_features` is a 3x3 conv
on the stride-4 map; the first 3 top-down maps are the multi-scale features.
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from combo_avs_tpu.models.position_encoding import sine_position_encoding
from combo_avs_tpu.models.transformer_decoder import MultiheadAttention
from combo_avs_tpu.utils.registry import SEM_SEG_HEADS_REGISTRY


def _gn(name):
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)


def _nearest_upsample(x, h, w):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, h, w, C), "nearest")


class TransformerEncoderLayer(nn.Module):
    """Standard (DETR) post-norm encoder layer (ref: transformer_decoder/
    transformer.py — only the encoder is ever used, by this decoder)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    pre_norm: bool = False

    @nn.compact
    def __call__(self, src: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        q = src + pos
        attn = MultiheadAttention(self.d_model, self.nhead, name="self_attn")(
            q, q, src, None
        )
        src = nn.LayerNorm(name="norm1")(src + attn)
        h = nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(src))
        src = nn.LayerNorm(name="norm2")(src + nn.Dense(self.d_model, name="linear2")(h))
        return src


@SEM_SEG_HEADS_REGISTRY.register(name="BasePixelDecoder")
class BasePixelDecoder(nn.Module):
    conv_dim: int = 256
    mask_dim: int = 256
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")

    def _fpn(self, features: Dict[str, jnp.ndarray]):
        outs = []
        y = None
        names = list(self.in_features)[::-1]  # res5 -> res2
        for idx, f in enumerate(names):
            x = features[f]
            if idx == 0:
                y = nn.relu(_gn(f"layer_norm{idx}")(
                    nn.Conv(self.conv_dim, (3, 3), use_bias=False, name=f"layer{idx}")(x)
                ))
            else:
                lat = _gn(f"adapter_norm{idx}")(
                    nn.Conv(self.conv_dim, (1, 1), use_bias=False, name=f"adapter{idx}")(x)
                )
                y = lat + _nearest_upsample(y, x.shape[1], x.shape[2])
                y = nn.relu(_gn(f"layer_norm{idx}")(
                    nn.Conv(self.conv_dim, (3, 3), use_bias=False, name=f"layer{idx}")(y)
                ))
            outs.append(y)
        mask_features = nn.Conv(self.mask_dim, (3, 3), name="mask_features")(outs[-1])
        return mask_features, outs

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        mask_features, outs = self._fpn(features)
        return mask_features, None, outs[:3]


@SEM_SEG_HEADS_REGISTRY.register(name="TransformerEncoderPixelDecoder")
class TransformerEncoderPixelDecoder(nn.Module):
    conv_dim: int = 256
    mask_dim: int = 256
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    nheads: int = 8
    dim_feedforward: int = 2048
    enc_layers: int = 6
    pre_norm: bool = False

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        # 6-layer transformer on res5 first (ref: fpn.py:235-268)
        x = features[self.in_features[-1]]
        B, H, W, _ = x.shape
        src = nn.Conv(self.conv_dim, (1, 1), name="input_proj")(x).reshape(B, H * W, -1)
        pos = jnp.asarray(
            sine_position_encoding(H, W, self.conv_dim // 2).reshape(1, H * W, -1),
            src.dtype,
        )
        for i in range(self.enc_layers):
            src = TransformerEncoderLayer(
                self.conv_dim, self.nheads, self.dim_feedforward,
                self.pre_norm, name=f"encoder{i}",
            )(src, pos)
        transformer_encoder_features = src.reshape(B, H, W, self.conv_dim)

        feats = dict(features)
        feats[self.in_features[-1]] = transformer_encoder_features
        mask_features, _, multi_scale = BasePixelDecoder(
            conv_dim=self.conv_dim, mask_dim=self.mask_dim,
            in_features=tuple(self.in_features), name="fpn",
        )(feats)
        return mask_features, transformer_encoder_features, multi_scale
