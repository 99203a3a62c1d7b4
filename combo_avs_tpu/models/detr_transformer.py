"""Legacy DETR transformer (encoder + decoder), parity companion.

Reimplements the reference's vanilla DETR `Transformer`
(ref: models/modeling/transformer_decoder/transformer.py:19-353): the COMBO
configs only ever exercise its encoder (through
`TransformerEncoderPixelDecoder`, ref: pixel_decoder/fpn.py:157-304), but the
reference ships the full class — decoder layers with self- + cross-attention,
pre-/post-norm variants, and the `return_intermediate_dec` stack of
per-layer activations — so the rebuild carries it too.

Differences from the torch original that are layout-only:
* batch-first `[B, N, C]` tensors (torch uses `[N, B, C]`),
* `hs` is returned `[num_layers, B, Q, C]` (torch returns the same after its
  final transpose), memory as NHWC.
Dropout is omitted (the reference constructs this class nowhere; all COMBO
decoders run dropout 0.0).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from combo_avs_tpu.models.transformer_decoder import MultiheadAttention


class DETREncoderLayer(nn.Module):
    """ref: transformer.py:146-216 (forward_post / forward_pre)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    pre_norm: bool = False

    @nn.compact
    def __call__(self, src, pos=None, src_mask=None):
        def with_pos(x):
            return x if pos is None else x + pos

        if self.pre_norm:
            s2 = nn.LayerNorm(name="norm1")(src)
            q = with_pos(s2)
            src = src + MultiheadAttention(self.d_model, self.nhead, name="self_attn")(
                q, q, s2, src_mask
            )
            s2 = nn.LayerNorm(name="norm2")(src)
            h = nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(s2))
            return src + nn.Dense(self.d_model, name="linear2")(h)
        q = with_pos(src)
        src = nn.LayerNorm(name="norm1")(
            src
            + MultiheadAttention(self.d_model, self.nhead, name="self_attn")(
                q, q, src, src_mask
            )
        )
        h = nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(src))
        return nn.LayerNorm(name="norm2")(src + nn.Dense(self.d_model, name="linear2")(h))


class DETRDecoderLayer(nn.Module):
    """Self-attn over queries, cross-attn into memory, FFN
    (ref: transformer.py:219-312)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    pre_norm: bool = False

    @nn.compact
    def __call__(self, tgt, memory, pos=None, query_pos=None, memory_mask=None):
        def wp(x, p):
            return x if p is None else x + p

        if self.pre_norm:
            t2 = nn.LayerNorm(name="norm1")(tgt)
            q = wp(t2, query_pos)
            tgt = tgt + MultiheadAttention(self.d_model, self.nhead, name="self_attn")(
                q, q, t2, None
            )
            t2 = nn.LayerNorm(name="norm2")(tgt)
            tgt = tgt + MultiheadAttention(
                self.d_model, self.nhead, name="multihead_attn"
            )(wp(t2, query_pos), wp(memory, pos), memory, memory_mask)
            t2 = nn.LayerNorm(name="norm3")(tgt)
            h = nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(t2))
            return tgt + nn.Dense(self.d_model, name="linear2")(h)
        q = wp(tgt, query_pos)
        tgt = nn.LayerNorm(name="norm1")(
            tgt
            + MultiheadAttention(self.d_model, self.nhead, name="self_attn")(
                q, q, tgt, None
            )
        )
        tgt = nn.LayerNorm(name="norm2")(
            tgt
            + MultiheadAttention(self.d_model, self.nhead, name="multihead_attn")(
                wp(tgt, query_pos), wp(memory, pos), memory, memory_mask
            )
        )
        h = nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(tgt))
        return nn.LayerNorm(name="norm3")(tgt + nn.Dense(self.d_model, name="linear2")(h))


class DETRTransformer(nn.Module):
    """Full DETR transformer (ref: transformer.py:19-71).

    `__call__(src NHWC, query_embed [Q, C], pos_embed NHWC)` returns
    `(hs [num_decoder_layers, B, Q, C], memory NHWC)`; decoder queries start
    from zeros as in DETR. `return_intermediate_dec` stacks every decoder
    layer's LayerNorm'ed output (ref: transformer.py:131-141)."""

    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    pre_norm: bool = False
    return_intermediate_dec: bool = False

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,  # [B, H, W, C]
        query_embed: jnp.ndarray,  # [Q, C]
        pos_embed: jnp.ndarray,  # [B or 1, H, W, C]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, H, W, C = src.shape
        x = src.reshape(B, H * W, C)
        pos = jnp.broadcast_to(
            pos_embed.reshape(-1, H * W, C), (B, H * W, C)
        ).astype(x.dtype)

        for i in range(self.num_encoder_layers):
            x = DETREncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.pre_norm,
                name=f"encoder{i}",
            )(x, pos)
        if self.pre_norm:  # encoder_norm exists only when normalize_before
            x = nn.LayerNorm(name="encoder_norm")(x)
        memory = x

        qp = jnp.broadcast_to(query_embed[None], (B, *query_embed.shape)).astype(x.dtype)
        tgt = jnp.zeros_like(qp)
        decoder_norm = nn.LayerNorm(name="decoder_norm")
        intermediate = []
        for i in range(self.num_decoder_layers):
            tgt = DETRDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.pre_norm,
                name=f"decoder{i}",
            )(tgt, memory, pos=pos, query_pos=qp)
            if self.return_intermediate_dec:
                intermediate.append(decoder_norm(tgt))
        out = decoder_norm(tgt)
        if self.return_intermediate_dec:
            intermediate[-1] = out
            hs = jnp.stack(intermediate)
        else:
            hs = out[None]
        return hs, memory.reshape(B, H, W, C)
