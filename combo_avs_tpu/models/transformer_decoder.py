"""Mask2Former-style masked-attention transformer decoder with
audio-conditioned queries.

Reimplements the reference `MultiScaleMaskedTransformerDecoder`
(ref: models/modeling/transformer_decoder/transformer_decoder.py:222-519):

* learnable `query_feat` (dim shrunk by `audio_out_dim` for "dim" fusion) and
  `query_embed` positional queries (ref :338-357),
* audio query fusion: the fused audio vector is broadcast to every query and
  combined by add / concat(dim) / replace(all) / none (ref :437-446),
* per layer: masked cross-attention over one of 3 pixel-decoder scales
  (cycling i % 3) -> self-attention -> FFN, all post-norm with dropout 0
  (ref :456-471, :29-193),
* prediction heads after every layer: shared LayerNorm, class linear,
  3-layer mask MLP, mask = <mask_embed, mask_features> einsum; the next
  layer's attention mask is the sigmoid(mask) < 0.5 downsampled to the next
  scale, detached; fully-masked rows are un-masked (ref :451-509),
* outputs: final logits/masks, per-layer aux outputs, and the intermediate
  masks (all but the last layer) for the inter-frame cosine loss (ref :485-491).

Configured with DEC_LAYERS=10 the reference builds 9 layers (one prediction
comes from the learnable queries themselves, ref :389-392).

All tensors are batch-first; attention masks are boolean with True = blocked
(torch `nn.MultiheadAttention` convention).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from combo_avs_tpu.models.layers import MLP
from combo_avs_tpu.models.position_encoding import sine_position_encoding

NEG_INF = -1e9


class MultiheadAttention(nn.Module):
    """torch-compatible MHA (packed qkv projection, optional boolean
    attn_mask with True = blocked)."""

    d_model: int
    nhead: int

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Nq, C]
        key: jnp.ndarray,  # [B, Nk, C]
        value: jnp.ndarray,  # [B, Nk, C]
        attn_mask: Optional[jnp.ndarray] = None,  # [B, h, Nq, Nk] bool, True=blocked
    ) -> jnp.ndarray:
        C, M = self.d_model, self.nhead
        hd = C // M
        in_proj_w = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * C, C)
        )
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * C,))
        q = query @ in_proj_w[:C].T + in_proj_b[:C]
        k = key @ in_proj_w[C : 2 * C].T + in_proj_b[C : 2 * C]
        v = value @ in_proj_w[2 * C :].T + in_proj_b[2 * C :]

        B, Nq, _ = q.shape
        Nk = k.shape[1]
        q = q.reshape(B, Nq, M, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, Nk, M, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Nk, M, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bmqd,bmkd->bmqk", q, k) * (hd**-0.5)
        if attn_mask is not None:
            logits = jnp.where(attn_mask, NEG_INF, logits)
        attn = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bmqk,bmkd->bmqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, C)
        return nn.Dense(C, name="out_proj")(out)


class MultiScaleMaskedTransformerDecoder(nn.Module):
    num_classes: int
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9  # = cfg DEC_LAYERS - 1
    pre_norm: bool = False
    mask_dim: int = 256
    enforce_input_project: bool = False
    queries_fuse_type: str = "add"  # add | dim | all | none
    audio_out_dim: int = 256
    use_cosine_loss: bool = True
    num_feature_levels: int = 3
    in_channels: int = 256

    @nn.compact
    def __call__(
        self,
        x: Sequence[jnp.ndarray],  # 3 NHWC multi-scale maps, coarse -> fine
        audio_features: jnp.ndarray,  # [B, 1, audio_out_dim]
        mask_features: jnp.ndarray,  # [B, H/4, W/4, mask_dim]
    ) -> Dict[str, object]:
        assert len(x) == self.num_feature_levels
        B = mask_features.shape[0]
        C = self.hidden_dim

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.num_feature_levels, C)
        )
        srcs, poss, sizes = [], [], []
        for i, feat in enumerate(x):
            _, H, W, ci = feat.shape
            sizes.append((H, W))
            pe = sine_position_encoding(H, W, C // 2).reshape(1, H * W, C)
            poss.append(jnp.asarray(pe, feat.dtype))
            if ci != C or self.enforce_input_project:
                feat = nn.Conv(C, (1, 1), name=f"input_proj{i}")(feat)
            srcs.append(feat.reshape(B, H * W, -1) + level_embed[i][None, None, :])

        qdim = C - self.audio_out_dim if self.queries_fuse_type == "dim" else C
        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (self.num_queries, qdim)
        )
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, C)
        )
        q_pos = jnp.broadcast_to(query_embed[None], (B, self.num_queries, C))
        output = jnp.broadcast_to(query_feat[None], (B, self.num_queries, qdim))

        audio = jnp.broadcast_to(
            audio_features, (B, self.num_queries, audio_features.shape[-1])
        )
        if self.queries_fuse_type == "add":
            output = output + audio
        elif self.queries_fuse_type == "dim":
            output = jnp.concatenate([output, audio], axis=-1)
        elif self.queries_fuse_type == "all":
            output = audio
        elif self.queries_fuse_type != "none":
            raise ValueError(self.queries_fuse_type)

        decoder_norm = nn.LayerNorm(name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        mask_embed = MLP(C, self.mask_dim, 3, name="mask_embed")

        def prediction_heads(out, target_size):
            d = decoder_norm(out)
            logits = class_embed(d)
            emb = mask_embed(d)  # [B, Q, mask_dim]
            masks = jnp.einsum("bqc,bhwc->bqhw", emb, mask_features)
            th, tw = target_size
            # antialias=False: the reference downsamples with
            # F.interpolate(mode="bilinear", align_corners=False), which does
            # NOT antialias (ref: transformer_decoder.py:502); jax.image.resize
            # defaults to antialias=True, which differs on downsampling and
            # shifts the <0.5 attention-mask threshold.
            small = jax.image.resize(
                masks, (B, self.num_queries, th, tw), "bilinear", antialias=False
            )
            attn_mask = jax.nn.sigmoid(small).reshape(B, 1, self.num_queries, th * tw) < 0.5
            attn_mask = jnp.broadcast_to(
                attn_mask, (B, self.nheads, self.num_queries, th * tw)
            )
            return logits, masks, jax.lax.stop_gradient(attn_mask)

        predictions_class: List[jnp.ndarray] = []
        predictions_mask: List[jnp.ndarray] = []
        middles: List[jnp.ndarray] = []

        logits, masks, attn_mask = prediction_heads(output, sizes[0])
        predictions_class.append(logits)
        predictions_mask.append(masks)
        if self.use_cosine_loss:
            middles.append(masks.reshape(B, self.num_queries, -1))

        for i in range(self.dec_layers):
            lvl = i % self.num_feature_levels
            # un-mask rows with no allowed position (ref :458)
            full = attn_mask.all(axis=-1, keepdims=True)
            attn_mask = jnp.where(full, False, attn_mask)

            # masked cross-attention (post-norm)
            tgt2 = MultiheadAttention(C, self.nheads, name=f"cross_attn{i}")(
                output + q_pos, srcs[lvl] + poss[lvl], srcs[lvl], attn_mask
            )
            output = nn.LayerNorm(name=f"cross_norm{i}")(output + tgt2)
            # self-attention
            tgt2 = MultiheadAttention(C, self.nheads, name=f"self_attn{i}")(
                output + q_pos, output + q_pos, output, None
            )
            output = nn.LayerNorm(name=f"self_norm{i}")(output + tgt2)
            # FFN
            h = nn.relu(nn.Dense(self.dim_feedforward, name=f"ffn_linear1_{i}")(output))
            output = nn.LayerNorm(name=f"ffn_norm{i}")(
                output + nn.Dense(C, name=f"ffn_linear2_{i}")(h)
            )

            logits, masks, attn_mask = prediction_heads(
                output, sizes[(i + 1) % self.num_feature_levels]
            )
            predictions_class.append(logits)
            predictions_mask.append(masks)
            if self.use_cosine_loss and i != self.dec_layers - 1:
                middles.append(masks.reshape(B, self.num_queries, -1))

        return {
            "pred_logits": predictions_class[-1],
            "pred_masks": predictions_mask[-1],
            "aux_outputs": [
                {"pred_logits": a, "pred_masks": b}
                for a, b in zip(predictions_class[:-1], predictions_mask[:-1])
            ],
            "middles_attn_mask": middles,
        }
