"""Bilateral audio-visual fusion (the COMBO core).

Reimplements the reference fusion stack TPU-natively:

* `BiMultiHeadAttention` — ONE attention logit matrix QK^T (vision queries
  [B, HW, C] x audio key [B, 1, C]) reused in both directions: softmax over
  the spatial axis scales the audio value into every pixel (audio->vision),
  and a max-normalized softmax over the same axis pools vision values into a
  new audio vector (vision->audio)
  (ref: models/modeling/fusion_module/utils/fuse_helper.py:102-237).
* `BiAttentionBlock` — per-level pre-LayerNorms + BiMHA with LayerScale
  residuals; multi-level audio outputs averaged (ref: fuse_helper.py:240-332).
* `CrossAttention`/`AttentionA2I` — the single-direction MHA-S variant
  (ref: fuse_helper.py:336-521).
* `AVFuse` — dispatch on TYPE (MHA-B / MHA-S / MHA-S-Audio / MHA-None), adds
  a learned audio position embedding, sine image positions and a level embed
  (ref: models/modeling/fusion_module/AVFuse.py:10-126).
* `AudioMLP` — 128 -> 4096 -> 4096 -> out audio transformation
  (ref: models/modeling/misc/audio_transformation.py:5-14).

Because the audio length is 1, every "attention" here is a rank-1 reduction;
the FLOPs live in the projections, which XLA maps straight onto the MXU —
no custom kernel needed.

All features are NHWC; the +/-50000 logit clamps are kept for checkpoint
parity with the reference's fp16 regime (harmless in bf16/fp32).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from combo_avs_tpu.models.position_encoding import sine_position_encoding

CLAMP = 50000.0


def _xavier_linear(features: int, name: str) -> nn.Dense:
    return nn.Dense(features, kernel_init=nn.initializers.xavier_uniform(), name=name)


class BiMultiHeadAttention(nn.Module):
    v_dim: int
    a_dim: int
    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    deterministic: bool = True

    @nn.compact
    def __call__(
        self,
        v: jnp.ndarray,  # [B, N, v_dim]
        a: jnp.ndarray,  # [B, 1, a_dim]
        pos_v: Optional[jnp.ndarray] = None,
        pos_a: Optional[jnp.ndarray] = None,
    ):
        B, N, _ = v.shape
        M = self.num_heads
        hd = self.embed_dim // M
        scale = hd**-0.5

        q_in = v if pos_v is None else v + pos_v
        k_in = a if pos_a is None else a + pos_a
        q = _xavier_linear(self.embed_dim, "v_proj")(q_in) * scale
        k = _xavier_linear(self.embed_dim, "a_proj")(k_in)
        val_v = _xavier_linear(self.embed_dim, "values_v_proj")(v)
        val_a = _xavier_linear(self.embed_dim, "values_a_proj")(a)

        q = q.reshape(B, N, M, hd)
        k = k.reshape(B, 1, M, hd)
        val_v = val_v.reshape(B, N, M, hd)
        val_a = val_a.reshape(B, 1, M, hd)

        # one logit matrix, audio length 1 -> [B, M, N]
        logits = jnp.einsum("bnmd,bmd->bmn", q, k[:, 0])
        logits = jnp.clip(logits, -CLAMP, CLAMP)

        # audio->vision: softmax over the SPATIAL axis (ref quirk: softmax(dim=1)
        # over [B*M, N, 1]), each pixel gets the audio value scaled by its prob
        attn_v = nn.softmax(logits, axis=-1)  # [B, M, N]
        # vision->audio: max-normalized softmax over the spatial axis
        attn_a = nn.softmax(logits - logits.max(axis=-1, keepdims=True), axis=-1)

        if self.dropout > 0.0 and not self.deterministic:
            attn_v = nn.Dropout(self.dropout, deterministic=False)(attn_v)
            attn_a = nn.Dropout(self.dropout, deterministic=False)(attn_a)

        out_v = jnp.einsum("bmn,bmd->bnmd", attn_v, val_a[:, 0]).reshape(B, N, self.embed_dim)
        out_a = jnp.einsum("bmn,bnmd->bmd", attn_a, val_v).reshape(B, 1, self.embed_dim)

        return (
            _xavier_linear(self.v_dim, "out_v_proj")(out_v),
            _xavier_linear(self.a_dim, "out_a_proj")(out_a),
        )


class BiAttentionBlock(nn.Module):
    feature_names: Sequence[str]
    vision_dims: Sequence[int]
    audio_dim: int
    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    init_values: float = 1e-4
    deterministic: bool = True

    @nn.compact
    def __call__(
        self,
        visual_features: Dict[str, jnp.ndarray],  # {name: [B, H, W, C]}
        audio: jnp.ndarray,  # [B, 1, audio_dim]
        pos_v: Optional[jnp.ndarray] = None,
        pos_a: Optional[jnp.ndarray] = None,
    ):
        gamma_a = self.param(
            "gamma_a", nn.initializers.constant(self.init_values), (self.audio_dim,)
        )
        out_feats = dict(visual_features)
        new_a_list = []
        for lvl, name in enumerate(self.feature_names):
            feat = visual_features[name]
            B, H, W, C = feat.shape
            v = feat.reshape(B, H * W, C)
            v = nn.LayerNorm(name=f"norm_v{lvl}")(v)
            a = nn.LayerNorm(name=f"norm_a{lvl}")(audio)
            dv, da = BiMultiHeadAttention(
                v_dim=self.vision_dims[lvl],
                a_dim=self.audio_dim,
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                dropout=self.dropout,
                deterministic=self.deterministic,
                name=f"attn{lvl}",
            )(v, a, pos_v, pos_a)
            gamma_v = self.param(
                f"gamma_v{lvl}",
                nn.initializers.constant(self.init_values),
                (self.vision_dims[lvl],),
            )
            # residuals attach to the POST-LayerNorm features (ref quirk,
            # fuse_helper.py:320-332)
            v = v + gamma_v * dv
            a = a + gamma_a * da
            out_feats[name] = v.reshape(B, H, W, C)
            new_a_list.append(a)
        new_audio = jnp.mean(jnp.stack(new_a_list, axis=1), axis=1)
        return out_feats, new_audio


class CrossAttention(nn.Module):
    """Generic clamped single-direction MHA (ref: fuse_helper.py:336-439)."""

    q_dim: int
    k_dim: int
    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    deterministic: bool = True

    @nn.compact
    def __call__(self, q, k, v):
        B, N, _ = q.shape
        S = k.shape[1]
        M = self.num_heads
        hd = self.embed_dim // M
        qs = _xavier_linear(self.embed_dim, "q_proj")(q) * hd**-0.5
        ks = _xavier_linear(self.embed_dim, "k_proj")(k)
        vs = _xavier_linear(self.embed_dim, "v_proj")(v)
        qs = qs.reshape(B, N, M, hd)
        ks = ks.reshape(B, S, M, hd)
        vs = vs.reshape(B, S, M, hd)
        logits = jnp.einsum("bnmd,bsmd->bmns", qs, ks)
        logits = jnp.clip(logits, -CLAMP, CLAMP)
        attn = nn.softmax(logits, axis=-1)
        if self.dropout > 0.0 and not self.deterministic:
            attn = nn.Dropout(self.dropout, deterministic=False)(attn)
        out = jnp.einsum("bmns,bsmd->bnmd", attn, vs).reshape(B, N, self.embed_dim)
        return _xavier_linear(self.q_dim, "out_proj")(out)


class AttentionA2I(nn.Module):
    """Audio->image single-direction fusion per level (ref: fuse_helper.py:442-521)."""

    feature_names: Sequence[str]
    q_dims: Sequence[int]
    k_dim: int
    embed_dim: int
    num_heads: int
    init_values: float = 1e-4
    deterministic: bool = True

    @nn.compact
    def __call__(self, visual_features, audio):
        out_feats = dict(visual_features)
        for lvl, name in enumerate(self.feature_names):
            feat = visual_features[name]
            B, H, W, C = feat.shape
            q = nn.LayerNorm(name=f"norm_q{lvl}")(feat.reshape(B, H * W, C))
            ka = nn.LayerNorm(name=f"norm_k{lvl}")(audio)
            dq = CrossAttention(
                q_dim=self.q_dims[lvl],
                k_dim=self.k_dim,
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                deterministic=self.deterministic,
                name=f"attn{lvl}",
            )(q, ka, ka)
            gamma = self.param(
                f"gamma{lvl}", nn.initializers.constant(self.init_values), (self.q_dims[lvl],)
            )
            q = q + gamma * dq
            out_feats[name] = q.reshape(B, H, W, C)
        return out_feats


class AVFuse(nn.Module):
    """Fusion dispatcher (ref: AVFuse.py:10-126). Input visual features are
    NHWC; returns {"visual": {...}, "audio": [B, 1, audio_dim]}."""

    fused_type: str  # MHA-B | MHA-S | MHA-S-Audio | MHA-None
    audio_dim: int
    fused_backbone: Sequence[str]
    fused_backbone_dim: Sequence[int]
    dropout: float = 0.1
    deterministic: bool = True

    @nn.compact
    def __call__(self, visual_features: Dict[str, jnp.ndarray], audio: jnp.ndarray):
        embed_dim = max(self.fused_backbone_dim)
        n_head = 8

        audio_pos = self.param(
            "audio_pos", nn.initializers.normal(1.0), (1, self.audio_dim)
        )
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (1, self.fused_backbone_dim[0])
        )

        feats = dict(visual_features)
        image_pos = None
        for i, name in enumerate(self.fused_backbone):
            f = feats[name]
            B, H, W, C = f.shape
            pe = sine_position_encoding(H, W, self.fused_backbone_dim[0] // 2)
            image_pos = jnp.asarray(pe.reshape(1, H * W, -1), f.dtype)
            feats[name] = f + level_embed[i][None, None, None, :]

        pos_a = jnp.broadcast_to(audio_pos[None], (audio.shape[0], 1, self.audio_dim))

        if self.fused_type == "MHA-B":
            fused_v, fused_a = BiAttentionBlock(
                feature_names=self.fused_backbone,
                vision_dims=self.fused_backbone_dim,
                audio_dim=self.audio_dim,
                embed_dim=embed_dim,
                num_heads=n_head,
                dropout=self.dropout,
                deterministic=self.deterministic,
                name="b_attn",
            )(feats, audio, pos_v=image_pos, pos_a=pos_a)
        elif self.fused_type == "MHA-S":
            fused_v = AttentionA2I(
                feature_names=self.fused_backbone,
                q_dims=self.fused_backbone_dim,
                k_dim=self.audio_dim,
                embed_dim=embed_dim,
                num_heads=n_head,
                deterministic=self.deterministic,
                name="a2i_attn",
            )(feats, audio)
            fused_a = audio
        elif self.fused_type == "MHA-S-Audio":
            # vision kept, audio updated (ref: AVFuse.py:113-117)
            fused_v_unused, fused_a = BiAttentionBlock(
                feature_names=self.fused_backbone,
                vision_dims=self.fused_backbone_dim,
                audio_dim=self.audio_dim,
                embed_dim=embed_dim,
                num_heads=n_head,
                dropout=self.dropout,
                deterministic=self.deterministic,
                name="b_attn",
            )(feats, audio, pos_v=image_pos, pos_a=pos_a)
            fused_v = feats
        elif self.fused_type == "MHA-None":
            fused_v, fused_a = feats, audio
        else:
            raise ValueError(f"unknown fusion type {self.fused_type!r}")

        return {"visual": fused_v, "audio": fused_a}


class AudioMLP(nn.Module):
    """128 -> 4096 -> 4096 -> out (ref: audio_transformation.py:5-14)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(4096, name="fc0")(x))
        x = nn.relu(nn.Dense(4096, name="fc1")(x))
        return nn.Dense(self.out_dim, name="fc2")(x)


class FeatureResizer(nn.Module):
    """Linear + LayerNorm + dropout embedding resizer
    (ref: fuse_helper.py:17-37; SCAN-era helper kept for API completeness)."""

    output_dim: int
    dropout: float = 0.1
    do_ln: bool = True
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.output_dim, name="fc")(x)
        if self.do_ln:
            x = nn.LayerNorm(epsilon=1e-12, name="layer_norm")(x)
        if self.dropout > 0 and not self.deterministic:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        return x


def l1norm(x, axis, eps=1e-8):
    return x / (jnp.abs(x).sum(axis=axis, keepdims=True) + eps)


def l2norm(x, axis, eps=1e-8):
    return x / (jnp.sqrt((x**2).sum(axis=axis, keepdims=True)) + eps)


def func_attention(query, context, smooth=1.0, raw_feature_norm="softmax", eps=1e-8):
    """SCAN-style cross attention (ref: fuse_helper.py:40-99; unused by the
    shipped configs, kept for the MHA-S research variants).

    query [B, Lq, D], context [B, Ls, D] -> (weighted context [B, Lq, D],
    attention [B, Ls, Lq])."""
    attn = jnp.einsum("bsd,bqd->bsq", context, query)
    if raw_feature_norm == "softmax":
        attn = nn.softmax(attn, axis=-1)
    elif raw_feature_norm == "l2norm":
        attn = l2norm(attn, 2)
    elif raw_feature_norm == "clipped_l2norm":
        attn = l2norm(nn.leaky_relu(attn, 0.1), 2)
    else:
        raise ValueError(f"unknown norm {raw_feature_norm!r}")
    # normalize over source, sharpen, renormalize (SCAN)
    attn = jnp.swapaxes(attn, 1, 2)  # [B, Lq, Ls]
    attn = nn.softmax(attn * smooth, axis=-1)
    weighted = jnp.einsum("bqs,bsd->bqd", attn, context)
    return weighted, jnp.swapaxes(attn, 1, 2)
