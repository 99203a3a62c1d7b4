"""Fusion module parity vs torch oracles."""

import jax
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from combo_avs_tpu.models.fusion import (
    AVFuse,
    AudioMLP,
    BiAttentionBlock,
    BiMultiHeadAttention,
)
from combo_avs_tpu.models.position_encoding import sine_position_encoding

B, N, VDIM, ADIM, EDIM, HEADS = 2, 49, 32, 16, 64, 4


def torch_bimha(weights, v, a, pos_v=None, pos_a=None):
    """Independent torch spelling of the bilateral attention spec."""
    M, hd = HEADS, EDIM // HEADS
    scale = hd**-0.5

    def lin(x, w, b):
        return x @ w.T + b

    q = lin(v if pos_v is None else v + pos_v, *weights["v_proj"]) * scale
    k = lin(a if pos_a is None else a + pos_a, *weights["a_proj"])
    vv = lin(v, *weights["values_v_proj"])
    va = lin(a, *weights["values_a_proj"])

    Bv = v.shape[0]
    q = q.view(Bv, -1, M, hd).transpose(1, 2)  # [B, M, N, hd]
    k = k.view(Bv, 1, M, hd).transpose(1, 2)
    vv = vv.view(Bv, -1, M, hd).transpose(1, 2)
    va = va.view(Bv, 1, M, hd).transpose(1, 2)

    logits = (q @ k.transpose(-2, -1)).clamp(-50000, 50000)  # [B, M, N, 1]
    attn_v = logits.softmax(dim=2)
    lt = logits.transpose(-2, -1)  # [B, M, 1, N]
    attn_a = (lt - lt.max(dim=-1, keepdim=True).values).clamp(-50000, 50000).softmax(-1)

    out_v = (attn_v @ va).transpose(1, 2).reshape(Bv, -1, EDIM)
    out_a = (attn_a @ vv).transpose(1, 2).reshape(Bv, 1, EDIM)
    return lin(out_v, *weights["out_v_proj"]), lin(out_a, *weights["out_a_proj"])


def _rand_lin(rng, din, dout):
    return (
        torch.from_numpy(rng.randn(dout, din).astype(np.float32) * 0.1),
        torch.from_numpy(rng.randn(dout).astype(np.float32) * 0.01),
    )


def test_bimha_matches_oracle():
    rng = np.random.RandomState(0)
    weights = {
        "v_proj": _rand_lin(rng, VDIM, EDIM),
        "a_proj": _rand_lin(rng, ADIM, EDIM),
        "values_v_proj": _rand_lin(rng, VDIM, EDIM),
        "values_a_proj": _rand_lin(rng, ADIM, EDIM),
        "out_v_proj": _rand_lin(rng, EDIM, VDIM),
        "out_a_proj": _rand_lin(rng, EDIM, ADIM),
    }
    v = rng.randn(B, N, VDIM).astype(np.float32)
    a = rng.randn(B, 1, ADIM).astype(np.float32)
    pos_v = rng.randn(B, N, VDIM).astype(np.float32)
    pos_a = rng.randn(B, 1, ADIM).astype(np.float32)

    m = BiMultiHeadAttention(v_dim=VDIM, a_dim=ADIM, embed_dim=EDIM, num_heads=HEADS)
    params = {
        k: {"kernel": w.numpy().T, "bias": b.numpy()} for k, (w, b) in weights.items()
    }
    ov, oa = m.apply({"params": params}, v, a, pos_v, pos_a)

    tv, ta = torch_bimha(weights, torch.from_numpy(v), torch.from_numpy(a),
                         torch.from_numpy(pos_v), torch.from_numpy(pos_a))
    np.testing.assert_allclose(np.asarray(ov), tv.numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(oa), ta.numpy(), atol=1e-5, rtol=1e-5)


def test_biattention_block_residual_semantics():
    """The block's residual attaches to the post-LayerNorm features and the
    audio output is the mean over levels."""
    rng = np.random.RandomState(1)
    feats = {"res2": rng.randn(B, 7, 7, VDIM).astype(np.float32)}
    audio = rng.randn(B, 1, ADIM).astype(np.float32)
    m = BiAttentionBlock(
        feature_names=("res2",), vision_dims=(VDIM,), audio_dim=ADIM,
        embed_dim=EDIM, num_heads=HEADS,
    )
    variables = m.init(jax.random.PRNGKey(0), feats, audio)
    out_feats, out_audio = m.apply(variables, feats, audio)
    assert out_feats["res2"].shape == (B, 7, 7, VDIM)
    assert out_audio.shape == (B, 1, ADIM)

    # with gamma = 0, output must equal LayerNorm(input) exactly
    p = jax.tree.map(lambda x: x, variables["params"])
    p["gamma_v0"] = np.zeros_like(p["gamma_v0"])
    p["gamma_a"] = np.zeros_like(p["gamma_a"])
    out0, audio0 = m.apply({"params": p}, feats, audio)
    tn = torch.from_numpy(feats["res2"].reshape(B, 49, VDIM))
    ln = F.layer_norm(tn, (VDIM,),
                      torch.from_numpy(np.asarray(p["norm_v0"]["scale"])),
                      torch.from_numpy(np.asarray(p["norm_v0"]["bias"])))
    np.testing.assert_allclose(
        np.asarray(out0["res2"]).reshape(B, 49, VDIM), ln.numpy(), atol=2e-5, rtol=1e-4
    )


def test_sine_position_encoding_matches_torch():
    """Oracle: the DETR sine PE (normalize=True) written in torch."""
    H, W, npf = 5, 6, 8
    ours = sine_position_encoding(H, W, npf)

    mask = torch.ones(1, H, W)
    y = mask.cumsum(1)
    x = mask.cumsum(2)
    scale = 2 * np.pi
    y = y / (y[:, -1:, :] + 1e-6) * scale
    x = x / (x[:, :, -1:] + 1e-6) * scale
    dim_t = torch.arange(npf, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / npf)
    px = x[:, :, :, None] / dim_t
    py = y[:, :, :, None] / dim_t
    px = torch.stack((px[:, :, :, 0::2].sin(), px[:, :, :, 1::2].cos()), dim=4).flatten(3)
    py = torch.stack((py[:, :, :, 0::2].sin(), py[:, :, :, 1::2].cos()), dim=4).flatten(3)
    ref = torch.cat((py, px), dim=3)[0].numpy()  # [H, W, 2*npf]

    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_avfuse_dispatch_types():
    rng = np.random.RandomState(2)
    feats = {"res2": rng.randn(B, 7, 7, VDIM).astype(np.float32)}
    audio = rng.randn(B, 1, ADIM).astype(np.float32)
    for t in ("MHA-B", "MHA-S", "MHA-S-Audio", "MHA-None"):
        m = AVFuse(fused_type=t, audio_dim=ADIM, fused_backbone=("res2",),
                   fused_backbone_dim=(VDIM,))
        variables = m.init(jax.random.PRNGKey(0), feats, audio)
        out = m.apply(variables, feats, audio)
        assert out["visual"]["res2"].shape == (B, 7, 7, VDIM)
        assert out["audio"].shape == (B, 1, ADIM)
    if True:
        # MHA-None passes audio through untouched; visual gets level embed only
        m = AVFuse(fused_type="MHA-None", audio_dim=ADIM, fused_backbone=("res2",),
                   fused_backbone_dim=(VDIM,))
        variables = m.init(jax.random.PRNGKey(0), feats, audio)
        out = m.apply(variables, feats, audio)
        np.testing.assert_array_equal(np.asarray(out["audio"]), audio)


def test_audio_mlp_shapes():
    m = AudioMLP(out_dim=256)
    x = np.zeros((4, 1, 128), np.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (4, 1, 256)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert n == (128 * 4096 + 4096) + (4096 * 4096 + 4096) + (4096 * 256 + 256)
