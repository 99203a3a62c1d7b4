"""Parity test for the legacy DETR transformer (encoder + decoder) against a
torch oracle built from the reference's structure
(ref: models/modeling/transformer_decoder/transformer.py:19-353)."""

import jax
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from combo_avs_tpu.models.detr_transformer import DETRTransformer

B, H, W, C, M, Q, FF = 2, 3, 4, 16, 4, 5, 32
L_ENC, L_DEC = 2, 3


class TorchEncLayer(nn.Module):
    def __init__(self, pre_norm):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(C, M, dropout=0.0, batch_first=True)
        self.linear1 = nn.Linear(C, FF)
        self.linear2 = nn.Linear(FF, C)
        self.norm1 = nn.LayerNorm(C)
        self.norm2 = nn.LayerNorm(C)
        self.pre_norm = pre_norm

    def forward(self, src, pos):
        if self.pre_norm:
            s2 = self.norm1(src)
            q = s2 + pos
            src = src + self.self_attn(q, q, s2, need_weights=False)[0]
            s2 = self.norm2(src)
            return src + self.linear2(F.relu(self.linear1(s2)))
        q = src + pos
        src = self.norm1(src + self.self_attn(q, q, src, need_weights=False)[0])
        return self.norm2(src + self.linear2(F.relu(self.linear1(src))))


class TorchDecLayer(nn.Module):
    def __init__(self, pre_norm):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(C, M, dropout=0.0, batch_first=True)
        self.multihead_attn = nn.MultiheadAttention(C, M, dropout=0.0, batch_first=True)
        self.linear1 = nn.Linear(C, FF)
        self.linear2 = nn.Linear(FF, C)
        self.norm1 = nn.LayerNorm(C)
        self.norm2 = nn.LayerNorm(C)
        self.norm3 = nn.LayerNorm(C)
        self.pre_norm = pre_norm

    def forward(self, tgt, memory, pos, query_pos):
        if self.pre_norm:
            t2 = self.norm1(tgt)
            q = t2 + query_pos
            tgt = tgt + self.self_attn(q, q, t2, need_weights=False)[0]
            t2 = self.norm2(tgt)
            tgt = tgt + self.multihead_attn(
                t2 + query_pos, memory + pos, memory, need_weights=False
            )[0]
            t2 = self.norm3(tgt)
            return tgt + self.linear2(F.relu(self.linear1(t2)))
        q = tgt + query_pos
        tgt = self.norm1(tgt + self.self_attn(q, q, tgt, need_weights=False)[0])
        tgt = self.norm2(
            tgt
            + self.multihead_attn(
                tgt + query_pos, memory + pos, memory, need_weights=False
            )[0]
        )
        return self.norm3(tgt + self.linear2(F.relu(self.linear1(tgt))))


def _mha_params(tm):
    return {
        "in_proj_weight": tm.in_proj_weight.detach().numpy(),
        "in_proj_bias": tm.in_proj_bias.detach().numpy(),
        "out_proj": {
            "kernel": tm.out_proj.weight.detach().numpy().T,
            "bias": tm.out_proj.bias.detach().numpy(),
        },
    }


def _lin(tl):
    return {"kernel": tl.weight.detach().numpy().T, "bias": tl.bias.detach().numpy()}


def _ln(tn):
    return {"scale": tn.weight.detach().numpy(), "bias": tn.bias.detach().numpy()}


def _run(pre_norm):
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    encs = [TorchEncLayer(pre_norm).eval() for _ in range(L_ENC)]
    decs = [TorchDecLayer(pre_norm).eval() for _ in range(L_DEC)]
    enc_norm = nn.LayerNorm(C).eval()
    dec_norm = nn.LayerNorm(C).eval()

    src = rng.randn(B, H, W, C).astype(np.float32)
    pos = rng.randn(1, H, W, C).astype(np.float32)
    query = rng.randn(Q, C).astype(np.float32)

    # torch forward (reference semantics, batch-first layout)
    with torch.no_grad():
        x = torch.from_numpy(src.reshape(B, H * W, C))
        p = torch.from_numpy(pos.reshape(1, H * W, C)).expand(B, -1, -1)
        for e in encs:
            x = e(x, p)
        if pre_norm:
            x = enc_norm(x)
        memory = x
        qp = torch.from_numpy(query)[None].expand(B, -1, -1)
        tgt = torch.zeros_like(qp)
        inter = []
        for d in decs:
            tgt = d(tgt, memory, p, qp)
            inter.append(dec_norm(tgt))
        inter[-1] = dec_norm(tgt)
        hs_ref = torch.stack(inter).numpy()

    model = DETRTransformer(
        d_model=C, nhead=M, num_encoder_layers=L_ENC, num_decoder_layers=L_DEC,
        dim_feedforward=FF, pre_norm=pre_norm, return_intermediate_dec=True,
    )
    params = {}
    for i, e in enumerate(encs):
        params[f"encoder{i}"] = {
            "self_attn": _mha_params(e.self_attn),
            "linear1": _lin(e.linear1), "linear2": _lin(e.linear2),
            "norm1": _ln(e.norm1), "norm2": _ln(e.norm2),
        }
    for i, d in enumerate(decs):
        params[f"decoder{i}"] = {
            "self_attn": _mha_params(d.self_attn),
            "multihead_attn": _mha_params(d.multihead_attn),
            "linear1": _lin(d.linear1), "linear2": _lin(d.linear2),
            "norm1": _ln(d.norm1), "norm2": _ln(d.norm2), "norm3": _ln(d.norm3),
        }
    if pre_norm:
        params["encoder_norm"] = _ln(enc_norm)
    params["decoder_norm"] = _ln(dec_norm)

    hs, mem = jax.jit(
        lambda s, q, p: model.apply({"params": params}, s, q, p)
    )(src, query, pos)
    assert hs.shape == (L_DEC, B, Q, C)
    assert mem.shape == (B, H, W, C)
    np.testing.assert_allclose(np.asarray(hs), hs_ref, atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(mem).reshape(B, H * W, C), memory.numpy(), atol=3e-4, rtol=1e-3
    )


def test_detr_transformer_post_norm():
    _run(pre_norm=False)


def test_detr_transformer_pre_norm():
    _run(pre_norm=True)
