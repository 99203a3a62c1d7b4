"""Full COMBO-AVS torch oracle for end-to-end converter/wiring parity.

An independent torch spelling of the reference model graph
(ref: models/maskformer_model.py:274-391 and the modules it builds), written
so that `state_dict()` produces the REFERENCE key names — the exact surface
`train.checkpoint.convert_combo_checkpoint` consumes from a trained
`model_best.pth`. Randomly initialized in the test; the assertion is that
`MaskFormer.apply` on the converted weights reproduces this forward.

Reduced-depth knobs (enc/dec layers, queries) keep the CPU cost small; all
channel widths are the reference's (R50 256..2048, hidden 256) so every
converter transpose is exercised at true shapes.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

PIXEL_MEAN = (123.675, 116.280, 103.530)
PIXEL_STD = (58.395, 57.120, 57.375)


class D2Conv(nn.Conv2d):
    """d2-style Conv2d with a trailing `.norm` submodule."""

    def __init__(self, *a, norm=None, **kw):
        super().__init__(*a, **kw)
        self.norm = norm

    def forward(self, x):
        x = super().forward(x)
        if self.norm is not None:
            x = self.norm(x)
        return x


class Bottleneck(nn.Module):
    """d2 ResNet bottleneck (stride in the 3x3: STRIDE_IN_1X1=False)."""

    def __init__(self, cin, mid, cout, stride):
        super().__init__()
        self.conv1 = D2Conv(cin, mid, 1, 1, bias=False, norm=nn.BatchNorm2d(mid))
        self.conv2 = D2Conv(mid, mid, 3, stride, 1, bias=False, norm=nn.BatchNorm2d(mid))
        self.conv3 = D2Conv(mid, cout, 1, 1, bias=False, norm=nn.BatchNorm2d(cout))
        self.shortcut = None
        if stride != 1 or cin != cout:
            self.shortcut = D2Conv(cin, cout, 1, stride, bias=False,
                                   norm=nn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.shortcut is None else self.shortcut(x)
        x = F.relu(self.conv1(x))
        x = F.relu(self.conv2(x))
        return F.relu(self.conv3(x) + idn)


class Stem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = D2Conv(3, 64, 7, 2, 3, bias=False, norm=nn.BatchNorm2d(64))

    def forward(self, x):
        x = F.relu(self.conv1(x))
        return F.max_pool2d(x, 3, 2, 1)


class ResNet50(nn.Module):
    """d2-named R50: stem.conv1 / res{2..5}.{i}.conv{1..3}(.norm)."""

    def __init__(self):
        super().__init__()
        self.stem = Stem()
        cfg = [(64, 256, 3, 1), (128, 512, 4, 2), (256, 1024, 6, 2), (512, 2048, 3, 2)]
        cin = 64
        for s, (mid, cout, n, st) in enumerate(cfg):
            blocks = []
            for b in range(n):
                blocks.append(Bottleneck(cin, mid, cout, st if b == 0 else 1))
                cin = cout
            setattr(self, f"res{s + 2}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.stem(x)
        out = {}
        for s in range(2, 6):
            x = getattr(self, f"res{s}")(x)
            out[f"res{s}"] = x
        return out


class VGGishTorch(nn.Module):
    """ref: audio_backbone/torchvggish/vggish.py:9-27,95-105 (conv ids
    0,3,6,8,11,13; embeddings 0,2,4; TF-compat transpose before flatten)."""

    def __init__(self):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(1, 64, 3, padding=1), nn.ReLU(True), nn.MaxPool2d(2, 2),
            nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(True), nn.MaxPool2d(2, 2),
            nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(True),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(True), nn.MaxPool2d(2, 2),
            nn.Conv2d(256, 512, 3, padding=1), nn.ReLU(True),
            nn.Conv2d(512, 512, 3, padding=1), nn.ReLU(True), nn.MaxPool2d(2, 2),
        )
        self.embeddings = nn.Sequential(
            nn.Linear(512 * 4 * 6, 4096), nn.ReLU(True),
            nn.Linear(4096, 4096), nn.ReLU(True),
            nn.Linear(4096, 128), nn.ReLU(True),
        )

    def forward(self, x):  # [N, 1, 96, 64]
        x = self.features(x)
        x = torch.transpose(x, 1, 3)
        x = torch.transpose(x, 1, 2)  # [N, 6, 4, 512]
        return self.embeddings(x.flatten(1))


class PVTDWConv(nn.Module):
    """Key shape `mlp.dwconv.dwconv.*` (ref: pvtv2.py:377-388)."""

    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 3, 1, 1, groups=dim)

    def forward(self, x, H, W):  # [B, N, C]
        B, N, C = x.shape
        x = self.dwconv(x.transpose(1, 2).reshape(B, C, H, W))
        return x.flatten(2).transpose(1, 2)


class PVTBlockTorch(nn.Module):
    """ref: pvtv2.py:60-190 (pre-norm SRA block, exact-GELU conv MLP)."""

    def __init__(self, dim, heads, sr, mlp_ratio=4):
        super().__init__()
        self.heads, self.sr_ratio = heads, sr
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        attn = nn.Module()
        attn.q = nn.Linear(dim, dim, bias=True)
        attn.kv = nn.Linear(dim, dim * 2, bias=True)
        attn.proj = nn.Linear(dim, dim)
        if sr > 1:
            attn.sr = nn.Conv2d(dim, dim, sr, sr)
            attn.norm = nn.LayerNorm(dim, eps=1e-6)
        self.attn = attn
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(dim, dim * mlp_ratio)
        mlp.dwconv = PVTDWConv(dim * mlp_ratio)
        mlp.fc2 = nn.Linear(dim * mlp_ratio, dim)
        self.mlp = mlp

    def _attention(self, x, H, W):
        B, N, C = x.shape
        hd = C // self.heads
        a = self.attn
        q = a.q(x).reshape(B, N, self.heads, hd).permute(0, 2, 1, 3)
        kvin = x
        if self.sr_ratio > 1:
            xm = x.transpose(1, 2).reshape(B, C, H, W)
            xm = a.sr(xm).reshape(B, C, -1).transpose(1, 2)
            kvin = a.norm(xm)
        kv = a.kv(kvin).reshape(B, -1, 2, self.heads, hd).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = (q @ k.transpose(-2, -1)) * hd**-0.5
        out = (attn.softmax(-1) @ v).transpose(1, 2).reshape(B, N, C)
        return a.proj(out)

    def forward(self, x, H, W):
        x = x + self._attention(self.norm1(x), H, W)
        h = self.mlp.fc1(self.norm2(x))
        h = F.gelu(self.mlp.dwconv(h, H, W))
        return x + self.mlp.fc2(h)


class PVTv2Torch(nn.Module):
    """Reduced-depth PVTv2 with the TRUE B5 channel widths and the timm/d2
    key names the converter consumes (ref: models/modeling/backbone/
    pvtv2.py:243-374 + avs_tools/convert_pvt_model_to_d2.py:28-36):
    patch_embed{i}.proj/.norm, block{i}.{j}.*, norm{i}."""

    dims = (64, 128, 320, 512)
    heads = (1, 2, 5, 8)
    srs = (8, 4, 2, 1)

    def __init__(self, depths=(1, 2, 1, 1)):
        super().__init__()
        self.depths = depths
        cin = 3
        for i, d in enumerate(self.dims):
            patch, stride = (7, 4) if i == 0 else (3, 2)
            pe = nn.Module()
            pe.proj = nn.Conv2d(cin, d, patch, stride, patch // 2)
            pe.norm = nn.LayerNorm(d, eps=1e-6)
            setattr(self, f"patch_embed{i + 1}", pe)
            setattr(self, f"block{i + 1}", nn.ModuleList([
                PVTBlockTorch(d, self.heads[i], self.srs[i])
                for _ in range(depths[i])
            ]))
            setattr(self, f"norm{i + 1}", nn.LayerNorm(d, eps=1e-6))
            cin = d

    def forward(self, x):
        out = {}
        for i in range(4):
            pe = getattr(self, f"patch_embed{i + 1}")
            x = pe.proj(x)
            B, C, H, W = x.shape
            x = pe.norm(x.flatten(2).transpose(1, 2))
            for blk in getattr(self, f"block{i + 1}"):
                x = blk(x, H, W)
            x = getattr(self, f"norm{i + 1}")(x)
            x = x.transpose(1, 2).reshape(B, C, H, W)
            out[f"res{i + 2}"] = x
        return out


class SEBlock(nn.Module):
    """ref: models/utils/misc.py:112-131 channel_weighted_block."""

    def __init__(self, dim, reduction=16):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim // reduction)
        self.fc2 = nn.Linear(dim // reduction, dim)

    def forward(self, x):  # [B, C, H, W] -> gate [B, C, 1, 1]
        y = x.mean(dim=(2, 3))
        y = torch.sigmoid(self.fc2(F.relu(self.fc1(y))))
        return y[:, :, None, None]


def sine_pe(H, W, num_pos_feats):
    """DETR normalized 2D sine PE -> [H*W, 2*num_pos_feats]
    (ref: transformer_decoder/position_encoding.py:12-60)."""
    mask = torch.ones(1, H, W)
    y = mask.cumsum(1)
    x = mask.cumsum(2)
    scale = 2 * math.pi
    y = y / (y[:, -1:, :] + 1e-6) * scale
    x = x / (x[:, :, -1:] + 1e-6) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    px = x[:, :, :, None] / dim_t
    py = y[:, :, :, None] / dim_t
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), dim=4).flatten(3)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), dim=4).flatten(3)
    return torch.cat((py, px), dim=3)[0].reshape(H * W, -1)


# ---------------------------------------------------------------------------
# pixel decoder
# ---------------------------------------------------------------------------


def grid_sample_core(value, shapes, loc, weights):
    """Deformable-DETR sampling core (ref: ops/functions/
    ms_deform_attn_func.py:53-72). value [B,S,M,D], loc [B,Lq,M,L,P,2]."""
    Bv, Sv, Mv, Dv = value.shape
    Lqv = loc.shape[1]
    L = len(shapes)
    P = loc.shape[4]
    splits = [h * w for h, w in shapes]
    per_level = value.split(splits, dim=1)
    grids = 2 * loc - 1
    acc = []
    for lvl, (H, W) in enumerate(shapes):
        v = per_level[lvl].flatten(2).transpose(1, 2).reshape(Bv * Mv, Dv, H, W)
        g = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        acc.append(s)
    stacked = torch.stack(acc, dim=-2)  # [B*M, D, Lq, L, P]
    w = weights.transpose(1, 2).reshape(Bv * Mv, 1, Lqv, L * P)
    out = (stacked.flatten(-2) * w).sum(-1)
    return out.view(Bv, Mv * Dv, Lqv).transpose(1, 2).contiguous()


class MSDeformAttnTorch(nn.Module):
    """ref: ops/modules/ms_deform_attn.py:28-129."""

    def __init__(self, d_model, n_levels, n_heads=8, n_points=4):
        super().__init__()
        self.d_model, self.L, self.M, self.P = d_model, n_levels, n_heads, n_points
        self.sampling_offsets = nn.Linear(d_model, n_heads * n_levels * n_points * 2)
        self.attention_weights = nn.Linear(d_model, n_heads * n_levels * n_points)
        self.value_proj = nn.Linear(d_model, d_model)
        self.output_proj = nn.Linear(d_model, d_model)

    def forward(self, query, reference_points, value_src, shapes):
        B, Lq, C = query.shape
        M, L, P = self.M, self.L, self.P
        value = self.value_proj(value_src).view(B, -1, M, C // M)
        off = self.sampling_offsets(query).view(B, Lq, M, L, P, 2)
        w = self.attention_weights(query).view(B, Lq, M, L * P)
        w = w.softmax(-1).view(B, Lq, M, L, P)
        normalizer = torch.tensor([[wd, ht] for ht, wd in shapes], dtype=torch.float32)
        loc = reference_points[None, :, None, :, None, :] \
            + off / normalizer[None, None, None, :, None, :]
        out = grid_sample_core(value, shapes, loc, w)
        return self.output_proj(out)


class EncoderLayerTorch(nn.Module):
    """ref: msdeformattn.py:99-137 (post-norm, ReLU FFN, dropout 0)."""

    def __init__(self, d_model, d_ffn, n_levels, n_heads):
        super().__init__()
        self.self_attn = MSDeformAttnTorch(d_model, n_levels, n_heads)
        self.norm1 = nn.LayerNorm(d_model)
        self.linear1 = nn.Linear(d_model, d_ffn)
        self.linear2 = nn.Linear(d_ffn, d_model)
        self.norm2 = nn.LayerNorm(d_model)

    def forward(self, src, pos, ref, shapes):
        src2 = self.self_attn(src + pos, ref, src, shapes)
        src = self.norm1(src + src2)
        src = self.norm2(src + self.linear2(F.relu(self.linear1(src))))
        return src


class PixelDecoderTorch(nn.Module):
    """ref: msdeformattn.py:168-359 (S4 shape: res3-5 encoder + one FPN step
    to stride 4). State-dict names match the trained checkpoints."""

    def __init__(self, in_channels=(256, 512, 1024, 2048), conv_dim=256,
                 mask_dim=256, enc_layers=2, n_heads=8, d_ffn=1024):
        super().__init__()
        self.enc_layers = enc_layers
        # top-down order res5, res4, res3
        self.input_proj = nn.ModuleList([
            nn.Sequential(nn.Conv2d(c, conv_dim, 1), nn.GroupNorm(32, conv_dim))
            for c in in_channels[:0:-1]
        ])
        self.transformer = nn.Module()
        self.transformer.level_embed = nn.Parameter(torch.randn(3, conv_dim))
        self.transformer.encoder = nn.Module()
        self.transformer.encoder.layers = nn.ModuleList([
            EncoderLayerTorch(conv_dim, d_ffn, 3, n_heads) for _ in range(enc_layers)
        ])
        self.adapter_1 = D2Conv(in_channels[0], conv_dim, 1, bias=False,
                                norm=nn.GroupNorm(32, conv_dim))
        self.layer_1 = D2Conv(conv_dim, conv_dim, 3, padding=1, bias=False,
                              norm=nn.GroupNorm(32, conv_dim))
        self.mask_features = nn.Conv2d(conv_dim, mask_dim, 1)
        self.conv_dim = conv_dim

    @staticmethod
    def reference_points(shapes):
        pts = []
        for h, w in shapes:
            ys = (torch.arange(h, dtype=torch.float32) + 0.5) / h
            xs = (torch.arange(w, dtype=torch.float32) + 0.5) / w
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            pts.append(torch.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        ref = torch.cat(pts, 0)
        return ref[:, None, :].expand(-1, len(shapes), -1)

    def forward(self, features):
        srcs, poss, shapes = [], [], []
        for idx, name in enumerate(["res5", "res4", "res3"]):
            x = self.input_proj[idx](features[name])
            B, C, H, W = x.shape
            srcs.append(x.flatten(2).transpose(1, 2))
            pe = sine_pe(H, W, self.conv_dim // 2)[None]
            poss.append(pe + self.transformer.level_embed[idx][None, None, :])
            shapes.append((H, W))
        src = torch.cat(srcs, 1)
        pos = torch.cat(poss, 1)
        ref = self.reference_points(shapes)
        for layer in self.transformer.encoder.layers:
            src = layer(src, pos, ref, shapes)
        out = []
        start = 0
        for (H, W) in shapes:
            out.append(src[:, start:start + H * W].transpose(1, 2)
                       .reshape(-1, self.conv_dim, H, W))
            start += H * W
        lat = self.adapter_1(features["res2"])
        up = F.interpolate(out[-1], size=lat.shape[-2:], mode="bilinear",
                           align_corners=False)
        y = F.relu(self.layer_1(lat + up))
        mask_features = self.mask_features(y)
        return mask_features, out[:3]


# ---------------------------------------------------------------------------
# fusion
# ---------------------------------------------------------------------------


class BiMHATorch(nn.Module):
    """ref: fuse_helper.py:102-237 (one QK^T, softmax both directions)."""

    def __init__(self, v_dim, a_dim, embed_dim, num_heads):
        super().__init__()
        self.M, self.E = num_heads, embed_dim
        self.v_proj = nn.Linear(v_dim, embed_dim)
        self.a_proj = nn.Linear(a_dim, embed_dim)
        self.values_v_proj = nn.Linear(v_dim, embed_dim)
        self.values_a_proj = nn.Linear(a_dim, embed_dim)
        self.out_v_proj = nn.Linear(embed_dim, v_dim)
        self.out_a_proj = nn.Linear(embed_dim, a_dim)

    def forward(self, v, a, pos_v=None, pos_a=None):
        B, N, _ = v.shape
        M, hd = self.M, self.E // self.M
        q = self.v_proj(v if pos_v is None else v + pos_v) * hd**-0.5
        k = self.a_proj(a if pos_a is None else a + pos_a)
        vv = self.values_v_proj(v)
        va = self.values_a_proj(a)
        q = q.view(B, N, M, hd).transpose(1, 2)
        k = k.view(B, 1, M, hd).transpose(1, 2)
        vv = vv.view(B, N, M, hd).transpose(1, 2)
        va = va.view(B, 1, M, hd).transpose(1, 2)
        logits = (q @ k.transpose(-2, -1)).clamp(-50000, 50000)  # [B, M, N, 1]
        attn_v = logits.softmax(dim=2)
        lt = logits.transpose(-2, -1)
        attn_a = (lt - lt.max(dim=-1, keepdim=True).values).softmax(-1)
        out_v = (attn_v @ va).transpose(1, 2).reshape(B, N, self.E)
        out_a = (attn_a @ vv).transpose(1, 2).reshape(B, 1, self.E)
        return self.out_v_proj(out_v), self.out_a_proj(out_a)


class FusionTorch(nn.Module):
    """AVFuse MHA-B on one level (ref: AVFuse.py:10-126,
    fuse_helper.py:240-332). Keys: audio_pos / level_embed / b_attn.*"""

    def __init__(self, v_dim=256, a_dim=128, embed_dim=256, num_heads=8):
        super().__init__()
        self.audio_pos = nn.Embedding(1, a_dim)
        self.level_embed = nn.Embedding(1, v_dim)
        b = nn.Module()
        b.layer_norm_v_list = nn.ModuleList([nn.LayerNorm(v_dim)])
        b.layer_norm_a_list = nn.ModuleList([nn.LayerNorm(a_dim)])
        b.attn_list = nn.ModuleList([BiMHATorch(v_dim, a_dim, embed_dim, num_heads)])
        b.gamma_v_list = nn.ParameterList([nn.Parameter(1e-4 * torch.ones(v_dim))])
        b.gamma_a = nn.Parameter(1e-4 * torch.ones(a_dim))
        self.b_attn = b
        self.v_dim = v_dim
        self.a_dim = a_dim

    def forward(self, feat, audio):  # feat [B, C, H, W], audio [B, 1, a_dim]
        B, C, H, W = feat.shape
        pos_v = sine_pe(H, W, self.v_dim // 2)[None]
        f = feat + self.level_embed.weight[0][None, :, None, None]
        v = f.flatten(2).transpose(1, 2)  # [B, HW, C]
        pos_a = self.audio_pos.weight[None].expand(B, 1, self.a_dim)
        v = self.b_attn.layer_norm_v_list[0](v)
        a = self.b_attn.layer_norm_a_list[0](audio)
        dv, da = self.b_attn.attn_list[0](v, a, pos_v, pos_a)
        v = v + self.b_attn.gamma_v_list[0] * dv
        a = a + self.b_attn.gamma_a * da
        return v.transpose(1, 2).reshape(B, C, H, W), a


# ---------------------------------------------------------------------------
# transformer decoder
# ---------------------------------------------------------------------------


class PredictorTorch(nn.Module):
    """ref: transformer_decoder.py:222-519 (masked cross-attn -> self-attn ->
    FFN, prediction heads per layer, audio 'add' query fusion)."""

    def __init__(self, num_classes=2, hidden_dim=256, num_queries=5, nheads=8,
                 dim_feedforward=2048, dec_layers=2, mask_dim=256):
        super().__init__()
        self.Q, self.C, self.M = num_queries, hidden_dim, nheads
        self.dec_layers = dec_layers
        self.query_feat = nn.Embedding(num_queries, hidden_dim)
        self.query_embed = nn.Embedding(num_queries, hidden_dim)
        self.level_embed = nn.Embedding(3, hidden_dim)

        def _attn_layer():
            m = nn.Module()
            m.norm = nn.LayerNorm(hidden_dim)
            return m

        self.transformer_cross_attention_layers = nn.ModuleList()
        self.transformer_self_attention_layers = nn.ModuleList()
        self.transformer_ffn_layers = nn.ModuleList()
        for _ in range(dec_layers):
            ca = _attn_layer()
            ca.multihead_attn = nn.MultiheadAttention(hidden_dim, nheads,
                                                      batch_first=True)
            self.transformer_cross_attention_layers.append(ca)
            sa = _attn_layer()
            sa.self_attn = nn.MultiheadAttention(hidden_dim, nheads,
                                                 batch_first=True)
            self.transformer_self_attention_layers.append(sa)
            ff = _attn_layer()
            ff.linear1 = nn.Linear(hidden_dim, dim_feedforward)
            ff.linear2 = nn.Linear(dim_feedforward, hidden_dim)
            self.transformer_ffn_layers.append(ff)
        self.decoder_norm = nn.LayerNorm(hidden_dim)
        self.class_embed = nn.Linear(hidden_dim, num_classes + 1)
        self.mask_embed = nn.Module()
        self.mask_embed.layers = nn.ModuleList([
            nn.Linear(hidden_dim, hidden_dim), nn.Linear(hidden_dim, hidden_dim),
            nn.Linear(hidden_dim, mask_dim),
        ])

    def _mask_mlp(self, x):
        for i, l in enumerate(self.mask_embed.layers):
            x = l(x) if i == 2 else F.relu(l(x))
        return x

    def _heads(self, output, mask_features, target_size):
        d = self.decoder_norm(output)
        logits = self.class_embed(d)
        emb = self._mask_mlp(d)
        masks = torch.einsum("bqc,bchw->bqhw", emb, mask_features)
        small = F.interpolate(masks, size=target_size, mode="bilinear",
                              align_corners=False)
        B = masks.shape[0]
        am = (small.sigmoid().flatten(2) < 0.5)[:, None].expand(-1, self.M, -1, -1)
        return logits, masks, am.detach()

    def forward(self, ms, audio, mask_features):
        B = mask_features.shape[0]
        srcs, poss, sizes = [], [], []
        for i, feat in enumerate(ms):
            _, C, H, W = feat.shape
            sizes.append((H, W))
            poss.append(sine_pe(H, W, self.C // 2)[None])
            srcs.append(feat.flatten(2).transpose(1, 2)
                        + self.level_embed.weight[i][None, None, :])
        q_pos = self.query_embed.weight[None].expand(B, -1, -1)
        output = self.query_feat.weight[None].expand(B, -1, -1)
        output = output + audio.expand(B, self.Q, -1)  # 'add' query fusion

        cls_list, mask_list, middles = [], [], []
        logits, masks, am = self._heads(output, mask_features, sizes[0])
        cls_list.append(logits)
        mask_list.append(masks)
        middles.append(masks.flatten(2))
        for i in range(self.dec_layers):
            lvl = i % 3
            full = am.all(dim=-1, keepdim=True)
            am = am & ~full
            ca = self.transformer_cross_attention_layers[i]
            t2, _ = ca.multihead_attn(
                output + q_pos, srcs[lvl] + poss[lvl], srcs[lvl],
                attn_mask=am.reshape(B * self.M, self.Q, -1), need_weights=False,
            )
            output = ca.norm(output + t2)
            sa = self.transformer_self_attention_layers[i]
            t2, _ = sa.self_attn(output + q_pos, output + q_pos, output,
                                 need_weights=False)
            output = sa.norm(output + t2)
            ff = self.transformer_ffn_layers[i]
            output = ff.norm(output + ff.linear2(F.relu(ff.linear1(output))))
            logits, masks, am = self._heads(output, mask_features,
                                            sizes[(i + 1) % 3])
            cls_list.append(logits)
            mask_list.append(masks)
            if i != self.dec_layers - 1:
                middles.append(masks.flatten(2))
        return {
            "pred_logits": cls_list[-1],
            "pred_masks": mask_list[-1],
            "aux_outputs": [{"pred_logits": a, "pred_masks": b}
                            for a, b in zip(cls_list[:-1], mask_list[:-1])],
            "middles_attn_mask": middles,
        }


class AudioMLPTorch(nn.Module):
    def __init__(self, out_dim=256):
        super().__init__()
        self.embeddings = nn.Sequential(
            nn.Linear(128, 4096), nn.ReLU(True),
            nn.Linear(4096, 4096), nn.ReLU(True),
            nn.Linear(4096, out_dim),
        )

    def forward(self, x):
        return self.embeddings(x)


class ComboTorch(nn.Module):
    """The full reference graph, eval forward (S4 late-fusion MHA-B)."""

    def __init__(self, num_classes=2, num_queries=5, enc_layers=2, dec_layers=2,
                 backbone="resnet", pvt_depths=(1, 2, 1, 1)):
        super().__init__()
        if backbone == "pvt":
            self.backbone = PVTv2Torch(pvt_depths)
            self.pre_sam_backbone = PVTv2Torch(pvt_depths)
            dims = PVTv2Torch.dims
        else:
            self.backbone = ResNet50()
            self.pre_sam_backbone = ResNet50()
            dims = (256, 512, 1024, 2048)
        self.audio_backbone = VGGishTorch()
        self.scale_factor_module = nn.ModuleList([SEBlock(d) for d in dims])
        sem = nn.Module()
        sem.pixel_decoder = PixelDecoderTorch(in_channels=dims,
                                              enc_layers=enc_layers)
        sem.fusion_module = FusionTorch()
        sem.audio_transformation = AudioMLPTorch(256)
        sem.predictor = PredictorTorch(num_classes=num_classes,
                                       num_queries=num_queries,
                                       dec_layers=dec_layers)
        self.sem_seg_head = sem

    def forward(self, images, mel, pre_masks):
        """images/pre_masks [N, 3, H, W] raw RGB 0-255; mel [N, 1, 96, 64].

        Grad-enabled (callers wrap inference in `torch.no_grad()`): the
        end-to-end gradient oracle (tests/test_grad_oracle.py) backprops
        through this forward."""
        mean = torch.tensor(PIXEL_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(PIXEL_STD).view(1, 3, 1, 1)
        frames = (images - mean) / std
        audio = self.audio_backbone(mel)[:, None, :]  # [N, 1, 128]
        feats = self.backbone(frames)
        pre = self.pre_sam_backbone((pre_masks - mean) / std)
        for i, k in enumerate(["res2", "res3", "res4", "res5"]):
            gate = self.scale_factor_module[i](pre[k])
            feats[k] = feats[k] + gate * pre[k]
        mask_features, ms = self.sem_seg_head.pixel_decoder(feats)
        mask_features, a = self.sem_seg_head.fusion_module(mask_features, audio)
        audio_t = self.sem_seg_head.audio_transformation(a)
        return self.sem_seg_head.predictor(ms, audio_t, mask_features)


def randomize(model: nn.Module, seed: int = 0):
    """Small random weights everywhere + realistic frozen-BN statistics."""
    rng = np.random.RandomState(seed)
    for name, p in model.named_parameters():
        p.data = torch.from_numpy(
            (rng.randn(*p.shape) * 0.05).astype(np.float32)
        )
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            n = m.num_features
            m.weight.data = torch.from_numpy(rng.rand(n).astype(np.float32) + 0.5)
            m.bias.data = torch.from_numpy(rng.randn(n).astype(np.float32) * 0.1)
            m.running_mean.data = torch.from_numpy(rng.randn(n).astype(np.float32) * 0.1)
            m.running_var.data = torch.from_numpy(rng.rand(n).astype(np.float32) + 0.5)
    model.eval()
    return model
