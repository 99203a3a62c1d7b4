"""Backbone parity tests vs torch oracles (constructed here, weights
transplanted into the flax models)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from combo_avs_tpu.models.pvtv2 import PVTv2, pvtv2_b5
from combo_avs_tpu.models.resnet import ResNet

# ---------------------------------------------------------------------------
# ResNet-50
# ---------------------------------------------------------------------------


class TorchBottleneck(nn.Module):
    def __init__(self, cin, mid, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, mid, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv2 = nn.Conv2d(mid, mid, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.conv3 = nn.Conv2d(mid, cout, 1, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idn = x if self.down is None else self.down(x)
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = self.bn3(self.conv3(x))
        return F.relu(x + idn)


class TorchResNet50(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        cfg = [(64, 256, 3, 1), (128, 512, 4, 2), (256, 1024, 6, 2), (512, 2048, 3, 2)]
        cin = 64
        self.stages = nn.ModuleList()
        for mid, cout, n, s in cfg:
            blocks = []
            for b in range(n):
                blocks.append(TorchBottleneck(cin, mid, cout, s if b == 0 else 1))
                cin = cout
            self.stages.append(nn.Sequential(*blocks))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        outs = []
        for st in self.stages:
            x = st(x)
            outs.append(x)
        return outs


def _randomize_bn(m):
    rng = np.random.RandomState(42)
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            n = mod.num_features
            mod.weight.data = torch.from_numpy(rng.rand(n).astype(np.float32) + 0.5)
            mod.bias.data = torch.from_numpy(rng.randn(n).astype(np.float32) * 0.1)
            mod.running_mean.data = torch.from_numpy(rng.randn(n).astype(np.float32) * 0.1)
            mod.running_var.data = torch.from_numpy(rng.rand(n).astype(np.float32) + 0.5)


def _bn_to_frozen(bn):
    return {
        "scale": bn.weight.detach().numpy(),
        "bias": bn.bias.detach().numpy(),
        "mean": bn.running_mean.numpy(),
        "var": bn.running_var.numpy(),
    }


def test_resnet50_matches_torch():
    torch.manual_seed(0)
    tm = TorchResNet50().eval()
    _randomize_bn(tm)

    model = ResNet(depth=50)
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    params = {"stem_conv1": {"kernel": tm.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)}}
    frozen = {"stem_norm1": _bn_to_frozen(tm.bn1)}
    for s, stage in enumerate(tm.stages):
        for b, blk in enumerate(stage):
            name = f"res{s + 2}_block{b}"
            p = {
                "conv1": {"kernel": blk.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)},
                "conv2": {"kernel": blk.conv2.weight.detach().numpy().transpose(2, 3, 1, 0)},
                "conv3": {"kernel": blk.conv3.weight.detach().numpy().transpose(2, 3, 1, 0)},
            }
            f = {
                "norm1": _bn_to_frozen(blk.bn1),
                "norm2": _bn_to_frozen(blk.bn2),
                "norm3": _bn_to_frozen(blk.bn3),
            }
            if blk.down is not None:
                p["shortcut"] = {"kernel": blk.down[0].weight.detach().numpy().transpose(2, 3, 1, 0)}
                f["shortcut_norm"] = _bn_to_frozen(blk.down[1])
            params[name] = p
            frozen[name] = f

    outs = model.apply({"params": params, "frozen": frozen}, x)
    refs = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    for i, key in enumerate(["res2", "res3", "res4", "res5"]):
        ref = refs[i].detach().numpy().transpose(0, 2, 3, 1)
        assert outs[key].shape == ref.shape
        np.testing.assert_allclose(np.asarray(outs[key]), ref, atol=2e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# PVTv2 (tiny variant for numerics; B5 for shapes)
# ---------------------------------------------------------------------------


class TorchPVTTiny(nn.Module):
    """Functional torch spelling of a 2-stage PVTv2 (dims 16/32, depths 1/2,
    heads 1/2, sr 2/1, mlp 2)."""

    def __init__(self):
        super().__init__()
        self.pe1 = nn.Conv2d(3, 16, 7, 4, 3)
        self.pn1 = nn.LayerNorm(16, eps=1e-6)
        self.pe2 = nn.Conv2d(16, 32, 3, 2, 1)
        self.pn2 = nn.LayerNorm(32, eps=1e-6)
        self.blocks1 = nn.ModuleList([self._block(16, 1, 2, 2)])
        self.blocks2 = nn.ModuleList([self._block(32, 2, 1, 2) for _ in range(2)])
        self.n1 = nn.LayerNorm(16, eps=1e-6)
        self.n2 = nn.LayerNorm(32, eps=1e-6)

    @staticmethod
    def _block(dim, heads, sr, mlp):
        b = nn.Module()
        b.norm1 = nn.LayerNorm(dim, eps=1e-6)
        b.q = nn.Linear(dim, dim, bias=True)
        b.kv = nn.Linear(dim, dim * 2, bias=True)
        b.proj = nn.Linear(dim, dim)
        b.sr_ratio = sr
        b.heads = heads
        if sr > 1:
            b.sr = nn.Conv2d(dim, dim, sr, sr)
            b.srn = nn.LayerNorm(dim, eps=1e-6)
        b.norm2 = nn.LayerNorm(dim, eps=1e-6)
        b.fc1 = nn.Linear(dim, dim * mlp)
        b.dw = nn.Conv2d(dim * mlp, dim * mlp, 3, 1, 1, groups=dim * mlp)
        b.fc2 = nn.Linear(dim * mlp, dim)
        return b

    @staticmethod
    def _attn(b, x, H, W):
        B, N, C = x.shape
        hd = C // b.heads
        q = b.q(x).reshape(B, N, b.heads, hd).permute(0, 2, 1, 3)
        kvin = x
        if b.sr_ratio > 1:
            xm = x.transpose(1, 2).reshape(B, C, H, W)
            xm = b.sr(xm).reshape(B, C, -1).transpose(1, 2)
            kvin = b.srn(xm)
        kv = b.kv(kvin).reshape(B, -1, 2, b.heads, hd).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        a = (q @ k.transpose(-2, -1)) * hd**-0.5
        a = a.softmax(-1)
        o = (a @ v).transpose(1, 2).reshape(B, N, C)
        return b.proj(o)

    @classmethod
    def _run_block(cls, b, x, H, W):
        x = x + cls._attn(b, b.norm1(x), H, W)
        h = b.fc1(b.norm2(x))
        B, N, C = h.shape
        h = b.dw(h.transpose(1, 2).reshape(B, C, H, W)).reshape(B, C, N).transpose(1, 2)
        h = F.gelu(h)
        return x + b.fc2(h)

    def forward(self, x):
        B = x.shape[0]
        x = self.pe1(x)
        _, C, H1, W1 = x.shape
        x = self.pn1(x.flatten(2).transpose(1, 2))
        for b in self.blocks1:
            x = self._run_block(b, x, H1, W1)
        o1 = self.n1(x).reshape(B, H1, W1, -1)
        x = self.pe2(o1.permute(0, 3, 1, 2))
        _, C, H2, W2 = x.shape
        x = self.pn2(x.flatten(2).transpose(1, 2))
        for b in self.blocks2:
            x = self._run_block(b, x, H2, W2)
        o2 = self.n2(x).reshape(B, H2, W2, -1)
        return o1, o2


def _lin(m):
    return {"kernel": m.weight.detach().numpy().T, "bias": m.bias.detach().numpy()}


def _convp(m):
    return {
        "kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0),
        "bias": m.bias.detach().numpy(),
    }


def _ln(m):
    return {"scale": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()}


def test_pvtv2_matches_torch_tiny():
    torch.manual_seed(1)
    tm = TorchPVTTiny().eval()

    model = PVTv2(
        embed_dims=(16, 32),
        num_heads=(1, 2),
        mlp_ratios=(2, 2),
        depths=(1, 2),
        sr_ratios=(2, 1),
        drop_path_rate=0.0,
        out_features=("res2", "res3"),
    )
    x = np.random.RandomState(3).randn(2, 32, 32, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def stack(blocks, key_fn):
        outs = [key_fn(b) for b in blocks]
        return jax.tree.map(lambda *xs: np.stack(xs), *outs)

    def block_params(b, has_sr):
        p = {
            "norm1": _ln(b.norm1),
            "attn": {"q": _lin(b.q), "kv": _lin(b.kv), "proj": _lin(b.proj)},
            "norm2": _ln(b.norm2),
            "mlp": {"fc1": _lin(b.fc1), "dwconv": _convp(b.dw), "fc2": _lin(b.fc2)},
        }
        if has_sr:
            p["attn"]["sr"] = _convp(b.sr)
            p["attn"]["sr_norm"] = _ln(b.srn)
        return p

    params = {
        "patch_embed1": _convp(tm.pe1),
        "patch_norm1": _ln(tm.pn1),
        "patch_embed2": _convp(tm.pe2),
        "patch_norm2": _ln(tm.pn2),
        "norm1": _ln(tm.n1),
        "norm2": _ln(tm.n2),
        "block1": stack(tm.blocks1, lambda b: block_params(b, True)),
        "block2": stack(tm.blocks2, lambda b: block_params(b, False)),
    }

    outs = model.apply({"params": params}, x)
    r1, r2 = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(outs["res2"]), r1.detach().numpy(), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(outs["res3"]), r2.detach().numpy(), atol=2e-4, rtol=1e-4)


def test_pvtv2_b5_shapes_and_param_count():
    model = pvtv2_b5()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    # PVTv2-B5 backbone (no classifier head): ~81.4M params
    assert 78e6 < n_params < 85e6, n_params
    out = jax.eval_shape(
        lambda v: model.apply(v, x), variables
    )
    assert out["res2"].shape == (1, 8, 8, 64)
    assert out["res5"].shape == (1, 1, 1, 512)
