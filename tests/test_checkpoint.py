"""Checkpoint conversion tests.

The torch state dicts here are synthesized with the REFERENCE's exact module
naming (vggish.py, d2 ResNet, timm PVTv2, maskformer_model.py) so the rename
maps are exercised end-to-end; forward parity is checked where a torch oracle
exists, and the full-model conversion is checked structurally against
model.init (paths + shapes must match exactly)."""

import jax
import numpy as np
import pytest
import torch

from combo_avs_tpu.models.meta_arch import MaskFormer
from combo_avs_tpu.models.resnet import ResNet
from combo_avs_tpu.models.vggish import VGGish
from combo_avs_tpu.train.checkpoint import (
    convert_caffe2_resnet,
    convert_combo_checkpoint,
    convert_pvt,
    convert_vggish,
    fan_out_siamese,
)

rng = np.random.RandomState(0)


def z(*shape):
    return rng.randn(*shape).astype(np.float32) * 0.05


def test_convert_vggish_forward_parity():
    from tests.test_audio import _torch_vggish

    torch.manual_seed(0)
    tm = _torch_vggish().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_vggish(sd)
    x = rng.randn(2, 96, 64, 1).astype(np.float32)
    ours = np.asarray(VGGish().apply({"params": params}, x))
    ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def _caffe2_r50_sd():
    sd = {"conv1_w": z(64, 3, 7, 7), "res_conv1_bn_s": z(64), "res_conv1_bn_b": z(64)}
    blocks = {2: 3, 3: 4, 4: 6, 5: 3}
    cin = 64
    for s, n in blocks.items():
        mid = 64 * 2 ** (s - 2)
        cout = mid * 4
        for b in range(n):
            pre = f"res{s}_{b}"
            sd[f"{pre}_branch2a_w"] = z(mid, cin if b == 0 else cout, 1, 1)
            sd[f"{pre}_branch2b_w"] = z(mid, mid, 3, 3)
            sd[f"{pre}_branch2c_w"] = z(cout, mid, 1, 1)
            for br, c in (("branch2a", mid), ("branch2b", mid), ("branch2c", cout)):
                sd[f"{pre}_{br}_bn_s"] = z(c) + 1
                sd[f"{pre}_{br}_bn_b"] = z(c)
            if b == 0:
                sd[f"{pre}_branch1_w"] = z(cout, cin, 1, 1)
                sd[f"{pre}_branch1_bn_s"] = z(cout) + 1
                sd[f"{pre}_branch1_bn_b"] = z(cout)
            cin = cout
    return sd


def test_convert_caffe2_resnet_structure():
    sd = _caffe2_r50_sd()
    params, frozen = convert_caffe2_resnet(sd)
    model = ResNet(depth=50)
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    )

    def paths(t):
        return {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_flatten_with_path(t)[0]}

    got_p, ref_p = paths(params), paths(ref["params"])
    assert got_p == ref_p
    got_f, ref_f = paths(frozen), paths(ref["frozen"])
    assert got_f == ref_f
    # and the model actually runs with the converted weights
    out = model.apply({"params": params, "frozen": frozen},
                      np.zeros((1, 64, 64, 3), np.float32))
    assert out["res5"].shape == (1, 2, 2, 2048)


def test_convert_pvt_structure():
    from combo_avs_tpu.models.pvtv2 import PVTv2

    depths = (1, 2)
    dims = (8, 16)
    heads = (1, 2)
    srs = (2, 1)
    sd = {}
    for i, (d, dim, sr) in enumerate(zip(depths, dims, srs), start=1):
        cin = 3 if i == 1 else dims[i - 2]
        patch = 7 if i == 1 else 3
        sd[f"patch_embed{i}.proj.weight"] = z(dim, cin, patch, patch)
        sd[f"patch_embed{i}.proj.bias"] = z(dim)
        sd[f"patch_embed{i}.norm.weight"] = z(dim) + 1
        sd[f"patch_embed{i}.norm.bias"] = z(dim)
        sd[f"norm{i}.weight"] = z(dim) + 1
        sd[f"norm{i}.bias"] = z(dim)
        for j in range(d):
            b = f"block{i}.{j}"
            for ln in ("norm1", "norm2"):
                sd[f"{b}.{ln}.weight"] = z(dim) + 1
                sd[f"{b}.{ln}.bias"] = z(dim)
            sd[f"{b}.attn.q.weight"] = z(dim, dim)
            sd[f"{b}.attn.q.bias"] = z(dim)
            sd[f"{b}.attn.kv.weight"] = z(2 * dim, dim)
            sd[f"{b}.attn.kv.bias"] = z(2 * dim)
            sd[f"{b}.attn.proj.weight"] = z(dim, dim)
            sd[f"{b}.attn.proj.bias"] = z(dim)
            if sr > 1:
                sd[f"{b}.attn.sr.weight"] = z(dim, dim, sr, sr)
                sd[f"{b}.attn.sr.bias"] = z(dim)
                sd[f"{b}.attn.norm.weight"] = z(dim) + 1
                sd[f"{b}.attn.norm.bias"] = z(dim)
            h = dim * 2
            sd[f"{b}.mlp.fc1.weight"] = z(h, dim)
            sd[f"{b}.mlp.fc1.bias"] = z(h)
            sd[f"{b}.mlp.dwconv.dwconv.weight"] = z(h, 1, 3, 3)
            sd[f"{b}.mlp.dwconv.dwconv.bias"] = z(h)
            sd[f"{b}.mlp.fc2.weight"] = z(dim, h)
            sd[f"{b}.mlp.fc2.bias"] = z(dim)

    params = convert_pvt(sd, depths=depths)
    # structure must match a matching flax PVTv2
    model = PVTv2(embed_dims=dims, num_heads=heads, mlp_ratios=(2, 2),
                  depths=depths, sr_ratios=srs, drop_path_rate=0.0,
                  out_features=("res2", "res3"))

    # convert_pvt emits all 4 stages normally; here only 2 exist
    params = {k: v for k, v in params.items()
              if not any(k.endswith(s) for s in ("3", "4"))}
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))
    )

    def paths(t):
        return {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_flatten_with_path(t)[0]}

    assert paths(params) == paths(ref["params"])
    out = model.apply({"params": params}, np.zeros((1, 32, 32, 3), np.float32))
    assert out["res3"].shape == (1, 4, 4, 16)


def test_convert_pvt_partial_stages_raises():
    with pytest.raises(KeyError):
        convert_pvt({}, depths=(1,))


def _full_combo_sd(dec_layers=9, enc_layers=6, num_classes=2, hidden=256):
    """Synthesize a full torch COMBO-R50 S4 state dict (reference naming)."""
    sd = {}

    def resnet(prefix):
        sd[prefix + "stem.conv1.weight"] = z(64, 3, 7, 7)
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[prefix + f"stem.conv1.norm.{leaf}"] = z(64) + (1 if "var" in leaf else 0)
        blocks = {2: 3, 3: 4, 4: 6, 5: 3}
        cin = 64
        for s, n in blocks.items():
            mid = 64 * 2 ** (s - 2)
            cout = mid * 4
            for b in range(n):
                pre = f"{prefix}res{s}.{b}."
                sd[pre + "conv1.weight"] = z(mid, cin if b == 0 else cout, 1, 1)
                sd[pre + "conv2.weight"] = z(mid, mid, 3, 3)
                sd[pre + "conv3.weight"] = z(cout, mid, 1, 1)
                for cv, c in (("conv1", mid), ("conv2", mid), ("conv3", cout)):
                    for leaf in ("weight", "bias", "running_mean", "running_var"):
                        sd[pre + f"{cv}.norm.{leaf}"] = z(c) + (1 if "var" in leaf else 0)
                if b == 0:
                    sd[pre + "shortcut.weight"] = z(cout, cin, 1, 1)
                    for leaf in ("weight", "bias", "running_mean", "running_var"):
                        sd[pre + f"shortcut.norm.{leaf}"] = z(cout) + (1 if "var" in leaf else 0)
                cin = cout

    resnet("backbone.")
    resnet("pre_sam_backbone.")

    # vggish
    chans = [(1, 64), (64, 128), (128, 256), (256, 256), (256, 512), (512, 512)]
    for tid, (ci, co) in zip((0, 3, 6, 8, 11, 13), chans):
        sd[f"audio_backbone.features.{tid}.weight"] = z(co, ci, 3, 3)
        sd[f"audio_backbone.features.{tid}.bias"] = z(co)
    for tid, (ci, co) in zip((0, 2, 4), [(12288, 4096), (4096, 4096), (4096, 128)]):
        sd[f"audio_backbone.embeddings.{tid}.weight"] = z(co, ci)
        sd[f"audio_backbone.embeddings.{tid}.bias"] = z(co)

    # SE gates
    for i, dim in enumerate((256, 512, 1024, 2048)):
        sd[f"scale_factor_module.{i}.fc1.weight"] = z(dim // 16, dim)
        sd[f"scale_factor_module.{i}.fc1.bias"] = z(dim // 16)
        sd[f"scale_factor_module.{i}.fc2.weight"] = z(dim, dim // 16)
        sd[f"scale_factor_module.{i}.fc2.bias"] = z(dim)

    # pixel decoder
    pd = "sem_seg_head.pixel_decoder."
    for i, cin in enumerate((2048, 1024, 512)):
        sd[pd + f"input_proj.{i}.0.weight"] = z(hidden, cin, 1, 1)
        sd[pd + f"input_proj.{i}.0.bias"] = z(hidden)
        sd[pd + f"input_proj.{i}.1.weight"] = z(hidden) + 1
        sd[pd + f"input_proj.{i}.1.bias"] = z(hidden)
    sd[pd + "transformer.level_embed"] = z(3, hidden)
    for l in range(enc_layers):
        el = pd + f"transformer.encoder.layers.{l}."
        sd[el + "self_attn.sampling_offsets.weight"] = z(8 * 3 * 4 * 2, hidden)
        sd[el + "self_attn.sampling_offsets.bias"] = z(8 * 3 * 4 * 2)
        sd[el + "self_attn.attention_weights.weight"] = z(8 * 3 * 4, hidden)
        sd[el + "self_attn.attention_weights.bias"] = z(8 * 3 * 4)
        sd[el + "self_attn.value_proj.weight"] = z(hidden, hidden)
        sd[el + "self_attn.value_proj.bias"] = z(hidden)
        sd[el + "self_attn.output_proj.weight"] = z(hidden, hidden)
        sd[el + "self_attn.output_proj.bias"] = z(hidden)
        for ln in ("norm1", "norm2"):
            sd[el + f"{ln}.weight"] = z(hidden) + 1
            sd[el + f"{ln}.bias"] = z(hidden)
        sd[el + "linear1.weight"] = z(1024, hidden)
        sd[el + "linear1.bias"] = z(1024)
        sd[el + "linear2.weight"] = z(hidden, 1024)
        sd[el + "linear2.bias"] = z(hidden)
    sd[pd + "adapter_1.weight"] = z(hidden, 256, 1, 1)
    sd[pd + "adapter_1.norm.weight"] = z(hidden) + 1
    sd[pd + "adapter_1.norm.bias"] = z(hidden)
    sd[pd + "layer_1.weight"] = z(hidden, hidden, 3, 3)
    sd[pd + "layer_1.norm.weight"] = z(hidden) + 1
    sd[pd + "layer_1.norm.bias"] = z(hidden)
    sd[pd + "mask_features.weight"] = z(hidden, hidden, 1, 1)
    sd[pd + "mask_features.bias"] = z(hidden)

    # fusion
    fm = "sem_seg_head.fusion_module."
    sd[fm + "audio_pos.weight"] = z(1, 128)
    sd[fm + "level_embed.weight"] = z(1, 256)
    sd[fm + "b_attn.layer_norm_v_list.0.weight"] = z(256) + 1
    sd[fm + "b_attn.layer_norm_v_list.0.bias"] = z(256)
    sd[fm + "b_attn.layer_norm_a_list.0.weight"] = z(128) + 1
    sd[fm + "b_attn.layer_norm_a_list.0.bias"] = z(128)
    embed = 256
    for lin, (ci, co) in {
        "v_proj": (256, embed), "a_proj": (128, embed),
        "values_v_proj": (256, embed), "values_a_proj": (128, embed),
        "out_v_proj": (embed, 256), "out_a_proj": (embed, 128),
    }.items():
        sd[fm + f"b_attn.attn_list.0.{lin}.weight"] = z(co, ci)
        sd[fm + f"b_attn.attn_list.0.{lin}.bias"] = z(co)
    sd[fm + "b_attn.gamma_v_list.0"] = z(256)
    sd[fm + "b_attn.gamma_a"] = z(128)

    at = "sem_seg_head.audio_transformation."
    for tid, (ci, co) in zip((0, 2, 4), [(128, 4096), (4096, 4096), (4096, 256)]):
        sd[at + f"embeddings.{tid}.weight"] = z(co, ci)
        sd[at + f"embeddings.{tid}.bias"] = z(co)

    # predictor
    pr = "sem_seg_head.predictor."
    sd[pr + "query_feat.weight"] = z(100, hidden)
    sd[pr + "query_embed.weight"] = z(100, hidden)
    sd[pr + "level_embed.weight"] = z(3, hidden)
    for i in range(dec_layers):
        for kind, mod in (("transformer_self_attention_layers", "self_attn"),
                          ("transformer_cross_attention_layers", "multihead_attn")):
            base = pr + f"{kind}.{i}."
            sd[base + f"{mod}.in_proj_weight"] = z(3 * hidden, hidden)
            sd[base + f"{mod}.in_proj_bias"] = z(3 * hidden)
            sd[base + f"{mod}.out_proj.weight"] = z(hidden, hidden)
            sd[base + f"{mod}.out_proj.bias"] = z(hidden)
            sd[base + "norm.weight"] = z(hidden) + 1
            sd[base + "norm.bias"] = z(hidden)
        base = pr + f"transformer_ffn_layers.{i}."
        sd[base + "linear1.weight"] = z(2048, hidden)
        sd[base + "linear1.bias"] = z(2048)
        sd[base + "linear2.weight"] = z(hidden, 2048)
        sd[base + "linear2.bias"] = z(hidden)
        sd[base + "norm.weight"] = z(hidden) + 1
        sd[base + "norm.bias"] = z(hidden)
    sd[pr + "decoder_norm.weight"] = z(hidden) + 1
    sd[pr + "decoder_norm.bias"] = z(hidden)
    sd[pr + "class_embed.weight"] = z(num_classes + 1, hidden)
    sd[pr + "class_embed.bias"] = z(num_classes + 1)
    for i, (ci, co) in enumerate([(hidden, hidden), (hidden, hidden), (hidden, 256)]):
        sd[pr + f"mask_embed.layers.{i}.weight"] = z(co, ci)
        sd[pr + f"mask_embed.layers.{i}.bias"] = z(co)
    return sd


def test_convert_full_combo_checkpoint_structure():
    sd = _full_combo_sd()
    variables = convert_combo_checkpoint(sd, backbone="resnet")

    model = MaskFormer()  # full COMBO-R50 S4 architecture
    B, T, S = 1, 5, 224
    ref = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            np.zeros((B, T, S, S, 3), np.float32),
            np.zeros((B, T, 96, 64), np.float32),
            np.zeros((B, T, S, S, 3), np.float32),
        )
    )

    def paths(t):
        return {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_flatten_with_path(t)[0]}

    got_p, ref_p = paths(variables["params"]), paths(ref["params"])
    missing = set(ref_p) - set(got_p)
    extra = set(got_p) - set(ref_p)
    assert not missing, f"missing params: {sorted(missing)[:10]}"
    assert not extra, f"extra params: {sorted(extra)[:10]}"
    mismatched = {k for k in ref_p if got_p[k] != ref_p[k]}
    assert not mismatched, {k: (got_p[k], ref_p[k]) for k in sorted(mismatched)[:5]}
    assert paths(variables["frozen"]) == paths(ref["frozen"])


def test_fan_out_siamese():
    sd = _caffe2_r50_sd()
    p, f = convert_caffe2_resnet(sd)
    p1, f1, p2, f2 = fan_out_siamese((p, f))
    a = jax.tree.leaves(p1)[0]
    b = jax.tree.leaves(p2)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a is not b  # independent copies


def test_save_checkpoint_prunes_to_keep(tmp_path):
    from combo_avs_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    state = {"w": np.arange(4, dtype=np.float32)}
    for step in [5, 10, 15, 20]:
        save_checkpoint(str(tmp_path), state, step, keep=2)
    names = sorted(p.name for p in tmp_path.iterdir() if p.name.startswith("step_"))
    assert names == ["step_15", "step_20"]
    restored = load_checkpoint(str(tmp_path / "step_20"), state)
    np.testing.assert_array_equal(restored["w"], state["w"])
