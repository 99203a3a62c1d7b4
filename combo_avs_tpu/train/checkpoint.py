"""Checkpoint I/O: native orbax checkpoints + torch/Caffe2 pickle import.

The reference loads three pickle dialects (SURVEY §5-checkpointing):
* `vggish-10086976.pth` — torchvggish state dict (ref: vggish.py:133-136),
* `R-50.pkl` — Caffe2 MSRA ResNet pickle (BN pre-folded into scale/bias),
  or d2-converted names inside trained checkpoints,
* `d2_pvt_v2_b5.pkl` — PVT pickle produced by
  avs_tools/convert_pvt_model_to_d2.py (keys pass through timm naming),
* `model_best.pth` — full trained COMBO model (torch module names).

This module converts each into this repo's flax variable trees, including
the ONE-TO-MANY siamese fan-out: a single pretrained backbone key initializes
BOTH the visual and the pre-SAM towers (the reference requires a d2 patch for
this, ref README.md:49-62 — here it is first-class).

Weight layout conventions: torch conv OIHW -> flax HWIO; torch Linear
[out,in] -> flax kernel [in,out]; LayerNorm/GroupNorm weight -> scale.
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Dict, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# loading raw files
# ---------------------------------------------------------------------------


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth (torch pickle) or .pkl (plain/Caffe2 pickle) into a flat
    {name: np.ndarray} dict."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            obj = pickle.load(f, encoding="latin1")
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if k.startswith("__") or not hasattr(v, "shape"):
            continue
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _conv(w):  # OIHW -> HWIO
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _dwconv(w):  # torch depthwise [C,1,kh,kw] -> flax HWIO (kh,kw,1,C)
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _lin(w):  # [out,in] -> [in,out]
    return np.ascontiguousarray(w.T)


def _set(tree: dict, path: str, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


# ---------------------------------------------------------------------------
# VGGish
# ---------------------------------------------------------------------------

# conv positions in the torch Sequential [conv,relu]x2 + pools layout
# (ref: vggish.py make_layers -> 0,3,6,8,11,13)
_VGG_CONV_IDS = (0, 3, 6, 8, 11, 13)


def convert_vggish(sd: Dict[str, np.ndarray], prefix: str = "") -> dict:
    """torchvggish state dict -> params for models.vggish.VGGish."""
    p: dict = {}
    for i, tid in enumerate(_VGG_CONV_IDS):
        _set(p, f"conv{i}/kernel", _conv(sd[f"{prefix}features.{tid}.weight"]))
        _set(p, f"conv{i}/bias", sd[f"{prefix}features.{tid}.bias"])
    for i, tid in enumerate((0, 2, 4)):
        _set(p, f"fc{i}/kernel", _lin(sd[f"{prefix}embeddings.{tid}.weight"]))
        _set(p, f"fc{i}/bias", sd[f"{prefix}embeddings.{tid}.bias"])
    return p


# ---------------------------------------------------------------------------
# ResNet-50
# ---------------------------------------------------------------------------


def convert_caffe2_resnet(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """Raw MSRA/Caffe2 R-50.pkl (conv1_w, res2_0_branch2a_w, ..., BN folded
    into _bn_s/_bn_b with no running stats)."""
    params: dict = {}
    frozen: dict = {}
    _set(params, "stem_conv1/kernel", _conv(sd["conv1_w"]))
    _set(frozen, "stem_norm1/scale", sd["res_conv1_bn_s"])
    _set(frozen, "stem_norm1/bias", sd["res_conv1_bn_b"])
    _set(frozen, "stem_norm1/mean", np.zeros_like(sd["res_conv1_bn_s"]))
    _set(frozen, "stem_norm1/var", np.ones_like(sd["res_conv1_bn_s"]) - 1e-5)

    branch_to_conv = {"branch2a": "conv1", "branch2b": "conv2", "branch2c": "conv3"}
    norm_of = {"conv1": "norm1", "conv2": "norm2", "conv3": "norm3"}
    for key in sd:
        m = re.match(r"res(\d)_(\d+)_(branch\w+)_(w|bn_s|bn_b)$", key)
        if not m:
            continue
        stage, block, branch, leaf = m.groups()
        base = f"res{stage}_block{block}"
        if branch == "branch1":
            tgt, ntgt = "shortcut", "shortcut_norm"
        else:
            tgt = branch_to_conv[branch]
            ntgt = norm_of[tgt]
        if leaf == "w":
            _set(params, f"{base}/{tgt}/kernel", _conv(sd[key]))
        elif leaf == "bn_s":
            _set(frozen, f"{base}/{ntgt}/scale", sd[key])
            _set(frozen, f"{base}/{ntgt}/mean", np.zeros_like(sd[key]))
            _set(frozen, f"{base}/{ntgt}/var", np.ones_like(sd[key]) - 1e-5)
        else:
            _set(frozen, f"{base}/{ntgt}/bias", sd[key])
    return params, frozen


def convert_d2_resnet(sd: Dict[str, np.ndarray], prefix: str = "") -> Tuple[dict, dict]:
    """d2-style names (stem.conv1.weight, res2.0.conv1.norm.running_mean...)
    as found inside trained COMBO checkpoints."""
    params: dict = {}
    frozen: dict = {}
    norm_leaf = {"weight": "scale", "bias": "bias", "running_mean": "mean", "running_var": "var"}
    for key, v in sd.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        if k.startswith("stem.conv1."):
            leaf = k[len("stem.conv1."):]
            if leaf == "weight":
                _set(params, "stem_conv1/kernel", _conv(v))
            elif leaf.startswith("norm.") and leaf[5:] in norm_leaf:
                # (num_batches_tracked etc. skipped)
                _set(frozen, f"stem_norm1/{norm_leaf[leaf[5:]]}", v)
            continue
        m = re.match(r"res(\d)\.(\d+)\.(conv\d|shortcut)\.(.*)$", k)
        if not m:
            continue
        stage, block, conv, leaf = m.groups()
        base = f"res{stage}_block{block}"
        if leaf == "weight":
            _set(params, f"{base}/{conv}/kernel", _conv(v))
        elif leaf.startswith("norm.") and leaf[5:] in norm_leaf:
            ntgt = "shortcut_norm" if conv == "shortcut" else f"norm{conv[-1]}"
            _set(frozen, f"{base}/{ntgt}/{norm_leaf[leaf[5:]]}", v)
    return params, frozen


def convert_resnet(sd: Dict[str, np.ndarray], prefix: str = "") -> Tuple[dict, dict]:
    if any(k.startswith("conv1_w") for k in sd):
        return convert_caffe2_resnet(sd)
    return convert_d2_resnet(sd, prefix)


# ---------------------------------------------------------------------------
# PVTv2 (timm naming, as in d2_pvt_v2_b5.pkl and trained checkpoints)
# ---------------------------------------------------------------------------


def convert_pvt(
    sd: Dict[str, np.ndarray], depths=None, prefix: str = ""
) -> dict:
    """timm PVTv2 keys -> scan-stacked flax params for models.pvtv2.PVTv2.

    depths=None infers the per-stage depth from the block{i}.{j}.* keys
    (B5 checkpoints yield (3, 6, 40, 3); reduced-depth test models work too).
    """
    if depths is None:
        depths = []
        for i in range(1, 5):
            j = 0
            while f"{prefix}block{i}.{j}.norm1.weight" in sd:
                j += 1
            depths.append(j)
        assert all(depths), f"no PVT block keys under prefix {prefix!r}"
    p: dict = {}
    for i in range(1, len(depths) + 1):
        _set(p, f"patch_embed{i}/kernel", _conv(sd[f"{prefix}patch_embed{i}.proj.weight"]))
        _set(p, f"patch_embed{i}/bias", sd[f"{prefix}patch_embed{i}.proj.bias"])
        _set(p, f"patch_norm{i}/scale", sd[f"{prefix}patch_embed{i}.norm.weight"])
        _set(p, f"patch_norm{i}/bias", sd[f"{prefix}patch_embed{i}.norm.bias"])
        _set(p, f"norm{i}/scale", sd[f"{prefix}norm{i}.weight"])
        _set(p, f"norm{i}/bias", sd[f"{prefix}norm{i}.bias"])

        depth = depths[i - 1]

        def stack(fmt, cvt=lambda x: x):
            return np.stack([cvt(sd[f"{prefix}" + fmt.format(j=j)]) for j in range(depth)])

        blk = f"block{i}"
        _set(p, f"{blk}/norm1/scale", stack(f"block{i}.{{j}}.norm1.weight"))
        _set(p, f"{blk}/norm1/bias", stack(f"block{i}.{{j}}.norm1.bias"))
        _set(p, f"{blk}/norm2/scale", stack(f"block{i}.{{j}}.norm2.weight"))
        _set(p, f"{blk}/norm2/bias", stack(f"block{i}.{{j}}.norm2.bias"))
        for lin in ("q", "kv", "proj"):
            _set(p, f"{blk}/attn/{lin}/kernel", stack(f"block{i}.{{j}}.attn.{lin}.weight", _lin))
            _set(p, f"{blk}/attn/{lin}/bias", stack(f"block{i}.{{j}}.attn.{lin}.bias"))
        if f"{prefix}block{i}.0.attn.sr.weight" in sd:
            _set(p, f"{blk}/attn/sr/kernel", stack(f"block{i}.{{j}}.attn.sr.weight", _conv))
            _set(p, f"{blk}/attn/sr/bias", stack(f"block{i}.{{j}}.attn.sr.bias"))
            _set(p, f"{blk}/attn/sr_norm/scale", stack(f"block{i}.{{j}}.attn.norm.weight"))
            _set(p, f"{blk}/attn/sr_norm/bias", stack(f"block{i}.{{j}}.attn.norm.bias"))
        for lin in ("fc1", "fc2"):
            _set(p, f"{blk}/mlp/{lin}/kernel", stack(f"block{i}.{{j}}.mlp.{lin}.weight", _lin))
            _set(p, f"{blk}/mlp/{lin}/bias", stack(f"block{i}.{{j}}.mlp.{lin}.bias"))
        _set(p, f"{blk}/mlp/dwconv/kernel", stack(f"block{i}.{{j}}.mlp.dwconv.dwconv.weight", _dwconv))
        _set(p, f"{blk}/mlp/dwconv/bias", stack(f"block{i}.{{j}}.mlp.dwconv.dwconv.bias"))
    return p


# ---------------------------------------------------------------------------
# head components (for full trained checkpoints)
# ---------------------------------------------------------------------------


def convert_pixel_decoder(sd, prefix="sem_seg_head.pixel_decoder.", enc_layers=6) -> dict:
    p: dict = {}
    for i in range(3):
        _set(p, f"input_proj{i}/kernel", _conv(sd[f"{prefix}input_proj.{i}.0.weight"]))
        _set(p, f"input_proj{i}/bias", sd[f"{prefix}input_proj.{i}.0.bias"])
        _set(p, f"input_norm{i}/scale", sd[f"{prefix}input_proj.{i}.1.weight"])
        _set(p, f"input_norm{i}/bias", sd[f"{prefix}input_proj.{i}.1.bias"])
    _set(p, "level_embed", sd[f"{prefix}transformer.level_embed"])

    def stack(fmt, cvt=lambda x: x):
        return np.stack(
            [cvt(sd[f"{prefix}transformer.encoder.layers.{l}." + fmt]) for l in range(enc_layers)]
        )

    enc = "encoder"
    for lin in ("value_proj", "output_proj", "sampling_offsets", "attention_weights"):
        _set(p, f"{enc}/self_attn/{lin}/kernel", stack(f"self_attn.{lin}.weight", _lin))
        _set(p, f"{enc}/self_attn/{lin}/bias", stack(f"self_attn.{lin}.bias"))
    for ln in ("norm1", "norm2"):
        _set(p, f"{enc}/{ln}/scale", stack(f"{ln}.weight"))
        _set(p, f"{enc}/{ln}/bias", stack(f"{ln}.bias"))
    for lin in ("linear1", "linear2"):
        _set(p, f"{enc}/ffn/{lin}/kernel", stack(f"{lin}.weight", _lin))
        _set(p, f"{enc}/ffn/{lin}/bias", stack(f"{lin}.bias"))

    # FPN level (S4 config has exactly one: adapter_1 / layer_1)
    _set(p, "adapter0/kernel", _conv(sd[f"{prefix}adapter_1.weight"]))
    _set(p, "adapter_norm0/scale", sd[f"{prefix}adapter_1.norm.weight"])
    _set(p, "adapter_norm0/bias", sd[f"{prefix}adapter_1.norm.bias"])
    _set(p, "layer0/kernel", _conv(sd[f"{prefix}layer_1.weight"]))
    _set(p, "layer_norm0/scale", sd[f"{prefix}layer_1.norm.weight"])
    _set(p, "layer_norm0/bias", sd[f"{prefix}layer_1.norm.bias"])
    _set(p, "mask_features/kernel", _conv(sd[f"{prefix}mask_features.weight"]))
    _set(p, "mask_features/bias", sd[f"{prefix}mask_features.bias"])
    return p


def convert_fusion(sd, prefix="sem_seg_head.fusion_module.") -> dict:
    p: dict = {}
    _set(p, "audio_pos", sd[f"{prefix}audio_pos.weight"])
    _set(p, "level_embed", sd[f"{prefix}level_embed.weight"])
    b = f"{prefix}b_attn."
    lvl = 0
    _set(p, f"b_attn/norm_v{lvl}/scale", sd[f"{b}layer_norm_v_list.{lvl}.weight"])
    _set(p, f"b_attn/norm_v{lvl}/bias", sd[f"{b}layer_norm_v_list.{lvl}.bias"])
    _set(p, f"b_attn/norm_a{lvl}/scale", sd[f"{b}layer_norm_a_list.{lvl}.weight"])
    _set(p, f"b_attn/norm_a{lvl}/bias", sd[f"{b}layer_norm_a_list.{lvl}.bias"])
    for lin in ("v_proj", "a_proj", "values_v_proj", "values_a_proj", "out_v_proj", "out_a_proj"):
        _set(p, f"b_attn/attn{lvl}/{lin}/kernel", _lin(sd[f"{b}attn_list.{lvl}.{lin}.weight"]))
        _set(p, f"b_attn/attn{lvl}/{lin}/bias", sd[f"{b}attn_list.{lvl}.{lin}.bias"])
    _set(p, f"b_attn/gamma_v{lvl}", sd[f"{b}gamma_v_list.{lvl}"])
    _set(p, "b_attn/gamma_a", sd[f"{b}gamma_a"])
    return p


def convert_audio_mlp(sd, prefix="sem_seg_head.audio_transformation.") -> dict:
    p: dict = {}
    for i, tid in enumerate((0, 2, 4)):
        _set(p, f"fc{i}/kernel", _lin(sd[f"{prefix}embeddings.{tid}.weight"]))
        _set(p, f"fc{i}/bias", sd[f"{prefix}embeddings.{tid}.bias"])
    return p


def convert_predictor(sd, prefix="sem_seg_head.predictor.", dec_layers=9) -> dict:
    p: dict = {}
    _set(p, "query_feat", sd[f"{prefix}query_feat.weight"])
    _set(p, "query_embed", sd[f"{prefix}query_embed.weight"])
    _set(p, "level_embed", sd[f"{prefix}level_embed.weight"])
    for i in range(dec_layers):
        sa = f"{prefix}transformer_self_attention_layers.{i}."
        _set(p, f"self_attn{i}/in_proj_weight", sd[f"{sa}self_attn.in_proj_weight"])
        _set(p, f"self_attn{i}/in_proj_bias", sd[f"{sa}self_attn.in_proj_bias"])
        _set(p, f"self_attn{i}/out_proj/kernel", _lin(sd[f"{sa}self_attn.out_proj.weight"]))
        _set(p, f"self_attn{i}/out_proj/bias", sd[f"{sa}self_attn.out_proj.bias"])
        _set(p, f"self_norm{i}/scale", sd[f"{sa}norm.weight"])
        _set(p, f"self_norm{i}/bias", sd[f"{sa}norm.bias"])
        ca = f"{prefix}transformer_cross_attention_layers.{i}."
        _set(p, f"cross_attn{i}/in_proj_weight", sd[f"{ca}multihead_attn.in_proj_weight"])
        _set(p, f"cross_attn{i}/in_proj_bias", sd[f"{ca}multihead_attn.in_proj_bias"])
        _set(p, f"cross_attn{i}/out_proj/kernel", _lin(sd[f"{ca}multihead_attn.out_proj.weight"]))
        _set(p, f"cross_attn{i}/out_proj/bias", sd[f"{ca}multihead_attn.out_proj.bias"])
        _set(p, f"cross_norm{i}/scale", sd[f"{ca}norm.weight"])
        _set(p, f"cross_norm{i}/bias", sd[f"{ca}norm.bias"])
        ff = f"{prefix}transformer_ffn_layers.{i}."
        _set(p, f"ffn_linear1_{i}/kernel", _lin(sd[f"{ff}linear1.weight"]))
        _set(p, f"ffn_linear1_{i}/bias", sd[f"{ff}linear1.bias"])
        _set(p, f"ffn_linear2_{i}/kernel", _lin(sd[f"{ff}linear2.weight"]))
        _set(p, f"ffn_linear2_{i}/bias", sd[f"{ff}linear2.bias"])
        _set(p, f"ffn_norm{i}/scale", sd[f"{ff}norm.weight"])
        _set(p, f"ffn_norm{i}/bias", sd[f"{ff}norm.bias"])
    _set(p, "decoder_norm/scale", sd[f"{prefix}decoder_norm.weight"])
    _set(p, "decoder_norm/bias", sd[f"{prefix}decoder_norm.bias"])
    _set(p, "class_embed/kernel", _lin(sd[f"{prefix}class_embed.weight"]))
    _set(p, "class_embed/bias", sd[f"{prefix}class_embed.bias"])
    for i in range(3):
        _set(p, f"mask_embed/layer{i}/kernel", _lin(sd[f"{prefix}mask_embed.layers.{i}.weight"]))
        _set(p, f"mask_embed/layer{i}/bias", sd[f"{prefix}mask_embed.layers.{i}.bias"])
    return p


def convert_combo_checkpoint(sd: Dict[str, np.ndarray], backbone: str = "resnet",
                             dec_layers: int = 9, enc_layers: int = 6) -> dict:
    """Full trained COMBO model (torch `model_best.pth`) -> flax variables."""
    params: dict = {}
    frozen: dict = {}

    if backbone == "resnet":
        bp, bf = convert_d2_resnet(sd, "backbone.")
        params["backbone"], frozen["backbone"] = bp, bf
        if any(k.startswith("pre_sam_backbone.") for k in sd):
            pp, pf = convert_d2_resnet(sd, "pre_sam_backbone.")
            params["pre_sam_backbone"], frozen["pre_sam_backbone"] = pp, pf
    else:
        params["backbone"] = convert_pvt(sd, prefix="backbone.")
        if any(k.startswith("pre_sam_backbone.") for k in sd):
            params["pre_sam_backbone"] = convert_pvt(sd, prefix="pre_sam_backbone.")

    params["audio_backbone"] = convert_vggish(sd, prefix="audio_backbone.")

    for i in range(4):
        if f"scale_factor_module.{i}.fc1.weight" in sd:
            params[f"scale_factor{i}"] = {
                "fc1": {"kernel": _lin(sd[f"scale_factor_module.{i}.fc1.weight"]),
                        "bias": sd[f"scale_factor_module.{i}.fc1.bias"]},
                "fc2": {"kernel": _lin(sd[f"scale_factor_module.{i}.fc2.weight"]),
                        "bias": sd[f"scale_factor_module.{i}.fc2.bias"]},
            }

    head: dict = {}
    head["pixel_decoder"] = convert_pixel_decoder(sd, enc_layers=enc_layers)
    if any(k.startswith("sem_seg_head.fusion_module.") for k in sd):
        head["fusion_module"] = convert_fusion(sd)
        head["audio_transformation"] = convert_audio_mlp(sd)
    head["predictor"] = convert_predictor(sd, dec_layers=dec_layers)
    params["sem_seg_head"] = head

    if not frozen:  # PVT models have no frozen-BN collection at all
        return {"params": params}
    return {"params": params, "frozen": frozen}


def fan_out_siamese(backbone_variables: Tuple[dict, dict]) -> Tuple[dict, dict, dict, dict]:
    """One pretrained backbone initializes BOTH towers (ref README.md:49-62)."""
    import copy

    p, f = backbone_variables
    return p, f, copy.deepcopy(p), copy.deepcopy(f)


# ---------------------------------------------------------------------------
# native checkpoints (orbax)
# ---------------------------------------------------------------------------


def save_checkpoint(ckpt_dir: str, state, step: int, keep: int = 5):
    """Save `state` under step_{step}/ and prune to the newest `keep`
    periodic checkpoints (d2 PeriodicCheckpointer max_to_keep behavior)."""
    import orbax.checkpoint as ocp

    import jax

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    state = jax.tree.map(np.asarray, state)  # normalize scalars for orbax
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    if keep and keep > 0:
        import re
        import shutil

        steps = []
        for name in os.listdir(ckpt_dir):
            m = re.fullmatch(r"step_(\d+)", name)
            if m:
                steps.append(int(m.group(1)))
        for s in sorted(steps)[:-keep]:
            shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"), ignore_errors=True)
    return path


def load_checkpoint(path: str, target=None):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), target)


class BestCheckpointer:
    """Track the best eval metric and keep that checkpoint
    (ref: models/engine/hooks.py:14-101)."""

    def __init__(self, ckpt_dir: str, metric: str = "mIoU", mode: str = "max"):
        assert mode in ("max", "min")
        self.ckpt_dir = ckpt_dir
        self.metric = metric
        self.mode = mode
        self.best = None
        self.best_path = None

    def update(self, results: Dict[str, Dict[str, float]], state, step: int) -> bool:
        value = results["sem_seg"][self.metric]
        better = (
            self.best is None
            or (self.mode == "max" and value > self.best)
            or (self.mode == "min" and value < self.best)
        )
        if better:
            self.best = value
            import orbax.checkpoint as ocp

            path = os.path.abspath(os.path.join(self.ckpt_dir, "model_best"))
            if os.path.exists(path):
                import shutil

                shutil.rmtree(path)
            import jax

            state = jax.tree.map(np.asarray, state)
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(path, state, force=True)
            self.best_path = path
        return better
