"""Reference-faithful torch optimizer twin for the optimizer-semantics
oracle (tests/test_optim_oracle.py).

An independent torch spelling of the reference's custom optimizer build
(ref: train_net.py:148-226): per-(module, param) AdamW groups with

* base lr x SOLVER.BACKBONE_MULTIPLIER when the module path contains
  "backbone" (ref :183),
* weight_decay 0 for relative_position_bias_table / absolute_pos_embed
  names (ref :184-189), WEIGHT_DECAY_NORM for params OF norm-module types
  (ref :156-191), WEIGHT_DECAY_EMBED for params of nn.Embedding modules
  (ref :192-193) — type-based, exactly the property the repo's path-based
  `classify_param` must reproduce,
* full-model gradient clipping INSIDE step(): global L2 clip over the chain
  of all group params, then AdamW (ref :197-209),
* d2 WarmupPolyLR applied per iteration k: lr_group(k) =
  base_group_lr * warmup(k) * (1 - k/max_iter)^power
  (ref configs select LR_SCHEDULER_NAME WarmupPolyLR; d2
  projects/DeepLab/deeplab/lr_scheduler.py semantics).

requires_grad=False params are skipped when building groups (and therefore
excluded from the clip norm) — the reference freezes VGGish that way, and
its FrozenBatchNorm2d stores affine/stats as buffers.
"""

from __future__ import annotations

import itertools

import torch

NORM_MODULE_TYPES = (
    torch.nn.BatchNorm1d,
    torch.nn.BatchNorm2d,
    torch.nn.BatchNorm3d,
    torch.nn.SyncBatchNorm,
    torch.nn.GroupNorm,
    torch.nn.InstanceNorm1d,
    torch.nn.InstanceNorm2d,
    torch.nn.InstanceNorm3d,
    torch.nn.LayerNorm,
    torch.nn.LocalResponseNorm,
)


def build_ref_adamw(model: torch.nn.Module, *, base_lr: float,
                    weight_decay: float, weight_decay_norm: float,
                    weight_decay_embed: float, backbone_multiplier: float):
    groups = []
    memo = set()
    for module_name, module in model.named_modules():
        for pname, value in module.named_parameters(recurse=False):
            if not value.requires_grad or value in memo:
                continue
            memo.add(value)
            lr = base_lr
            wd = weight_decay
            if "backbone" in module_name:
                lr = lr * backbone_multiplier
            if ("relative_position_bias_table" in pname
                    or "absolute_pos_embed" in pname):
                wd = 0.0
            if isinstance(module, NORM_MODULE_TYPES):
                wd = weight_decay_norm
            if isinstance(module, torch.nn.Embedding):
                wd = weight_decay_embed
            groups.append({"params": [value], "lr": lr, "weight_decay": wd,
                           "base_group_lr": lr})
    return torch.optim.AdamW(groups, lr=base_lr)


def warmup_poly_mult(k: int, *, max_iter: int, warmup_iters: int,
                     warmup_factor: float, power: float = 0.9) -> float:
    if warmup_iters > 0:
        alpha = min(max(k / warmup_iters, 0.0), 1.0)
        warm = warmup_factor * (1 - alpha) + alpha
    else:
        warm = 1.0
    return warm * max(1.0 - min(k, max_iter) / max_iter, 0.0) ** power


def ref_step(opt: torch.optim.AdamW, k: int, *, clip_value: float,
             schedule_kwargs: dict):
    """One reference iteration: set per-group lr for iter k, clip the global
    grad norm over all group params, AdamW step."""
    mult = warmup_poly_mult(k, **schedule_kwargs)
    for g in opt.param_groups:
        g["lr"] = g["base_group_lr"] * mult
    if clip_value > 0:
        torch.nn.utils.clip_grad_norm_(
            itertools.chain(*[g["params"] for g in opt.param_groups]),
            clip_value)
    opt.step()
