"""Optimizer and LR schedule (optax).

Replicates the reference's custom optimizer build (ref: train_net.py:147-226):

* AdamW (or SGD) with base LR / weight decay,
* backbone parameters (any path containing "backbone") at
  BACKBONE_MULTIPLIER x LR (ref :183),
* SOLVER.WEIGHT_DECAY_NORM on norm-layer parameters (ref :156-191),
  SOLVER.WEIGHT_DECAY_EMBED on embedding parameters (ref :192-193), exact 0
  on relative_position_bias_table / absolute_pos_embed (ref :184-189),
* FULL-MODEL gradient clipping: global L2 norm clipped BEFORE the optimizer
  step (ref :196-211) -> `optax.clip_by_global_norm` first in the chain,
* WarmupPolyLR schedule: base * warmup(t) * (1 - t/max_iter)^0.9
  (d2 deeplab scheduler selected by `LR_SCHEDULER_NAME`, ref yaml :37),
* frozen modules (the VGGish audio tower) receive zero updates.

Path-based classification replaces torch's module-type introspection: flax
norm params are the `scale`/`bias` leaves of LayerNorm/GroupNorm module names,
and the embedding-like params are the named query/level/position tables.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

NORM_KEYS = ("norm", "layernorm", "groupnorm", "ln", "gn")
# flax param names of the modules that are torch nn.Embedding in the
# reference (query/level/audio-pos tables) -> SOLVER.WEIGHT_DECAY_EMBED
# (ref: train_net.py:192-193). NOTE the name collision: the PIXEL DECODER's
# level_embed is an nn.Parameter in the reference (ref: msdeformattn.py:45),
# NOT an nn.Embedding, so it keeps the DEFAULT weight decay — only the
# fusion-module and predictor tables are Embeddings. classify_param exempts
# pixel_decoder paths (caught by tests/test_optim_oracle.py).
EMBED_KEYS = ("query_feat", "query_embed", "level_embed", "audio_pos")
# always-zero weight decay regardless of cfg (ref: train_net.py:184-189)
ZERO_WD_KEYS = ("relative_position_bias_table", "absolute_pos_embed")
FROZEN_MODULES = ("audio_backbone",)


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    ).lower()


def classify_param(path, freeze_audio: bool = True) -> dict:
    """Returns {frozen, backbone, wd_kind} for a param path; wd_kind is one
    of "default"/"norm"/"embed"/"zero", matching the reference's per-module
    weight-decay override order (ref: train_net.py:156-193: the zero-wd name
    check fires first, then norm-module type, then nn.Embedding)."""
    s = _path_str(path)
    parts = s.split("/")
    frozen = freeze_audio and any(m in s for m in FROZEN_MODULES)
    is_backbone = "backbone" in s
    # norm params: scale/bias leaves under a *norm* module name
    leaf = parts[-1]
    parent = parts[-2] if len(parts) > 1 else ""
    wd_kind = "default"
    if any(k in leaf or k in parent for k in ZERO_WD_KEYS):
        wd_kind = "zero"
    elif leaf in ("scale", "bias") and any(k in parent for k in NORM_KEYS):
        wd_kind = "norm"
    elif (any(k in leaf or k in parent for k in EMBED_KEYS)
          and "pixel_decoder" not in s):
        wd_kind = "embed"
    return {
        "frozen": frozen,
        "backbone": is_backbone,
        "wd_kind": wd_kind,
    }


def add_decayed_weights_per_leaf(wd_tree) -> optax.GradientTransformation:
    """optax.add_decayed_weights with a per-leaf decay value (the reference
    sets weight_decay per param group, ref: train_net.py:181-194)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params):
        return (
            jax.tree.map(lambda u, wd, p: u + wd * p, updates, wd_tree, params),
            state,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_param_multiplier(multiplier_tree) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, m: u * m, updates, multiplier_tree), state

    return optax.GradientTransformation(init_fn, update_fn)


def warmup_poly_schedule(
    base_lr: float,
    max_iter: int,
    warmup_iters: int = 0,
    warmup_factor: float = 1.0,
    power: float = 0.9,
    constant_ending: float = 0.0,
) -> optax.Schedule:
    """d2 WarmupPolyLR."""

    def schedule(count):
        t = jnp.minimum(count, max_iter).astype(jnp.float32)
        if warmup_iters > 0:
            alpha = jnp.clip(t / warmup_iters, 0.0, 1.0)
            warm = warmup_factor * (1 - alpha) + alpha
        else:
            warm = 1.0
        poly = jnp.power(jnp.maximum(1.0 - t / max_iter, 0.0), power)
        if constant_ending > 0:
            poly = jnp.maximum(poly, constant_ending)
        return base_lr * warm * poly

    return schedule


def build_optimizer(cfg, params) -> Tuple[optax.GradientTransformation, Callable]:
    """Returns (optimizer, lr_schedule). `params` is the model param tree
    (used to build per-leaf masks)."""
    s = cfg.SOLVER
    freeze_audio = cfg.MODEL.AUDIO.FREEZE_AUDIO_EXTRACTOR

    info = jax.tree_util.tree_map_with_path(
        lambda p, _: classify_param(p, freeze_audio=freeze_audio), params
    )
    _is_info = lambda x: isinstance(x, dict) and "frozen" in x
    mult = jax.tree.map(
        lambda i: 0.0 if i["frozen"] else (s.BACKBONE_MULTIPLIER if i["backbone"] else 1.0),
        info, is_leaf=_is_info,
    )
    wd_values = {
        "default": s.WEIGHT_DECAY,
        "norm": s.WEIGHT_DECAY_NORM,
        "embed": s.WEIGHT_DECAY_EMBED,
        "zero": 0.0,
    }
    wd_tree = jax.tree.map(
        lambda i: 0.0 if i["frozen"] else wd_values[i["wd_kind"]],
        info, is_leaf=_is_info,
    )

    schedule = warmup_poly_schedule(
        base_lr=s.BASE_LR,
        max_iter=s.MAX_ITER,
        warmup_iters=s.WARMUP_ITERS,
        warmup_factor=s.WARMUP_FACTOR,
        power=s.get("POLY_LR_POWER", 0.9),
        constant_ending=s.get("POLY_LR_CONSTANT_ENDING", 0.0),
    )

    chain = []
    clip = s.CLIP_GRADIENTS
    if clip.ENABLED and clip.CLIP_TYPE == "full_model" and clip.CLIP_VALUE > 0:
        chain.append(optax.clip_by_global_norm(clip.CLIP_VALUE))

    if s.OPTIMIZER.upper() == "ADAMW":
        chain += [
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            add_decayed_weights_per_leaf(wd_tree),
        ]
    elif s.OPTIMIZER.upper() == "SGD":
        chain += [
            optax.trace(decay=s.MOMENTUM),
            add_decayed_weights_per_leaf(wd_tree),
        ]
    else:
        raise NotImplementedError(f"no optimizer type {s.OPTIMIZER}")

    chain += [
        optax.scale_by_learning_rate(schedule),  # includes the -1 sign
        scale_by_param_multiplier(mult),
    ]
    return optax.chain(*chain), schedule
