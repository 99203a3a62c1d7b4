"""Quantify the gradient-comparison noise floor for the end-to-end gradient
oracle (tests/test_grad_oracle.py).

The jax model and the torch oracle compute their fp32 positional/reference
constants with DIFFERENT transcendental implementations (numpy vs ATen), so
their fp64 activations diverge at the f32-ulp level (~1e-7 rel), amplified
to ~4e-5 absolute on the logits (test_e2e_parity_float64). This script
measures how much d(loss)/d(params) moves when an equivalent ulp-scale
perturbation is injected — running the SAME jax graph twice with params
perturbed by rel 1e-7 — which bounds the per-leaf relative gradient error
any cross-implementation oracle can achieve at this operating point.

Output: per-leaf rel-error distribution (max, p99, median) of grad deltas,
same metric as the oracle's comparison loop.
"""

from __future__ import annotations

import numpy as np
import torch

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from combo_avs_tpu.config import get_cfg
from combo_avs_tpu.losses.criterion import SetCriterion, build_weight_dict, total_loss
from combo_avs_tpu.losses.matcher import HungarianMatcher
from combo_avs_tpu.models.meta_arch import MaskFormer
from combo_avs_tpu.train.checkpoint import convert_combo_checkpoint

from tests.test_criterion_oracle import MPTS, NPTS, OS, ISR
from tests.torch_combo import ComboTorch, randomize

ENC, DEC, Q = 2, 2, 5
B, T, S = 1, 2, 64
C, K = 2, 3
TINY = 1e-11

tm = randomize(ComboTorch(num_queries=Q, enc_layers=ENC, dec_layers=DEC))
sd = {k: v.numpy() for k, v in tm.state_dict().items()}

rng = np.random.RandomState(3)
images = (rng.rand(B, T, S, S, 3) * 255).astype(np.float64)
mel = rng.randn(B, T, 96, 64).astype(np.float64)
pre = (rng.rand(B, T, S, S, 3) * 255).astype(np.float64)
labels = rng.randint(0, C, (B * T, K)).astype(np.int32)
masks = (rng.rand(B * T, K, S, S) > 0.6).astype(np.float64)
valid = np.zeros((B * T, K), bool)
valid[0, :2] = True
targets = {"labels": labels, "masks": masks, "valid": valid}
fw = np.array([1.0, 0.0])

variables = convert_combo_checkpoint(sd, backbone="resnet",
                                     dec_layers=DEC, enc_layers=ENC)
variables = jax.tree.map(lambda x: np.asarray(x, np.float64), variables)

model = MaskFormer(dec_layers=DEC, enc_layers=ENC, num_queries=Q,
                   freeze_audio=False)
crit = SetCriterion(
    num_classes=C, matcher=HungarianMatcher(num_points=MPTS),
    eos_coef=0.1, num_points=NPTS, oversample_ratio=OS,
    importance_sample_ratio=ISR, cosine_n_frame=T, exact_topk=True)
cfg = get_cfg()
cfg.MODEL.MASK_FORMER.DEC_LAYERS = DEC + 1
wd = build_weight_dict(cfg)
key = jax.random.PRNGKey(5)


def loss_fn(params):
    out = model.apply({"params": params, "frozen": variables["frozen"]},
                      images, mel, pre)
    losses = crit(key, out, jax.tree.map(jnp.asarray, targets),
                  frame_weight=jnp.asarray(fw))
    return total_loss(losses, wd)


grad_fn = jax.jit(jax.grad(loss_fn))
g0 = grad_fn(variables["params"])

prng = np.random.RandomState(0)
import os as _os
PERT = float(_os.environ.get("PERT", "1e-7"))


def perturb(x):
    x = np.asarray(x)
    return x * (1.0 + PERT * prng.randn(*x.shape))


p1 = jax.tree.map(perturb, variables["params"])
g1 = grad_fn(p1)

rels, rl2s = [], []
for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g0)[0],
        jax.tree_util.tree_flatten_with_path(g1)[0]):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(np.abs(a).max(), np.abs(b).max())
    if scale <= TINY:
        continue
    name = "/".join(str(getattr(p, "key", p)) for p in path)
    rels.append((np.abs(a - b).max() / scale, name))
    l2 = max(np.linalg.norm(a), np.linalg.norm(b))
    rl2s.append((np.linalg.norm(a - b) / l2, name))

for label, pairs in (("max-elementwise", rels), ("relative-L2", rl2s)):
    pairs.sort(reverse=True)
    vals = np.array([r for r, _ in pairs])
    print(f"[{label}] leaves={len(vals)} max={vals.max():.3e} "
          f"p99={np.quantile(vals, .99):.3e} p90={np.quantile(vals, .90):.3e} "
          f"median={np.median(vals):.3e}")
    print("  worst 5:")
    for r, n in pairs[:5]:
        print(f"    {n}: {r:.3e}")
