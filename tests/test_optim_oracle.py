"""Multi-step OPTIMIZER twin at float64: optax chain (train/optim.py) vs a
reference-faithful torch AdamW build (tests/torch_optim.py) driving the SAME
model from the SAME weights.

The gradient oracle (tests/test_grad_oracle.py) proves d(loss)/d(params)
parity; this proves everything AFTER the gradient matches the reference too:

* param-group semantics — backbone lr multiplier, WEIGHT_DECAY /
  WEIGHT_DECAY_NORM / WEIGHT_DECAY_EMBED assignment (path-based
  classify_param vs the reference's module-TYPE rules, ref
  train_net.py:156-193; the wd values are set large and pairwise-distinct so
  ONE misclassified tensor shifts its update ~25%),
* full-model global-norm clipping composition (clip BEFORE AdamW, norm over
  exactly the trainable params, ref :197-209),
* AdamW bias correction / eps placement / decoupled decay ordering,
* WarmupPolyLR applied per iteration with the warmup boundary crossed
  mid-run (ref d2 WarmupPolyLR).

Weights travel torch->jax through the checkpoint converter; the per-leaf
update deltas (p_N - p_0) travel back the same way for comparison, so a
divergence anywhere in the update rule is localized to the exact tensor.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from combo_avs_tpu.config import get_cfg
from combo_avs_tpu.models.meta_arch import MaskFormer
from combo_avs_tpu.train.checkpoint import convert_combo_checkpoint
from combo_avs_tpu.train.optim import build_optimizer

from tests.torch_combo import ComboTorch, randomize
from tests.torch_optim import build_ref_adamw, ref_step, warmup_poly_mult

ENC, DEC, Q = 2, 2, 5
B, T, S = 1, 1, 64
STEPS = 3

BASE_LR = 0.05
WD, WD_NORM, WD_EMBED = 2.0, 5.0, 9.0  # pairwise-distinct, loud on purpose
BACKBONE_MULT = 0.1
CLIP = 0.01
MAX_ITER, WARMUP_ITERS, WARMUP_FACTOR = 100, 2, 0.01

# Per-leaf relative-L2 tolerance, same calibrated noise model as the
# gradient oracle (scripts/r5_grad_noise_floor.py): the two models' fp32
# positional constants diverge at the ulp level, amplified to ~4e-5 on
# activations, and AdamW's elementwise m/sqrt(v) normalization re-amplifies
# the resulting gradient noise (at step counts 1-3 the update is nearly
# sign(g), maximally sensitive where |g| is small). The defect classes this
# test targets are LOUD against that floor: a misclassified weight-decay
# group shifts a leaf's decay term by the wd ratio (2/5/9 pairwise-distinct
# below → rel-L2 ~ O(1)); a wrong backbone multiplier scales the whole leaf
# 10x; a clipping-composition error shifts every leaf together (caught by
# the median check).
L2_RTOL = 0.15
MED_L2 = 0.05
TINY = 1e-12


@pytest.fixture(autouse=True)
def _x64():
    with jax.enable_x64(True):
        yield


def _solver_cfg():
    cfg = get_cfg()
    s = cfg.SOLVER
    s.OPTIMIZER = "ADAMW"
    s.BASE_LR = BASE_LR
    s.WEIGHT_DECAY = WD
    s.WEIGHT_DECAY_NORM = WD_NORM
    s.WEIGHT_DECAY_EMBED = WD_EMBED
    s.BACKBONE_MULTIPLIER = BACKBONE_MULT
    s.MAX_ITER = MAX_ITER
    s.WARMUP_ITERS = WARMUP_ITERS
    s.WARMUP_FACTOR = WARMUP_FACTOR
    s.CLIP_GRADIENTS.ENABLED = True
    s.CLIP_GRADIENTS.CLIP_TYPE = "full_model"
    s.CLIP_GRADIENTS.CLIP_VALUE = CLIP
    return cfg


def test_schedule_matches_reference_formula():
    cfg = _solver_cfg()
    model_tree = {"w": jnp.ones(1)}
    _, schedule = build_optimizer(cfg, model_tree)
    for k in [0, 1, 2, 3, 50, 99, 100]:
        want = BASE_LR * warmup_poly_mult(
            k, max_iter=MAX_ITER, warmup_iters=WARMUP_ITERS,
            warmup_factor=WARMUP_FACTOR)
        # the optax schedule computes in float32 (it runs inside the jitted
        # update); formula parity at f32 resolution is the claim
        assert abs(float(schedule(k)) - want) < 1e-6 * max(want, 1e-6), (k,)


def test_multi_step_optimizer_twin():
    tm = randomize(ComboTorch(num_queries=Q, enc_layers=ENC, dec_layers=DEC))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    tm = tm.double()
    # reference freezes: VGGish via requires_grad=False
    # (FREEZE_AUDIO_EXTRACTOR), FrozenBatchNorm2d affine params are buffers
    for p in tm.audio_backbone.parameters():
        p.requires_grad_(False)
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.weight.requires_grad_(False)
            m.bias.requires_grad_(False)

    rng = np.random.RandomState(7)
    images = (rng.rand(B, T, S, S, 3) * 255).astype(np.float64)
    mel = rng.randn(B, T, 96, 64).astype(np.float64)
    pre = (rng.rand(B, T, S, S, 3) * 255).astype(np.float64)

    variables = convert_combo_checkpoint(sd, backbone="resnet",
                                         dec_layers=DEC, enc_layers=ENC)
    variables = jax.tree.map(lambda x: np.asarray(x, np.float64), variables)
    p0 = variables["params"]

    model = MaskFormer(dec_layers=DEC, enc_layers=ENC, num_queries=Q)
    cfg = _solver_cfg()
    optimizer, _ = build_optimizer(cfg, p0)

    def loss_fn(params):
        out = model.apply({"params": params, "frozen": variables["frozen"]},
                          images, mel, pre)
        return (jnp.mean(out["pred_logits"] ** 2)
                + jnp.mean(out["pred_masks"] ** 2))

    grad_fn = jax.jit(jax.grad(loss_fn))
    params, opt_state = p0, optimizer.init(p0)
    for _ in range(STEPS):
        grads = grad_fn(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    topt = build_ref_adamw(
        tm, base_lr=BASE_LR, weight_decay=WD, weight_decay_norm=WD_NORM,
        weight_decay_embed=WD_EMBED, backbone_multiplier=BACKBONE_MULT)
    timages = torch.from_numpy(images[0].transpose(0, 3, 1, 2))
    tmel = torch.from_numpy(mel.reshape(B * T, 1, 96, 64))
    tpre = torch.from_numpy(pre[0].transpose(0, 3, 1, 2))
    for k in range(STEPS):
        topt.zero_grad(set_to_none=True)
        out = tm(timages, tmel, tpre)
        loss = (out["pred_logits"] ** 2).mean() + (out["pred_masks"] ** 2).mean()
        loss.backward()
        ref_step(topt, k, clip_value=CLIP,
                 schedule_kwargs=dict(max_iter=MAX_ITER,
                                      warmup_iters=WARMUP_ITERS,
                                      warmup_factor=WARMUP_FACTOR))

    # torch deltas -> jax-aligned tree via the converter (+ ones mask to
    # restrict to parameter-derived leaves, as in test_grad_oracle)
    dsd, msd = {}, {}
    pfinal = dict(tm.named_parameters())
    for name, w0 in sd.items():
        if name in pfinal:
            dsd[name] = (pfinal[name].detach().numpy()
                         - w0.astype(np.float64))
            msd[name] = np.ones(w0.shape, np.float64)
        else:  # buffer
            dsd[name] = np.zeros(w0.shape, np.float64)
            msd[name] = np.zeros(w0.shape, np.float64)
    tdelta = convert_combo_checkpoint(dsd, backbone="resnet",
                                      dec_layers=DEC, enc_layers=ENC)["params"]
    tmask = convert_combo_checkpoint(msd, backbone="resnet",
                                     dec_layers=DEC, enc_layers=ENC)["params"]
    jdelta = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                          params, p0)

    jflat = jax.tree_util.tree_flatten_with_path(jdelta)[0]
    tflat = jax.tree_util.tree_flatten_with_path(tdelta)[0]
    mflat = jax.tree_util.tree_flatten_with_path(tmask)[0]
    assert (jax.tree.structure(jdelta) == jax.tree.structure(tdelta)
            == jax.tree.structure(tmask))
    compared = 0
    moved = 0
    bad, rl2s = [], []
    for (pj, dj), (_, dt), (_, mk) in zip(jflat, tflat, mflat):
        name = "/".join(str(getattr(p, "key", p)) for p in pj)
        mk, dj, dt = np.asarray(mk), np.asarray(dj), np.asarray(dt)
        if not mk.all():
            assert not mk.any(), f"{name}: mixed param/buffer converted leaf"
            # buffer-derived params-collection leaves don't exist for resnet
            # COMBO; frozen things (BN, VGGish under requires_grad=False)
            # must not have moved on the JAX side either
            assert np.abs(dj).max() == 0.0, f"{name}: frozen leaf moved"
            continue
        if name.startswith("audio_backbone/"):
            # frozen tower: exactly zero update on both sides
            assert np.abs(dj).max() == 0.0 and np.abs(dt).max() == 0.0, name
            continue
        scale = max(np.linalg.norm(dj), np.linalg.norm(dt))
        if scale > TINY:
            moved += 1
            rl2 = np.linalg.norm(dj - dt) / scale
            rl2s.append(rl2)
            if rl2 > L2_RTOL:
                bad.append(f"{name}: rel-L2={rl2:.3e} |d|={scale:.3e}")
        compared += 1
    assert not bad, "update mismatches:\n" + "\n".join(bad)
    assert np.median(rl2s) < MED_L2, float(np.median(rl2s))
    # the run must be meaningful: most trainable leaves actually moved
    assert compared > 100 and moved > compared * 0.8, (compared, moved)
