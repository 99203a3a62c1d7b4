"""END-TO-END gradient oracle at float64: jax.grad through the FULL
production loss composition (MaskFormer forward -> SetCriterion ->
weighted total, exactly train_step.py's loss_fn) vs torch autograd through
the reference-faithful oracles (tests/torch_combo.py model +
tests/torch_criterion.py criterion) on identical weights, inputs and
injected random draws.

This closes the last training-semantics gap the loss-VALUE oracle
(tests/test_criterion_oracle.py) leaves open: a backward-only defect —
a wrong custom VJP, a stop_gradient missing or misplaced (the matcher and
PointRend selection must NOT leak gradient, ref: matcher.py:69 @torch.no_grad,
criterion.py:92-107 with torch.no_grad), a dtype cast that silently detaches
— would pass every forward parity test and still train the wrong model.

Gradient comparison rides the checkpoint converter: torch `p.grad` tensors
have the same shapes as the weights, and `convert_combo_checkpoint` is a
pure rename/transpose/stack mapping, so feeding it the grad dict yields a
tree aligned leaf-for-leaf with the jax param tree. A parallel pass of an
all-ones dict marks which converted entries originate from torch
*parameters* (vs buffers / synthesized constants) so only those are
compared. FrozenBN scale/bias/stats live in the `frozen` collection on the
jax side and are untrainable in the reference — they are outside
`jax.grad`'s argument by construction, matching d2's FrozenBatchNorm2d.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from combo_avs_tpu.config import get_cfg
from combo_avs_tpu.losses.criterion import SetCriterion, build_weight_dict, total_loss
from combo_avs_tpu.losses.matcher import HungarianMatcher
from combo_avs_tpu.models.meta_arch import MaskFormer
from combo_avs_tpu.train.checkpoint import convert_combo_checkpoint

from tests.test_criterion_oracle import (MPTS, NPTS, OS, ISR, _jax_losses,
                                         torch_losses_live)
from tests.torch_combo import ComboTorch, randomize

ENC, DEC, Q = 2, 2, 5
B, T, S = 1, 2, 64
C, K = 2, 3

# Tolerances are CALIBRATED, not guessed (scripts/r5_grad_noise_floor.py).
# Both implementations compute positional-encoding / reference-point
# constants in float32 by design (matching the reference's fp32 buffers) with
# DIFFERENT transcendental libraries (numpy vs ATen), so even at fp64 the
# logits diverge ~4e-5 absolute (test_e2e_parity_float64). Gradients are far
# more sensitive than losses to that operating-point shift: re-running the
# SAME jax graph with params perturbed by rel 4e-5 moves per-leaf gradients
# by rel-L2 up to 6.4e-2 (median 1.1e-2) and max-elementwise up to 0.23 —
# ReLU/selection boundary bits flip, giving locally O(1) deltas on a few
# elements (FFN first-linear rows are the worst). The rel-L2 norm is the
# discriminating metric: boundary flips touch few elements so the noise
# ceiling stays ~6e-2, while the targeted defect classes (detached subgraph,
# wrong custom VJP, leaked matcher/selection gradient) shift whole leaves,
# i.e. rel-L2 ~ O(1).
L2_RTOL = 0.15      # per-leaf rel-L2: 2.3x the calibrated noise ceiling
MED_L2 = 0.03       # median per-leaf rel-L2: 2.7x the calibrated median
TINY = 1e-11        # leaves this small on BOTH sides are skipped as zero


@pytest.fixture(autouse=True)
def _x64():
    with jax.enable_x64(True):
        yield


def _leafname(path):
    return "/".join(str(getattr(p, "key", p)) for p in path)


PVT_DEPTHS = (1, 2, 1, 1)  # true B5 widths/heads/sr, reduced depths


@pytest.mark.parametrize("backbone", ["resnet", "pvt"])
def test_full_model_gradient_oracle(backbone):
    """resnet: FrozenBN towers (frozen collection outside jax.grad). pvt:
    the nn.scan'd SRA stages + overlapping patch embeds + LayerScale-free
    pre-norm blocks — the backward through the scan's stacked params is the
    piece no other test differentiates."""
    tm = randomize(ComboTorch(num_queries=Q, enc_layers=ENC, dec_layers=DEC,
                              backbone=backbone, pvt_depths=PVT_DEPTHS))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    tm = tm.double()

    rng = np.random.RandomState(3)
    images = (rng.rand(B, T, S, S, 3) * 255).astype(np.float64)
    mel = rng.randn(B, T, 96, 64).astype(np.float64)
    pre = (rng.rand(B, T, S, S, 3) * 255).astype(np.float64)
    # S4 regime: frame 0 annotated (2 valid slots), frame 1 zero-weight
    labels = rng.randint(0, C, (B * T, K)).astype(np.int32)
    masks = (rng.rand(B * T, K, S, S) > 0.6).astype(np.float64)
    valid = np.zeros((B * T, K), bool)
    valid[0, :2] = True
    targets = {"labels": labels, "masks": masks, "valid": valid}
    fw = np.array([1.0, 0.0])

    variables = convert_combo_checkpoint(sd, backbone=backbone,
                                         dec_layers=DEC, enc_layers=ENC)
    variables = jax.tree.map(lambda x: np.asarray(x, np.float64), variables)
    aux_cols = {k: v for k, v in variables.items() if k != "params"}

    # freeze_audio=False: the torch oracle backprops into VGGish (it has no
    # freeze), so lift the stop_gradient and compare the audio-tower backward
    # too. The production freeze (meta_arch.py stop_gradient + optimizer
    # zero-multiplier) is covered by test_train.py::test_freeze_audio_*.
    bkw = ({} if backbone == "resnet" else
           dict(backbone_name="build_pvtv2_b5_backbone",
                pvt_depths=PVT_DEPTHS, pre_sam_dim=(64, 128, 320, 512)))
    model = MaskFormer(dec_layers=DEC, enc_layers=ENC, num_queries=Q,
                       freeze_audio=False, **bkw)
    crit = SetCriterion(
        num_classes=C, matcher=HungarianMatcher(num_points=MPTS),
        eos_coef=0.1, num_points=NPTS, oversample_ratio=OS,
        importance_sample_ratio=ISR, cosine_n_frame=T, exact_topk=True)
    cfg = get_cfg()
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = DEC + 1  # L = DEC+1 stacked heads
    wd = build_weight_dict(cfg)
    key = jax.random.PRNGKey(5)

    def loss_fn(params):
        out = model.apply({"params": params, **aux_cols}, images, mel, pre)
        losses = crit(key, out, jax.tree.map(jnp.asarray, targets),
                      frame_weight=jnp.asarray(fw))
        return total_loss(losses, wd), out

    (jtot, out), jgrads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
    out_np = {
        "pred_logits": np.asarray(out["pred_logits"]),
        "pred_masks": np.asarray(out["pred_masks"]),
        "aux_outputs": [{k: np.asarray(a[k])
                         for k in ("pred_logits", "pred_masks")}
                        for a in out["aux_outputs"]],
        "middles_attn_mask": [np.asarray(m) for m in out["middles_attn_mask"]],
    }
    # replay the criterion on the model outputs to extract the PRNG draws +
    # assignments (same key -> same stream); its loss values must equal the
    # in-graph ones by construction
    jl, assigns, draws = _jax_losses(out_np, targets, fw, C, key, n_frame=T)

    timages = torch.from_numpy(images[0].transpose(0, 3, 1, 2))
    tmel = torch.from_numpy(mel.reshape(B * T, 1, 96, 64))
    tpre = torch.from_numpy(pre[0].transpose(0, 3, 1, 2))
    tout = tm(timages, tmel, tpre)
    tlosses = torch_losses_live(tout, targets, [0], C, K, assigns, draws,
                                n_frame=T, lsap_tol=1e-3)
    ttot = sum(wd[k] * v for k, v in tlosses.items())
    ttot.backward()

    # losses agree at the model-driven operating point (the criterion oracle
    # runs on synthetic outputs; this re-proves it on REAL activations)
    assert set(jl) == set(tlosses)
    for k in jl:
        assert abs(jl[k] - float(tlosses[k])) < 2e-4, (
            f"{k}: jax {jl[k]} vs torch {float(tlosses[k])}")
    assert abs(float(jtot) - float(ttot)) < 5e-4

    # torch grads -> jax-aligned tree via the converter; ones-mask marks
    # which converted leaves are parameter-derived
    gsd, msd = {}, {}
    for name, p in tm.named_parameters():
        g = p.grad if p.grad is not None else torch.zeros_like(p)
        gsd[name] = g.detach().numpy()
        msd[name] = np.ones(p.shape, np.float64)
    for name, b in tm.named_buffers():
        gsd[name] = np.zeros(b.shape, np.float64)
        msd[name] = np.zeros(b.shape, np.float64)
    tgrads = convert_combo_checkpoint(gsd, backbone=backbone,
                                      dec_layers=DEC, enc_layers=ENC)["params"]
    tmask = convert_combo_checkpoint(msd, backbone=backbone,
                                     dec_layers=DEC, enc_layers=ENC)["params"]

    jflat = jax.tree_util.tree_flatten_with_path(jgrads)[0]
    tflat = jax.tree_util.tree_flatten_with_path(tgrads)[0]
    mflat = jax.tree_util.tree_flatten_with_path(tmask)[0]
    assert (jax.tree.structure(jgrads) == jax.tree.structure(tgrads)
            == jax.tree.structure(tmask))
    compared = skipped = 0
    bad, rl2s = [], []
    jall, tall = [], []
    for (pj, gj), (_, gt), (_, mk) in zip(jflat, tflat, mflat):
        name = _leafname(pj)
        mk = np.asarray(mk)
        if not mk.all():
            # only buffer-derived leaves may be skipped inside params
            assert not mk.any(), f"{name}: mixed param/buffer converted leaf"
            skipped += 1
            continue
        gj, gt = np.asarray(gj), np.asarray(gt)
        jall.append(gj.ravel())
        tall.append(gt.ravel())
        scale = max(np.linalg.norm(gj), np.linalg.norm(gt))
        if scale > TINY:
            rl2 = np.linalg.norm(gj - gt) / scale
            rl2s.append(rl2)
            if rl2 > L2_RTOL:
                bad.append(f"{name}: rel-L2={rl2:.3e} |g|={scale:.3e}")
        compared += 1
    assert not bad, "gradient mismatches:\n" + "\n".join(bad)
    # a systematic (but per-leaf sub-threshold) divergence would lift the
    # whole distribution; noise calibrates at median 1.1e-2
    assert np.median(rl2s) < MED_L2, float(np.median(rl2s))
    # the comparison must actually cover the tree (only buffer-derived
    # converted leaves, e.g. VGGish PCA constants, may be skipped)
    assert compared > 100 and skipped < compared // 10, (compared, skipped)

    # global sanity over every compared value: gradient energy agrees
    jall, tall = np.concatenate(jall), np.concatenate(tall)
    gl2 = np.linalg.norm(jall - tall) / max(np.linalg.norm(tall), 1e-300)
    assert gl2 < L2_RTOL / 2, float(gl2)
