"""Composition-level oracle test of the FULL loss stack at float64.

Compares `combo_avs_tpu.losses.SetCriterion` (padded K-slot targets +
frame_weight masks + on-device LSAP + injected-PRNG point selection) against
the reference-faithful dynamic-shape torch oracle (tests/torch_criterion.py:
ragged targets, scipy LSAP, d2 PointRend selection) on IDENTICAL inputs:

* every stochastic draw (matcher shared points, PointRend 3x-oversample
  candidates, random tails) is extracted from the JAX PRNG stream and
  injected into the oracle, so selection randomness cancels exactly,
* per-loss AND weighted-total deltas must be < 1e-8 at fp64 (the VERDICT r4
  bar was 1e-5),
* regimes: S4 (first-annotated-frame weights, ref criterion.py:241-254) and
  AVSS (gt_temporal_mask selection, 71 classes, 12 slots,
  ref criterion_ss.py:246-257),
* a padding case proves invalid slots / zero-weight frames contribute
  EXACTLY nothing (garbage targets there leave every loss bit-identical).
"""

from __future__ import annotations

import numpy as np
import pytest
import torch
from scipy.optimize import linear_sum_assignment

import jax
import jax.numpy as jnp

from combo_avs_tpu.config import get_cfg
from combo_avs_tpu.losses.criterion import SetCriterion, build_weight_dict, total_loss
from combo_avs_tpu.losses.matcher import HungarianMatcher

from tests.torch_criterion import RefHungarianMatcher, RefSetCriterion

# small-but-composition-real shapes
NPTS, OS, ISR = 64, 3.0, 0.75  # criterion PointRend points
MPTS = 128  # matcher shared points


def _problem(rng, N, Q, C, K, h, w, Hgt, L, valid_counts):
    """Random fp64 outputs/targets. valid_counts[i] = #valid slots, frame i
    (valid slots packed first)."""
    out = {
        "pred_logits": rng.randn(N, Q, C + 1) * 2.0,
        "pred_masks": rng.randn(N, Q, h, w) * 2.0,
        "aux_outputs": [
            {"pred_logits": rng.randn(N, Q, C + 1) * 2.0,
             "pred_masks": rng.randn(N, Q, h, w) * 2.0}
            for _ in range(L - 1)
        ],
        "middles_attn_mask": [rng.randn(N, Q, h * w) for _ in range(L - 1)],
    }
    labels = rng.randint(0, C, (N, K)).astype(np.int32)
    masks = (rng.rand(N, K, Hgt, Hgt) > 0.6).astype(np.float64)
    valid = np.zeros((N, K), bool)
    for i, c in enumerate(valid_counts):
        valid[i, :c] = True
    targets = {"labels": labels, "masks": masks, "valid": valid}
    return out, targets


def _jax_losses(out, targets, frame_weight, C, key, n_frame=5):
    crit = SetCriterion(
        num_classes=C, matcher=HungarianMatcher(num_points=MPTS),
        eos_coef=0.1, num_points=NPTS, oversample_ratio=OS,
        importance_sample_ratio=ISR, cosine_n_frame=n_frame, exact_topk=True)
    jout = jax.tree.map(jnp.asarray, out)
    jtgt = {k: jnp.asarray(v) for k, v in targets.items()}
    losses = crit(key, jout, jtgt, frame_weight=jnp.asarray(frame_weight))
    # the per-layer assignments, recomputed with the same keys (the
    # criterion derives layer keys by split(key, 2L))
    L = 1 + len(out["aux_outputs"])
    keys = jax.random.split(key, 2 * L)
    assigns, draws = [], []
    stacked = [(out["pred_logits"], out["pred_masks"])] + [
        (a["pred_logits"], a["pred_masks"]) for a in out["aux_outputs"]]
    N, K = targets["labels"].shape
    M = N * K
    n_sampled = int(NPTS * OS)
    n_rand = NPTS - int(NPTS * ISR)
    for j, (lg, mk) in enumerate(stacked):
        kmat, ksamp = keys[2 * j], keys[2 * j + 1]
        assigns.append(np.asarray(crit.matcher(
            kmat, jnp.asarray(lg), jnp.asarray(mk), jtgt["labels"],
            jtgt["masks"], jtgt["valid"] & (jnp.asarray(frame_weight)[:, None] > 0))))
        pts = np.asarray(jax.random.uniform(kmat, (N, MPTS, 2)))
        k1, k2 = jax.random.split(ksamp)
        cand = np.asarray(jax.random.uniform(k1, (M, n_sampled, 2)))
        tail = np.asarray(jax.random.uniform(k2, (M, n_rand, 2)))
        draws.append((pts, cand, tail))
    return {k: float(v) for k, v in losses.items()}, assigns, draws


def _torch_losses(out, targets, sel_frames, C, K, assigns, draws):
    tout = {
        "pred_logits": torch.as_tensor(out["pred_logits"]),
        "pred_masks": torch.as_tensor(out["pred_masks"]),
        "aux_outputs": [
            {k: torch.as_tensor(v) for k, v in a.items()}
            for a in out["aux_outputs"]],
        "middles_attn_mask": [torch.as_tensor(m) for m in
                              out["middles_attn_mask"]],
    }
    losses = torch_losses_live(tout, targets, sel_frames, C, K, assigns, draws)
    return {k: float(v) for k, v in losses.items()}


def torch_losses_live(tout, targets, sel_frames, C, K, assigns, draws,
                      n_frame=5, lsap_tol=1e-9):
    """Oracle on the ragged selected-frame view, with the JAX draws mapped
    into its row ordering (oracle mask rows follow scipy's src-ascending
    order; our rows are (frame, slot)).

    `tout` holds torch tensors and may carry grad (the end-to-end gradient
    oracle, tests/test_grad_oracle.py, backprops through the returned loss
    tensors into the live ComboTorch model).

    `lsap_tol`: absolute slack allowed when checking our assignment's
    optimality under the oracle's fp64 cost matrix. The synthetic-output
    tests feed both sides bit-identical inputs, so 1e-9 holds; the live
    gradient oracle runs two INDEPENDENT models whose logits differ by the
    fp32 positional-constant noise floor (~4e-5 absolute), so an assignment
    optimal under the jax cost matrix can be that-much suboptimal under the
    torch one — callers on live activations pass ~1e-3."""
    matcher = RefHungarianMatcher()
    crit = RefSetCriterion(num_classes=C, matcher=matcher, eos_coef=0.1,
                           num_points=NPTS, oversample_ratio=OS,
                           importance_sample_ratio=ISR, cosine_n_frame=n_frame)
    ragged = []
    for g in sel_frames:
        v = targets["valid"][g]
        ragged.append({
            "labels": torch.as_tensor(targets["labels"][g][v], dtype=torch.int64),
            "masks": torch.as_tensor(targets["masks"][g][v]),
        })
    L = 1 + len(tout["aux_outputs"])
    matcher_points, cands, tails, indices_all = [], [], [], []
    for j in range(L):
        pts, cand, tail = draws[j]
        matcher_points.append(torch.as_tensor(pts[list(sel_frames)]))
        # verify our LSAP result is OPTIMAL under the oracle's cost matrix
        # (ties — common on near-identical queries at random init — may
        # legitimately resolve to a different optimal permutation than
        # scipy's, so assert cost equality, not index equality), then inject
        # OUR assignment into the oracle so both sides differentiate the
        # same matched pairs. Rows are our flat (g*K + slot) order.
        lay = {"pred_logits": tout["pred_logits"], "pred_masks": tout["pred_masks"]} \
            if j == 0 else tout["aux_outputs"][j - 1]
        lay_sel = {k: v[list(sel_frames)] for k, v in lay.items()}
        rows, lay_idx = [], []
        for b, g in enumerate(sel_frames):
            tgt = ragged[b]
            R = len(tgt["labels"])
            ours = assigns[j][g]  # [K] matched query per slot (-1 invalid)
            osrc = [int(ours[t]) for t in range(R)]
            if R:
                C = matcher.cost_matrix(lay_sel, b, tgt,
                                        matcher_points[-1]).cpu().numpy()
                si, sj = linear_sum_assignment(C)
                cost_scipy = float(C[si, sj].sum())
                cost_ours = float(C[osrc, range(R)].sum())
                assert len(set(osrc)) == R and min(osrc) >= 0, (
                    f"layer {j} frame {g}: invalid assignment {osrc}")
                assert cost_ours <= cost_scipy + lsap_tol * max(1.0, abs(cost_scipy)), (
                    f"layer {j} frame {g}: our LSAP cost {cost_ours} is "
                    f"suboptimal vs scipy {cost_scipy}")
            lay_idx.append((torch.as_tensor(osrc, dtype=torch.int64),
                            torch.arange(R, dtype=torch.int64)))
            rows.extend(g * targets["labels"].shape[1] + t for t in range(R))
        indices_all.append(lay_idx)
        cands.append(torch.as_tensor(cand[rows]))
        tails.append(torch.as_tensor(tail[rows]))
    return crit.forward(tout, ragged, sel_frames, matcher_points, cands, tails,
                        indices_override=indices_all)


def _compare(jl, tl, tol=1e-8):
    assert set(jl) == set(tl), (sorted(jl), sorted(tl))
    for k in sorted(jl):
        assert abs(jl[k] - tl[k]) < tol, f"{k}: jax {jl[k]} vs torch {tl[k]}"
    cfg = get_cfg()
    # L total layers (1 final + n aux) -> DEC_LAYERS = L (build_weight_dict
    # emits DEC_LAYERS-1 aux copies)
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 1 + sum(
        1 for k in jl if k.startswith("loss_ce_"))
    wd = build_weight_dict(cfg)
    tot_j = sum(jl[k] * wd[k] for k in jl)
    tot_t = sum(tl[k] * wd[k] for k in tl)
    assert abs(tot_j - tot_t) < tol * 20, (tot_j, tot_t)
    # sanity: total_loss agrees with the hand sum
    assert abs(float(total_loss({k: jnp.float64(v) for k, v in jl.items()}, wd))
               - tot_j) < 1e-9


@pytest.fixture(autouse=True)
def _x64():
    with jax.enable_x64(True):
        yield


def test_oracle_s4_first_frame_regime():
    """S4: 2 videos x 5 frames, only each video's first frame annotated
    (frame_weight = [1,0,0,0,0] x 2 == ref's index_select(0,5,...));
    includes a frame with a single slot and one with full slots."""
    rng = np.random.RandomState(0)
    N, Q, C, K, L = 10, 10, 2, 3, 3
    valid_counts = [2, 0, 0, 0, 0, 3, 0, 0, 0, 0][:N]
    out, targets = _problem(rng, N, Q, C, K, 14, 14, 56, L, valid_counts)
    fw = np.tile(np.array([1.0, 0, 0, 0, 0]), 2)
    jl, assigns, draws = _jax_losses(out, targets, fw, C, jax.random.PRNGKey(42))
    tl = _torch_losses(out, targets, [0, 5], C, K, assigns, draws)
    _compare(jl, tl)


def test_oracle_avss_regime():
    """AVSS v1m-style: all 10 frames annotated (gt flag all ones), 71
    classes, 12 instance slots (JV LSAP path), one empty-GT frame."""
    rng = np.random.RandomState(1)
    N, Q, C, K, L = 10, 16, 71, 12, 2
    valid_counts = [3, 5, 1, 12, 2, 4, 0, 2, 6, 1]
    out, targets = _problem(rng, N, Q, C, K, 14, 14, 56, L, valid_counts)
    fw = np.ones(N)
    jl, assigns, draws = _jax_losses(out, targets, fw, C, jax.random.PRNGKey(7))
    tl = _torch_losses(out, targets, list(range(N)), C, K, assigns, draws)
    _compare(jl, tl)


def test_oracle_avss_v1s_sparse_gt():
    """AVSS v1s-style training: gt flag [1,0,0,0,0] per video — the oracle
    selects frames {0,5}, ours weights them; mixed with dense valid slots."""
    rng = np.random.RandomState(2)
    N, Q, C, K, L = 10, 16, 71, 12, 2
    valid_counts = [4, 1, 2, 3, 1, 2, 5, 1, 1, 2]
    out, targets = _problem(rng, N, Q, C, K, 14, 14, 56, L, valid_counts)
    fw = np.tile(np.array([1.0, 0, 0, 0, 0]), 2)
    jl, assigns, draws = _jax_losses(out, targets, fw, C, jax.random.PRNGKey(3))
    tl = _torch_losses(out, targets, [0, 5], C, K, assigns, draws)
    _compare(jl, tl)


def test_padding_contributes_exactly_nothing():
    """Garbage in invalid slots AND in zero-weight frames' targets leaves
    every loss value bit-identical (the static-shape padding design's core
    claim)."""
    rng = np.random.RandomState(4)
    N, Q, C, K, L = 10, 10, 2, 3, 2
    valid_counts = [2, 0, 0, 0, 0, 1, 0, 0, 0, 0]
    out, targets = _problem(rng, N, Q, C, K, 14, 14, 56, L, valid_counts)
    fw = np.tile(np.array([1.0, 0, 0, 0, 0]), 2)
    key = jax.random.PRNGKey(11)
    jl_clean, _, _ = _jax_losses(out, targets, fw, C, key)

    garbage = {k: v.copy() for k, v in targets.items()}
    inv = ~targets["valid"] | (fw[:, None] == 0)
    garbage["labels"][inv] = rng.randint(0, C, inv.sum())
    garbage["masks"][inv] = rng.rand(int(inv.sum()), 56, 56) * 37.0 - 11.0
    jl_garbage, _, _ = _jax_losses(out, garbage, fw, C, key)
    for k in jl_clean:
        assert jl_clean[k] == jl_garbage[k], (
            f"{k}: {jl_clean[k]} != {jl_garbage[k]} — padding leaked")
