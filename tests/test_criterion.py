import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from combo_avs_tpu.losses.criterion import SetCriterion, build_weight_dict, total_loss
from combo_avs_tpu.losses.matcher import (
    HungarianMatcher,
    batch_dice_cost,
    batch_sigmoid_ce_cost,
)

N, Q, K, C = 4, 8, 3, 2  # frames, queries, target slots, classes
H = W = 16


def test_batch_cost_formulas_match_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(Q, 50).astype(np.float32)
    targets = (rng.rand(K, 50) > 0.5).astype(np.float32)

    ce = np.asarray(batch_sigmoid_ce_cost(logits, targets))
    dice = np.asarray(batch_dice_cost(logits, targets))

    tl, tt = torch.from_numpy(logits), torch.from_numpy(targets)
    pos = F.binary_cross_entropy_with_logits(tl, torch.ones_like(tl), reduction="none")
    neg = F.binary_cross_entropy_with_logits(tl, torch.zeros_like(tl), reduction="none")
    ce_ref = (pos @ tt.T + neg @ (1 - tt).T) / 50
    p = tl.sigmoid()
    dice_ref = 1 - (2 * (p @ tt.T) + 1) / (p.sum(-1)[:, None] + tt.sum(-1)[None, :] + 1)
    np.testing.assert_allclose(ce, ce_ref.numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(dice, dice_ref.numpy(), atol=1e-5, rtol=1e-5)


def _synthetic_problem(perfect=True, seed=0):
    """Targets at slots 0..K-1; prediction query q matches target (q+1)%K
    when perfect, so the optimal assignment is known."""
    rng = np.random.RandomState(seed)
    tgt_masks = np.zeros((N, K, H, W), np.float32)
    labels = np.zeros((N, K), np.int32)
    valid = np.zeros((N, K), bool)
    logits = rng.randn(N, Q, C + 1).astype(np.float32) * 0.1
    masks = rng.randn(N, Q, H, W).astype(np.float32) * 0.1
    if perfect:
        logits[:, :, C] = 10.0  # default: confident no-object
    for n in range(N):
        for k in range(K):
            tgt_masks[n, k, k * 5 : k * 5 + 4, :] = 1.0
            labels[n, k] = k % C
            valid[n, k] = True
            if perfect:
                q = (k + 1) % K
                masks[n, q] = tgt_masks[n, k] * 20 - 10
                logits[n, q, C] = 0.0
                logits[n, q, labels[n, k]] = 10.0
    return logits, masks, labels, tgt_masks, valid


def test_matcher_recovers_known_assignment():
    logits, masks, labels, tgt_masks, valid = _synthetic_problem(perfect=True)
    m = HungarianMatcher(num_points=256)
    assign = np.asarray(m(jax.random.PRNGKey(0), logits, masks, labels, tgt_masks, valid))
    for n in range(N):
        for k in range(K):
            assert assign[n, k] == (k + 1) % Q % K + (1 if k + 1 < K else 0) * 0 or True
    # exact expectation: target k matched to query (k+1)%K
    expected = np.array([[(k + 1) % K for k in range(K)]] * N)
    np.testing.assert_array_equal(assign, expected)


def test_matcher_padding_gets_minus_one():
    logits, masks, labels, tgt_masks, valid = _synthetic_problem(perfect=True)
    valid[:, -1] = False
    m = HungarianMatcher(num_points=128)
    assign = np.asarray(m(jax.random.PRNGKey(0), logits, masks, labels, tgt_masks, valid))
    assert (assign[:, -1] == -1).all()
    assert (assign[:, :-1] >= 0).all()


def _criterion(num_points=256):
    return SetCriterion(
        num_classes=C,
        matcher=HungarianMatcher(num_points=num_points),
        num_points=num_points,
        cosine_n_frame=2,
    )


def test_perfect_predictions_give_small_losses():
    logits, masks, labels, tgt_masks, valid = _synthetic_problem(perfect=True)
    crit = _criterion()
    out = {"pred_logits": logits, "pred_masks": masks, "aux_outputs": [],
           "middles_attn_mask": []}
    targets = {"labels": labels, "masks": tgt_masks, "valid": valid}
    losses = crit(jax.random.PRNGKey(0), out, targets)
    # NOTE: importance sampling concentrates points on mask BOUNDARIES, where
    # even a perfect staircase prediction has interpolated logits near 0 --
    # so "perfect" losses are small but not ~0 (same as the reference).
    assert float(losses["loss_ce"]) < 0.05
    assert float(losses["loss_dice"]) < 0.3
    assert float(losses["loss_mask"]) < 0.6

    # random predictions must be far worse
    logits2, masks2, *_ = _synthetic_problem(perfect=False, seed=3)
    out2 = {"pred_logits": logits2, "pred_masks": masks2, "aux_outputs": [],
            "middles_attn_mask": []}
    losses2 = crit(jax.random.PRNGKey(0), out2, targets)
    assert float(losses2["loss_dice"]) > 3 * float(losses["loss_dice"])
    assert float(losses2["loss_ce"]) > 10 * float(losses["loss_ce"])


def test_frame_weight_masks_out_frames():
    """Zero-weight frames must not affect any loss (the S4 first-frame rule
    and AVSS gt flags)."""
    logits, masks, labels, tgt_masks, valid = _synthetic_problem(perfect=True)
    crit = _criterion()
    targets = {"labels": labels, "masks": tgt_masks, "valid": valid}
    out = {"pred_logits": logits, "pred_masks": masks, "aux_outputs": [],
           "middles_attn_mask": []}
    fw = np.array([1, 0, 1, 0], np.float32)
    l1 = crit(jax.random.PRNGKey(0), out, targets, frame_weight=fw)

    # corrupt the masked frames' predictions AND targets: losses unchanged
    logits2 = logits.copy(); logits2[1] = 100.0; logits2[3] = -7.0
    masks2 = masks.copy(); masks2[1] = 50.0
    tgt2 = tgt_masks.copy(); tgt2[3] = 1 - tgt2[3]
    out2 = {"pred_logits": logits2, "pred_masks": masks2, "aux_outputs": [],
            "middles_attn_mask": []}
    targets2 = {"labels": labels, "masks": tgt2, "valid": valid}
    l2 = crit(jax.random.PRNGKey(0), out2, targets2, frame_weight=fw)
    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l2[k]), rtol=1e-5, atol=1e-6)


def test_cosine_loss_matches_torch():
    rng = np.random.RandomState(5)
    middle = rng.randn(N, Q, 32).astype(np.float32)  # N = bs * n_frame, n_frame=2
    crit = _criterion()
    ours = float(crit._loss_cosine(jnp.asarray(middle)))

    n_frame, bs = 2, N // 2
    m = torch.from_numpy(middle).reshape(bs, n_frame, -1)
    cel = torch.nn.CosineEmbeddingLoss(reduction="none")
    total = torch.zeros(bs)
    for f in range(n_frame - 1):
        d = cel(m[:, f], m[:, f + 1], torch.ones(bs))
        total = total + d * torch.exp(-d)
    ref = float(total.sum() / bs / (n_frame - 1))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_weight_dict_and_total_loss():
    from combo_avs_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 10
    cfg.MODEL.MASK_FORMER.CLASS_WEIGHT = 2.0
    cfg.MODEL.MASK_FORMER.MASK_WEIGHT = 5.0
    cfg.MODEL.MASK_FORMER.DICE_WEIGHT = 5.0
    cfg.MODEL.MASK_FORMER.COSINE_WEIGHT = 10.0
    wd = build_weight_dict(cfg)
    # 3 main + 9*3 aux + 9 cosine
    assert len(wd) == 3 + 27 + 9
    assert wd["loss_ce_4"] == 2.0 and wd["loss_cosine_8"] == 10.0

    losses = {"loss_ce": jnp.asarray(1.0), "loss_mask": jnp.asarray(2.0)}
    assert float(total_loss(losses, wd)) == 2.0 * 1 + 5.0 * 2
    try:
        total_loss({"loss_unknown": jnp.asarray(1.0)}, wd)
        raise AssertionError("should have raised")
    except ValueError:
        pass


def test_uncertainty_points_exact_topk():
    """The exact_topk switch (MODEL.MASK_FORMER.EXACT_TOPK_POINTS) selects
    exactly the most-uncertain sampled points, matching detectron2's
    get_uncertain_point_coords_with_randomness semantics (ref:
    criterion.py:158-166): 75% top-|uncertainty| of a 3x oversample + 25%
    fresh random points."""
    from combo_avs_tpu.losses.criterion import uncertainty_sampled_points
    from combo_avs_tpu.ops.grid_sample import point_sample

    key = jax.random.PRNGKey(5)
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(3, 16, 16).astype(np.float32)) * 3
    P, OS, IR = 32, 3.0, 0.75
    pts = uncertainty_sampled_points(key, logits, P, OS, IR, exact_topk=True)
    assert pts.shape == (3, P, 2)

    # recompute the oversampled pool with the same key stream
    k1, _ = jax.random.split(key)
    coords = jax.random.uniform(k1, (3, int(P * OS), 2))
    samp = point_sample(logits[..., None], coords)[..., 0]
    unc = -jnp.abs(samp)
    n_unc = int(P * IR)
    kth = jnp.sort(unc, axis=-1)[:, -n_unc]
    # every selected "uncertain" point is in the true top set (>= kth value)
    sel_unc = -jnp.abs(point_sample(logits[..., None], pts[:, :n_unc])[..., 0])
    assert bool((sel_unc >= kth[:, None] - 1e-6).all())
    # the random tail stays in [0, 1]
    assert float(pts[:, n_unc:].min()) >= 0 and float(pts[:, n_unc:].max()) <= 1


def test_stratified_uncertain_coords():
    """The stratified chunk-sort selection (the TPU default path): correct
    count, every selected coord comes from the candidate pool, and recall vs
    the exact top-k stays in the approx_max_k class (>= 0.9)."""
    from combo_avs_tpu.losses.criterion import (
        _stratified_chunk, _stratified_uncertain_coords)

    rng = np.random.RandomState(1)
    M, NS = 6, 1024
    NU = NS * 3 // 4
    strat = _stratified_chunk(NS, NU)
    assert strat is not None
    ch, quota = strat
    logits = jnp.asarray(rng.randn(M, NS).astype(np.float32))
    coords = jnp.asarray(rng.rand(M, NS, 2).astype(np.float32))
    out = np.asarray(_stratified_uncertain_coords(logits, coords, ch, quota))
    assert out.shape == (M, NU, 2)

    cn = np.asarray(coords)
    ln = np.asarray(logits)
    for m in range(M):
        pool = {(float(a), float(b)): i for i, (a, b) in enumerate(cn[m])}
        sel = [pool[(float(a), float(b))] for a, b in out[m]]  # KeyError = bad
        assert len(set(sel)) == NU  # no duplicates
        exact = set(np.argsort(np.abs(ln[m]))[:NU].tolist())
        recall = len(set(sel) & exact) / NU
        assert recall >= 0.9, recall


def test_stratified_chunk_divisibility():
    from combo_avs_tpu.losses.criterion import _stratified_chunk

    # the production PointRend shape: 12544 points, 3x oversample, 75%
    assert _stratified_chunk(12544 * 3, 12544 * 3 // 4) == (256, 64)
    # indivisible pools fall back (None)
    assert _stratified_chunk(1000, 750) is None


def test_vmap_layers_matches_lax_map():
    # vmap_layers=True batches the 10-layer loss body instead of the serial
    # lax.map; losses must be identical (same math, same per-layer RNG keys)
    logits, masks, labels, tgt_masks, valid = _synthetic_problem(perfect=False)
    aux = []
    rng = np.random.RandomState(11)
    for _ in range(2):
        aux.append({
            "pred_logits": jnp.asarray(
                rng.randn(*logits.shape).astype(np.float32)),
            "pred_masks": jnp.asarray(
                rng.randn(*masks.shape).astype(np.float32)),
        })
    out = {"pred_logits": logits, "pred_masks": masks, "aux_outputs": aux,
           "middles_attn_mask": []}
    targets = {"labels": labels, "masks": tgt_masks, "valid": valid}

    base = _criterion()
    vm = _criterion()
    vm.vmap_layers = True
    l0 = base(jax.random.PRNGKey(0), out, targets)
    l1 = vm(jax.random.PRNGKey(0), out, targets)
    assert set(l0) == set(l1)
    for k in l0:
        np.testing.assert_allclose(
            np.asarray(l0[k]), np.asarray(l1[k]), atol=1e-6, err_msg=k)
