"""Set criterion: Hungarian-matched CE + PointRend mask/dice losses + the
adaptive inter-frame cosine consistency loss.

Reimplements the reference `SetCriterion`/`SetCriterion_SS`
(ref: models/modeling/criterion.py:87-305, criterion_ss.py:238-288) with a
static-shape design:

* Targets are padded to K instance slots per frame (`labels [N, K]`,
  `masks [N, K, H, W]`, `valid [N, K]`).
* The reference's dynamic frame selection — S4 "first annotated frame only"
  (ref: criterion.py:241-254) and AVSS `gt_temporal_mask_flag` indexing
  (ref: criterion_ss.py:246-257) — becomes a per-frame weight vector
  `frame_weight [N]`: frames with weight 0 contribute nothing to any matched
  loss, exactly like being dropped.
* `num_masks` normalization is computed on the global (pjit-sharded) batch,
  replacing the reference's explicit all_reduce (ref: criterion.py:260-265).

Losses (ref formulas):
* loss_ce: CE over all queries vs matched classes, no-object weighted by
  eos_coef (ref :121-135),
* loss_mask / loss_dice: sigmoid-CE and dice on `num_points`
  importance-sampled points (75% most-uncertain of a 3x oversample + 25%
  random — PointRend; ref :137-186),
* loss_cosine: adjacent-frame cosine distance of intermediate mask
  predictions, self-weighted by exp(-loss) ("adaptive"; ref :208-231).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from combo_avs_tpu.losses.matcher import HungarianMatcher
from combo_avs_tpu.ops.grid_sample import point_sample


def _upcast32(x: jnp.ndarray) -> jnp.ndarray:
    """Upcast bf16/fp16 AMP activations to fp32 for the loss math (the
    reference computes losses in fp32 under autocast) WITHOUT downcasting
    fp64 — the float64 criterion-oracle parity test runs the exact
    production graph at full precision."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def uncertainty_sampled_points(
    key: jax.Array,
    mask_logits: jnp.ndarray,  # [M, h, w]
    num_points: int,
    oversample_ratio: float,
    importance_sample_ratio: float,
    exact_topk: bool = False,
) -> jnp.ndarray:
    """PointRend point selection (ref: criterion.py:158-166 via detectron2
    `get_uncertain_point_coords_with_randomness`); returns [M, num_points, 2].

    exact_topk=False (default) uses TPU `approx_max_k` (recall>=0.95) for the
    uncertain-point selection; True forces the reference's exact top-k
    (MODEL.MASK_FORMER.EXACT_TOPK_POINTS — a TPU-native speed/fidelity knob,
    no reference equivalent)."""
    M = mask_logits.shape[0]
    n_sampled = int(num_points * oversample_ratio)
    n_uncertain = int(num_points * importance_sample_ratio)
    n_random = num_points - n_uncertain

    k1, k2 = jax.random.split(key)
    coords = jax.random.uniform(k1, (M, n_sampled, 2))
    logits = point_sample(mask_logits[..., None], coords)[..., 0]  # [M, n_sampled]
    from combo_avs_tpu.ops.dispatch import pallas_available

    # The stratified path is pure XLA (an algorithm choice for accelerators,
    # not a Pallas dispatch), so gate it on the platform — under force_xla()
    # FLOP-costing twins then keep the production selection semantics
    # (advisor r4: gating it on pallas_available() flipped the ALGORITHM)
    on_accel = jax.default_backend() != "cpu"
    strat = _stratified_chunk(n_sampled, n_uncertain)
    if on_accel and not exact_topk and strat:
        top_coords = _stratified_uncertain_coords(logits, coords, *strat)
    elif pallas_available() and not exact_topk:
        # fallback for indivisible shapes: approximate top-k (PartialReduce,
        # recall >= 0.95) + Pallas lane-gather of the coords (XLA
        # take_along_axis is serial dynamic slices on TPU, ~23 ms/layer)
        _, idx = jax.lax.approx_max_k(-jnp.abs(logits), n_uncertain,
                                      recall_target=0.95)
        from combo_avs_tpu.ops.gather_pallas import gather_lanes

        flat = jnp.concatenate([coords[..., 0], coords[..., 1]], axis=0)  # [2M, NS]
        sel = gather_lanes(flat, jnp.concatenate([idx, idx], axis=0))  # [2M, NU]
        top_coords = jnp.stack([sel[:M], sel[M:]], axis=-1)
    else:
        _, idx = jax.lax.top_k(-jnp.abs(logits), n_uncertain)
        top_coords = jnp.take_along_axis(coords, idx[..., None], axis=1)
    rand_coords = jax.random.uniform(k2, (M, n_random, 2))
    return jax.lax.stop_gradient(jnp.concatenate([top_coords, rand_coords], axis=1))


# Chunk width for the stratified selection. 256 measured 3.11 ms vs the
# approx_max_k+gather path's 6.44 ms at the production shape with the same
# recall class (0.957 vs the 0.95 target); 128 is faster still (2.71 ms) at
# recall 0.939 (scripts/exp_select_topk.py, docs/PROFILE_r4.md).
_STRAT_CHUNK = 256


def _stratified_chunk(n_sampled: int, n_uncertain: int):
    """Chunk/quota for the stratified selection, or None if shapes do not
    divide (then the approx_max_k fallback runs)."""
    ch = _STRAT_CHUNK
    if n_sampled % ch == 0 and (n_uncertain * ch) % n_sampled == 0 \
            and n_uncertain * ch // n_sampled > 0:
        return ch, n_uncertain * ch // n_sampled
    return None


def _stratified_uncertain_coords(logits, coords, ch, quota):
    """Top-`n_uncertain` most-uncertain points via a stratified chunk sort.

    The candidates are iid uniform points, so the global top-k spreads
    binomially over lane chunks: sorting each `ch`-wide chunk by |logit|
    (ascending = most uncertain first) with the coord channels riding as
    sort payload and keeping a fixed per-chunk quota reaches recall ~0.94
    (ch=128) / ~0.96 (ch=256) of the exact top-k — the same approximation
    class as the approx_max_k path it replaces, at half the time, with NO
    coord gather afterwards (the payload IS the answer; the lane-gather it
    replaces also bf16-rounded the coords through its one-hot matmul)."""
    M, NS = logits.shape
    nchunk = NS // ch
    k = jnp.abs(logits).reshape(M * nchunk, ch)
    a = coords[..., 0].reshape(M * nchunk, ch)
    b = coords[..., 1].reshape(M * nchunk, ch)
    _, sa, sb = jax.lax.sort((k, a, b), dimension=-1, num_keys=1)
    nu = nchunk * quota
    return jnp.stack([sa[:, :quota].reshape(M, nu),
                      sb[:, :quota].reshape(M, nu)], axis=-1)


class SetCriterion:
    def __init__(
        self,
        num_classes: int,
        matcher: HungarianMatcher,
        eos_coef: float = 0.1,
        num_points: int = 12544,
        oversample_ratio: float = 3.0,
        importance_sample_ratio: float = 0.75,
        cosine_n_frame: int = 5,
        remat: bool = True,
        exact_topk: bool = False,
        vmap_layers: bool = False,
    ):
        self.num_classes = num_classes
        self.matcher = matcher
        self.eos_coef = eos_coef
        self.num_points = num_points
        self.oversample_ratio = oversample_ratio
        self.importance_sample_ratio = importance_sample_ratio
        self.cosine_n_frame = cosine_n_frame
        self.remat = remat
        self.exact_topk = exact_topk
        # True = batch the 10 layers' loss bodies with vmap instead of the
        # serial lax.map: same single-body compile cost, 10x fewer op
        # dispatches, ~10x the loss-graph live intermediates (~2 GB at bs8)
        self.vmap_layers = vmap_layers

    # ------------------------------------------------------------------
    def _loss_labels(self, pred_logits, labels, valid, assign, frame_weight):
        N, Q, _ = pred_logits.shape
        target_classes = jnp.full((N, Q), self.num_classes, jnp.int32)
        safe_assign = jnp.where(valid, assign, Q)  # Q = out of bounds -> dropped
        target_classes = target_classes.at[
            jnp.arange(N)[:, None], safe_assign
        ].set(labels, mode="drop")

        logp = jax.nn.log_softmax(_upcast32(pred_logits), axis=-1)
        nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
        empty_weight = jnp.where(target_classes == self.num_classes, self.eos_coef, 1.0)
        w = empty_weight * frame_weight[:, None]
        return (nll * w).sum() / jnp.maximum(w.sum(), 1e-6)

    # ------------------------------------------------------------------
    def _loss_masks(self, key, pred_masks, tgt_masks, valid, assign, num_masks):
        N, Q, h, w = pred_masks.shape
        K = tgt_masks.shape[1]
        safe_assign = jnp.clip(jnp.where(valid, assign, 0), 0, Q - 1)
        src = jnp.take_along_axis(
            pred_masks, safe_assign[:, :, None, None], axis=1
        )  # [N, K, h, w]

        src_f = _upcast32(src.reshape(N * K, h, w))
        tgt_f = _upcast32(tgt_masks.reshape(N * K, *tgt_masks.shape[2:]))
        # point selection and GT labels carry no gradient — keep them OUTSIDE
        # the checkpointed region so the backward pass never replays the 3x
        # oversample / top-k / 224^2 GT sampling
        coords = uncertainty_sampled_points(
            key, jax.lax.stop_gradient(src_f), self.num_points,
            self.oversample_ratio, self.importance_sample_ratio,
            exact_topk=self.exact_topk,
        )
        point_labels = jax.lax.stop_gradient(
            point_sample(tgt_f[..., None], coords)[..., 0]
        )
        vmask = valid.reshape(N * K).astype(jnp.float32)

        def core(src_f):
            point_logits = point_sample(src_f[..., None], coords)[..., 0]  # [NK, P]
            # sigmoid CE, mean over points then sum over valid masks (ref :40-62)
            ce = jnp.maximum(point_logits, 0) - point_logits * point_labels \
                + jax.nn.softplus(-jnp.abs(point_logits))
            loss_mask = ((ce.mean(-1) * vmask).sum()) / num_masks
            # dice (ref :17-37)
            p = jax.nn.sigmoid(point_logits)
            numerator = 2.0 * (p * point_labels).sum(-1)
            denominator = p.sum(-1) + point_labels.sum(-1)
            dice = 1.0 - (numerator + 1.0) / (denominator + 1.0)
            loss_dice = (dice * vmask).sum() / num_masks
            return loss_mask, loss_dice

        if self.remat:
            core = jax.checkpoint(core)
        return core(src_f)

    # ------------------------------------------------------------------
    def _loss_cosine(self, middle: jnp.ndarray) -> jnp.ndarray:
        """middle [N, Q, HW]; adjacent-frame adaptive cosine loss
        (ref: criterion.py:208-231)."""
        n_frame = self.cosine_n_frame
        N = middle.shape[0]
        bs = N // n_frame
        m = _upcast32(middle.reshape(bs, n_frame, -1))

        def cos_dist(a, b):
            denom = jnp.maximum(
                jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), 1e-8
            )
            return 1.0 - (a * b).sum(-1) / denom

        total = jnp.zeros((bs,), jnp.float32)
        for f in range(n_frame - 1):
            d = cos_dist(m[:, f], m[:, f + 1])
            total = total + d * jnp.exp(-d)  # adaptive weighting
        return total.sum() / bs / (n_frame - 1)

    # ------------------------------------------------------------------
    def __call__(
        self,
        key: jax.Array,
        outputs: Dict[str, object],
        targets: Dict[str, jnp.ndarray],
        frame_weight: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """outputs: model output dict; targets: labels [N,K] int, masks
        [N,K,H,W], valid [N,K] bool. frame_weight [N] (None = all ones)."""
        labels = targets["labels"]
        tgt_masks = targets["masks"]
        valid0 = targets["valid"]
        N, K = labels.shape
        if frame_weight is None:
            frame_weight = jnp.ones((N,), jnp.float32)
        valid = valid0 & (frame_weight[:, None] > 0)

        num_masks = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)

        layers = [(outputs["pred_logits"], outputs["pred_masks"], "")] + [
            (a["pred_logits"], a["pred_masks"], f"_{i}")
            for i, a in enumerate(outputs.get("aux_outputs", []))
        ]
        losses: Dict[str, jnp.ndarray] = {}
        keys = jax.random.split(key, 2 * len(layers))

        # All DEC_LAYERS (final + aux) share one loss body, so it is run via
        # lax.map over a stacked layer axis: XLA compiles the matcher +
        # PointRend losses ONCE instead of 10 unrolled copies (the dominant
        # compile cost of the train step), with bit-identical math and the
        # same sequential execution/memory profile as the unrolled loop.
        # Per layer: matcher and point selection are gradient-free and run
        # once (outside any remat); only _loss_masks' differentiable core is
        # checkpointed (see _loss_masks) so backward replays just one 12544-
        # point sampling per layer instead of the full matcher + oversample.
        stacked_logits = jnp.stack([l for l, _, _ in layers])
        stacked_masks = jnp.stack([m for _, m, _ in layers])
        kmat = jnp.stack([keys[2 * j] for j in range(len(layers))])
        ksamp = jnp.stack([keys[2 * j + 1] for j in range(len(layers))])

        def per_layer(args):
            logits, masks, km, ks = args
            assign = self.matcher(km, logits, masks, labels, tgt_masks, valid)
            ce = self._loss_labels(logits, labels, valid, assign, frame_weight)
            lm, ld = self._loss_masks(ks, masks, tgt_masks, valid, assign, num_masks)
            return ce, lm, ld

        run = jax.vmap(per_layer) if self.vmap_layers else functools.partial(
            jax.lax.map, per_layer)
        ces, lms, lds = run((stacked_logits, stacked_masks, kmat, ksamp))
        for j, (_, _, suffix) in enumerate(layers):
            losses[f"loss_ce{suffix}"] = ces[j]
            losses[f"loss_mask{suffix}"] = lms[j]
            losses[f"loss_dice{suffix}"] = lds[j]

        for i, middle in enumerate(outputs.get("middles_attn_mask", [])):
            losses[f"loss_cosine_{i}"] = self._loss_cosine(middle)

        return losses


def build_weight_dict(cfg) -> Dict[str, float]:
    """Loss-name -> weight map incl. per-aux-layer copies
    (ref: maskformer_model.py:192-238)."""
    mf = cfg.MODEL.MASK_FORMER
    base = {
        "loss_ce": mf.CLASS_WEIGHT,
        "loss_mask": mf.MASK_WEIGHT,
        "loss_dice": mf.DICE_WEIGHT,
    }
    out = dict(base)
    dec_layers = mf.DEC_LAYERS - 1
    for i in range(dec_layers):
        for k, v in base.items():
            out[f"{k}_{i}"] = v
    if mf.COSINE_WEIGHT > 0:
        for i in range(dec_layers):
            out[f"loss_cosine_{i}"] = mf.COSINE_WEIGHT
    return out


def total_loss(losses: Dict[str, jnp.ndarray], weight_dict: Dict[str, float]) -> jnp.ndarray:
    unknown = set(losses) - set(weight_dict)
    if unknown:
        raise ValueError(f"losses without weights: {sorted(unknown)}")
    return sum(losses[k] * weight_dict[k] for k in losses)
