"""Hungarian matcher (static-shape JAX redesign).

Same cost as the reference `HungarianMatcher`
(ref: models/modeling/matcher.py:60-137): per frame,

  C = cost_class * (-softmax(logits)[:, tgt_ids])
    + cost_mask  * batch-sigmoid-CE(point-sampled masks)
    + cost_dice  * batch-dice(point-sampled masks)

evaluated on ONE shared uniform random point set per frame (12544 points).

Static-shape redesign: targets arrive padded to K slots per frame
(`labels [N, K]`, `masks [N, K, H, W]`, `valid [N, K]`). The cost matrix is
always [Q, K]; invalid columns get a large uniform cost (they soak up leftover
queries without perturbing the valid rows' optimum). The assignment returns,
per target slot, the matched query index (or -1 when invalid) — downstream
losses gather with it, so no dynamic shapes ever enter the jitted graph.

Where the reference ships costs to the CPU for scipy
(ref: matcher.py:131-134), the LSAP here is solved ON DEVICE with the exact
JAX Jonker-Volgenant solver in `ops.lsap` — no host round trip, works under
jit/vmap/pjit, and runs on TPU runtimes that lack host callbacks entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from combo_avs_tpu.ops.lsap import solve_lsap_batch
from combo_avs_tpu.ops.point_sample_pallas import point_sample_shared_or_fallback

# Padding cost for invalid target slots. Must dominate any real cost (max
# real magnitude ~12 = 2*CE + 5*BCE + 5*dice) yet stay small enough that
# fp32 dual-variable arithmetic in the JV solver keeps full resolution
# (fp32 spacing at 1e4 is ~1e-3; at 1e8 it would be ~8 — comparable to real
# cost gaps).
BIG_COST = 1e4

# Frame-chunk size for the cost computation. The per-frame transients
# (out_pts/pos/neg, each [chunk, Q, 12544] fp32) dominate the matcher's HBM
# peak; matching is forward-only, so lax.map-ing chunks bounds the peak at
# ~300 MB with zero backward cost. 20 = one bs4 x 5-frame batch.
_COST_CHUNK = 20


def batch_sigmoid_ce_cost(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """[Q, P] logits x [K, P] binary targets -> [Q, K] mean-BCE cost
    (ref: matcher.py:31-55)."""
    P = logits.shape[-1]
    pos = jax.nn.softplus(-logits)  # BCE vs target 1
    neg = jax.nn.softplus(logits)  # BCE vs target 0
    return (pos @ targets.T + neg @ (1.0 - targets.T)) / P


def batch_dice_cost(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """[Q, P] logits x [K, P] binary targets -> [Q, K] dice cost
    (ref: matcher.py:13-28)."""
    p = jax.nn.sigmoid(logits)
    numerator = 2.0 * (p @ targets.T)
    denominator = p.sum(-1)[:, None] + targets.sum(-1)[None, :]
    return 1.0 - (numerator + 1.0) / (denominator + 1.0)


class HungarianMatcher:
    def __init__(
        self,
        cost_class: float = 2.0,
        cost_mask: float = 5.0,
        cost_dice: float = 5.0,
        num_points: int = 12544,
    ):
        self.cost_class = cost_class
        self.cost_mask = cost_mask
        self.cost_dice = cost_dice
        self.num_points = num_points

    def cost_matrix(self, key, pred_logits, pred_masks, tgt_labels, tgt_masks, tgt_valid):
        """Batched cost. pred_logits [N, Q, C+1], pred_masks [N, Q, h, w],
        tgt_labels [N, K], tgt_masks [N, K, H, W], tgt_valid [N, K] -> [N, Q, K].

        All masks of a frame are point-sampled in ONE packed call (masks ride
        the channel dim) — the per-frame shared point set makes this exact.

        The whole cost is matching-only (no gradients — ref: matcher.py:102
        @torch.no_grad): inputs are stop_gradient'ed here so the forward-only
        shared-points sampling kernel is never differentiated."""
        pred_logits = jax.lax.stop_gradient(pred_logits)
        pred_masks = jax.lax.stop_gradient(pred_masks)
        # target masks arrive as bool from the loader's compact batches
        # (data/mappers.py); the samplers/cost math need float
        tgt_masks = tgt_masks.astype(
            jnp.promote_types(tgt_masks.dtype, jnp.float32))
        N, Q = pred_logits.shape[:2]
        K = tgt_labels.shape[1]
        pts = jax.random.uniform(key, (N, self.num_points, 2))

        def _cost(args):
            logits_c, masks_c, tl_c, tm_c, tv_c, pts_c = args
            out_prob = jax.nn.softmax(logits_c, axis=-1)  # [n, Q, C+1]
            cost_class = -jnp.take_along_axis(
                out_prob, tl_c[:, None, :], axis=2
            )  # [n, Q, K]
            # all Q (or K) masks share the frame's point set: ONE
            # interpolation matrix per point block, channels ride the MXU
            out_pts = point_sample_shared_or_fallback(
                masks_c.transpose(0, 2, 3, 1), pts_c
            ).transpose(0, 2, 1)  # [n, Q, P]
            tgt_pts = point_sample_shared_or_fallback(
                tm_c.transpose(0, 2, 3, 1), pts_c
            ).transpose(0, 2, 1)  # [n, K, P]
            C = (
                self.cost_class * cost_class
                + self.cost_mask * jax.vmap(batch_sigmoid_ce_cost)(out_pts, tgt_pts)
                + self.cost_dice * jax.vmap(batch_dice_cost)(out_pts, tgt_pts)
            )
            return jnp.where(tv_c[:, None, :], C, BIG_COST)

        args = (pred_logits, pred_masks, tgt_labels, tgt_masks, tgt_valid, pts)
        if N > _COST_CHUNK and N % _COST_CHUNK == 0:
            n = N // _COST_CHUNK
            return jax.lax.map(
                _cost,
                jax.tree.map(lambda x: x.reshape(n, _COST_CHUNK, *x.shape[1:]), args),
            ).reshape(N, Q, K)
        return _cost(args)

    def __call__(self, key, pred_logits, pred_masks, tgt_labels, tgt_masks, tgt_valid):
        """Batched matching.

        Args:
          key: PRNG key.
          pred_logits [N, Q, C+1], pred_masks [N, Q, h, w],
          tgt_labels [N, K] int32, tgt_masks [N, K, H, W] float,
          tgt_valid [N, K] bool (valid slots packed first).
        Returns:
          assignment [N, K] int32: matched query per target slot, -1 = padding.
        """
        cost = self.cost_matrix(
            key, pred_logits, pred_masks, tgt_labels, tgt_masks, tgt_valid
        )
        cost = jax.lax.stop_gradient(cost)
        cost = jnp.nan_to_num(cost, nan=BIG_COST, posinf=BIG_COST, neginf=-BIG_COST)
        # rows = target slots, columns = queries (K <= Q)
        assign = solve_lsap_batch(jnp.swapaxes(cost, 1, 2))  # [N, K]
        return jnp.where(tgt_valid, assign, -1)
