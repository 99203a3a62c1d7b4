"""Hungarian matcher (static-shape JAX redesign).

Same cost as the reference `HungarianMatcher`
(ref: models/modeling/matcher.py:60-137): per frame,

  C = cost_class * (-softmax(logits)[:, tgt_ids])
    + cost_mask  * batch-sigmoid-CE(point-sampled masks)
    + cost_dice  * batch-dice(point-sampled masks)

evaluated on ONE shared uniform random point set per frame (12544 points),
solved with `scipy.optimize.linear_sum_assignment`.

Static-shape redesign: targets arrive padded to K slots per frame
(`labels [N, K]`, `masks [N, K, H, W]`, `valid [N, K]` with valid slots packed
first). The cost matrix is always [Q, K]; invalid columns get +inf cost and
the host LSAP solves only the valid prefix. The assignment returns, per
target slot, the matched query index (or -1 when invalid) — downstream losses
gather with it, so no dynamic shapes ever enter the jitted graph. The scipy
solve runs through `jax.pure_callback` exactly like the reference's
device->CPU hop (ref: matcher.py:131-134).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from combo_avs_tpu.ops.grid_sample import point_sample

BIG_COST = 1e8


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


def _lsap_host(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Host-side LSAP on the valid prefix. cost [Q, K]; returns [K] int32
    matched query per target slot (-1 for padding)."""
    Q, K = cost.shape
    k = int(n_valid)
    out = np.full((K,), -1, np.int32)
    if k > 0:
        c = np.nan_to_num(cost[:, :k], nan=BIG_COST, posinf=BIG_COST, neginf=-BIG_COST)
        rows, cols = scipy.optimize.linear_sum_assignment(c)
        out[cols] = rows.astype(np.int32)
    return out


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
        """Per-frame cost. pred_logits [Q, C+1], pred_masks [Q, h, w],
        tgt_labels [K], tgt_masks [K, H, W], tgt_valid [K] -> [Q, K]."""
        out_prob = jax.nn.softmax(pred_logits, axis=-1)
        cost_class = -out_prob[:, tgt_labels]  # [Q, K]

        pts = jax.random.uniform(key, (1, self.num_points, 2))
        Q = pred_masks.shape[0]
        K = tgt_masks.shape[0]
        out_pts = point_sample(
            pred_masks[..., None], jnp.broadcast_to(pts, (Q, self.num_points, 2))
        )[..., 0]
        tgt_pts = point_sample(
            tgt_masks[..., None], jnp.broadcast_to(pts, (K, self.num_points, 2))
        )[..., 0]

        C = (
            self.cost_class * cost_class
            + self.cost_mask * batch_sigmoid_ce_cost(out_pts, tgt_pts)
            + self.cost_dice * batch_dice_cost(out_pts, tgt_pts)
        )
        return jnp.where(tgt_valid[None, :], C, BIG_COST)

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
        N, K = tgt_labels.shape
        keys = jax.random.split(key, N)
        cost = jax.vmap(self.cost_matrix)(
            keys, pred_logits, pred_masks, tgt_labels, tgt_masks, tgt_valid
        )
        cost = jax.lax.stop_gradient(cost)
        n_valid = tgt_valid.sum(axis=-1).astype(jnp.int32)

        lsap = functools.partial(
            jax.pure_callback,
            _lsap_host,
            jax.ShapeDtypeStruct((K,), jnp.int32),
            vmap_method="sequential",
        )
        return jax.vmap(lsap)(cost, n_valid)
