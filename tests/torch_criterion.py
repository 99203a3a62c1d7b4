"""Reference-faithful torch oracle for the FULL loss stack.

An independent torch spelling of the reference's `HungarianMatcher` +
`SetCriterion`/`SetCriterion_SS` forward composition
(ref: models/modeling/matcher.py:58-159, criterion.py:87-305,
criterion_ss.py:238-290, plus detectron2 point_rend's
`point_sample` / `get_uncertain_point_coords_with_randomness`), built to
verify `combo_avs_tpu.losses` COMPOSITION-level: per-loss and weighted-total
values on identical inputs (tests/test_criterion_oracle.py).

Stochastic point selection is made injectable: every random draw the
reference makes (the matcher's shared per-frame point set, the PointRend
3x-oversample candidates, the random tail) is passed IN, so the caller can
feed the exact draws the JAX side produced and the only thing under test is
the deterministic loss math + matching + selection logic.

Dynamic-shape semantics are the reference's: targets are ragged per-frame
lists, losses run on the frame subset selected by `frame_indices`
(S4 first-frame 0,5,10,... — ref criterion.py:241-254; AVSS
`gt_temporal_mask_flag` indices — ref criterion_ss.py:246-257); the cosine
loss always sees ALL frames (middles are excluded from the selection,
ref criterion.py:240,282-286).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import torch
import torch.nn.functional as F
from scipy.optimize import linear_sum_assignment


def point_sample(feat: torch.Tensor, coords: torch.Tensor) -> torch.Tensor:
    """d2 point_sample: feat [M, C, H, W], coords [M, P, 2] (x, y) in [0, 1]
    -> [M, C, P] via grid_sample(align_corners=False, zeros padding)."""
    grid = 2.0 * coords - 1.0
    out = F.grid_sample(feat, grid[:, :, None, :], mode="bilinear",
                        padding_mode="zeros", align_corners=False)
    return out[..., 0]


def uncertain_point_coords(mask_logits: torch.Tensor,
                           candidates: torch.Tensor,
                           rand_tail: torch.Tensor,
                           num_points: int,
                           importance_sample_ratio: float) -> torch.Tensor:
    """d2 get_uncertain_point_coords_with_randomness with the two random
    draws injected. mask_logits [M, 1, h, w]; candidates [M, n_sampled, 2];
    rand_tail [M, n_random, 2]. Uncertainty = -|logit| (ref
    criterion.py:70-84). Returns [M, num_points, 2]."""
    n_uncertain = int(num_points * importance_sample_ratio)
    logits = point_sample(mask_logits, candidates)[:, 0]  # [M, n_sampled]
    _, idx = torch.topk(-logits.abs(), n_uncertain, dim=1)
    top = torch.gather(candidates, 1, idx[..., None].expand(-1, -1, 2))
    assert rand_tail.shape[1] == num_points - n_uncertain
    return torch.cat([top, rand_tail], dim=1)


class RefHungarianMatcher:
    """Per-frame LSAP over class/mask/dice costs on ONE shared injected
    point set per frame (ref: matcher.py:83-136)."""

    def __init__(self, cost_class=2.0, cost_mask=5.0, cost_dice=5.0):
        self.cost_class = cost_class
        self.cost_mask = cost_mask
        self.cost_dice = cost_dice

    @torch.no_grad()
    def cost_matrix(self, outputs: Dict, b: int, tgt: Dict,
                    frame_points: torch.Tensor) -> torch.Tensor:
        """[Q, R] total cost for frame b (ref: matcher.py:83-126)."""
        prob = outputs["pred_logits"][b].softmax(-1)  # [Q, C+1]
        cost_class = -prob[:, tgt["labels"]]  # [Q, R]
        pts = frame_points[b : b + 1]
        out_pts = point_sample(
            outputs["pred_masks"][b][:, None],
            pts.expand(outputs["pred_masks"].shape[1], -1, -1),
        )[:, 0].double()  # [Q, P]
        R = tgt["masks"].shape[0]
        if R:
            tgt_pts = point_sample(
                tgt["masks"][:, None].to(out_pts.dtype), pts.expand(R, -1, -1)
            )[:, 0].double()
        else:
            tgt_pts = out_pts.new_zeros((0, out_pts.shape[1]))
        P = out_pts.shape[1]
        pos = F.binary_cross_entropy_with_logits(
            out_pts, torch.ones_like(out_pts), reduction="none")
        neg = F.binary_cross_entropy_with_logits(
            out_pts, torch.zeros_like(out_pts), reduction="none")
        cost_mask = (pos @ tgt_pts.T + neg @ (1.0 - tgt_pts).T) / P
        sig = out_pts.sigmoid()
        inter = 2.0 * (sig @ tgt_pts.T)
        denom = sig.sum(-1)[:, None] + tgt_pts.sum(-1)[None, :]
        cost_dice = 1.0 - (inter + 1.0) / (denom + 1.0)
        return (self.cost_class * cost_class.double()
                + self.cost_mask * cost_mask + self.cost_dice * cost_dice)

    @torch.no_grad()
    def __call__(self, outputs: Dict, targets: List[Dict],
                 frame_points: torch.Tensor):
        """frame_points [N, P, 2]: the shared random point set per frame."""
        indices = []
        for b, tgt in enumerate(targets):
            C = self.cost_matrix(outputs, b, tgt, frame_points)
            i, j = linear_sum_assignment(C.cpu().numpy())
            indices.append((torch.as_tensor(i, dtype=torch.int64),
                            torch.as_tensor(j, dtype=torch.int64)))
        return indices


class RefSetCriterion:
    """Composition of the reference losses. All tensors should be float64
    for a tight oracle."""

    def __init__(self, num_classes: int, matcher: RefHungarianMatcher,
                 eos_coef=0.1, num_points=12544, oversample_ratio=3.0,
                 importance_sample_ratio=0.75, cosine_n_frame=5):
        self.num_classes = num_classes
        self.matcher = matcher
        self.eos_coef = eos_coef
        self.num_points = num_points
        self.oversample_ratio = oversample_ratio
        self.importance_sample_ratio = importance_sample_ratio
        self.cosine_n_frame = cosine_n_frame

    def loss_labels(self, outputs, targets, indices):
        logits = outputs["pred_logits"].double()
        N, Q, _ = logits.shape
        target_classes = torch.full((N, Q), self.num_classes, dtype=torch.int64)
        for b, (src, tgt) in enumerate(indices):
            target_classes[b, src] = targets[b]["labels"][tgt]
        weight = torch.ones(self.num_classes + 1, dtype=torch.float64)
        weight[-1] = self.eos_coef
        return F.cross_entropy(logits.transpose(1, 2), target_classes, weight)

    def loss_masks(self, outputs, targets, indices, num_masks,
                   candidates, rand_tail):
        src_list, tgt_list = [], []
        for b, (src, tgt) in enumerate(indices):
            src_list.append(outputs["pred_masks"][b][src])
            tgt_list.append(targets[b]["masks"][tgt])
        src_masks = torch.cat(src_list)[:, None].double()  # [M, 1, h, w]
        tgt_masks = torch.cat(tgt_list)[:, None].double()  # [M, 1, H, W]
        with torch.no_grad():
            coords = uncertain_point_coords(
                src_masks, candidates, rand_tail, self.num_points,
                self.importance_sample_ratio)
            point_labels = point_sample(tgt_masks, coords)[:, 0]
        point_logits = point_sample(src_masks, coords)[:, 0]
        ce = F.binary_cross_entropy_with_logits(
            point_logits, point_labels, reduction="none")
        loss_mask = ce.mean(1).sum() / num_masks
        sig = point_logits.sigmoid()
        numerator = 2.0 * (sig * point_labels).sum(-1)
        denominator = sig.sum(-1) + point_labels.sum(-1)
        loss_dice = (1.0 - (numerator + 1.0) / (denominator + 1.0)).sum() / num_masks
        return loss_mask, loss_dice

    def similarity_loss(self, middle):
        """middle [N, Q, HW] over ALL frames (ref: criterion.py:208-231)."""
        n_frame = self.cosine_n_frame
        bs = middle.shape[0] // n_frame
        m = middle.reshape(bs, n_frame, -1).double()
        total = torch.zeros(bs, dtype=torch.float64)
        for f in range(n_frame - 1):
            d = 1.0 - F.cosine_similarity(m[:, f], m[:, f + 1], dim=-1, eps=1e-8)
            total = total + d * torch.exp(-d)
        return total.sum() / bs / (n_frame - 1)

    def forward(self, outputs: Dict, targets: List[Dict],
                frame_indices: Sequence[int],
                matcher_points: torch.Tensor,
                mask_candidates: List[torch.Tensor],
                mask_rand_tails: List[torch.Tensor],
                world_size: int = 1,
                indices_override: Optional[List] = None
                ) -> Dict[str, torch.Tensor]:
        """outputs: pred_logits [N,Q,C+1], pred_masks [N,Q,h,w],
        aux_outputs (list of dicts), middles_attn_mask (list of [N,Q,HW]).
        targets: ragged per-SELECTED-frame dicts (len == len(frame_indices)).
        frame_indices: frames the matched losses run on (ref S4
        criterion.py:241-254 / AVSS criterion_ss.py:246-257).
        matcher_points [L, Nsel, P, 2]; mask_candidates/rand_tails: per layer,
        rows ordered like the concatenated matched masks."""
        sel = torch.as_tensor(list(frame_indices), dtype=torch.int64)
        layers = [{k: outputs[k].index_select(0, sel)
                   for k in ("pred_logits", "pred_masks")}]
        for aux in outputs.get("aux_outputs", []):
            layers.append({k: aux[k].index_select(0, sel)
                           for k in ("pred_logits", "pred_masks")})

        num_masks = max(sum(len(t["labels"]) for t in targets) / world_size, 1.0)
        losses: Dict[str, torch.Tensor] = {}
        for li, lay in enumerate(layers):
            indices = (indices_override[li] if indices_override is not None
                       else self.matcher(lay, targets, matcher_points[li]))
            suffix = "" if li == 0 else f"_{li - 1}"
            losses[f"loss_ce{suffix}"] = self.loss_labels(lay, targets, indices)
            lm, ld = self.loss_masks(lay, targets, indices, num_masks,
                                     mask_candidates[li], mask_rand_tails[li])
            losses[f"loss_mask{suffix}"] = lm
            losses[f"loss_dice{suffix}"] = ld
        for i, middle in enumerate(outputs.get("middles_attn_mask", [])):
            losses[f"loss_cosine_{i}"] = self.similarity_loss(middle)
        return losses
