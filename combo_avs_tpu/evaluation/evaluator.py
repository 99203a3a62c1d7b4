"""Dataset evaluators with the reference's reset/process/evaluate protocol.

`SemSegEvaluator` (S4/MS3; ref: models/evaluation/sem_seg_evaluation.py:
140-281): per video, softmax the 2-channel semantic maps ONCE MORE (the
reference applies softmax on top of the model's softmax-x-sigmoid output —
kept for metric parity, ref :243), take the foreground channel, accumulate
per-video mask_iou and max-F; evaluate() means over videos.

`SemSegEvaluatorSS` (AVSS; ref: sem_seg_evaluation_ss.py:214-283): accumulate
per-class IoU/F sums and presence counts over frames, normalize per class,
NaN -> 0, mean over classes (with noBg variants).

Multi-host: accumulators are tiny numpy arrays; when running under
`jax.distributed` each host evaluates its shard and the arrays are summed via
`multihost_utils` by the caller (the reference all_gathers meters,
ref: sem_seg_evaluation.py:256-265).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from combo_avs_tpu.evaluation.metrics import batch_miou_fscore, eval_fmeasure, mask_iou


def _softmax(x: np.ndarray, axis: int) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def eval_video_partial(kind: str, num_classes: int, sem: np.ndarray,
                       gt: np.ndarray, img_size, out_h: int, out_w: int):
    """Postprocess + metric math for ONE video, returning a fresh evaluator
    holding the partial sums — the unit of work for process-parallel eval
    (`COMBO_EVAL_PROCS`, train/trainer.py::evaluate). Top-level and jax-free;
    the pool uses a FORK context (spawn/forkserver re-import the parent's
    __main__, breaking stdin-driven scripts — see trainer.py); the returned
    evaluator is a few floats / tiny arrays, merged via `merge()` exactly
    like the multi-host path (the reference's one-rank-per-GPU eval fan-out,
    ref: pred.py:231-238, applied to host cores)."""
    from combo_avs_tpu.evaluation.postprocess import (
        crop_and_resize_gt, sem_seg_postprocess)

    ev = (SemSegEvaluator() if kind == "sem_seg"
          else SemSegEvaluatorSS(num_classes=num_classes))
    pred = sem_seg_postprocess(sem, img_size, out_h, out_w)
    gtc = crop_and_resize_gt(np.asarray(gt), img_size, out_h, out_w)
    ev.process(pred, gtc)
    return ev


class SemSegEvaluator:
    """S4 / MS3: binary sounding-object masks."""

    def __init__(self, ignore_label: int = 255):
        self.ignore_label = ignore_label
        self.reset()

    def reset(self):
        self._miou_sum = 0.0
        self._f_sum = 0.0
        self._count = 0

    def process(self, sem_seg: np.ndarray, gt: np.ndarray):
        """sem_seg: [N, 2, H, W] model semantic maps for one video's frames;
        gt: [N, H, W] binary ground truth (ignore_label pixels excluded)."""
        gt = np.asarray(gt)
        ignore = gt == self.ignore_label
        if not ignore.any():
            ignore = None  # exact reference formula on clean inputs
        probs = _softmax(np.asarray(sem_seg, np.float64), axis=1)[:, 1]
        self._miou_sum += mask_iou(probs, gt, ignore=ignore)
        self._f_sum += eval_fmeasure(probs, gt, ignore=ignore)
        self._count += 1

    def merge(self, other: "SemSegEvaluator"):
        self._miou_sum += other._miou_sum
        self._f_sum += other._f_sum
        self._count += other._count

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        n = max(self._count, 1)
        return {
            "sem_seg": {
                "mIoU": round(self._miou_sum / n, 4),
                "f_score": round(self._f_sum / n, 4),
            }
        }


class SemSegEvaluatorSS:
    """AVSS: 71-class semantic masks with per-class presence normalization."""

    def __init__(self, num_classes: int = 71, ignore_label: int = 255):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.reset()

    def reset(self):
        self._iou_pc = np.zeros(self.num_classes, np.float64)
        self._f_pc = np.zeros(self.num_classes, np.float64)
        self._cls_pc = np.zeros(self.num_classes, np.float64)

    def process(self, sem_seg: np.ndarray, gt: np.ndarray):
        """sem_seg: [N, C, H, W] class scores; gt: [N, H, W] int labels."""
        probs = _softmax(np.asarray(sem_seg, np.float64), axis=1)
        iou, f, cls = batch_miou_fscore(probs, np.asarray(gt), self.num_classes,
                                        ignore_label=self.ignore_label)
        self._iou_pc += iou
        self._f_pc += f
        self._cls_pc += cls

    def merge(self, other: "SemSegEvaluatorSS"):
        self._iou_pc += other._iou_pc
        self._f_pc += other._f_pc
        self._cls_pc += other._cls_pc

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        with np.errstate(divide="ignore", invalid="ignore"):
            miou_pc = self._iou_pc / self._cls_pc
            f_pc = self._f_pc / self._cls_pc
        miou_pc = np.nan_to_num(miou_pc, nan=0.0)
        f_pc = np.nan_to_num(f_pc, nan=0.0)
        return {
            "sem_seg": {
                "mIoU": round(float(miou_pc.mean()), 4),
                "f_score": round(float(f_pc.mean()), 4),
                "mIoU_noBg": round(float(miou_pc[:-1].mean()), 4),
                "f_score_noBg": round(float(f_pc[:-1].mean()), 4),
            }
        }
