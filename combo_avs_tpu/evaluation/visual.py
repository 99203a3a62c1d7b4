"""Visualization helpers (ref: models/evaluation/misc/visual.py:1-53):
binary + 71-class color maps for rendering predictions, and a simple
per-image mean IoU used by the (optional) visual debugging path."""

from __future__ import annotations

import numpy as np


def binary_color_map() -> np.ndarray:
    """[2, 3] palette: background black, sounding object white."""
    return np.asarray([[0, 0, 0], [255, 255, 255]], np.uint8)


def v2_pallete(num_classes: int = 71, seed: int = 1) -> np.ndarray:
    """Deterministic distinct colors for the AVSS 71-class labels (the
    reference builds a V2 palette in the AVSS mapper,
    ref: avss_semantic_dataset_mapper.py:18-43)."""
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 255, (num_classes, 3)).astype(np.uint8)
    pal[0] = 0  # background black
    return pal


def colorize(mask: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """[H, W] int labels -> [H, W, 3] RGB."""
    return palette[np.clip(mask, 0, len(palette) - 1)]


def mean_iou(pred: np.ndarray, target: np.ndarray, eps: float = 1e-7) -> float:
    """Simple binary mean IoU over a batch (ref: visual.py:38-53)."""
    p = (np.asarray(pred) > 0.5).astype(np.int64)
    t = (np.asarray(target) > 0).astype(np.int64)
    inter = (p * t).sum(axis=(-1, -2))
    union = np.maximum(p, t).sum(axis=(-1, -2))
    return float(np.mean(inter / (union + eps)))


def save_mask_png(path: str, mask: np.ndarray, palette: np.ndarray | None = None):
    import cv2

    if mask.ndim == 2:
        rgb = colorize(mask, palette if palette is not None else binary_color_map())
    else:
        rgb = mask
    cv2.imwrite(path, cv2.cvtColor(rgb.astype(np.uint8), cv2.COLOR_RGB2BGR))
