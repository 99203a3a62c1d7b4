"""Original-size eval postprocessing.

The reference crops the model-resolution prediction back to the unpadded
image region, then bilinear-resizes (align_corners=False) to the record's
original (height, width) before any metric is computed
(d2 `sem_seg_postprocess`, used at ref: models/maskformer_model.py:422-433).
Host-side numpy/cv2: per-video original sizes are data-dependent and must
stay off the jitted static-shape path.
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np


def sem_seg_postprocess(
    result: np.ndarray,  # [C, H_pad, W_pad] or [N, C, H_pad, W_pad]
    img_size: Tuple[int, int],  # (h, w) valid region before padding
    output_height: int,
    output_width: int,
) -> np.ndarray:
    """Crop padding, then bilinear-resize to the original size
    (cv2 INTER_LINEAR uses the same half-pixel convention as
    F.interpolate(align_corners=False))."""
    single = result.ndim == 3
    if single:
        result = result[None]
    h, w = int(img_size[0]), int(img_size[1])
    out = result[:, :, :h, :w]
    if (h, w) != (output_height, output_width):
        n, c = out.shape[:2]
        resized = np.empty((n, c, output_height, output_width), out.dtype)
        for i in range(n):
            for j in range(c):
                resized[i, j] = cv2.resize(
                    out[i, j], (output_width, output_height),
                    interpolation=cv2.INTER_LINEAR,
                )
        out = resized
    return out[0] if single else out


def crop_and_resize_gt(
    gt: np.ndarray,  # [N, H_pad, W_pad] int labels
    img_size: Tuple[int, int],
    output_height: int,
    output_width: int,
) -> np.ndarray:
    """GT companion: crop the ignore-padding; NEAREST if a resize is needed
    (labels must stay integral)."""
    h, w = int(img_size[0]), int(img_size[1])
    out = gt[:, :h, :w]
    if (h, w) != (output_height, output_width):
        out = np.stack([
            cv2.resize(f.astype(np.int32), (output_width, output_height),
                       interpolation=cv2.INTER_NEAREST)
            for f in out
        ])
    return out
