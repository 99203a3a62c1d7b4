"""Bilinear grid sampling with PyTorch `F.grid_sample` semantics.

The reference relies on `F.grid_sample(..., mode="bilinear",
padding_mode="zeros", align_corners=False)` in two places:

* the pure-PyTorch deformable-attention core, which is the functional spec of
  the CUDA op (ref: models/modeling/pixel_decoder/ops/functions/
  ms_deform_attn_func.py:53-72), and
* PointRend-style point sampling in the criterion/matcher
  (ref: models/modeling/criterion.py:137-186, matcher.py:104-131 via
  detectron2 `point_sample`, which uses align_corners=False).

This module provides the same numerics as a pure-XLA composition (gather +
bilinear weights), fully differentiable. Layout is NHWC (TPU-native); helpers
accept channel counts in the trailing dim so XLA keeps the lane dimension
dense.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Map grid coords in [-1, 1] to pixel indices (torch convention)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def bilinear_gather(
    img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear sample `img` [H, W, C] at pixel coords x, y [..] with
    zero padding outside the image. Returns [.., C]."""
    H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    flat = img.reshape(H * W, C)

    def corner(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        v = jnp.take(flat, yi_c * W + xi_c, axis=0)
        return v * (w * valid)[..., None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    out = (
        corner(x0i, y0i, wx0 * wy0)
        + corner(x0i + 1, y0i, wx1 * wy0)
        + corner(x0i, y0i + 1, wx0 * wy1)
        + corner(x0i + 1, y0i + 1, wx1 * wy1)
    )
    return out


def grid_sample(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """`F.grid_sample(img, grid, "bilinear", "zeros", align_corners)` in NHWC.

    Args:
      img:  [N, H, W, C]
      grid: [N, Hg, Wg, 2], last dim = (x, y) in [-1, 1]
    Returns:
      [N, Hg, Wg, C]
    """
    N, H, W, C = img.shape
    gx = _unnormalize(grid[..., 0], W, align_corners)
    gy = _unnormalize(grid[..., 1], H, align_corners)
    return jax.vmap(bilinear_gather)(img, gx, gy)


def point_sample(
    feat: jnp.ndarray,
    points: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Sample features at normalized point coords in [0, 1].

    Equivalent to detectron2 `point_sample` (grid_sample on 2*p-1) used by the
    PointRend losses (ref: models/modeling/criterion.py:158-170).

    On TPU this routes through the two-stage Pallas point-sample kernel
    (`ops.point_sample_pallas`): row-interpolation matmul + column-weighted
    reduce, both on the MXU, with a matmul-form VJP. XLA's native gather
    lowers to serial dynamic-slices there, which made PointRend sampling the
    training-step bottleneck; the round-1 one-hot kernel detour capped images
    at H*W<=16384, which kept 224^2 GT masks on the slow path — this kernel
    has no [points, H*W] accumulator, so any image that fits VMEM works.

    Args:
      feat:   [N, H, W, C]
      points: [N, P, 2] in [0, 1], (x, y)
    Returns:
      [N, P, C]
    """
    from combo_avs_tpu.ops.dispatch import pallas_available

    N, H, W, C = feat.shape
    # img block [H, W] fp32 must fit VMEM alongside small per-block tensors
    if (
        not align_corners
        and H * W * 4 <= 8 * 1024 * 1024
        and pallas_available()
    ):
        from combo_avs_tpu.ops.point_sample_pallas import point_sample_pallas

        return point_sample_pallas(feat, points)

    grid = 2.0 * points - 1.0
    out = grid_sample(feat, grid[:, :, None, :], align_corners=align_corners)
    return out[:, :, 0, :]
