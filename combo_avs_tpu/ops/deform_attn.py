"""Multi-scale deformable attention core (the reference's only CUDA op).

Functional spec: the pure-PyTorch oracle `ms_deform_attn_core_pytorch`
(ref: models/modeling/pixel_decoder/ops/functions/ms_deform_attn_func.py:53-72)
— per level, bilinearly sample head-split values at predicted locations with
`grid_sample(mode=bilinear, padding=zeros, align_corners=False)`, then reduce
with attention weights over (levels x points). The CUDA kernels
(ref: ops/src/cuda/ms_deform_im2col_cuda.cuh:243-305 forward, :307-1020
backward variants) are performance tuning of that same math; in JAX the
backward comes from autodiff of this composition.

Design notes (TPU):
* Spatial shapes are STATIC (python tuple) — each level is sliced with static
  bounds so XLA sees fixed shapes.
* Values are kept with the head-dim D in the trailing (lane) position and the
  4-corner bilinear gather is expressed as `jnp.take` on a flattened H*W axis,
  which XLA lowers to a dynamic-gather that tiles well when D is lane-aligned.
* A fused Pallas kernel (`pallas_ms_deform_attn`) replaces this composition on
  the hot path; this composition remains the correctness oracle and the
  fallback on CPU.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-scale deformable attention (XLA composition).

    Args:
      value: [B, S, M, D] where S = sum(H_l * W_l) over levels.
      spatial_shapes: static per-level (H_l, W_l).
      sampling_locations: [B, Lq, M, L, P, 2], normalized to [0, 1] (x, y).
      attention_weights: [B, Lq, M, L, P], softmax-normalized over (L, P).

    Returns:
      [B, Lq, M * D]
    """
    B, S, M, D = value.shape
    _, Lq, Mq, L, P, _ = sampling_locations.shape
    assert Mq == M and L == len(spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes), (
        f"value length {S} != sum of spatial shapes {spatial_shapes}"
    )

    out = jnp.zeros((B, Lq, M, D), dtype=value.dtype)
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = value[:, start : start + H * W]  # [B, HW, M, D]
        start += H * W
        # [B, M, HW, D] -> flat gather axis per (batch, head)
        v = v.transpose(0, 2, 1, 3).reshape(B * M, H * W, D)

        loc = sampling_locations[:, :, :, lvl]  # [B, Lq, M, P, 2]
        # grid_sample(2*loc-1, align_corners=False) pixel mapping:
        x = loc[..., 0] * W - 0.5  # [B, Lq, M, P]
        y = loc[..., 1] * H - 0.5
        x = x.transpose(0, 2, 1, 3).reshape(B * M, Lq * P)
        y = y.transpose(0, 2, 1, 3).reshape(B * M, Lq * P)

        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        def corner(xi, yi, w, v=v):
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            g = jnp.take_along_axis(v, idx[..., None], axis=1)  # [B*M, LqP, D]
            return g * (w * valid)[..., None]

        sampled = (
            corner(x0i, y0i, (1 - wx1) * (1 - wy1))
            + corner(x0i + 1, y0i, wx1 * (1 - wy1))
            + corner(x0i, y0i + 1, (1 - wx1) * wy1)
            + corner(x0i + 1, y0i + 1, wx1 * wy1)
        )  # [B*M, Lq*P, D]

        sampled = sampled.reshape(B, M, Lq, P, D)
        w_l = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)  # [B, M, Lq, P]
        out = out + jnp.einsum("bmqpd,bmqp->bqmd", sampled, w_l)

    # fp32 sampling locations promote the accumulator; the contract (shared
    # with the Pallas kernel) is output dtype == value dtype
    return out.reshape(B, Lq, M * D).astype(value.dtype)


def level_start_index(spatial_shapes: Sequence[Tuple[int, int]]) -> Tuple[int, ...]:
    """Static per-level start offsets into the flattened value axis."""
    starts = []
    s = 0
    for h, w in spatial_shapes:
        starts.append(s)
        s += h * w
    return tuple(starts)
