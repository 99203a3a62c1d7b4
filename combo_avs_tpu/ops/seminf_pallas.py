"""Fused semantic-inference Pallas kernel: bilinear mask upsample + sigmoid
+ per-class contraction without the [N, Q, H, W] HBM intermediate.

Why: `semantic_inference` (softmax(cls)[..,:-1] x sigmoid(resize(mask)), ref:
models/maskformer_model.py:397-402,460-471) is the eval-step tail. The XLA
form materializes the Q=100 upsampled masks — [20, 100, 224, 224] bf16 is
200 MB written + re-read per eval batch, ~1.35 ms of a 28.5 ms step
(docs/PROFILE_r3.md). The contraction output [N, C, H, W] is 100x smaller
(C=2 for S4/MS3), so the op is pure HBM-bandwidth waste.

How: bilinear resize is separable and linear, so per video-frame n

    sem[c] = sum_q cls[q, c] * sigmoid(A_h @ mask[q] @ A_w^T)

with the per-axis interpolation matrices A_h [H, h], A_w [W, w] extracted
EXACTLY from `jax.image.resize` by resizing identity matrices (captures the
edge renormalization too). The kernel holds one frame's [Q, h, w] mask stack
in VMEM (~630 KB bf16 at 56^2), does the W-contraction as ONE [Q*h, w] @
[w, W] MXU matmul, then per query one [H, h] @ [h, W] MXU matmul + sigmoid
+ C fused multiply-adds into a [C, H, W] accumulator. Only the small output
ever reaches HBM.

Layouts (CLAUDE.md rules): kernel bodies stay 2D/3D with the long axis on
lanes; the [Q, h, w] -> [Q*h, w] view keeps the minor dim; dynamic slices
ride sublanes at q*h offsets (h % 8 == 0). cls rows are pre-spread to a
[Q, 8, Cp] layout so the per-q slice offset is a sublane-tile multiple.

Used for small C only (S4/MS3 binary eval, C <= _MAX_C); AVSS' C=71 keeps
the XLA einsum whose Q-contraction already rides the MXU efficiently.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_MAX_C = 8  # per-query scalar FMA loop; large C wants the XLA matmul instead
_MAX_OUT_BYTES = 4 * 1024 * 1024  # axon scoped-vmem cap convention (see
# ops/point_sample_pallas.py); chunk the N axis under it
_VMEM_BUDGET = 10 * 1024 * 1024  # mask stack + Yt f32 + working set


def resize_matrix(n_in: int, n_out: int, dtype=jnp.float32) -> jnp.ndarray:
    """[n_out, n_in] linear map equal to jax.image.resize(method="bilinear")
    along one axis — resize is linear, so resizing the identity recovers the
    exact matrix including boundary renormalization."""
    eye = jnp.eye(n_in, dtype=jnp.float32)
    return jax.image.resize(eye, (n_out, n_in), "bilinear").astype(dtype)


def _kernel(cls_ref, mask_ref, ah_ref, awt_ref, out_ref, *, Q, C, h, w, H, W):
    # one [Q*h, w] @ [w, W] MXU contraction for the whole frame's W-resize
    mask2d = mask_ref[0].reshape(Q * h, w)
    yt = jax.lax.dot(
        mask2d.astype(jnp.float32), awt_ref[...],
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )  # [Q*h, W]
    ah = ah_ref[...]  # [H, h]

    def body(q, acc):
        ytq = jax.lax.dynamic_slice(yt, (q * h, 0), (h, W))
        z = jax.lax.dot(ah, ytq, precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)  # [H, W]
        s = jax.nn.sigmoid(z)
        clsq = jax.lax.dynamic_slice(cls_ref[0], (q * 8, 0), (8, cls_ref.shape[-1]))
        row = clsq[0:1, :]  # [1, Cp]; values live in lane c
        for c in range(C):
            acc = acc.at[c].add(row[:, c : c + 1] * s)
        return acc

    acc0 = jnp.zeros((C, H, W), jnp.float32)
    out_ref[0] = jax.lax.fori_loop(0, Q, body, acc0)


def seminf_fits(Q: int, C: int, h: int, w: int, H: int, W: int) -> bool:
    """Shape gate for the fused kernel (upsample-direction, VMEM budget,
    sublane-aligned per-query slicing)."""
    vmem = Q * h * w * 2 + Q * h * W * 4 + (C + 3) * H * W * 4
    return (
        C <= _MAX_C
        and h % 8 == 0
        and H >= h
        and W >= w
        and vmem <= _VMEM_BUDGET
    )


def seminf_pallas(
    cls_sm: jnp.ndarray,  # [N, Q, C] softmaxed class probs (background dropped)
    mask: jnp.ndarray,  # [N, Q, h, w] mask logits
    out_size,  # (H, W)
    interpret: bool = False,
) -> jnp.ndarray:
    """sum_q cls_sm[n,q,c] * sigmoid(resize(mask[n,q], (H, W))) -> [N, C, H, W]
    float32, numerically matching meta_arch.semantic_inference's XLA form
    (resize in mask.dtype, fp32 contraction)."""
    N, Q, h, w = mask.shape
    C = cls_sm.shape[-1]
    H, W = out_size
    assert seminf_fits(Q, C, h, w, H, W), (Q, C, h, w, H, W)

    ah = resize_matrix(h, H)  # [H, h]
    awt = resize_matrix(w, W).T  # [w, W]
    # match the XLA path, which resizes in the mask dtype (bf16 production)
    ah = ah.astype(mask.dtype)
    awt = awt.astype(mask.dtype)

    # spread cls rows to [Q, 8, Cp]: row q lives at sublane q*8, so the
    # kernel's dynamic slice offset is always a sublane-tile multiple
    Cp = ((C + 127) // 128) * 128
    cls_sp = jnp.zeros((N, Q, 8, Cp), jnp.float32)
    cls_sp = cls_sp.at[:, :, 0, :C].set(cls_sm.astype(jnp.float32))
    cls_sp = cls_sp.reshape(N, Q * 8, Cp)

    gc = max(1, min(N, _MAX_OUT_BYTES // (C * H * W * 4)))
    while N % gc:
        gc -= 1

    kern = functools.partial(_kernel, Q=Q, C=C, h=h, w=w, H=H, W=W)

    def call(args):
        cls_c, mask_c = args
        return pl.pallas_call(
            kern,
            grid=(gc,),
            in_specs=[
                pl.BlockSpec((1, Q * 8, Cp), lambda g: (g, 0, 0)),
                pl.BlockSpec((1, Q, h, w), lambda g: (g, 0, 0, 0)),
                pl.BlockSpec((H, h), lambda g: (0, 0)),
                pl.BlockSpec((w, W), lambda g: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, C, H, W), lambda g: (g, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((gc, C, H, W), jnp.float32),
            interpret=interpret,
        )(cls_c, mask_c, ah, awt)

    if gc == N:
        return call((cls_sp, mask))
    nchunk = N // gc
    return jax.lax.map(
        call,
        (cls_sp.reshape(nchunk, gc, Q * 8, Cp),
         mask.reshape(nchunk, gc, Q, h, w)),
    ).reshape(N, C, H, W)
