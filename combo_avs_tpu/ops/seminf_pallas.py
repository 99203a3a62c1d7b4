"""Fused semantic-inference Pallas kernel: bilinear mask upsample + sigmoid
+ per-class contraction without the [N, Q, H, W] HBM intermediate.

STATUS: measured variant, NOT production. On-chip (r4,
scripts/exp_eval_secondary.py) this kernel runs 0.87x the XLA form at the
production S4 eval shape — the per-query [h,w]@[w,W] / [H,h]@[h,W] matmuls
are too small to feed the MXU, and the 100-iteration fori serialization
costs more than the 400 MB HBM round-trip it avoids (explicit-einsum resize
measured 0.71x). `meta_arch.semantic_inference` therefore keeps
jax.image.resize. Kept because it is parity-proven on real Mosaic and is the
repo's reference for two Mosaic rules (see below and CLAUDE.md).

Why it was tried: `semantic_inference` (softmax(cls)[..,:-1] x
sigmoid(resize(mask)), ref: models/maskformer_model.py:397-402,460-471) is
the eval-step tail. The XLA form materializes the Q=100 upsampled masks —
[20, 100, 224, 224] bf16 is 200 MB written + re-read per eval batch,
~1.35-1.9 ms of a ~28.5 ms step (docs/PROFILE_r3.md). The contraction output
[N, C, H, W] is 100x smaller (C=2 for S4/MS3).

How: bilinear resize is separable and linear, so per video-frame n

    sem[c] = sum_q cls[q, c] * sigmoid(A_h @ mask[q] @ A_w^T)

with the per-axis interpolation matrices A_h [H, h], A_w [W, w] extracted
EXACTLY from `jax.image.resize` by resizing identity matrices (captures the
edge renormalization too). The kernel holds one frame's [Q, h, w] mask stack
in VMEM (~630 KB bf16 at 56^2) and, per query, runs two MXU matmuls
([h, w] @ [w, W] then [H, h] @ [h, W]) + sigmoid + C multiply-adds into
per-class [H, W] accumulators carried through the fori loop. Only the small
output ever reaches HBM.

Mosaic rules this kernel obeys (CLAUDE.md): bodies stay 2D; dynamic slicing
happens ONLY on refs via ref[pl.dslice(...)] (lax.dynamic_slice on in-register
values is an unimplemented TPU-lowering primitive — interpret mode accepts
it, real Mosaic rejects); the class weights ride SMEM so `cls[0, q, c]` is a
true scalar (a [1, 1] vector x [H, W] multiply would need a
both-sublanes-and-lanes broadcast, also rejected); accumulators are a tuple
of 2D values (no .at[] updates).

Used for small C only (S4/MS3 binary eval, C <= _MAX_C); AVSS' C=71 keeps
the XLA einsum whose Q-contraction already rides the MXU efficiently.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    # Mosaic rules: dynamic slicing only on REFS (ref[pl.dslice(...)]);
    # lax.dynamic_slice on in-register values is unimplemented. The class
    # weights live in SMEM so `cls_ref[0, q, c]` is a true scalar read —
    # a [1, 1] vector times [H, W] would need a both-dims broadcast, which
    # Mosaic also rejects ("Broadcast in both sublanes and lanes").
    ah = ah_ref[...].astype(jnp.float32)  # [H, h]
    awt = awt_ref[...].astype(jnp.float32)  # [w, W]

    def body(q, accs):
        m = mask_ref[0, pl.dslice(q, 1)]  # [1, h, w]
        ytq = jax.lax.dot(m[0].astype(jnp.float32), awt,
                          precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=jnp.float32)  # [h, W]
        z = jax.lax.dot(ah, ytq, precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)  # [H, W]
        s = jax.nn.sigmoid(z)
        return tuple(a + cls_ref[0, q, c] * s for c, a in enumerate(accs))

    acc0 = tuple(jnp.zeros((H, W), jnp.float32) for _ in range(C))
    accs = jax.lax.fori_loop(0, Q, body, acc0)
    for c in range(C):
        out_ref[0, c] = accs[c]


def seminf_fits(Q: int, C: int, h: int, w: int, H: int, W: int) -> bool:
    """Shape gate for the fused kernel (upsample-direction, VMEM budget,
    sublane-aligned per-query slicing)."""
    vmem = Q * h * w * 2 + (C + 3) * H * W * 4 + h * W * 4
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

    cls_f = cls_sm.astype(jnp.float32)  # [N, Q, C] -> SMEM scalars

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
                pl.BlockSpec((1, Q, C), lambda g: (g, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, Q, h, w), lambda g: (g, 0, 0, 0)),
                pl.BlockSpec((H, h), lambda g: (0, 0)),
                pl.BlockSpec((w, W), lambda g: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, C, H, W), lambda g: (g, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((gc, C, H, W), jnp.float32),
            interpret=interpret,
        )(cls_c, mask_c, ah, awt)

    if gc == N:
        return call((cls_f, mask))
    nchunk = N // gc
    return jax.lax.map(
        call,
        (cls_f.reshape(nchunk, gc, Q, C),
         mask.reshape(nchunk, gc, Q, h, w)),
    ).reshape(N, C, H, W)
