"""Pallas TPU kernel for batched element gather (take_along_axis).

Why: XLA lowers `take_along_axis` to serial dynamic slices on TPU — the
PointRend uncertainty top-k coord extraction ([240, 37632] -> 9408 per row,
once per decoder layer) measured ~23 ms per call, more than the top-k
itself. No reference counterpart (torch gathers are fast on GPU; ref:
detectron2 point selection inside criterion.py:158-166) — this is the
TPU-native equivalent of one `torch.gather`.

How: a flat index idx factors into (row, lane) over the source viewed as
[rows, 128] tiles. Row selection is an exact one-hot matmul on the MXU
(the tent weight at an integer offset IS the one-hot), lane selection a
sublane-masked reduce:

    R[:, p]  = srcT[128, rows] @ onehot(rows == idx_p // 128)   (MXU)
    out[p]   = sum_s (s == idx_p % 128) * R[s, p]               (VPU)

Points ride the lane dimension throughout (see point_sample_pallas for why
[pblk, 1] columns are ruinous), groups are blocked by 8 for sublane tiling.

Values pass through one DEFAULT-precision MXU product (the one-hot side is
exactly representable, so the only rounding is the value's own bf16
round-trip, ~4e-3 relative — callers gather point coordinates, where that
is a sub-1e-2-pixel perturbation). interpret mode computes exact fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from combo_avs_tpu.ops.point_sample_pallas import (
    GBLK,
    _MAX_OUT_BYTES,
    _PREC,
    _group_chunks,
    _pad_groups,
    _pad_to,
    _tent,
)

PBLK = 512
LANE = 128


def _gather_kernel(qs_ref, rs_ref, src_ref, out_ref, *, rows, pblk, precision):
    riota = jax.lax.broadcasted_iota(jnp.int32, (rows, pblk), 0).astype(jnp.float32)
    siota = jax.lax.broadcasted_iota(jnp.int32, (LANE, pblk), 0).astype(jnp.float32)
    # DEFAULT: explicit bf16 operands force ONE MXU pass (f32 @ DEFAULT
    # still lowers to a multi-pass decomposition); the one-hot side is
    # exactly representable in bf16, so only the value rounds (~4e-3).
    # HIGHEST keeps exact fp32 extraction.
    op_dtype = (
        jnp.bfloat16 if precision == jax.lax.Precision.DEFAULT else jnp.float32
    )
    for i in range(GBLK):
        rowsel = _tent(riota - qs_ref[i : i + 1, :])  # exact one-hot [rows, pblk]
        R = jax.lax.dot_general(
            src_ref[i].astype(op_dtype), rowsel.astype(op_dtype),
            (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )  # [LANE, pblk]
        lanesel = _tent(siota - rs_ref[i : i + 1, :])
        out_ref[i : i + 1, :] = jnp.sum(lanesel * R, axis=0, keepdims=True).astype(
            out_ref.dtype
        )


def gather_lanes(
    src: jnp.ndarray,  # [G, NS]
    idx: jnp.ndarray,  # [G, P] int in [0, NS)
    precision=_PREC,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[g, p] = src[g, idx[g, p]] (jnp.take_along_axis(src, idx, axis=1))."""
    G, NS = src.shape
    P = idx.shape[1]
    dtype = src.dtype
    NSp = _pad_to(NS, LANE)
    rows = NSp // LANE
    srcp = jnp.pad(src.astype(jnp.float32), ((0, 0), (0, NSp - NS)))
    srcT = srcp.reshape(G, rows, LANE).transpose(0, 2, 1)  # [G, LANE, rows]

    Pp = _pad_to(P, PBLK)
    if Pp != P:
        idx = jnp.pad(idx, ((0, 0), (0, Pp - P)))
    qs = (idx // LANE).astype(jnp.float32)
    rs = (idx - (idx // LANE) * LANE).astype(jnp.float32)
    Gp, qs, rs, srcT = _pad_groups(G, (qs, -10.0), (rs, -10.0), (srcT, 0.0))

    gc = _group_chunks(Gp, Pp * 4)
    kern = functools.partial(_gather_kernel, rows=rows, pblk=PBLK, precision=precision)

    def call(args):
        qs_c, rs_c, src_c = args
        return pl.pallas_call(
            kern,
            grid=(gc // GBLK, Pp // PBLK),
            in_specs=[
                pl.BlockSpec((GBLK, PBLK), lambda g, p: (g, p)),
                pl.BlockSpec((GBLK, PBLK), lambda g, p: (g, p)),
                pl.BlockSpec((GBLK, LANE, rows), lambda g, p: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((GBLK, PBLK), lambda g, p: (g, p)),
            out_shape=jax.ShapeDtypeStruct((gc, Pp), jnp.float32),
            interpret=interpret,
        )(qs_c, rs_c, src_c)

    inputs = (qs, rs, srcT)
    if gc == Gp:
        out = call(inputs)
    else:
        n = Gp // gc
        out = jax.lax.map(
            call, tuple(a.reshape(n, gc, *a.shape[1:]) for a in inputs)
        ).reshape(Gp, Pp)
    return out[:G, :P].astype(dtype)


def take_along_axis(src, idx, interpret: bool = False):
    """Dispatch: Pallas lane-gather on TPU, jnp.take_along_axis elsewhere."""
    from combo_avs_tpu.ops.dispatch import pallas_available

    if pallas_available() or interpret:
        return gather_lanes(src, idx, interpret=interpret)
    return jnp.take_along_axis(src, idx, axis=1)
