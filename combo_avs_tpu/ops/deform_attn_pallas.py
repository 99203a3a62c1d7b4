"""Pallas TPU kernel for multi-scale deformable attention.

Why: XLA lowers the 4-corner bilinear gathers of `ops.deform_attn` to serial
dynamic-slices on TPU (~55 ms per call, ~334 ms for the 6-layer pixel-decoder
encoder at the S4 eval batch — 96% of the whole model step).

How: the gather becomes a sparse-interpolation-matrix product built entirely
in VMEM. For every query, ALL L levels x P points are accumulated into one
row of a per-level interpolation matrix A_l[QBLK, HW_l] as a separable tent
product  w * max(0, 1-|col-x|) * max(0, 1-|row-y|)  over static per-lane
(col, row) grids — 3 wide VPU ops per point produce the entire 2x2 bilinear
footprint, and out-of-level corners have no lane, reproducing grid_sample
zero padding exactly. One MXU matmul per level A_l @ value_l[HW_l, D] then
yields the block's output:

  out[q] = sum_l A_l[q] @ V_l       A_l[q, hw] = sum_p w_qp * bilinear corners

Pixel coordinates and folded weights are precomputed host-side (vectorized
XLA), level segments are padded to 128 lanes so every slice stays
tile-aligned, and everything inside the kernel is strictly 2D (Mosaic rejects
minor-dim reshapes). Per-call outputs are chunked under axon's 16 MB
scoped-vmem cap for custom-call results.

Semantics match `ms_deform_attn` exactly (the reference CUDA op's spec,
ref: ops/functions/ms_deform_attn_func.py:53-72); the parity test runs both
against each other. `precision=HIGHEST` gives bit-level fp32 matmuls (6 MXU
passes); DEFAULT trades ~4e-3 absolute error for ~2x speed.

The backward is a fused Pallas kernel in the same one-hot-matmul form
(replacing the reference's six channel-tuned col2im CUDA kernels,
ref: ops/src/cuda/ms_deform_im2col_cuda.cuh:307-1020):

  GV   = g @ V_l^T                       one MXU matmul per level
  dV_l = A_l^T @ g                       A_l = the forward's interp matrix
  dw   = (wx*wy) * <onehot, GV>          per-corner lane reduce of GV
  dx   = w * (±wy) * <onehot, GV>        (bilinear weight derivative), dy sym.

where <onehot, GV> extracts GV at each corner's flat index — so dValue rides
the MXU and dloc/dweight cost four VPU lane-reduces per point, with no
re-gather of value anywhere.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from combo_avs_tpu.ops.deform_attn import ms_deform_attn as ms_deform_attn_xla

QBLK = 128  # queries per grid cell (measured fastest vs 256/512 on v5e)
LANE = 128


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _level_grids(H, W, seg):
    """Static per-lane (col, row) coordinates of a 128-padded level segment;
    padding lanes get -1e4 so every tent weight evaluates to zero there."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, seg), 1)
    row = lane // W
    col = lane - row * W
    pad = lane >= H * W
    colf = jnp.where(pad, -1e4, col.astype(jnp.float32))
    rowf = jnp.where(pad, -1e4, row.astype(jnp.float32))
    return colf, rowf


def _kernel(xs_ref, ys_ref, ws_ref, value_ref, out_ref, *, shapes, seg_offs, P, D,
            precision, qblk):
    """Blocks: xs/ys/ws [1, qblk, L*P], value [1, S_pad, D], out [1, qblk, D].

    xs/ys are pixel coords (already scaled per level), ws the attention
    weights; channel c = l * P + p.

    The 2x2 bilinear footprint of a point is the separable tent
    tent(col - x) * tent(row - y), tent(t) = max(0, 1 - |t|): nonzero exactly
    at the two enclosing integer coordinates with the fractional weights, and
    identically zero outside the level (grid_sample zero padding) because
    out-of-range corners have no lane. 3 wide VPU ops per point instead of
    4 corners x (compare + FMA)."""
    out = jnp.zeros((qblk, D), jnp.float32)
    for l, (H, W) in enumerate(shapes):
        seg = _pad_to(H * W, LANE)
        colf, rowf = _level_grids(H, W, seg)
        acc = jnp.zeros((qblk, seg), jnp.float32)
        for p in range(P):
            c = l * P + p
            x = xs_ref[0, :, c : c + 1]  # [qblk, 1]
            y = ys_ref[0, :, c : c + 1]
            w = ws_ref[0, :, c : c + 1]
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(colf - x))
            ty = jnp.maximum(0.0, 1.0 - jnp.abs(rowf - y))
            acc = acc + (w * tx) * ty
        v = value_ref[0, seg_offs[l] : seg_offs[l] + seg, :]
        out = out + jax.lax.dot(acc, v.astype(jnp.float32), precision=precision,
                                preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


# axon's XLA stack-allocates custom-call outputs in scoped vmem (16 MB cap);
# chunk the batch*head axis so each call's output stays well under it.
_MAX_OUT_BYTES = 4 * 1024 * 1024


def _adaptive_qblk(spatial_shapes, n_bufs=1):
    """Shrink the query block so n_bufs [qblk, max_seg] fp32 VMEM buffers
    stay under ~4 MB total."""
    max_seg = max(_pad_to(h * w, LANE) for h, w in spatial_shapes)
    return min(QBLK, max(8, (4 * 1024 * 1024 // (n_bufs * max_seg * 4)) // 8 * 8))


def _prep(value, spatial_shapes, sampling_locations, attention_weights, qblk):
    """Shared host-side (XLA) preparation for forward and backward."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    G = B * M

    # pixel coords per level: x = loc_x * W - 0.5 (grid_sample align_corners=False)
    scale = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)  # [L, 2]
    pix = sampling_locations * scale[None, None, None, :, None, :] - 0.5
    # [B, Lq, M, L, P, 2] -> [G, Lq, L*P]
    xs = pix[..., 0].transpose(0, 2, 1, 3, 4).reshape(G, Lq, L * P)
    ys = pix[..., 1].transpose(0, 2, 1, 3, 4).reshape(G, Lq, L * P)
    ws = attention_weights.transpose(0, 2, 1, 3, 4).reshape(G, Lq, L * P)

    # value: [B, S, M, D] -> [G, S_pad, D] with 128-lane-aligned level segments
    segs = []
    start = 0
    seg_offs = []
    off = 0
    for H, W in spatial_shapes:
        HW = H * W
        v = value[:, start : start + HW].transpose(0, 2, 1, 3).reshape(G, HW, D)
        pad = _pad_to(HW, LANE) - HW
        if pad:
            v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        segs.append(v)
        seg_offs.append(off)
        off += HW + pad
        start += HW
    value_pad = jnp.concatenate(segs, axis=1)  # [G, S_pad, D]

    qpad = (-Lq) % qblk
    if qpad:
        xs = jnp.pad(xs, ((0, 0), (0, qpad), (0, 0)), constant_values=-10.0)
        ys = jnp.pad(ys, ((0, 0), (0, qpad), (0, 0)), constant_values=-10.0)
        ws = jnp.pad(ws, ((0, 0), (0, qpad), (0, 0)))
    return xs, ys, ws, value_pad, tuple(seg_offs), Lq + qpad


def _forward(value, spatial_shapes, sampling_locations, attention_weights,
             precision=jax.lax.Precision.HIGHEST, interpret=False):
    """Per-(frame x head) grid variant — superseded by `_forward_hfuse` as
    the production path (see _MAX_OUT_BYTES_HF comment); kept as the
    measured baseline that scripts/exp_deform_*.py compare against."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    G = B * M
    dtype = value.dtype

    # queries per grid cell: the kernel's interpolation accumulator is
    # [qblk, max_seg] fp32 in VMEM — shrink qblk for large levels so it
    # stays under ~4 MB
    qblk = _adaptive_qblk(spatial_shapes)
    xs, ys, ws, value_pad, seg_offs, Lqp = _prep(
        value, spatial_shapes, sampling_locations, attention_weights, qblk
    )
    S_pad = value_pad.shape[1]

    bytes_per_g = Lqp * D * dtype.itemsize
    gc = max(1, min(G, _MAX_OUT_BYTES // max(bytes_per_g, 1)))
    while G % gc:
        gc -= 1

    kern = functools.partial(
        _kernel, shapes=tuple(spatial_shapes), seg_offs=tuple(seg_offs),
        P=P, D=D, precision=precision, qblk=qblk,
    )
    pallas_call = functools.partial(pl.pallas_call, interpret=interpret)

    def call(args):
        xs_c, ys_c, ws_c, val_c = args
        return pallas_call(
            kern,
            grid=(gc, Lqp // qblk),
            in_specs=[
                pl.BlockSpec((1, qblk, L * P), lambda g, q: (g, q, 0)),
                pl.BlockSpec((1, qblk, L * P), lambda g, q: (g, q, 0)),
                pl.BlockSpec((1, qblk, L * P), lambda g, q: (g, q, 0)),
                pl.BlockSpec((1, S_pad, D), lambda g, q: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, qblk, D), lambda g, q: (g, q, 0)),
            out_shape=jax.ShapeDtypeStruct((gc, Lqp, D), dtype),
        )(xs_c, ys_c, ws_c, val_c)

    inputs = (xs, ys, ws, value_pad)
    if gc == G:
        out = call(inputs)
    else:
        n = G // gc
        out = jax.lax.map(
            call, tuple(x.reshape(n, gc, *x.shape[1:]) for x in inputs)
        ).reshape(G, Lqp, D)

    out = out[:, :Lq]  # [G, Lq, D]
    return out.reshape(B, M, Lq, D).transpose(0, 2, 1, 3).reshape(B, Lq, M * D)


def _bwd_kernel(xs_ref, ys_ref, ws_ref, value_ref, g_ref, dval_ref, dxs_ref,
                dys_ref, dws_ref, *, shapes, seg_offs, P, D, qblk, precision):
    """Fused backward. Blocks: xs/ys/ws [1, qblk, L*P], value [1, S_pad, D],
    g [1, qblk, D]; outputs dval [1, S_pad, D] (accumulated across the query
    grid axis), dxs/dys/dws [1, qblk, L*P] (pixel-space; scaled host-side)."""
    q_idx = pl.program_id(1)

    @pl.when(q_idx == 0)
    def _():
        dval_ref[0] = jnp.zeros(dval_ref.shape[1:], dval_ref.dtype)

    gout = g_ref[0].astype(jnp.float32)  # [qblk, D]
    for l, (H, W) in enumerate(shapes):
        HW = H * W
        seg = _pad_to(HW, LANE)
        v = value_ref[0, seg_offs[l] : seg_offs[l] + seg, :].astype(jnp.float32)
        # GV[q, hw] = <g[q], V[hw]>: every corner's sampled-value dot product
        # comes from one MXU pass instead of per-point gathers
        GV = jax.lax.dot_general(
            gout, v, (((1,), (1,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32,
        )  # [qblk, seg]
        colf, rowf = _level_grids(H, W, seg)
        accA = jnp.zeros((qblk, seg), jnp.float32)
        for p in range(P):
            c = l * P + p
            x = xs_ref[0, :, c : c + 1]  # [qblk, 1]
            y = ys_ref[0, :, c : c + 1]
            w = ws_ref[0, :, c : c + 1]
            # separable tent weights (see _kernel); the x-derivative is the
            # floor-based corner step: -1 on the lane col == floor(x)
            # (tcx in (-1, 0]), +1 on col == floor(x)+1 (tcx in (0, 1]) —
            # matching grid_sample's corner gradients incl. the fx == 0 case
            tcx = colf - x
            tcy = rowf - y
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(tcx))
            ty = jnp.maximum(0.0, 1.0 - jnp.abs(tcy))
            prod = tx * ty
            accA = accA + w * prod
            dw_col = jnp.sum(prod * GV, axis=1, keepdims=True)
            dtx = jnp.where(
                (tcx > -1.0) & (tcx <= 1.0), jnp.where(tcx > 0.0, 1.0, -1.0), 0.0
            )
            dty = jnp.where(
                (tcy > -1.0) & (tcy <= 1.0), jnp.where(tcy > 0.0, 1.0, -1.0), 0.0
            )
            dx_col = w * jnp.sum((dtx * ty) * GV, axis=1, keepdims=True)
            dy_col = w * jnp.sum((tx * dty) * GV, axis=1, keepdims=True)
            dws_ref[0, :, c : c + 1] = dw_col.astype(dws_ref.dtype)
            dxs_ref[0, :, c : c + 1] = dx_col.astype(dxs_ref.dtype)
            dys_ref[0, :, c : c + 1] = dy_col.astype(dys_ref.dtype)
        # dV_l += A_l^T @ g  (contract the query axis)
        upd = jax.lax.dot_general(
            accA, gout, (((0,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32,
        )  # [seg, D]
        dval_ref[0, seg_offs[l] : seg_offs[l] + seg, :] += upd.astype(dval_ref.dtype)


def _backward(value, spatial_shapes, sampling_locations, attention_weights, g,
              precision=jax.lax.Precision.HIGHEST, interpret=False):
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    G = B * M

    # two [qblk, max_seg] fp32 buffers live at once (GV + accA)
    qblk = _adaptive_qblk(spatial_shapes, n_bufs=2)
    xs, ys, ws, value_pad, seg_offs, Lqp = _prep(
        value, spatial_shapes, sampling_locations, attention_weights, qblk
    )
    S_pad = value_pad.shape[1]

    # cotangent: [B, Lq, M*D] -> [G, Lqp, D], zero-padded queries
    gq = g.astype(jnp.float32).reshape(B, Lq, M, D).transpose(0, 2, 1, 3).reshape(G, Lq, D)
    if Lqp != Lq:
        gq = jnp.pad(gq, ((0, 0), (0, Lqp - Lq), (0, 0)))

    bytes_per_g = (S_pad * D + 3 * Lqp * L * P) * 4
    gc = max(1, min(G, _MAX_OUT_BYTES // max(bytes_per_g, 1)))
    while G % gc:
        gc -= 1

    kern = functools.partial(
        _bwd_kernel, shapes=tuple(spatial_shapes), seg_offs=tuple(seg_offs),
        P=P, D=D, qblk=qblk, precision=precision,
    )

    def call(args):
        xs_c, ys_c, ws_c, val_c, g_c = args
        return pl.pallas_call(
            kern,
            grid=(gc, Lqp // qblk),
            in_specs=[
                pl.BlockSpec((1, qblk, L * P), lambda g_, q: (g_, q, 0)),
                pl.BlockSpec((1, qblk, L * P), lambda g_, q: (g_, q, 0)),
                pl.BlockSpec((1, qblk, L * P), lambda g_, q: (g_, q, 0)),
                pl.BlockSpec((1, S_pad, D), lambda g_, q: (g_, 0, 0)),
                pl.BlockSpec((1, qblk, D), lambda g_, q: (g_, q, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, S_pad, D), lambda g_, q: (g_, 0, 0)),
                pl.BlockSpec((1, qblk, L * P), lambda g_, q: (g_, q, 0)),
                pl.BlockSpec((1, qblk, L * P), lambda g_, q: (g_, q, 0)),
                pl.BlockSpec((1, qblk, L * P), lambda g_, q: (g_, q, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((gc, S_pad, D), jnp.float32),
                jax.ShapeDtypeStruct((gc, Lqp, L * P), jnp.float32),
                jax.ShapeDtypeStruct((gc, Lqp, L * P), jnp.float32),
                jax.ShapeDtypeStruct((gc, Lqp, L * P), jnp.float32),
            ],
            interpret=interpret,
        )(xs_c, ys_c, ws_c, val_c, g_c)

    inputs = (xs, ys, ws, value_pad, gq)
    if gc == G:
        dval, dxs, dys, dws = call(inputs)
    else:
        n = G // gc
        dval, dxs, dys, dws = jax.lax.map(
            call, tuple(x.reshape(n, gc, *x.shape[1:]) for x in inputs)
        )
        dval = dval.reshape(G, S_pad, D)
        dxs = dxs.reshape(G, Lqp, L * P)
        dys = dys.reshape(G, Lqp, L * P)
        dws = dws.reshape(G, Lqp, L * P)

    # ---- dValue: [G, S_pad, D] -> [B, S, M, D] (strip level padding) ----
    parts = []
    for l, (H, W) in enumerate(spatial_shapes):
        HW = H * W
        seg = dval[:, seg_offs[l] : seg_offs[l] + HW, :]  # [G, HW, D]
        parts.append(seg.reshape(B, M, HW, D).transpose(0, 2, 1, 3))
    dvalue = jnp.concatenate(parts, axis=1).astype(value.dtype)  # [B, S, M, D]

    # ---- dloc / dweights: [G, Lq, L*P] -> [B, Lq, M, L, P(, 2)] ----
    def _unpack(a):
        return (
            a[:, :Lq].reshape(B, M, Lq, L, P).transpose(0, 2, 1, 3, 4)
        )

    dxs_u = _unpack(dxs)
    dys_u = _unpack(dys)
    scale = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)  # [L, 2]
    dloc = jnp.stack([dxs_u, dys_u], axis=-1) * scale[None, None, None, :, None, :]
    dloc = dloc.astype(sampling_locations.dtype)
    dweights = _unpack(dws).astype(attention_weights.dtype)
    return dvalue, dloc, dweights


# Heads-fused forward (the production path). Measured on-chip vs the
# per-(frame x head) grid (docs/PROFILE_r3.md): folding all M heads into one
# cell is ~2% faster standalone and, more importantly, removes the per-head
# transposes of value/coords/output host-side AND cuts the train-shape
# chunking from 16 sequential pallas calls (v0: G=B*M=320 cells, 4 MB cap)
# to 4 (per-frame output rows are M*D wide). A single call fits axon's 16 MB
# scoped-vmem cap up to ~12 MB of output, which covers the eval shape whole.
_MAX_OUT_BYTES_HF = 12 * 1024 * 1024


def _prep_hfuse(value, spatial_shapes, sampling_locations, attention_weights, qblk):
    """[B, S, M, D] value + per-head coords -> per-frame packed layout:
    pk [B, Lqp, M*3*L*P] (xs | ys | ws per head) and value [B, S_pad, M*D]
    with 128-lane-aligned level segments."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    LP = L * P
    scale = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)
    pix = sampling_locations * scale[None, None, None, :, None, :] - 0.5
    xs = pix[..., 0].reshape(B, Lq, M, LP)
    ys = pix[..., 1].reshape(B, Lq, M, LP)
    ws = attention_weights.reshape(B, Lq, M, LP)
    pk = jnp.concatenate([xs, ys, ws], -1).reshape(B, Lq, M * 3 * LP)
    qpad = (-Lq) % qblk
    if qpad:
        # -10 pixel coords give all-zero tents, so padded queries contribute 0
        pk = jnp.pad(pk, ((0, 0), (0, qpad), (0, 0)), constant_values=-10.0)
    vv = value.reshape(B, S, M * D)
    segs, seg_offs = [], []
    start = off = 0
    for H, W in spatial_shapes:
        HW = H * W
        v = vv[:, start : start + HW]
        pad = _pad_to(HW, LANE) - HW
        if pad:
            v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        segs.append(v)
        seg_offs.append(off)
        off += HW + pad
        start += HW
    return pk, jnp.concatenate(segs, 1), tuple(seg_offs), Lq + qpad


def _kernel_hfuse(pk_ref, value_ref, out_ref, *, shapes, seg_offs, M, P, D,
                  qblk, precision):
    """One grid cell = (frame, query-block), all M heads. Blocks:
    pk [1, qblk, M*3*LP], value [1, S_pad, M*D], out [1, qblk, M*D].
    Per head the body is `_kernel`'s tent accumulate + per-level matmul."""
    L = len(shapes)
    LP = L * P
    for m in range(M):
        base = m * 3 * LP
        out = jnp.zeros((qblk, D), jnp.float32)
        for l, (H, W) in enumerate(shapes):
            seg = _pad_to(H * W, LANE)
            colf, rowf = _level_grids(H, W, seg)
            acc = jnp.zeros((qblk, seg), jnp.float32)
            for p in range(P):
                c = l * P + p
                x = pk_ref[0, :, base + c : base + c + 1]
                y = pk_ref[0, :, base + LP + c : base + LP + c + 1]
                w = pk_ref[0, :, base + 2 * LP + c : base + 2 * LP + c + 1]
                tx = jnp.maximum(0.0, 1.0 - jnp.abs(colf - x))
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(rowf - y))
                acc = acc + (w * tx) * ty
            v = value_ref[0, seg_offs[l] : seg_offs[l] + seg, m * D : (m + 1) * D]
            out = out + jax.lax.dot(acc, v.astype(jnp.float32),
                                    precision=precision,
                                    preferred_element_type=jnp.float32)
        out_ref[0, :, m * D : (m + 1) * D] = out.astype(out_ref.dtype)


def _forward_hfuse(value, spatial_shapes, sampling_locations, attention_weights,
                   precision=jax.lax.Precision.HIGHEST, interpret=False):
    """Heads-fused forward; returns [B, Lq, M*D] directly (no per-head
    transposes). Chunks the frame axis so each call's output stays under
    `_MAX_OUT_BYTES_HF` of axon scoped vmem."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    dtype = value.dtype

    qblk = _adaptive_qblk(spatial_shapes)
    pk, value_pad, seg_offs, Lqp = _prep_hfuse(
        value, spatial_shapes, sampling_locations, attention_weights, qblk
    )
    S_pad = value_pad.shape[1]
    CK = pk.shape[-1]

    bytes_per_b = Lqp * M * D * dtype.itemsize
    bc = max(1, min(B, _MAX_OUT_BYTES_HF // max(bytes_per_b, 1)))
    while B % bc:
        bc -= 1

    kern = functools.partial(
        _kernel_hfuse, shapes=tuple(spatial_shapes), seg_offs=tuple(seg_offs),
        M=M, P=P, D=D, qblk=qblk, precision=precision,
    )

    def call(args):
        pk_c, val_c = args
        return pl.pallas_call(
            kern,
            grid=(bc, Lqp // qblk),
            in_specs=[
                pl.BlockSpec((1, qblk, CK), lambda b, q: (b, q, 0)),
                pl.BlockSpec((1, S_pad, M * D), lambda b, q: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, qblk, M * D), lambda b, q: (b, q, 0)),
            out_shape=jax.ShapeDtypeStruct((bc, Lqp, M * D), dtype),
            interpret=interpret,
        )(pk_c, val_c)

    inputs = (pk, value_pad)
    if bc == B:
        out = call(inputs)
    else:
        n = B // bc
        out = jax.lax.map(
            call, tuple(x.reshape(n, bc, *x.shape[1:]) for x in inputs)
        ).reshape(B, Lqp, M * D)
    return out[:, :Lq]


def _bwd_kernel_hfuse(pk_ref, value_ref, g_ref, dval_ref, dpk_ref, *,
                      shapes, seg_offs, M, P, D, qblk, precision):
    """Heads-fused fused backward: one grid cell per (frame, q-block), all M
    heads. Blocks: pk [1, qblk, M*3*LP] (xs|ys|ws per head, the forward's
    packed layout), value [1, S_pad, M*D], g [1, qblk, M*D]; outputs
    dval [1, S_pad, M*D] (accumulated across the query grid axis) and
    dpk [1, qblk, M*3*LP] (dx|dy|dw in pk's own layout, pixel-space).
    Per-head math is `_bwd_kernel`'s: GV = g @ V^T on the MXU, per-corner
    lane reduces for dloc/dweight, dV = A^T @ g."""
    L = len(shapes)
    LP = L * P
    q_idx = pl.program_id(1)

    @pl.when(q_idx == 0)
    def _():
        dval_ref[0] = jnp.zeros(dval_ref.shape[1:], dval_ref.dtype)

    for m in range(M):
        base = m * 3 * LP
        gout = g_ref[0, :, m * D : (m + 1) * D].astype(jnp.float32)  # [qblk, D]
        for l, (H, W) in enumerate(shapes):
            seg = _pad_to(H * W, LANE)
            v = value_ref[0, seg_offs[l] : seg_offs[l] + seg,
                          m * D : (m + 1) * D].astype(jnp.float32)
            GV = jax.lax.dot_general(
                gout, v, (((1,), (1,)), ((), ())), precision=precision,
                preferred_element_type=jnp.float32,
            )  # [qblk, seg]
            colf, rowf = _level_grids(H, W, seg)
            accA = jnp.zeros((qblk, seg), jnp.float32)
            for p in range(P):
                c = l * P + p
                x = pk_ref[0, :, base + c : base + c + 1]
                y = pk_ref[0, :, base + LP + c : base + LP + c + 1]
                w = pk_ref[0, :, base + 2 * LP + c : base + 2 * LP + c + 1]
                tcx = colf - x
                tcy = rowf - y
                tx = jnp.maximum(0.0, 1.0 - jnp.abs(tcx))
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(tcy))
                prod = tx * ty
                accA = accA + w * prod
                dw_col = jnp.sum(prod * GV, axis=1, keepdims=True)
                dtx = jnp.where(
                    (tcx > -1.0) & (tcx <= 1.0), jnp.where(tcx > 0.0, 1.0, -1.0), 0.0
                )
                dty = jnp.where(
                    (tcy > -1.0) & (tcy <= 1.0), jnp.where(tcy > 0.0, 1.0, -1.0), 0.0
                )
                dx_col = w * jnp.sum((dtx * ty) * GV, axis=1, keepdims=True)
                dy_col = w * jnp.sum((tx * dty) * GV, axis=1, keepdims=True)
                dpk_ref[0, :, base + c : base + c + 1] = dx_col.astype(dpk_ref.dtype)
                dpk_ref[0, :, base + LP + c : base + LP + c + 1] = dy_col.astype(dpk_ref.dtype)
                dpk_ref[0, :, base + 2 * LP + c : base + 2 * LP + c + 1] = dw_col.astype(dpk_ref.dtype)
            upd = jax.lax.dot_general(
                accA, gout, (((0,), (0,)), ((), ())), precision=precision,
                preferred_element_type=jnp.float32,
            )  # [seg, D]
            dval_ref[0, seg_offs[l] : seg_offs[l] + seg,
                     m * D : (m + 1) * D] += upd.astype(dval_ref.dtype)


def _backward_hfuse(value, spatial_shapes, sampling_locations, attention_weights,
                    g, precision=jax.lax.Precision.HIGHEST, interpret=False):
    """Heads-fused fused backward; chunks the frame axis under the scoped-
    vmem output budget (vs 32 sequential per-head calls per layer at the
    bs8 train shape)."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    LP = L * P

    qblk = _adaptive_qblk(spatial_shapes, n_bufs=2)
    pk, value_pad, seg_offs, Lqp = _prep_hfuse(
        value, spatial_shapes, sampling_locations, attention_weights, qblk
    )
    S_pad = value_pad.shape[1]
    CK = pk.shape[-1]

    # cotangent [B, Lq, M*D] -> zero-padded queries
    gq = g.astype(jnp.float32)
    if Lqp != Lq:
        gq = jnp.pad(gq, ((0, 0), (0, Lqp - Lq), (0, 0)))

    bytes_per_b = (S_pad * M * D + Lqp * CK) * 4
    bc = max(1, min(B, _MAX_OUT_BYTES_HF // max(bytes_per_b, 1)))
    while B % bc:
        bc -= 1

    kern = functools.partial(
        _bwd_kernel_hfuse, shapes=tuple(spatial_shapes), seg_offs=tuple(seg_offs),
        M=M, P=P, D=D, qblk=qblk, precision=precision,
    )

    def call(args):
        pk_c, val_c, g_c = args
        return pl.pallas_call(
            kern,
            grid=(bc, Lqp // qblk),
            in_specs=[
                pl.BlockSpec((1, qblk, CK), lambda b, q: (b, q, 0)),
                pl.BlockSpec((1, S_pad, M * D), lambda b, q: (b, 0, 0)),
                pl.BlockSpec((1, qblk, M * D), lambda b, q: (b, q, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, S_pad, M * D), lambda b, q: (b, 0, 0)),
                pl.BlockSpec((1, qblk, CK), lambda b, q: (b, q, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bc, S_pad, M * D), jnp.float32),
                jax.ShapeDtypeStruct((bc, Lqp, CK), jnp.float32),
            ],
            interpret=interpret,
        )(pk_c, val_c, g_c)

    inputs = (pk, value_pad, gq)
    if bc == B:
        dval, dpk = call(inputs)
    else:
        n = B // bc
        dval, dpk = jax.lax.map(
            call, tuple(x.reshape(n, bc, *x.shape[1:]) for x in inputs)
        )
        dval = dval.reshape(B, S_pad, M * D)
        dpk = dpk.reshape(B, Lqp, CK)

    # ---- dValue: [B, S_pad, M*D] -> [B, S, M, D] (strip level padding) ----
    parts = []
    for l, (H, W) in enumerate(spatial_shapes):
        HW = H * W
        parts.append(dval[:, seg_offs[l] : seg_offs[l] + HW, :])
    dvalue = jnp.concatenate(parts, axis=1).reshape(B, S, M, D).astype(value.dtype)

    # ---- dloc / dweights from dpk's (xs|ys|ws per head) layout ----
    dpk = dpk[:, :Lq].reshape(B, Lq, M, 3, LP)
    dxs = dpk[:, :, :, 0].reshape(B, Lq, M, L, P)
    dys = dpk[:, :, :, 1].reshape(B, Lq, M, L, P)
    dws = dpk[:, :, :, 2].reshape(B, Lq, M, L, P)
    scale = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)
    dloc = jnp.stack([dxs, dys], axis=-1) * scale[None, None, None, :, None, :]
    return (dvalue, dloc.astype(sampling_locations.dtype),
            dws.astype(attention_weights.dtype))


def _precision_for(value):
    # bf16 values: the interpolation matmul runs one native MXU pass
    # (DEFAULT); fp32 values keep HIGHEST for bit-level parity with the
    # reference CUDA op (6-pass decomposition).
    if value.dtype == jnp.bfloat16:
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Drop-in fused replacement for `ops.deform_attn.ms_deform_attn`."""
    return _forward_hfuse(value, spatial_shapes, sampling_locations,
                          attention_weights, precision=_precision_for(value))


def _fwd(value, spatial_shapes, loc, w):
    out = _forward_hfuse(value, spatial_shapes, loc, w,
                         precision=_precision_for(value))
    return out, (value, loc, w)


def _bwd(spatial_shapes, res, g):
    value, loc, w = res
    # precision stays HIGHEST regardless of dtype, matching `_backward`'s
    # long-standing default (gradients are accumulated fp32 either way)
    return _backward_hfuse(value, spatial_shapes, loc, w, g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)


def ms_deform_attn(value, spatial_shapes, sampling_locations, attention_weights):
    """Backend dispatch: Pallas kernel on TPU, XLA composition elsewhere."""
    from combo_avs_tpu.ops.dispatch import pallas_available

    if pallas_available():
        return ms_deform_attn_pallas(
            value, tuple(map(tuple, spatial_shapes)), sampling_locations, attention_weights
        )
    return ms_deform_attn_xla(value, spatial_shapes, sampling_locations, attention_weights)
