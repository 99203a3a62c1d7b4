"""Pallas TPU kernel for PointRend-style bilinear point sampling.

Why: the criterion/matcher point-sample GT and predicted masks at 12k-37k
random points per mask (ref: models/modeling/criterion.py:137-186,
matcher.py:104-131 via detectron2 `point_sample`). XLA lowers those gathers
to serial dynamic slices on TPU; round 1 routed small images through the
one-hot deformable-attention kernel, but its [qblk, HW] VMEM accumulator
capped images at HW<=16384 — 224^2 GT masks stayed on the slow gather path
(the dominant train-step cost), and its backward replayed the XLA gathers.

How: bilinear sampling factorizes into two interpolation stages that ride
the MXU and never materialize a [points, HW] matrix:

    R[p, :]  = rowsel[p, :H] @ img[H, W]      rowsel = tent(row - y)
    out[p]   = (colw[p, :W] * R[p, :]) @ 1_W  colw   = tent(col - x)

where tent(t) = max(0, 1 - |t|) evaluates both bilinear corner weights in
one wide VPU pass; out-of-bounds corners have no lane (grid_sample zero
padding).
The VJP is matmul-form too:

    dimg = rowsel^T @ (colw * dout)                       (MXU)
    dx   = ((dcolw/dx * R) @ 1_W) * dout,  dy analogous   (one extra matmul)

Layouts: channels fold into the group axis (img [N*C, H, W]), points ride
[G, P, 1] columns so every kernel tensor is 2D (Mosaic rejects minor-dim
reshapes); outputs are chunked under axon's 16 MB scoped-vmem cap for
custom-call results.

Semantics match `F.grid_sample(mode="bilinear", padding_mode="zeros",
align_corners=False)` on points in [0, 1] (detectron2 point_sample), i.e.
`ops.grid_sample.point_sample`'s XLA composition — the parity test runs both
against each other, values and gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

PBLK = 512  # points per grid cell
# axon's XLA stack-allocates custom-call outputs in scoped vmem (16 MB cap);
# chunk the group axis so each call's outputs stay well under it.
_MAX_OUT_BYTES = 4 * 1024 * 1024

# Single-pass bf16 MXU products (~4e-3 relative; Mosaic supports only
# DEFAULT and HIGHEST). The interpolation weights themselves are built
# exactly in fp32 on the VPU; only the sampled mask logits/labels round —
# harmless for PointRend losses and matching costs, and 6x fewer MXU passes
# than HIGHEST. Interpret-mode parity tests run exact fp32 either way.
_PREC = jax.lax.Precision.DEFAULT


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _tent(t):
    """Separable bilinear weight: nonzero exactly at the two enclosing
    integer coordinates with the fractional weights; out-of-range corners
    have no lane (grid_sample zero padding)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _tent_grad(t):
    """d/dx tent(c - x) as grid_sample computes it (floor-based corner
    step): -1 on the floor lane (t in (-1, 0]), +1 on the ceil lane
    (t in (0, 1]) — incl. the fractional == 0 case."""
    return jnp.where((t > -1.0) & (t <= 1.0), jnp.where(t > 0.0, 1.0, -1.0), 0.0)


# Points ride the LANE dimension throughout ([1, pblk] rows): a [pblk, 1]
# column materializes as full (8, 128) tiles with 1/128 lanes used, so the
# coord loads / output stores alone would move ~128x the useful bytes — at
# 240 groups x 74 point blocks that padded traffic (~14 GB) dominated the
# kernel. The interpolation matrices are built transposed ([H, pblk] /
# [W, pblk]) and contracted on the MXU along the grid axis instead.


GBLK = 8  # groups per grid cell (TPU sublane tiling wants blocks of 8)


def _rowselT(y_row, pblk, H):
    """wy-weighted row-selection matrix, transposed: [H, pblk]."""
    ih = jax.lax.broadcasted_iota(jnp.int32, (H, pblk), 0).astype(jnp.float32)
    return _tent(ih - y_row)


def _colwT(x_row, pblk, W):
    """wx-weighted column weights, transposed: [W, pblk]."""
    iw = jax.lax.broadcasted_iota(jnp.int32, (W, pblk), 0).astype(jnp.float32)
    return _tent(iw - x_row)


def _fwd_kernel(xs_ref, ys_ref, img_ref, out_ref, *, H, W, pblk, precision):
    for i in range(GBLK):
        rowselT = _rowselT(ys_ref[i : i + 1, :], pblk, H)  # [H, pblk]
        img = img_ref[i].astype(jnp.float32)  # [H, W]
        # R_T[w, p] = sum_h img[h, w] * rowselT[h, p]
        R_T = jax.lax.dot_general(
            img, rowselT, (((0,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32,
        )  # [W, pblk]
        colwT = _colwT(xs_ref[i : i + 1, :], pblk, W)
        out = jnp.sum(colwT * R_T, axis=0, keepdims=True)  # [1, pblk]
        out_ref[i : i + 1, :] = out.astype(out_ref.dtype)


def _dimg_kernel(xs_ref, ys_ref, dout_ref, dimg_ref, *, H, W, pblk, precision):
    q = pl.program_id(1)

    @pl.when(q == 0)
    def _():
        dimg_ref[...] = jnp.zeros((GBLK, H, W), dimg_ref.dtype)

    for i in range(GBLK):
        rowselT = _rowselT(ys_ref[i : i + 1, :], pblk, H)  # [H, pblk]
        colwT = _colwT(xs_ref[i : i + 1, :], pblk, W)  # [W, pblk]
        dR_T = colwT * dout_ref[i : i + 1, :].astype(jnp.float32)  # [W, pblk]
        # dimg += rowselT @ dR_T^T  (contract the point axis)
        upd = jax.lax.dot_general(
            rowselT, dR_T, (((1,), (1,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32,
        )  # [H, W]
        dimg_ref[i] += upd.astype(dimg_ref.dtype)


def _dxy_kernel(xs_ref, ys_ref, img_ref, dout_ref, dxs_ref, dys_ref, *,
                H, W, pblk, precision):
    iw = jax.lax.broadcasted_iota(jnp.int32, (W, pblk), 0).astype(jnp.float32)
    ih = jax.lax.broadcasted_iota(jnp.int32, (H, pblk), 0).astype(jnp.float32)
    for i in range(GBLK):
        img = img_ref[i].astype(jnp.float32)
        dout = dout_ref[i : i + 1, :].astype(jnp.float32)  # [1, pblk]

        rowselT = _rowselT(ys_ref[i : i + 1, :], pblk, H)
        R_T = jax.lax.dot_general(
            img, rowselT, (((0,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32,
        )  # [W, pblk]
        dcolT = _tent_grad(iw - xs_ref[i : i + 1, :])
        dxs_ref[i : i + 1, :] = (
            jnp.sum(dcolT * R_T, axis=0, keepdims=True) * dout
        ).astype(dxs_ref.dtype)

        drowT = _tent_grad(ih - ys_ref[i : i + 1, :])
        RdyT = jax.lax.dot_general(
            img, drowT, (((0,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32,
        )  # [W, pblk]
        colwT = _colwT(xs_ref[i : i + 1, :], pblk, W)
        dys_ref[i : i + 1, :] = (
            jnp.sum(colwT * RdyT, axis=0, keepdims=True) * dout
        ).astype(dys_ref.dtype)


def _prep(feat, points):
    """feat [N, H, W, C], points [N, P, 2] in [0, 1] ->
    img [N*C, H, W], xs/ys [N*C, Pp, 1] pixel coords, P, Pp."""
    N, H, W, C = feat.shape
    P = points.shape[1]
    img = feat.transpose(0, 3, 1, 2).reshape(N * C, H, W)
    # align_corners=False: pixel = p * size - 0.5
    xs = points[..., 0] * W - 0.5  # [N, P]
    ys = points[..., 1] * H - 0.5
    Pp = _pad_to(P, PBLK)
    if Pp != P:
        xs = jnp.pad(xs, ((0, 0), (0, Pp - P)), constant_values=-10.0)
        ys = jnp.pad(ys, ((0, 0), (0, Pp - P)), constant_values=-10.0)
    xs = jnp.broadcast_to(xs[:, None], (N, C, Pp)).reshape(N * C, Pp)
    ys = jnp.broadcast_to(ys[:, None], (N, C, Pp)).reshape(N * C, Pp)
    return img, xs, ys, P, Pp


def _pad_groups(G, *arrs):
    """Pad the group axis to a GBLK multiple (imgs/cotangents with zeros,
    coords with -10 -> tent weights all zero)."""
    Gp = _pad_to(G, GBLK)
    if Gp == G:
        return (G,) + tuple(a for a, _ in arrs)
    out = []
    for a, fill in arrs:
        pad = [(0, Gp - G)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, pad, constant_values=fill))
    return (Gp,) + tuple(out)


def _group_chunks(Gp, bytes_per_g):
    """Largest GBLK-multiple chunk of the (GBLK-padded) group axis under the
    output-bytes cap."""
    gc = max(GBLK, min(Gp, (_MAX_OUT_BYTES // max(bytes_per_g, 1)) // GBLK * GBLK))
    while Gp % gc:
        gc -= GBLK
    return gc


def _group_chunks_any(G, bytes_per_g):
    """Largest divisor chunk of an arbitrary group axis under the cap
    (the shared-points kernel blocks its own group axis by 1)."""
    gc = max(1, min(G, _MAX_OUT_BYTES // max(bytes_per_g, 1)))
    while G % gc:
        gc -= 1
    return gc


def _forward(feat, points, precision=_PREC, interpret=False):
    N, H, W, C = feat.shape
    dtype = feat.dtype
    img, xs, ys, P, Pp = _prep(feat, points)
    G = N * C
    Gp, xs, ys, img = _pad_groups(G, (xs, -10.0), (ys, -10.0), (img, 0.0))
    gc = _group_chunks(Gp, Pp * 4)
    kern = functools.partial(_fwd_kernel, H=H, W=W, pblk=PBLK, precision=precision)

    def call(args):
        xs_c, ys_c, img_c = args
        return pl.pallas_call(
            kern,
            grid=(gc // GBLK, Pp // PBLK),
            in_specs=[
                pl.BlockSpec((GBLK, PBLK), lambda g, q: (g, q)),
                pl.BlockSpec((GBLK, PBLK), lambda g, q: (g, q)),
                pl.BlockSpec((GBLK, H, W), lambda g, q: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((GBLK, PBLK), lambda g, q: (g, q)),
            out_shape=jax.ShapeDtypeStruct((gc, Pp), jnp.float32),
            interpret=interpret,
        )(xs_c, ys_c, img_c)

    inputs = (xs, ys, img)
    if gc == Gp:
        out = call(inputs)
    else:
        n = Gp // gc
        out = jax.lax.map(
            call, tuple(a.reshape(n, gc, *a.shape[1:]) for a in inputs)
        ).reshape(Gp, Pp)
    # [N*C, Pp] -> [N, P, C]
    out = out[:G].reshape(N, C, Pp)[:, :, :P].transpose(0, 2, 1)
    return out.astype(dtype)


def _backward(feat, points, g, precision=_PREC, interpret=False):
    N, H, W, C = feat.shape
    img, xs, ys, P, Pp = _prep(feat, points)
    G = N * C
    # cotangent [N, P, C] -> [N*C, Pp]
    dout = g.astype(jnp.float32).transpose(0, 2, 1)  # [N, C, P]
    if Pp != P:
        dout = jnp.pad(dout, ((0, 0), (0, 0), (0, Pp - P)))
    dout = dout.reshape(G, Pp)
    Gp, xs, ys, img, dout = _pad_groups(
        G, (xs, -10.0), (ys, -10.0), (img, 0.0), (dout, 0.0)
    )

    # ---- dimg: accumulate over point blocks ----
    gci = _group_chunks(Gp, H * W * 4)
    kern_i = functools.partial(_dimg_kernel, H=H, W=W, pblk=PBLK, precision=precision)

    def call_dimg(args):
        xs_c, ys_c, do_c = args
        return pl.pallas_call(
            kern_i,
            grid=(gci // GBLK, Pp // PBLK),
            in_specs=[
                pl.BlockSpec((GBLK, PBLK), lambda g_, q: (g_, q)),
                pl.BlockSpec((GBLK, PBLK), lambda g_, q: (g_, q)),
                pl.BlockSpec((GBLK, PBLK), lambda g_, q: (g_, q)),
            ],
            out_specs=pl.BlockSpec((GBLK, H, W), lambda g_, q: (g_, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((gci, H, W), jnp.float32),
            interpret=interpret,
        )(xs_c, ys_c, do_c)

    inputs = (xs, ys, dout)
    if gci == Gp:
        dimg = call_dimg(inputs)
    else:
        n = Gp // gci
        dimg = jax.lax.map(
            call_dimg, tuple(a.reshape(n, gci, *a.shape[1:]) for a in inputs)
        ).reshape(Gp, H, W)
    dfeat = dimg[:G].reshape(N, C, H, W).transpose(0, 2, 3, 1).astype(feat.dtype)

    # ---- dpoints: per-group dx/dy, then channel-sum + pixel scale ----
    gcp = _group_chunks(Gp, 2 * Pp * 4)
    kern_p = functools.partial(_dxy_kernel, H=H, W=W, pblk=PBLK, precision=precision)

    def call_dxy(args):
        xs_c, ys_c, img_c, do_c = args
        return pl.pallas_call(
            kern_p,
            grid=(gcp // GBLK, Pp // PBLK),
            in_specs=[
                pl.BlockSpec((GBLK, PBLK), lambda g_, q: (g_, q)),
                pl.BlockSpec((GBLK, PBLK), lambda g_, q: (g_, q)),
                pl.BlockSpec((GBLK, H, W), lambda g_, q: (g_, 0, 0)),
                pl.BlockSpec((GBLK, PBLK), lambda g_, q: (g_, q)),
            ],
            out_specs=[
                pl.BlockSpec((GBLK, PBLK), lambda g_, q: (g_, q)),
                pl.BlockSpec((GBLK, PBLK), lambda g_, q: (g_, q)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((gcp, Pp), jnp.float32),
                jax.ShapeDtypeStruct((gcp, Pp), jnp.float32),
            ],
            interpret=interpret,
        )(xs_c, ys_c, img_c, do_c)

    inputs = (xs, ys, img, dout)
    if gcp == Gp:
        dxs, dys = call_dxy(inputs)
    else:
        n = Gp // gcp
        dxs, dys = jax.lax.map(
            call_dxy, tuple(a.reshape(n, gcp, *a.shape[1:]) for a in inputs)
        )
        dxs = dxs.reshape(Gp, Pp)
        dys = dys.reshape(Gp, Pp)
    dxs = dxs[:G].reshape(N, C, Pp)[:, :, :P].sum(axis=1)  # [N, P]
    dys = dys[:G].reshape(N, C, Pp)[:, :, :P].sum(axis=1)
    dpoints = jnp.stack([dxs * W, dys * H], axis=-1).astype(points.dtype)
    return dfeat, dpoints


@jax.custom_vjp
def point_sample_pallas(feat: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Bilinear point sampling, feat [N, H, W, C] x points [N, P, 2] in [0, 1]
    -> [N, P, C]. Drop-in for `ops.grid_sample.point_sample`'s XLA path."""
    return _forward(feat, points)


def _vjp_fwd(feat, points):
    return _forward(feat, points), (feat, points)


def _vjp_bwd(res, g):
    feat, points = res
    return _backward(feat, points, g)


point_sample_pallas.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# shared-points multichannel sampling (the Hungarian matcher's shape)
# ---------------------------------------------------------------------------
#
# The matcher point-samples ALL Q=100 predicted masks of a frame at ONE
# shared 12544-point set (ref: models/modeling/matcher.py:104-131). Routing
# that through the per-channel kernel rebuilds identical row/column one-hots
# 100x (measured 294 ms per decoder layer at bs8 — the dominant train cost).
# Here the bilinear interpolation matrix A[pblk, HW] is built ONCE per point
# block and all channels ride one MXU matmul:
#
#     out[p, c] = A[p, :] @ V[:, c]      A[p, hw] = the 4 corner weights
#
# Exact grid_sample zero-padding: out-of-bounds corners never match the lane
# iota. Requires HW and C to fit VMEM (A is [pblk, HW_pad] fp32) — the caller
# falls back to the per-channel kernel otherwise.

_SHARED_PBLK = 256
_SHARED_MAX_HW = 4096  # A = [pblk, HW_pad] fp32 <= 4 MB
_SHARED_MAX_C = 128


def _shared_kernel(xs_ref, ys_ref, v_ref, out_ref, *, H, W, pblk, precision):
    seg = v_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, seg), 1)
    row = lane // W
    col = lane - row * W
    pad = lane >= H * W
    colf = jnp.where(pad, -1e4, col.astype(jnp.float32))
    rowf = jnp.where(pad, -1e4, row.astype(jnp.float32))
    # one separable tent per point row builds the whole 2x2 bilinear
    # footprint; out-of-level corners have no lane (zero padding)
    A = _tent(colf - xs_ref[0]) * _tent(rowf - ys_ref[0])
    out = jax.lax.dot(A, v_ref[0].astype(jnp.float32), precision=precision,
                      preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def point_sample_shared(
    feat: jnp.ndarray,  # [N, H, W, C]
    points: jnp.ndarray,  # [N, P, 2] in [0, 1], shared by all C channels
    precision=_PREC,
    interpret: bool = False,
) -> jnp.ndarray:
    N, H, W, C = feat.shape
    P = points.shape[1]
    dtype = feat.dtype
    HWp = _pad_to(H * W, 128)
    Cp = _pad_to(C, 128)
    v = feat.reshape(N, H * W, C)
    v = jnp.pad(v, ((0, 0), (0, HWp - H * W), (0, Cp - C)))

    xs = points[..., 0] * W - 0.5
    ys = points[..., 1] * H - 0.5
    Pp = _pad_to(P, _SHARED_PBLK)
    if Pp != P:
        xs = jnp.pad(xs, ((0, 0), (0, Pp - P)), constant_values=-10.0)
        ys = jnp.pad(ys, ((0, 0), (0, Pp - P)), constant_values=-10.0)
    xs = xs[..., None]
    ys = ys[..., None]

    # chunk point and group axes so each call's output [gc, pc, Cp] stays
    # under the scoped-vmem cap for custom-call results; pc must be a whole
    # number of point blocks dividing Pp
    nblk = Pp // _SHARED_PBLK
    n_pc = nblk
    for k in range(1, nblk + 1):
        if nblk % k == 0 and (nblk // k) * _SHARED_PBLK * Cp * 4 <= _MAX_OUT_BYTES:
            n_pc = k
            break
    pc = Pp // n_pc
    gc = _group_chunks_any(N, pc * Cp * 4)

    kern = functools.partial(_shared_kernel, H=H, W=W, pblk=_SHARED_PBLK,
                             precision=precision)

    def call(args):
        xs_c, ys_c, v_c = args
        return pl.pallas_call(
            kern,
            grid=(gc, pc // _SHARED_PBLK),
            in_specs=[
                pl.BlockSpec((1, _SHARED_PBLK, 1), lambda g, q: (g, q, 0)),
                pl.BlockSpec((1, _SHARED_PBLK, 1), lambda g, q: (g, q, 0)),
                pl.BlockSpec((1, HWp, Cp), lambda g, q: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, _SHARED_PBLK, Cp), lambda g, q: (g, q, 0)),
            out_shape=jax.ShapeDtypeStruct((gc, pc, Cp), jnp.float32),
            interpret=interpret,
        )(xs_c, ys_c, v_c)

    def over_groups(xs_p, ys_p):
        if gc == N:
            return call((xs_p, ys_p, v))
        n = N // gc
        return jax.lax.map(
            call,
            (xs_p.reshape(n, gc, pc, 1), ys_p.reshape(n, gc, pc, 1),
             v.reshape(n, gc, HWp, Cp)),
        ).reshape(N, pc, Cp)

    # static python loop over point chunks: v is reused (never broadcast)
    outs = [
        over_groups(xs[:, i * pc : (i + 1) * pc], ys[:, i * pc : (i + 1) * pc])
        for i in range(n_pc)
    ]
    out = outs[0] if n_pc == 1 else jnp.concatenate(outs, axis=1)
    out = out[:, :P, :C]
    return out.astype(dtype)


def point_sample_shared_or_fallback(feat, points):
    """Shared-points fast path when shapes fit; per-channel kernel or XLA
    composition otherwise. Forward-only (matcher costs are stop_gradient)."""
    from combo_avs_tpu.ops.dispatch import pallas_available

    N, H, W, C = feat.shape
    if (
        pallas_available()
        and _pad_to(H * W, 128) <= _SHARED_MAX_HW
        and C <= _SHARED_MAX_C
    ):
        return point_sample_shared(feat, points)
    from combo_avs_tpu.ops.grid_sample import point_sample

    return point_sample(feat, points)
