"""Kernel experiments: deformable-attention forward variants at the S4 shape.

Variants:
  v0         current ms_deform_attn_pallas (tent one-hot matmul, [qblk, seg])
  nochunk    v0 with _MAX_OUT_BYTES raised so the whole G fits one call
  bf16acc    v0 with the tent accumulator + matmul operand in bf16
  tsep       transposed layout: acc^T [seg, qblk] built from separable
             per-point tents on [W, qblk] / [H, qblk] tiles (28x fewer
             wide VPU ops), out^T = V^T @ acc^T streams only D=32 rows

Usage:
  python scripts/exp_deform_variants.py --check   # CPU interpret parity
  python scripts/exp_deform_variants.py           # TPU timing
"""

import functools
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

QBLK = 128
LANE = 128


def _pad_to(n, m):
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------- variants
def make_variants():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from combo_avs_tpu.ops import deform_attn_pallas as dap

    # ---- bf16acc: same structure as dap._kernel but bf16 acc/matmul ----
    def _kernel_bf16acc(xs_ref, ys_ref, ws_ref, value_ref, out_ref, *,
                        shapes, seg_offs, P, D, qblk):
        out = jnp.zeros((qblk, D), jnp.float32)
        for l, (H, W) in enumerate(shapes):
            seg = _pad_to(H * W, LANE)
            colf, rowf = dap._level_grids(H, W, seg)
            acc = jnp.zeros((qblk, seg), jnp.bfloat16)
            for p in range(P):
                c = l * P + p
                x = xs_ref[0, :, c : c + 1]
                y = ys_ref[0, :, c : c + 1]
                w = ws_ref[0, :, c : c + 1]
                tx = jnp.maximum(0.0, 1.0 - jnp.abs(colf - x))
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(rowf - y))
                acc = acc + ((w * tx) * ty).astype(jnp.bfloat16)
            v = value_ref[0, seg_offs[l] : seg_offs[l] + seg, :]
            out = out + jax.lax.dot(acc, v.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)

    def fwd_bf16acc(value, shapes, loc, w, interpret=False):
        B, S, M, D = value.shape
        _, Lq, _, L, P, _ = loc.shape
        G = B * M
        qblk = dap._adaptive_qblk(shapes)
        xs, ys, ws, value_pad, seg_offs, Lqp = dap._prep(value, shapes, loc, w, qblk)
        S_pad = value_pad.shape[1]
        kern = functools.partial(
            _kernel_bf16acc, shapes=tuple(shapes), seg_offs=tuple(seg_offs),
            P=P, D=D, qblk=qblk)
        out = pl.pallas_call(
            kern,
            grid=(G, Lqp // qblk),
            in_specs=[
                pl.BlockSpec((1, qblk, L * P), lambda g, q: (g, q, 0)),
                pl.BlockSpec((1, qblk, L * P), lambda g, q: (g, q, 0)),
                pl.BlockSpec((1, qblk, L * P), lambda g, q: (g, q, 0)),
                pl.BlockSpec((1, S_pad, D), lambda g, q: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, qblk, D), lambda g, q: (g, q, 0)),
            out_shape=jax.ShapeDtypeStruct((G, Lqp, D), value.dtype),
            interpret=interpret,
        )(xs, ys, ws, value_pad)
        out = out[:, :Lq]
        return out.reshape(B, M, Lq, D).transpose(0, 2, 1, 3).reshape(B, Lq, M * D)

    # ---- nochunk: v0 forward with one call for all G ----
    def fwd_nochunk(value, shapes, loc, w, interpret=False):
        old = dap._MAX_OUT_BYTES
        dap._MAX_OUT_BYTES = 12 * 1024 * 1024
        try:
            return dap._forward(value, shapes, loc, w,
                                precision=dap._precision_for(value),
                                interpret=interpret)
        finally:
            dap._MAX_OUT_BYTES = old

    # ---- tsep: transposed separable ----
    def _kernel_tsep(xs_ref, ys_ref, ws_ref, valueT_ref, outT_ref, *,
                     shapes, seg_offs, P, D, qblk, acc_dtype):
        # xs/ys/ws [1, LP, qblk]; valueT [1, D, S_pad]; outT [1, D, qblk]
        out = jnp.zeros((D, qblk), jnp.float32)
        for l, (H, W) in enumerate(shapes):
            seg = _pad_to(H * W, LANE)
            Hp = _pad_to(H, 8)
            Wp = _pad_to(W, 8)
            lane_h = jax.lax.broadcasted_iota(jnp.int32, (Hp, 1), 0)
            lane_w = jax.lax.broadcasted_iota(jnp.int32, (Wp, 1), 0)
            gh = jnp.where(lane_h >= H, -1e4, lane_h.astype(jnp.float32))
            gw = jnp.where(lane_w >= W, -1e4, lane_w.astype(jnp.float32))
            acc = jnp.zeros((seg, qblk), acc_dtype)
            for p in range(P):
                c = l * P + p
                x = xs_ref[0, c : c + 1, :]  # [1, qblk]
                y = ys_ref[0, c : c + 1, :]
                w = ws_ref[0, c : c + 1, :]
                tx = jnp.maximum(0.0, 1.0 - jnp.abs(gw - x))  # [Wp, qblk]
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(gh - y)) * w  # [Hp, qblk]
                # expand to [H*W, qblk]: s = r*W + c  (c fast -> tile tx H
                # times; r slow -> interleave-broadcast ty W times)
                txe = pltpu.repeat(tx[:W], H, 0)  # [H*W, qblk]
                tye = jax.lax.broadcast_in_dim(
                    ty[:H], (H, W, qblk), (0, 2)
                ).reshape(H * W, qblk)
                prod = (txe * tye).astype(acc_dtype)
                if seg != H * W:
                    prod = jnp.concatenate(
                        [prod, jnp.zeros((seg - H * W, qblk), acc_dtype)], 0)
                acc = acc + prod
            vT = valueT_ref[0, :, seg_offs[l] : seg_offs[l] + seg]  # [D, seg]
            out = out + jax.lax.dot(vT.astype(acc_dtype), acc,
                                    preferred_element_type=jnp.float32)
        outT_ref[0] = out.astype(outT_ref.dtype)

    def fwd_tsep(value, shapes, loc, w, interpret=False, acc_dtype=None):
        B, S, M, D = value.shape
        _, Lq, _, L, P, _ = loc.shape
        G = B * M
        acc_dtype = acc_dtype or (jnp.bfloat16 if value.dtype == jnp.bfloat16
                                  else jnp.float32)
        qblk = QBLK
        xs, ys, ws, value_pad, seg_offs, Lqp = dap._prep(value, shapes, loc, w, qblk)
        S_pad = value_pad.shape[1]
        xsT = xs.transpose(0, 2, 1)  # [G, LP, Lqp]
        ysT = ys.transpose(0, 2, 1)
        wsT = ws.transpose(0, 2, 1)
        valueT = value_pad.transpose(0, 2, 1)  # [G, D, S_pad]
        kern = functools.partial(
            _kernel_tsep, shapes=tuple(shapes), seg_offs=tuple(seg_offs),
            P=P, D=D, qblk=qblk, acc_dtype=acc_dtype)
        outT = pl.pallas_call(
            kern,
            grid=(G, Lqp // qblk),
            in_specs=[
                pl.BlockSpec((1, L * P, qblk), lambda g, q: (g, 0, q)),
                pl.BlockSpec((1, L * P, qblk), lambda g, q: (g, 0, q)),
                pl.BlockSpec((1, L * P, qblk), lambda g, q: (g, 0, q)),
                pl.BlockSpec((1, D, S_pad), lambda g, q: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, D, qblk), lambda g, q: (g, 0, q)),
            out_shape=jax.ShapeDtypeStruct((G, D, Lqp), value.dtype),
            interpret=interpret,
        )(xsT, ysT, wsT, valueT)
        out = outT.transpose(0, 2, 1)[:, :Lq]  # [G, Lq, D]
        return out.reshape(B, M, Lq, D).transpose(0, 2, 1, 3).reshape(B, Lq, M * D)

    return {
        "nochunk": fwd_nochunk,
        "bf16acc": fwd_bf16acc,
        "tsep": fwd_tsep,
    }


def main():
    import jax
    import jax.numpy as jnp

    from combo_avs_tpu.ops import deform_attn_pallas as dap
    from combo_avs_tpu.ops.deform_attn import ms_deform_attn as ms_xla

    check = "--check" in sys.argv
    if check:
        jax.config.update("jax_platforms", "cpu")

    shapes = ((7, 7), (14, 14), (28, 28))
    S = sum(h * w for h, w in shapes)
    N = 4 if check else 20
    M, D, P, L = 8, 32, 4, len(shapes)
    Lq = S
    rng = np.random.RandomState(0)
    value = rng.randn(N, S, M, D).astype(np.float32)
    loc = rng.rand(N, Lq, M, L, P, 2).astype(np.float32) * 1.2 - 0.1
    w = rng.rand(N, Lq, M, L, P).astype(np.float32)
    w /= w.sum((-1, -2), keepdims=True)

    variants = make_variants()

    if check:
        ref = ms_xla(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
        for name, fn in variants.items():
            if name == "nochunk":
                continue  # chunking path identical to v0
            out = fn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w),
                     interpret=True)
            err = float(jnp.abs(out - ref).max())
            print(f"{name:8s} max_err={err:.2e}  {'OK' if err < 2e-2 else 'FAIL'}")
        return

    from combo_avs_tpu.utils.profiling import device_timer

    v16 = jnp.asarray(value, jnp.bfloat16)
    locj, wj = jnp.asarray(loc), jnp.asarray(w)
    ref = np.asarray(
        ms_xla(jnp.asarray(value), shapes, locj, wj), np.float32)

    rows = []
    f0 = lambda v, l, w_: dap.ms_deform_attn_pallas(v, shapes, l, w_)
    rows.append(("v0 bf16", device_timer(f0, v16, locj, wj, iters=32)))
    for name, fn in variants.items():
        f = lambda v, l, w_, fn=fn: fn(v, shapes, l, w_)
        out = np.asarray(f(v16, locj, wj), np.float32)
        err = np.abs(out - ref).max()
        dt = device_timer(f, v16, locj, wj, iters=32)
        rows.append((f"{name} bf16 (err {err:.1e})", dt))
    for name, dt in rows:
        print(f"{dt * 1e3:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
