"""Experiment: op-diet variants of the heads-fused deformable-attention
BACKWARD kernel.

profile_backward (docs/PROFILE_r4.md) puts the backward kernel at
25.1 ms/layer x 6 layers = ~150 ms of the 582 ms bs8 train step — the
single largest item. The kernel is VPU-compute-bound (~31 wide ops per
point over [qblk, seg] vs the forward's ~11, at ~69% of that op-count's
roofline), so the only lever is FEWER wide ops per point:

  v0  production `_bwd_kernel_hfuse`
  v1  op-diet: derivative tents from the already-computed tents
      (dtx = sign(tcx) gated by tx>0: 4 ops vs 6; shared ty*GV product).
      Boundary subgradient differs ONLY at |tcx| == 1 exactly (tent = 0
      there; measure-zero for continuous inputs).
  v2  batched dpk writes: accumulate the 3*L*P [qblk, 1] gradient columns
      per head and store once as [qblk, 3*LP] (narrow minor-dim stores move
      full (8,128) tiles — the point_sample layout lesson).
  v3  v1 + v2

Each variant is parity-checked against v0 (max rel err on dval/dpk) and
timed with device_timer at the production train layer shape.

Usage: python scripts/exp_deform_bwd_opt.py [--tiny]
"""

import functools
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax

    if "--tiny" in sys.argv:  # CPU (interpret-mode) smoke
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from combo_avs_tpu.ops.deform_attn_pallas import (
        LANE, _adaptive_qblk, _level_grids, _pad_to, _prep_hfuse)
    from combo_avs_tpu.utils.profiling import device_timer

    tiny = "--tiny" in sys.argv
    interpret = tiny
    N = 2 if tiny else 40  # frames (bs8 x 5f train)
    S_img = 64 if tiny else 224
    shapes = ((S_img // 32, S_img // 32), (S_img // 16, S_img // 16),
              (S_img // 8, S_img // 8))
    S = sum(h * w for h, w in shapes)
    M, D, P, L = (2, 16, 4, 3) if tiny else (8, 32, 4, 3)
    LP = L * P
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(N, S, M, D).astype(np.float32))
    loc = jnp.asarray(rng.rand(N, S, M, L, P, 2).astype(np.float32))
    w = rng.rand(N, S, M, L, P).astype(np.float32)
    w = jnp.asarray(w / w.sum((-1, -2), keepdims=True))
    g = jnp.asarray(rng.randn(N, S, M * D).astype(np.float32))

    qblk = _adaptive_qblk(shapes, n_bufs=2)
    pk, value_pad, seg_offs, Lqp = _prep_hfuse(value, shapes, loc, w, qblk)
    S_pad = value_pad.shape[1]
    CK = pk.shape[-1]
    gq = g.astype(jnp.float32)
    if Lqp != S:
        gq = jnp.pad(gq, ((0, 0), (0, Lqp - S), (0, 0)))
    prec = jax.lax.Precision.HIGHEST

    # ------------------------------------------------------------------
    def body_v0(pk_ref, value_ref, g_ref, dval_ref, dpk_ref):
        """Production math (mirror of _bwd_kernel_hfuse's body)."""
        q_idx = pl.program_id(1)

        @pl.when(q_idx == 0)
        def _():
            dval_ref[0] = jnp.zeros(dval_ref.shape[1:], dval_ref.dtype)

        for m in range(M):
            base = m * 3 * LP
            gout = g_ref[0, :, m * D:(m + 1) * D].astype(jnp.float32)
            for l, (H, W) in enumerate(shapes):
                seg = _pad_to(H * W, LANE)
                v = value_ref[0, seg_offs[l]:seg_offs[l] + seg,
                              m * D:(m + 1) * D].astype(jnp.float32)
                GV = jax.lax.dot_general(
                    gout, v, (((1,), (1,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32)
                colf, rowf = _level_grids(H, W, seg)
                accA = jnp.zeros((qblk, seg), jnp.float32)
                for p in range(P):
                    c = l * P + p
                    x = pk_ref[0, :, base + c:base + c + 1]
                    y = pk_ref[0, :, base + LP + c:base + LP + c + 1]
                    ww = pk_ref[0, :, base + 2 * LP + c:base + 2 * LP + c + 1]
                    tcx = colf - x
                    tcy = rowf - y
                    tx = jnp.maximum(0.0, 1.0 - jnp.abs(tcx))
                    ty = jnp.maximum(0.0, 1.0 - jnp.abs(tcy))
                    prod = tx * ty
                    accA = accA + ww * prod
                    dw_col = jnp.sum(prod * GV, axis=1, keepdims=True)
                    dtx = jnp.where((tcx > -1.0) & (tcx <= 1.0),
                                    jnp.where(tcx > 0.0, 1.0, -1.0), 0.0)
                    dty = jnp.where((tcy > -1.0) & (tcy <= 1.0),
                                    jnp.where(tcy > 0.0, 1.0, -1.0), 0.0)
                    dx_col = ww * jnp.sum((dtx * ty) * GV, axis=1, keepdims=True)
                    dy_col = ww * jnp.sum((tx * dty) * GV, axis=1, keepdims=True)
                    dpk_ref[0, :, base + c:base + c + 1] = dx_col
                    dpk_ref[0, :, base + LP + c:base + LP + c + 1] = dy_col
                    dpk_ref[0, :, base + 2 * LP + c:base + 2 * LP + c + 1] = dw_col
                upd = jax.lax.dot_general(
                    accA, gout, (((0,), (0,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32)
                dval_ref[0, seg_offs[l]:seg_offs[l] + seg,
                         m * D:(m + 1) * D] += upd

    # ------------------------------------------------------------------
    def body_opt(pk_ref, value_ref, g_ref, dval_ref, dpk_ref, *,
                 op_diet, batch_io):
        q_idx = pl.program_id(1)

        @pl.when(q_idx == 0)
        def _():
            dval_ref[0] = jnp.zeros(dval_ref.shape[1:], dval_ref.dtype)

        for m in range(M):
            base = m * 3 * LP
            gout = g_ref[0, :, m * D:(m + 1) * D].astype(jnp.float32)
            pkh = pk_ref[0, :, base:base + 3 * LP] if batch_io else None
            dxs, dys, dws = [None] * LP, [None] * LP, [None] * LP
            for l, (H, W) in enumerate(shapes):
                seg = _pad_to(H * W, LANE)
                v = value_ref[0, seg_offs[l]:seg_offs[l] + seg,
                              m * D:(m + 1) * D].astype(jnp.float32)
                GV = jax.lax.dot_general(
                    gout, v, (((1,), (1,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32)
                colf, rowf = _level_grids(H, W, seg)
                accA = jnp.zeros((qblk, seg), jnp.float32)
                for p in range(P):
                    c = l * P + p
                    if batch_io:
                        x = pkh[:, c:c + 1]
                        y = pkh[:, LP + c:LP + c + 1]
                        ww = pkh[:, 2 * LP + c:2 * LP + c + 1]
                    else:
                        x = pk_ref[0, :, base + c:base + c + 1]
                        y = pk_ref[0, :, base + LP + c:base + LP + c + 1]
                        ww = pk_ref[0, :, base + 2 * LP + c:base + 2 * LP + c + 1]
                    tcx = colf - x
                    tcy = rowf - y
                    tx = jnp.maximum(0.0, 1.0 - jnp.abs(tcx))
                    ty = jnp.maximum(0.0, 1.0 - jnp.abs(tcy))
                    if op_diet:
                        # derivative tents from the tents: sign gated by
                        # support; differs from v0 only at |tc| == 1 exactly
                        # (where the tent itself is 0)
                        dtx = jnp.where(tx > 0.0,
                                        jnp.where(tcx > 0.0, 1.0, -1.0), 0.0)
                        dty = jnp.where(ty > 0.0,
                                        jnp.where(tcy > 0.0, 1.0, -1.0), 0.0)
                        tyGV = ty * GV
                        txty = tx * ty
                        accA = accA + ww * txty
                        dw_col = jnp.sum(tx * tyGV, axis=1, keepdims=True)
                        dx_col = ww * jnp.sum(dtx * tyGV, axis=1, keepdims=True)
                        dy_col = ww * jnp.sum((tx * dty) * GV, axis=1,
                                              keepdims=True)
                    else:
                        prod = tx * ty
                        accA = accA + ww * prod
                        dw_col = jnp.sum(prod * GV, axis=1, keepdims=True)
                        dtx = jnp.where((tcx > -1.0) & (tcx <= 1.0),
                                        jnp.where(tcx > 0.0, 1.0, -1.0), 0.0)
                        dty = jnp.where((tcy > -1.0) & (tcy <= 1.0),
                                        jnp.where(tcy > 0.0, 1.0, -1.0), 0.0)
                        dx_col = ww * jnp.sum((dtx * ty) * GV, axis=1,
                                              keepdims=True)
                        dy_col = ww * jnp.sum((tx * dty) * GV, axis=1,
                                              keepdims=True)
                    if batch_io:
                        dxs[c], dys[c], dws[c] = dx_col, dy_col, dw_col
                    else:
                        dpk_ref[0, :, base + c:base + c + 1] = dx_col
                        dpk_ref[0, :, base + LP + c:base + LP + c + 1] = dy_col
                        dpk_ref[0, :, base + 2 * LP + c:base + 2 * LP + c + 1] = dw_col
                upd = jax.lax.dot_general(
                    accA, gout, (((0,), (0,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32)
                dval_ref[0, seg_offs[l]:seg_offs[l] + seg,
                         m * D:(m + 1) * D] += upd
            if batch_io:
                dpk_ref[0, :, base:base + 3 * LP] = jnp.concatenate(
                    dxs + dys + dws, axis=1)

    # ------------------------------------------------------------------
    def run(body, label):
        def call(pk, value_pad, gq):
            return pl.pallas_call(
                body,
                grid=(N, Lqp // qblk),
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
                    jax.ShapeDtypeStruct((N, S_pad, M * D), jnp.float32),
                    jax.ShapeDtypeStruct((N, Lqp, CK), jnp.float32),
                ],
                interpret=interpret,
            )(pk, value_pad, gq)

        outs = jax.jit(call)(pk, value_pad, gq)
        dt = device_timer(call, pk, value_pad, gq, iters=2 if tiny else 8)
        print(f"{dt * 1e3:9.2f} ms  {label}", flush=True)
        return outs, dt

    def relerr(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)

    (dval0, dpk0), t0 = run(body_v0, "v0 production bwd")
    for label, op_diet, batch_io in (
        ("v1 op-diet", True, False),
        ("v2 batched dpk IO", False, True),
        ("v3 op-diet + batched IO", True, True),
    ):
        body = functools.partial(body_opt, op_diet=op_diet, batch_io=batch_io)
        try:
            (dval, dpk), dt = run(body, label)
            print(f"          rel err dval={relerr(dval, dval0):.2e} "
                  f"dpk={relerr(dpk, dpk0):.2e}  speedup={t0 / dt:.3f}x",
                  flush=True)
        except Exception as e:
            print(f"          {label} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
