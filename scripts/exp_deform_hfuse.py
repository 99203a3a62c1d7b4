"""Heads-fused deformable-attention forward: one grid cell per (frame,
q-block) processing all M heads, vs v0's per-(frame*head) cells.

Empirics (exp_deform_diag): v0's grid of B*M x q = 1440 cells pays ~2.5 ms
of pure grid/DMA overhead (empty kernel) of its 4.2 ms total. Folding the
M=8 heads into the cell cuts cells 8x and also returns output directly in
the caller's [B, Lq, M*D] layout (no per-head transposes host-side).

Usage:
  python scripts/exp_deform_hfuse.py --check   # CPU interpret parity
  python scripts/exp_deform_hfuse.py           # TPU timing vs v0
"""

import functools
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

LANE = 128


def _pad_to(n, m):
    return ((n + m - 1) // m) * m


def build():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from combo_avs_tpu.ops import deform_attn_pallas as dap

    def _prep_hfuse(value, spatial_shapes, loc, w, qblk):
        B, S, M, D = value.shape
        _, Lq, _, L, P, _ = loc.shape
        LP = L * P
        scale = jnp.asarray([[ww, hh] for hh, ww in spatial_shapes], jnp.float32)
        pix = loc * scale[None, None, None, :, None, :] - 0.5
        xs = pix[..., 0].reshape(B, Lq, M, LP)
        ys = pix[..., 1].reshape(B, Lq, M, LP)
        ws = w.reshape(B, Lq, M, LP)
        pk = jnp.concatenate([xs, ys, ws], -1).reshape(B, Lq, M * 3 * LP)
        qpad = (-Lq) % qblk
        if qpad:
            # pad coords with -10 (zero tents), weights don't matter then
            pk = jnp.pad(pk, ((0, 0), (0, qpad), (0, 0)), constant_values=-10.0)
        # value: [B, S, M*D] with 128-lane-aligned level segments on S
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
        L = len(shapes)
        LP = L * P
        for m in range(M):
            base = m * 3 * LP
            out = jnp.zeros((qblk, D), jnp.float32)
            for l, (H, W) in enumerate(shapes):
                seg = _pad_to(H * W, LANE)
                colf, rowf = dap._level_grids(H, W, seg)
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

    def fwd_hfuse(value, spatial_shapes, loc, w, qblk=128, interpret=False):
        B, S, M, D = value.shape
        _, Lq, _, L, P, _ = loc.shape
        pk, value_pad, seg_offs, Lqp = _prep_hfuse(value, spatial_shapes, loc, w, qblk)
        S_pad = value_pad.shape[1]
        CK = pk.shape[-1]
        precision = dap._precision_for(value)
        kern = functools.partial(
            _kernel_hfuse, shapes=tuple(spatial_shapes), seg_offs=seg_offs,
            M=M, P=P, D=D, qblk=qblk, precision=precision)
        out = pl.pallas_call(
            kern,
            grid=(B, Lqp // qblk),
            in_specs=[
                pl.BlockSpec((1, qblk, CK), lambda b, q: (b, q, 0)),
                pl.BlockSpec((1, S_pad, M * D), lambda b, q: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, qblk, M * D), lambda b, q: (b, q, 0)),
            out_shape=jax.ShapeDtypeStruct((B, Lqp, M * D), value.dtype),
            interpret=interpret,
        )(pk, value_pad)
        return out[:, :Lq]

    return fwd_hfuse


def main():
    import jax
    import jax.numpy as jnp

    from combo_avs_tpu.ops import deform_attn_pallas as dap
    from combo_avs_tpu.ops.deform_attn import ms_deform_attn as ms_xla

    check = "--check" in sys.argv
    if check:
        jax.config.update("jax_platforms", "cpu")

    fwd_hfuse = build()
    shapes = ((7, 7), (14, 14), (28, 28))
    S = sum(h * w for h, w in shapes)
    N = 4 if check else 20
    M, D, P, L = 8, 32, 4, 3
    Lq = S
    rng = np.random.RandomState(0)
    value = rng.randn(N, S, M, D).astype(np.float32)
    loc = (rng.rand(N, Lq, M, L, P, 2) * 1.2 - 0.1).astype(np.float32)
    w = rng.rand(N, Lq, M, L, P).astype(np.float32)
    w /= w.sum((-1, -2), keepdims=True)

    if check:
        ref = ms_xla(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
        out = fwd_hfuse(jnp.asarray(value), shapes, jnp.asarray(loc),
                        jnp.asarray(w), interpret=True)
        err = float(jnp.abs(out - ref).max())
        print(f"hfuse max_err={err:.2e}  {'OK' if err < 1e-4 else 'FAIL'}")
        return

    from combo_avs_tpu.utils.profiling import device_timer

    v16 = jnp.asarray(value, jnp.bfloat16)
    locj, wj = jnp.asarray(loc), jnp.asarray(w)
    ref = np.asarray(ms_xla(jnp.asarray(value), shapes, locj, wj), np.float32)

    f0 = lambda v, l, w_: dap.ms_deform_attn_pallas(v, shapes, l, w_)
    print(f"{device_timer(f0, v16, locj, wj, iters=32) * 1e3:8.3f} ms  v0 bf16",
          flush=True)
    for qblk in (128, 256, 512):
        f = lambda v, l, w_, q=qblk: fwd_hfuse(v, shapes, l, w_, qblk=q)
        out = np.asarray(f(v16, locj, wj), np.float32)
        err = np.abs(out - ref).max()
        dt = device_timer(f, v16, locj, wj, iters=32)
        print(f"{dt * 1e3:8.3f} ms  hfuse qblk={qblk} (err {err:.1e})", flush=True)


if __name__ == "__main__":
    main()
