"""Locate the deformable-kernel cost: grid/DMA overhead vs tent chain vs MXU.

Variants (all same grid/BlockSpecs as v0 unless noted):
  v0        the real kernel
  empty     writes zeros; measures grid sequencing + input DMA cost
  tentonly  tent accumulate, out = acc column slice (no MXU matmul)
  matonly   matmul of a constant acc (no tent chain)
  qblk256   real kernel, 256-query blocks (half the grid cells)
  gswap     real kernel, grid=(q, g) so the value block re-fetches per cell

Usage: python scripts/exp_deform_diag.py
"""

import functools
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

LANE = 128


def _pad_to(n, m):
    return ((n + m - 1) // m) * m


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from combo_avs_tpu.ops import deform_attn_pallas as dap
    from combo_avs_tpu.utils.profiling import device_timer

    shapes = ((7, 7), (14, 14), (28, 28))
    S = sum(h * w for h, w in shapes)
    N, M, D, P, L = 20, 8, 32, 4, 3
    Lq = S
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(N, S, M, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(N, Lq, M, L, P, 2) * 1.2 - 0.1, jnp.float32)
    w = jnp.asarray(rng.rand(N, Lq, M, L, P), jnp.float32)
    w = w / w.sum((-1, -2), keepdims=True)

    def make(kernel_body, qblk=128, swap_grid=False):
        def fwd(value, loc, w):
            B, S_, M_, D_ = value.shape
            G = B * M_
            xs, ys, ws, value_pad, seg_offs, Lqp = dap._prep(value, shapes, loc, w, qblk)
            S_pad = value_pad.shape[1]
            kern = functools.partial(
                kernel_body, shapes=shapes, seg_offs=tuple(seg_offs),
                P=P, D=D_, qblk=qblk)
            if swap_grid:
                grid = (Lqp // qblk, G)
                qg = lambda q, g: (g, q, 0)
                vg = lambda q, g: (g, 0, 0)
            else:
                grid = (G, Lqp // qblk)
                qg = lambda g, q: (g, q, 0)
                vg = lambda g, q: (g, 0, 0)
            out = pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, qblk, L * P), qg),
                    pl.BlockSpec((1, qblk, L * P), qg),
                    pl.BlockSpec((1, qblk, L * P), qg),
                    pl.BlockSpec((1, S_pad, D_), vg),
                ],
                out_specs=pl.BlockSpec((1, qblk, D_), qg),
                out_shape=jax.ShapeDtypeStruct((G, Lqp, D_), value.dtype),
            )(xs, ys, ws, value_pad)
            return out[:, :Lq]
        return fwd

    def k_v0(xs_ref, ys_ref, ws_ref, value_ref, out_ref, *, shapes, seg_offs, P, D, qblk):
        dap._kernel(xs_ref, ys_ref, ws_ref, value_ref, out_ref, shapes=shapes,
                    seg_offs=seg_offs, P=P, D=D,
                    precision=jax.lax.Precision.DEFAULT, qblk=qblk)

    def k_empty(xs_ref, ys_ref, ws_ref, value_ref, out_ref, *, shapes, seg_offs, P, D, qblk):
        out_ref[0] = (xs_ref[0, :, :1] * 0.0 + value_ref[0, :1, :1]).astype(out_ref.dtype) * jnp.zeros((qblk, D), out_ref.dtype)

    def k_tentonly(xs_ref, ys_ref, ws_ref, value_ref, out_ref, *, shapes, seg_offs, P, D, qblk):
        out = jnp.zeros((qblk, D), jnp.float32)
        for l, (H, W) in enumerate(shapes):
            seg = _pad_to(H * W, LANE)
            colf, rowf = dap._level_grids(H, W, seg)
            acc = jnp.zeros((qblk, seg), jnp.float32)
            for p in range(P):
                c = l * P + p
                x = xs_ref[0, :, c:c + 1]
                y = ys_ref[0, :, c:c + 1]
                ww = ws_ref[0, :, c:c + 1]
                tx = jnp.maximum(0.0, 1.0 - jnp.abs(colf - x))
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(rowf - y))
                acc = acc + (ww * tx) * ty
            out = out + acc[:, :D] + value_ref[0, :1, :1].astype(jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)

    def k_matonly(xs_ref, ys_ref, ws_ref, value_ref, out_ref, *, shapes, seg_offs, P, D, qblk):
        out = jnp.zeros((qblk, D), jnp.float32)
        for l, (H, W) in enumerate(shapes):
            seg = _pad_to(H * W, LANE)
            acc = (jnp.zeros((qblk, seg), jnp.float32)
                   + xs_ref[0, :, l:l + 1] * 1e-6)
            v = value_ref[0, seg_offs[l]:seg_offs[l] + seg, :]
            out = out + jax.lax.dot(acc, v.astype(jnp.float32),
                                    precision=jax.lax.Precision.DEFAULT,
                                    preferred_element_type=jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)

    rows = []
    for name, fn in [
        ("v0", make(k_v0)),
        ("empty", make(k_empty)),
        ("tentonly", make(k_tentonly)),
        ("matonly", make(k_matonly)),
        ("qblk256", make(k_v0, qblk=256)),
        ("qblk512", make(k_v0, qblk=512)),
        ("gswap", make(k_v0, swap_grid=True)),
    ]:
        dt = device_timer(fn, value, loc, w, iters=32)
        rows.append((name, dt))
        print(f"{dt * 1e3:8.3f} ms  {name}", flush=True)


if __name__ == "__main__":
    main()
