"""Microbench of the Pallas deformable-attention kernel at the S4 eval shape.

Times forward (bf16 + fp32) and forward+backward of `ms_deform_attn_pallas`
against the XLA composition, using the on-device loop timer (axon-safe).

Usage: python scripts/bench_deform_kernel.py [--train]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from combo_avs_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas
    from combo_avs_tpu.utils.profiling import device_timer

    train = "--train" in sys.argv
    N = 40 if train else 20  # frames (bs8 train vs bs4 eval)
    shapes = ((7, 7), (14, 14), (28, 28))
    S = sum(h * w for h, w in shapes)
    M, D, P, L = 8, 32, 4, len(shapes)
    Lq = S
    rng = np.random.RandomState(0)
    value = rng.randn(N, S, M, D).astype(np.float32)
    loc = rng.rand(N, Lq, M, L, P, 2).astype(np.float32)
    w = rng.rand(N, Lq, M, L, P).astype(np.float32)
    w /= w.sum((-1, -2), keepdims=True)

    for dtype in (jnp.bfloat16, jnp.float32):
        v = jnp.asarray(value, dtype)
        fn = lambda v, loc, w: ms_deform_attn_pallas(v, shapes, loc, w)
        dt = device_timer(fn, v, jnp.asarray(loc), jnp.asarray(w), iters=32)
        print(f"forward  {dtype.__name__:9s}: {dt * 1e3:7.3f} ms")
        if train:
            def fwdbwd(v, loc, w):
                def loss(args):
                    return ms_deform_attn_pallas(args[0], shapes, args[1], args[2]).sum()
                return jax.grad(loss)((v, loc, w))[0]
            dt = device_timer(fwdbwd, v, jnp.asarray(loc), jnp.asarray(w), iters=16)
            print(f"fwd+bwd  {dtype.__name__:9s}: {dt * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
