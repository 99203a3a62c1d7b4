"""Round-4 gate: prove the PRODUCTION heads-fused deform-attn kernels
(forward `_forward_hfuse` + backward `_bwd_kernel_hfuse`,
ops/deform_attn_pallas.py) compile and match on REAL Mosaic.

Round 3 swapped these into production (642d6cd fwd, 7436b7d bwd) with only
CPU interpret-mode parity — and interpret mode accepts programs real Mosaic
rejects (float iota, layout constraints; see CLAUDE.md). This script runs
fwd + VJP on the chip at the pixel-decoder's production eval shapes and the
train shapes, comparing numerics against the pure-XLA composition
(ops/deform_attn.py ms_deform_attn + jax autodiff).

Exit 0 = both kernels ran on Mosaic and matched (fp32 tol 2e-3 vs XLA).
Any Mosaic compile error surfaces as a traceback / nonzero exit — in that
case production training on TPU is broken at HEAD and the kernel must be
fixed or reverted to the per-head `_backward`.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def run_case(name, B, shapes, Lq, M=8, D=32, P=4):
    import jax
    import jax.numpy as jnp

    from combo_avs_tpu.ops.deform_attn import ms_deform_attn as ms_xla
    from combo_avs_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas

    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, M, D).astype(np.float32))
    loc = jnp.asarray((rng.rand(B, Lq, M, L, P, 2) * 1.2 - 0.1).astype(np.float32))
    w = rng.rand(B, Lq, M, L, P).astype(np.float32)
    w = jnp.asarray(w / w.sum((-1, -2), keepdims=True))

    def loss_pallas(v, l, a):
        return (ms_deform_attn_pallas(v, shapes, l, a) ** 2).sum()

    def loss_xla(v, l, a):
        return (ms_xla(v, shapes, l, a) ** 2).sum()

    fwd_p = jax.jit(lambda v, l, a: ms_deform_attn_pallas(v, shapes, l, a))
    fwd_x = jax.jit(lambda v, l, a: ms_xla(v, shapes, l, a))
    grad_p = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))
    grad_x = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))

    out_p = np.asarray(fwd_p(value, loc, w))
    out_x = np.asarray(fwd_x(value, loc, w))
    ferr = np.abs(out_p - out_x).max() / max(np.abs(out_x).max(), 1e-6)
    gp = grad_p(value, loc, w)
    gx = grad_x(value, loc, w)
    gerrs = []
    for a, b in zip(gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        gerrs.append(np.abs(a - b).max() / max(np.abs(b).max(), 1e-6))
    ok = ferr < 2e-3 and all(e < 2e-3 for e in gerrs)
    print(f"[{name}] fwd rel_err {ferr:.2e}  grad rel_errs "
          + " ".join(f"{e:.2e}" for e in gerrs)
          + ("  OK" if ok else "  FAIL"), flush=True)
    return ok


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    assert jax.default_backend() != "cpu", (
        "this proof must run on the real chip (interpret-mode parity already "
        "exists in tests/test_deform_attn_pallas.py)")
    ok = True
    # production eval shapes: pixel decoder, 224^2 input -> levels 28/14/7,
    # B = videos*frames (bs4 eval x 5f = 20 frames)
    ok &= run_case("eval-224", B=20,
                   shapes=((28, 28), (14, 14), (7, 7)), Lq=28 * 28 + 14 * 14 + 7 * 7)
    # train shapes: bs8 x 5 frames = 40
    ok &= run_case("train-224", B=40,
                   shapes=((28, 28), (14, 14), (7, 7)), Lq=28 * 28 + 14 * 14 + 7 * 7)
    print("HFUSE_PROOF", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
