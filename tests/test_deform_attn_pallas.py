"""Pallas deformable-attention kernel: parity vs the XLA composition.

On CPU the kernel runs in pallas interpret mode (the compiled path is
exercised on real TPU by bench.py and the TPU test drives)."""

import jax
import jax.numpy as jnp
import numpy as np

from combo_avs_tpu.ops.deform_attn import ms_deform_attn as xla_version
from combo_avs_tpu.ops.deform_attn_pallas import _forward, ms_deform_attn

SHAPES = ((4, 6), (2, 3))
B, M, D, Lq, P = 2, 2, 8, 37, 3
S = sum(h * w for h, w in SHAPES)


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    value = rng.randn(B, S, M, D).astype(np.float32)
    loc = rng.uniform(-0.2, 1.2, (B, Lq, M, len(SHAPES), P, 2)).astype(np.float32)
    w = rng.rand(B, Lq, M, len(SHAPES), P).astype(np.float32)
    w /= w.reshape(B, Lq, M, -1).sum(-1)[..., None, None]
    return value, loc, w


def test_pallas_forward_matches_xla_interpret():
    value, loc, w = _inputs()
    ref = np.asarray(xla_version(value, SHAPES, loc, w))
    out = np.asarray(_forward(value, SHAPES, loc, w, interpret=True))
    assert out.shape == ref.shape == (B, Lq, M * D)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_pallas_oob_zero_padding_interpret():
    value, loc, w = _inputs(1)
    loc_oob = np.full_like(loc, 7.0)
    out = np.asarray(_forward(value, SHAPES, loc_oob, w, interpret=True))
    np.testing.assert_array_equal(out, 0)


def test_hfuse_forward_matches_xla_interpret():
    """The heads-fused production forward (all M heads per grid cell,
    [B, Lq, M*D] output layout) must match the XLA composition."""
    from combo_avs_tpu.ops.deform_attn_pallas import _forward_hfuse

    value, loc, w = _inputs(5)
    ref = np.asarray(xla_version(value, SHAPES, loc, w))
    out = np.asarray(_forward_hfuse(value, SHAPES, loc, w, interpret=True))
    assert out.shape == ref.shape == (B, Lq, M * D)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_hfuse_forward_chunked_interpret(monkeypatch):
    """Frame-axis chunking under the scoped-vmem output cap is exact."""
    from combo_avs_tpu.ops import deform_attn_pallas as dap

    value, loc, w = _inputs(6)
    ref = np.asarray(dap._forward_hfuse(value, SHAPES, loc, w, interpret=True))
    monkeypatch.setattr(dap, "_MAX_OUT_BYTES_HF", 1)  # force 1-frame chunks
    out = np.asarray(dap._forward_hfuse(value, SHAPES, loc, w, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_hfuse_oob_zero_padding_interpret():
    from combo_avs_tpu.ops.deform_attn_pallas import _forward_hfuse

    value, loc, w = _inputs(7)
    loc_oob = np.full_like(loc, -3.0)
    out = np.asarray(_forward_hfuse(value, SHAPES, loc_oob, w, interpret=True))
    np.testing.assert_array_equal(out, 0)


def test_dispatch_falls_back_on_cpu():
    # tests run on CPU: the dispatcher must route to the XLA composition
    value, loc, w = _inputs(2)
    out = np.asarray(ms_deform_attn(value, SHAPES, loc, w))
    ref = np.asarray(xla_version(value, SHAPES, loc, w))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_fused_backward_kernel_matches_xla_grads():
    """The fused Pallas backward (dV = A^T g on the MXU + per-corner GV
    extraction for dloc/dweight) must match autodiff of the XLA composition
    (the reference col2im kernels' spec, ref: ms_deform_im2col_cuda.cuh:
    307-1020)."""
    from combo_avs_tpu.ops.deform_attn_pallas import _backward

    value, loc, w = _inputs(3)
    g = np.random.RandomState(9).randn(B, Lq, M * D).astype(np.float32)

    def f_xla(v, l, a):
        return (xla_version(v, SHAPES, l, a) * g).sum()

    gv_ref = jax.grad(f_xla, argnums=(0, 1, 2))(value, loc, w)
    dv, dl, dw = _backward(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w),
        jnp.asarray(g), interpret=True,
    )
    for name, a, b in zip("value loc weight".split(), gv_ref, (dv, dl, dw)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4, err_msg=name
        )


def test_fused_backward_oob_and_padded_queries():
    """OOB sampling corners contribute zero to every gradient (grid_sample
    zero-padding), including through the query-padding path."""
    from combo_avs_tpu.ops.deform_attn_pallas import _backward

    value, loc, w = _inputs(4)
    loc_oob = loc.copy()
    loc_oob[:, ::3] = 9.0  # every third query fully out of bounds
    g = np.random.RandomState(3).randn(B, Lq, M * D).astype(np.float32)

    def f_xla(v, l, a):
        return (xla_version(v, SHAPES, l, a) * g).sum()

    gv_ref = jax.grad(f_xla, argnums=(0, 1, 2))(value, loc_oob, w)
    dv, dl, dw = _backward(
        jnp.asarray(value), SHAPES, jnp.asarray(loc_oob), jnp.asarray(w),
        jnp.asarray(g), interpret=True,
    )
    for a, b in zip(gv_ref, (dv, dl, dw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
    # OOB queries produce exactly zero dloc/dweight
    np.testing.assert_array_equal(np.asarray(dl)[:, ::3], 0)
    np.testing.assert_array_equal(np.asarray(dw)[:, ::3], 0)


def test_fused_backward_group_chunking():
    """Force the lax.map group-chunked path."""
    import combo_avs_tpu.ops.deform_attn_pallas as dap

    value, loc, w = _inputs(5)
    g = np.random.RandomState(5).randn(B, Lq, M * D).astype(np.float32)
    full = dap._backward(jnp.asarray(value), SHAPES, jnp.asarray(loc),
                         jnp.asarray(w), jnp.asarray(g), interpret=True)
    orig = dap._MAX_OUT_BYTES
    try:
        dap._MAX_OUT_BYTES = 1  # 1 group per chunk
        chunked = dap._backward(jnp.asarray(value), SHAPES, jnp.asarray(loc),
                                jnp.asarray(w), jnp.asarray(g), interpret=True)
    finally:
        dap._MAX_OUT_BYTES = orig
    for a, b in zip(full, chunked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_hfuse_backward_matches_xla_grads():
    """The heads-fused backward (the production VJP) matches autodiff of the
    XLA composition and the per-head `_backward` baseline."""
    from combo_avs_tpu.ops.deform_attn_pallas import _backward, _backward_hfuse

    value, loc, w = _inputs(8)
    g = np.random.RandomState(11).randn(B, Lq, M * D).astype(np.float32)

    def f_xla(v, l, a):
        return (xla_version(v, SHAPES, l, a) * g).sum()

    gv_ref = jax.grad(f_xla, argnums=(0, 1, 2))(value, loc, w)
    out_h = _backward_hfuse(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w),
        jnp.asarray(g), interpret=True,
    )
    out_v0 = _backward(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w),
        jnp.asarray(g), interpret=True,
    )
    for name, a, b, c in zip("value loc weight".split(), gv_ref, out_h, out_v0):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4, err_msg=name)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(c), atol=1e-5, rtol=1e-5, err_msg=name)


def test_hfuse_backward_chunked_interpret(monkeypatch):
    from combo_avs_tpu.ops import deform_attn_pallas as dap

    value, loc, w = _inputs(9)
    g = np.random.RandomState(12).randn(B, Lq, M * D).astype(np.float32)
    ref = dap._backward_hfuse(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w),
        jnp.asarray(g), interpret=True)
    monkeypatch.setattr(dap, "_MAX_OUT_BYTES_HF", 1)  # force 1-frame chunks
    out = dap._backward_hfuse(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w),
        jnp.asarray(g), interpret=True)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
