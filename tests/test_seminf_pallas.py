"""Parity: fused semantic-inference kernel vs the XLA composition.

The kernel (ops/seminf_pallas.py) must reproduce meta_arch.semantic_inference's
resize -> sigmoid -> class-contract chain (ref: maskformer_model.py:397-402,
460-471) without materializing the [N, Q, H, W] intermediate. Interpret mode
on CPU; the on-chip proof runs in scripts/exp_eval_secondary.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from combo_avs_tpu.ops.seminf_pallas import resize_matrix, seminf_fits, seminf_pallas


def _xla_ref(cls_sm, mask, out_size):
    N, Q = mask.shape[:2]
    up = jax.image.resize(mask, (N, Q, *out_size), "bilinear")
    return jnp.einsum(
        "nqc,nqhw->nchw", cls_sm.astype(jnp.float32), jax.nn.sigmoid(up),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32)


def test_resize_matrix_exact():
    x = jnp.asarray(np.random.RandomState(0).randn(16, 24).astype(np.float32))
    direct = jax.image.resize(x, (64, 24), "bilinear")
    via_mat = resize_matrix(16, 64) @ x
    np.testing.assert_allclose(np.asarray(via_mat), np.asarray(direct), atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_seminf_parity(dtype):
    rng = np.random.RandomState(1)
    N, Q, h, w, C, H, W = 3, 10, 16, 16, 2, 64, 64
    assert seminf_fits(Q, C, h, w, H, W)
    mask = jnp.asarray(rng.randn(N, Q, h, w).astype(np.float32) * 4).astype(dtype)
    cls = jax.nn.softmax(jnp.asarray(rng.randn(N, Q, C + 1).astype(np.float32)))[..., :-1]
    out = seminf_pallas(cls, mask, (H, W), interpret=True)
    ref = _xla_ref(cls, mask, (H, W))
    atol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=atol)
    assert out.dtype == jnp.float32


def test_seminf_chunked_and_production_shape_downscaled():
    # production-aspect shapes scaled down 4x (Q=100 kept; N chosen so the
    # _MAX_OUT_BYTES chunking path is NOT hit at this size, then forced)
    rng = np.random.RandomState(2)
    N, Q, h, w, C, H, W = 4, 100, 16, 16, 2, 64, 64
    mask = jnp.asarray(rng.randn(N, Q, h, w).astype(np.float32))
    cls = jax.nn.softmax(jnp.asarray(rng.randn(N, Q, C + 1).astype(np.float32)))[..., :-1]
    out = seminf_pallas(cls, mask, (H, W), interpret=True)
    ref = _xla_ref(cls, mask, (H, W))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    import combo_avs_tpu.ops.seminf_pallas as sp

    old = sp._MAX_OUT_BYTES
    sp._MAX_OUT_BYTES = C * H * W * 4  # force gc=1 -> lax.map chunk path
    try:
        out2 = seminf_pallas(cls, mask, (H, W), interpret=True)
    finally:
        sp._MAX_OUT_BYTES = old
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-6)


def test_fits_gate():
    assert seminf_fits(100, 2, 56, 56, 224, 224)  # S4/MS3 production eval
    assert not seminf_fits(100, 71, 56, 56, 224, 224)  # AVSS -> XLA einsum
    assert not seminf_fits(100, 2, 56, 56, 28, 28)  # downscale -> XLA
    assert not seminf_fits(100, 2, 57, 57, 224, 224)  # unaligned h
