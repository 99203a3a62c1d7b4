"""Parity tests: the two-stage point-sample Pallas kernel vs the XLA
grid_sample composition (the functional spec of detectron2 `point_sample`,
ref: models/modeling/criterion.py:158-170), values AND gradients, in
interpret mode on CPU."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from combo_avs_tpu.ops import point_sample_pallas as psp
from combo_avs_tpu.ops.grid_sample import point_sample as point_sample_xla


def _inputs(N=2, H=13, W=9, C=3, P=700, seed=0, spread=1.4):
    rng = np.random.RandomState(seed)
    feat = rng.randn(N, H, W, C).astype(np.float32)
    # points mostly in [0,1] with some out of range (zero-padding corners)
    pts = (rng.rand(N, P, 2).astype(np.float32) * spread) - (spread - 1.0) / 2
    return jnp.asarray(feat), jnp.asarray(pts)


def _fwd_interpret(feat, pts):
    return psp._forward(feat, pts, interpret=True)


@pytest.mark.parametrize("shape", [(2, 13, 9, 3, 700), (1, 24, 16, 1, 512),
                                   (3, 7, 31, 2, 64)])
def test_forward_parity(shape):
    N, H, W, C, P = shape
    feat, pts = _inputs(N, H, W, C, P)
    ours = _fwd_interpret(feat, pts)
    ref = point_sample_xla(feat, pts)
    assert ours.shape == (N, P, C)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_forward_points_exactly_on_grid_and_corners():
    # integer pixel centers + exact border points exercise floor/validity edges
    N, H, W, C = 1, 8, 8, 1
    feat = jnp.asarray(np.arange(H * W, dtype=np.float32).reshape(1, H, W, 1))
    px = (np.arange(8) + 0.5) / W  # exact pixel centers
    pts = np.stack(np.meshgrid(px, px), -1).reshape(1, -1, 2).astype(np.float32)
    border = np.array([[[0, 0], [1, 1], [0, 1], [1, 0], [0.5, 0.5]]], np.float32)
    pts = jnp.asarray(np.concatenate([pts, border], axis=1))
    ours = _fwd_interpret(feat, pts)
    ref = point_sample_xla(feat, pts)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_gradient_parity():
    feat, pts = _inputs(N=2, H=11, W=14, C=2, P=300, spread=1.2)

    def loss_x(f, p):
        out = point_sample_xla(f, p)
        return (out * jnp.cos(out)).sum()

    # chain rule by hand to exercise the custom backward in interpret mode
    out = psp._forward(feat, pts, interpret=True)
    g = jnp.cos(out) - out * jnp.sin(out)
    df_k, dp_k = psp._backward(feat, pts, g, interpret=True)
    df_x, dp_x = jax.grad(loss_x, argnums=(0, 1))(feat, pts)
    np.testing.assert_allclose(np.asarray(df_k), np.asarray(df_x), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dp_k), np.asarray(dp_x), atol=1e-3, rtol=1e-3)


def test_gradient_parity_multi_channel_accumulation():
    # C > 1 exercises the channel fold + dpoints channel-sum
    feat, pts = _inputs(N=1, H=9, W=9, C=5, P=64, spread=1.0, seed=3)
    g = jnp.asarray(np.random.RandomState(1).randn(1, 64, 5).astype(np.float32))

    df_k, dp_k = psp._backward(feat, pts, g, interpret=True)

    def out_x(f, p):
        return point_sample_xla(f, p)

    _, vjp = jax.vjp(out_x, feat, pts)
    df_x, dp_x = vjp(g)
    np.testing.assert_allclose(np.asarray(df_k), np.asarray(df_x), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dp_k), np.asarray(dp_x), atol=1e-3, rtol=1e-3)


def test_group_chunking_path():
    # force the lax.map chunked path by shrinking the output-bytes cap
    feat, pts = _inputs(N=4, H=6, W=6, C=3, P=96, seed=5)
    orig = psp._MAX_OUT_BYTES
    try:
        psp._MAX_OUT_BYTES = 4 * psp.PBLK  # 2 groups per chunk at most
        ours = _fwd_interpret(feat, pts)
    finally:
        psp._MAX_OUT_BYTES = orig
    ref = point_sample_xla(feat, pts)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shape", [(2, 13, 9, 5, 700), (1, 16, 16, 100, 512),
                                   (3, 7, 31, 1, 300)])
def test_shared_points_forward_parity(shape):
    """Shared-points multichannel kernel (the matcher's shape: one point set
    sampling all channels) vs the XLA composition."""
    N, H, W, C, P = shape
    feat, pts = _inputs(N, H, W, C, P)
    ours = psp.point_sample_shared(feat, pts, interpret=True)
    ref = point_sample_xla(feat, pts)
    assert ours.shape == (N, P, C)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)


def test_shared_points_chunking_path():
    """P large enough to force the point-axis output chunking (n_pc > 1)."""
    N, H, W, C, P = 2, 8, 8, 128, 12544
    rng = np.random.RandomState(7)
    feat = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
    pts = jnp.asarray(rng.rand(N, P, 2).astype(np.float32))
    ours = psp.point_sample_shared(feat, pts, interpret=True)
    ref = point_sample_xla(feat, pts)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)
