import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from combo_avs_tpu.models.pixel_decoder import (
    MSDeformAttnPixelDecoder,
    _directional_offset_bias,
    encoder_reference_points,
)


def test_fpn_bilinear_upsample_matches_torch():
    # the FPN merge uses bilinear align_corners=False upsampling
    # (ref: msdeformattn.py:291); jax.image.resize must match
    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, 7, 5).astype(np.float32)
    ours = np.asarray(jax.image.resize(jnp.asarray(x), (2, 14, 14, 5), "bilinear"))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(14, 14),
        mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # and the 28->56 case used at stride 8 -> 4
    x = rng.randn(1, 28, 28, 3).astype(np.float32)
    ours = np.asarray(jax.image.resize(jnp.asarray(x), (1, 56, 56, 3), "bilinear"))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(56, 56),
        mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_directional_offset_bias_init():
    init = _directional_offset_bias(8, 3, 4)
    b = np.asarray(init(jax.random.PRNGKey(0), None)).reshape(8, 3, 4, 2)
    # head 0 points along +x, scaled by point index
    np.testing.assert_allclose(b[0, 0], [[1, 0], [2, 0], [3, 0], [4, 0]], atol=1e-6)
    # head 2 (theta=pi/2) points along +y
    np.testing.assert_allclose(b[2, 1], [[0, 1], [0, 2], [0, 3], [0, 4]], atol=1e-5)
    # diagonal heads normalized to unit max-component
    assert abs(abs(b[1, 0, 0]).max() - 1.0) < 1e-6
    # all levels share the same ring
    np.testing.assert_allclose(b[:, 0], b[:, 2], atol=1e-6)


def test_reference_points_static():
    ref = encoder_reference_points(((2, 2), (1, 1)))
    assert ref.shape == (5, 2, 2)
    np.testing.assert_allclose(ref[0, 0], [0.25, 0.25])
    np.testing.assert_allclose(ref[3, 0], [0.75, 0.75])
    np.testing.assert_allclose(ref[4, 0], [0.5, 0.5])
    # identical across levels (valid ratios are 1)
    np.testing.assert_allclose(ref[:, 0], ref[:, 1])


def test_pixel_decoder_end_to_end_shapes_and_grads():
    B = 2
    feats = {
        "res2": np.random.RandomState(0).randn(B, 16, 16, 32).astype(np.float32),
        "res3": np.random.RandomState(1).randn(B, 8, 8, 64).astype(np.float32),
        "res4": np.random.RandomState(2).randn(B, 4, 4, 128).astype(np.float32),
        "res5": np.random.RandomState(3).randn(B, 2, 2, 256).astype(np.float32),
    }
    dec = MSDeformAttnPixelDecoder(conv_dim=64, mask_dim=48, enc_layers=2, d_ffn=128)
    variables = dec.init(jax.random.PRNGKey(0), feats)
    mask_features, out0, ms = jax.jit(lambda v, f: dec.apply(v, f))(variables, feats)
    assert mask_features.shape == (B, 16, 16, 48)
    assert out0.shape == (B, 2, 2, 64)
    assert [m.shape for m in ms] == [(B, 2, 2, 64), (B, 4, 4, 64), (B, 8, 8, 64)]

    def loss(v):
        mf, o0, m = dec.apply(v, feats)
        return (mf**2).mean() + (m[2] ** 2).mean()

    g = jax.grad(loss)(variables)
    gnorm = sum(float((x**2).sum()) for x in jax.tree.leaves(g["params"]))
    assert np.isfinite(gnorm) and gnorm > 0
    # scanned encoder params are stacked over 2 layers
    assert g["params"]["encoder"]["self_attn"]["value_proj"]["kernel"].shape[0] == 2


def test_remat_policy_save_deform_grads_match():
    # remat_policy="save_deform" keeps the named deformable-kernel output as
    # a residual (skipping the Pallas forward replay on TPU); rematerialization
    # must not change gradients at all
    B = 2
    rng = np.random.RandomState(7)
    feats = {
        "res2": rng.randn(B, 16, 16, 32).astype(np.float32),
        "res3": rng.randn(B, 8, 8, 64).astype(np.float32),
        "res4": rng.randn(B, 4, 4, 128).astype(np.float32),
        "res5": rng.randn(B, 2, 2, 256).astype(np.float32),
    }
    kw = dict(conv_dim=64, mask_dim=48, enc_layers=2, d_ffn=128)
    base = MSDeformAttnPixelDecoder(**kw)
    variables = base.init(jax.random.PRNGKey(0), feats)

    def grads(dec):
        def loss(v):
            mf, _, ms = dec.apply(v, feats)
            return (mf**2).mean() + (ms[2] ** 2).mean()

        return jax.jit(jax.grad(loss))(variables)

    g0 = grads(base)
    g1 = grads(MSDeformAttnPixelDecoder(remat_policy="save_deform", **kw))
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
