"""Registry, FPN decoder alternatives, 3D PE, visual helpers, AMP step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from combo_avs_tpu.models.fpn_decoder import BasePixelDecoder, TransformerEncoderPixelDecoder
from combo_avs_tpu.models.position_encoding import sine_position_encoding_3d
from combo_avs_tpu.utils.registry import SEM_SEG_HEADS_REGISTRY, Registry


def _feats(B=2):
    rng = np.random.RandomState(0)
    return {
        "res2": rng.rand(B, 16, 16, 32).astype(np.float32),
        "res3": rng.rand(B, 8, 8, 64).astype(np.float32),
        "res4": rng.rand(B, 4, 4, 128).astype(np.float32),
        "res5": rng.rand(B, 2, 2, 256).astype(np.float32),
    }


def test_registry():
    r = Registry("test")

    @r.register
    def thing():
        return 1

    assert r.get("thing")() == 1
    assert "thing" in r
    with pytest.raises(KeyError):
        r.get("missing")
    with pytest.raises(KeyError):
        r.register(thing)
    # the three pixel decoders are registered
    for name in ("MSDeformAttnPixelDecoder", "BasePixelDecoder",
                 "TransformerEncoderPixelDecoder"):
        import combo_avs_tpu.models.head  # noqa: F401 triggers registration

        assert name in SEM_SEG_HEADS_REGISTRY


def test_base_pixel_decoder():
    feats = _feats()
    dec = BasePixelDecoder(conv_dim=64, mask_dim=48)
    v = dec.init(jax.random.PRNGKey(0), feats)
    mf, t, ms = dec.apply(v, feats)
    assert mf.shape == (2, 16, 16, 48)
    assert t is None
    assert [m.shape for m in ms] == [(2, 2, 2, 64), (2, 4, 4, 64), (2, 8, 8, 64)]


def test_transformer_encoder_pixel_decoder():
    feats = _feats()
    dec = TransformerEncoderPixelDecoder(conv_dim=64, mask_dim=48, enc_layers=2,
                                         nheads=4, dim_feedforward=128)
    v = dec.init(jax.random.PRNGKey(0), feats)
    mf, t, ms = dec.apply(v, feats)
    assert mf.shape == (2, 16, 16, 48)
    assert t.shape == (2, 2, 2, 64)  # transformer-refined res5


def test_head_with_fpn_decoder():
    from combo_avs_tpu.models.head import MaskFormerHead

    feats = _feats()
    audio = np.random.RandomState(1).randn(2, 1, 128).astype(np.float32)
    head = MaskFormerHead(
        num_classes=2, conv_dim=64, mask_dim=64, hidden_dim=64,
        num_queries=4, nheads=4, dim_feedforward=64, dec_layers=1,
        audio_out_dim=64, pixel_decoder_name="BasePixelDecoder",
    )
    v = head.init(jax.random.PRNGKey(0), feats, audio)
    out = head.apply(v, feats, audio)
    assert out["pred_masks"].shape == (2, 4, 16, 16)


def test_sine_pe_3d():
    pe = sine_position_encoding_3d(4, 5, 6, num_pos_feats=8)
    assert pe.shape == (4, 5, 6, 24)
    assert np.isfinite(pe).all()
    # temporal block varies along T only
    assert np.abs(pe[0, :, :, :8] - pe[0, 0, 0, :8]).max() < 1e-6
    assert np.abs(pe[0, 0, 0, :8] - pe[3, 0, 0, :8]).max() > 0.1


def test_visual_helpers(tmp_path):
    from combo_avs_tpu.evaluation.visual import (
        binary_color_map, colorize, mean_iou, save_mask_png, v2_pallete,
    )

    pal = v2_pallete(71)
    assert pal.shape == (71, 3) and (pal[0] == 0).all()
    m = np.random.RandomState(0).randint(0, 71, (8, 8))
    rgb = colorize(m, pal)
    assert rgb.shape == (8, 8, 3)
    assert mean_iou(np.ones((2, 4, 4)), np.ones((2, 4, 4))) > 0.99
    save_mask_png(str(tmp_path / "m.png"), (m > 35).astype(np.uint8), binary_color_map())
    assert (tmp_path / "m.png").exists()


def test_amp_train_step():
    from combo_avs_tpu.config import get_cfg
    from combo_avs_tpu.losses.criterion import SetCriterion
    from combo_avs_tpu.losses.matcher import HungarianMatcher
    from combo_avs_tpu.models.meta_arch import MaskFormer
    from combo_avs_tpu.train.optim import build_optimizer
    from combo_avs_tpu.train.train_step import create_train_state, make_train_step

    model = MaskFormer(dec_layers=1, enc_layers=1, num_queries=4, deterministic=False)
    rng = np.random.RandomState(0)
    B, T, S, K = 1, 2, 32, 2
    batch = {
        "images": (rng.rand(B, T, S, S, 3) * 255).astype(np.float32),
        "audio_log_mel": rng.randn(B, T, 96, 64).astype(np.float32),
        "pre_masks": (rng.rand(B, T, S, S, 3) * 255).astype(np.float32),
        "labels": np.zeros((B, T, K), np.int32),
        "masks": (rng.rand(B, T, K, S, S) > 0.5).astype(np.float32),
        "valid": np.ones((B, T, K), bool),
        "gt_temporal_mask": np.ones((B, T), np.float32),
    }
    cfg = get_cfg()
    crit = SetCriterion(2, HungarianMatcher(num_points=64), num_points=64, cosine_n_frame=2)
    wd = {}
    for s in ("", "_0"):
        wd.update({f"loss_ce{s}": 2.0, f"loss_mask{s}": 5.0, f"loss_dice{s}": 5.0})
    wd["loss_cosine_0"] = 10.0
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["images"], batch["audio_log_mel"], batch["pre_masks"], None)
    optimizer, _ = build_optimizer(cfg, variables["params"])
    state = create_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, crit, wd, optimizer, amp=True)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["total_loss"]))
    # master params stay float32
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(new_state.params)
               if hasattr(p, "dtype") and p.dtype != jnp.int32)
