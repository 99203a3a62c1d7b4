import os

import jax
import numpy as np

from combo_avs_tpu.config import setup_cfg
from combo_avs_tpu.losses.criterion import SetCriterion, build_weight_dict, total_loss
from combo_avs_tpu.losses.matcher import HungarianMatcher
from combo_avs_tpu.models.meta_arch import MaskFormer, build_model, semantic_inference

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "combo_avs_tpu", "configs")


def _tiny_model(**kw):
    return MaskFormer(dec_layers=2, enc_layers=1, num_queries=5, **kw)


def _batch(B=1, T=2, size=32):
    rng = np.random.RandomState(0)
    return (
        (rng.rand(B, T, size, size, 3) * 255).astype(np.float32),
        rng.randn(B, T, 96, 64).astype(np.float32),
        (rng.rand(B, T, size, size, 3) * 255).astype(np.float32),
    )


def test_forward_and_semantic_inference():
    m = _tiny_model()
    imgs, mel, pre = _batch()
    v = m.init(jax.random.PRNGKey(0), imgs, mel, pre)
    out = m.apply(v, imgs, mel, pre)
    assert out["pred_logits"].shape == (2, 5, 3)
    assert out["pred_masks"].shape == (2, 5, 8, 8)
    assert len(out["aux_outputs"]) == 2
    assert len(out["middles_attn_mask"]) == 2
    sem = semantic_inference(out["pred_logits"], out["pred_masks"], out_size=(32, 32))
    assert sem.shape == (2, 2, 32, 32)
    s = np.asarray(sem)
    # semseg sums softmax-prob x sigmoid over queries: bounded by [0, Q]
    assert s.min() >= 0 and s.max() <= 5


def test_build_model_from_config():
    cfg = setup_cfg(os.path.join(CFG_DIR, "avs_s4", "COMBO_R50_bs8_90k.yaml"))
    m = build_model(cfg)
    assert m.num_classes == 2 and m.dec_layers == 9 and m.use_pre_sam
    assert m.fusion_step == "late" and m.queries_fuse_type == "add"
    assert m.backbone_name == "build_resnet_backbone"
    cfg2 = setup_cfg(os.path.join(CFG_DIR, "avs_ss", "COMBO_PVTV2B5_bs8_90k.yaml"))
    m2 = build_model(cfg2)
    assert m2.num_classes == 71 and m2.backbone_name == "build_pvtv2_b5_backbone"
    assert m2.pre_sam_dim == (64, 128, 320, 512)


def test_train_loss_end_to_end():
    """Full pipeline: model forward -> criterion -> weighted scalar, grads."""
    m = _tiny_model()
    imgs, mel, pre = _batch()
    variables = m.init(jax.random.PRNGKey(0), imgs, mel, pre)
    params, frozen = variables["params"], variables["frozen"]

    K = 3
    rng = np.random.RandomState(1)
    targets = {
        "labels": rng.randint(0, 2, (2, K)).astype(np.int32),
        "masks": (rng.rand(2, K, 32, 32) > 0.5).astype(np.float32),
        "valid": np.array([[True, True, False], [True, False, False]]),
    }
    crit = SetCriterion(num_classes=2, matcher=HungarianMatcher(num_points=128),
                        num_points=128, cosine_n_frame=2)
    wd = {"loss_ce": 2.0, "loss_mask": 5.0, "loss_dice": 5.0,
          "loss_ce_0": 2.0, "loss_mask_0": 5.0, "loss_dice_0": 5.0,
          "loss_ce_1": 2.0, "loss_mask_1": 5.0, "loss_dice_1": 5.0,
          "loss_cosine_0": 10.0, "loss_cosine_1": 10.0}

    def loss_fn(p):
        out = m.apply({"params": p, "frozen": frozen}, imgs, mel, pre)
        losses = crit(jax.random.PRNGKey(2), out, targets)
        return total_loss(losses, wd)

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val)) and float(val) > 0
    # gradients flow to backbone, fusion, decoder -- but NOT to frozen vggish
    gb = grads["backbone"]
    assert any(float(np.abs(x).sum()) > 0 for x in jax.tree.leaves(gb))
    gaudio = grads["audio_backbone"]
    assert all(float(np.abs(x).sum()) == 0 for x in jax.tree.leaves(gaudio))
    gfuse = grads["sem_seg_head"]["fusion_module"]
    assert any(float(np.abs(x).sum()) > 0 for x in jax.tree.leaves(gfuse))
