import os

import pytest

from combo_avs_tpu.config import CfgNode, get_cfg, setup_cfg

HERE = os.path.dirname(os.path.abspath(__file__))
CFG_DIR = os.path.join(HERE, "..", "combo_avs_tpu", "configs")


def test_defaults_surface():
    cfg = get_cfg()
    assert cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES == 100
    assert cfg.MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME == "MSDeformAttnPixelDecoder"
    assert cfg.MODEL.FUSE_CONFIG.TYPE == "MHA-B"
    assert cfg.SOLVER.OPTIMIZER == "ADAMW"


def test_base_inheritance_and_overrides():
    path = os.path.join(CFG_DIR, "avs_s4", "COMBO_R50_bs8_90k.yaml")
    cfg = setup_cfg(path)
    # from derived file
    assert cfg.MODEL.FUSE_CONFIG.FUSION_STEP == "late"
    assert cfg.MODEL.MASK_FORMER.DEC_LAYERS == 10
    assert cfg.MODEL.MASK_FORMER.COSINE_WEIGHT == 10.0
    assert cfg.MODEL.PRE_SAM.USE_PRE_SAM is True
    # from base file
    assert cfg.SOLVER.MAX_ITER == 90000
    assert cfg.MODEL.BACKBONE.NAME == "build_resnet_backbone"
    assert cfg.DATASETS.TRAIN == ("avss4_sem_seg_train",)
    assert cfg.INPUT.CROP.SIZE == (224, 224)
    # eval'd scale list semantics
    assert cfg.INPUT.MIN_SIZE_TRAIN == [int(x * 0.1 * 224) for x in range(5, 21)]


def test_all_presets_load():
    for bench in ("avs_s4", "avs_ms3", "avs_ss"):
        d = os.path.join(CFG_DIR, bench)
        for name in os.listdir(d):
            if name.endswith(".yaml"):
                cfg = setup_cfg(os.path.join(d, name))
                assert cfg.MODEL.MASK_FORMER.HIDDEN_DIM == 256


def test_variant_matrix():
    ms3 = setup_cfg(os.path.join(CFG_DIR, "avs_ms3", "COMBO_R50_bs8_20k.yaml"))
    assert ms3.SOLVER.MAX_ITER == 20000
    assert ms3.TEST.EVAL_PERIOD == 400
    ss = setup_cfg(os.path.join(CFG_DIR, "avs_ss", "COMBO_PVTV2B5_bs8_90k.yaml"))
    assert ss.MODEL.SEM_SEG_HEAD.NUM_CLASSES == 71
    assert ss.MODEL.FUSE_CONFIG.NUM_FRAMES == 10
    assert ss.SOLVER.AMP.ENABLED is True
    assert ss.MODEL.PRE_SAM.PRE_SAM_DIM == [64, 128, 320, 512]
    t = setup_cfg(os.path.join(CFG_DIR, "avs_s4", "Test_COMBO_R50_bs8_90k.yaml"))
    assert t.DATASETS.TEST == ("avss4_sem_seg_test",)
    assert t.SOLVER.IMS_PER_BATCH == 2


def test_freeze_and_cli_overrides():
    cfg = setup_cfg(None, freeze=False)
    cfg.merge_from_list(["SOLVER.BASE_LR", "0.01", "MODEL.SEM_SEG_HEAD.NUM_CLASSES", "71"])
    assert cfg.SOLVER.BASE_LR == 0.01
    assert cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES == 71
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.BASE_LR = 1.0
    c2 = cfg.clone()
    c2.defrost()
    c2.SOLVER.BASE_LR = 1.0
    assert cfg.SOLVER.BASE_LR == 0.01


def test_reference_yaml_dialect_loads():
    # Our loader must read the reference's own yaml files unmodified
    # (duplicate MODEL keys, tuple strings, python eval tag).
    ref = "/root/reference/configs/avs_s4/COMBO_R50_bs8_90k.yaml"
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    cfg = setup_cfg(ref)
    assert cfg.MODEL.FUSE_CONFIG.AUDIO_DIM == 128
    assert cfg.MODEL.RESNETS.DEPTH == 50
    assert cfg.MODEL.AUDIO.FREEZE_AUDIO_EXTRACTOR is True
    assert cfg.INPUT.MIN_SIZE_TRAIN == [int(x * 0.1 * 224) for x in range(5, 21)]
    assert cfg.DATASETS.TRAIN == ("avss4_sem_seg_train",)
