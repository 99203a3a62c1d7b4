"""End-to-end AVSS (semantic, temporal-masked) engine test on a tiny
synthetic AVSS tree: real metadata.csv/label2idx.json layout through
load_avss_records + register_all, the avss_semantic mapper (index-label GTs,
temporal flags), SetCriterion with gt/vid temporal masks, AMP train step,
and the SemSegEvaluator_SS 71-class-histogram path — the full AVSS regime
of the reference (ref: configs/avs_ss/R50-AVSS-SemanticSegmentation.yaml +
register_avss_sem.py + criterion_ss.py) at toy scale."""

import json
import os
import pickle

import cv2
import numpy as np
import pytest
import torch

from combo_avs_tpu.config import get_cfg
from combo_avs_tpu.data import catalogs

S = 64
NCLS = 6


@pytest.fixture(scope="module")
def avss_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("avs_root")
    avss = root / "AVSS"
    rng = np.random.RandomState(5)
    rows = ["uid,label,split"]
    for split in ("train", "val"):
        for vid in ("u1", "u2"):
            uid = f"{split}_{vid}"
            vdir = avss / "v1s" / uid
            (vdir / "processed_frames").mkdir(parents=True)
            (vdir / "processed_labels_semantic").mkdir(parents=True)
            n_lbl = 1 if split == "train" else 5
            for i in range(5):
                img = rng.randint(0, 40, (S, S, 3), np.uint8)
                img[:, : S // 2] += 150
                cv2.imwrite(str(vdir / "processed_frames" / f"{i}.png"), img)
                if i < n_lbl:
                    lbl = np.zeros((S, S), np.uint8)
                    lbl[:, : S // 2] = 3  # class 3 "sounds"
                    cv2.imwrite(
                        str(vdir / "processed_labels_semantic" / f"{i}.png"), lbl)
            with open(vdir / "audio.pkl", "wb") as f:
                pickle.dump(torch.randn(10, 1, 96, 64), f)  # AVSS pads to 10
            rows.append(f"{uid},v1s,{split}")
    (avss / "metadata.csv").write_text("\n".join(rows) + "\n")
    (avss / "label2idx.json").write_text(
        json.dumps({f"c{i}": i for i in range(NCLS)}))

    catalogs.register_all(str(root), use_pre_sam=False)

    cfg = get_cfg()
    m = cfg.MODEL
    m.BACKBONE.NAME = "tiny_resnet"
    m.PRE_SAM.USE_PRE_SAM = False
    m.AUDIO.WIDTH_MULT = 0.125
    m.FUSE_CONFIG.FUSION_STEP = "late"
    m.FUSE_CONFIG.TYPE = "MHA-B"
    m.FUSE_CONFIG.AUDIO_DIM = 128
    m.FUSE_CONFIG.FUSED_BACKBONE = ["res2"]
    m.FUSE_CONFIG.FUSED_BACKBONE_DIM = [32]
    m.MASK_FORMER.HIDDEN_DIM = 32
    m.MASK_FORMER.NHEADS = 2
    m.MASK_FORMER.DIM_FEEDFORWARD = 64
    m.MASK_FORMER.DEC_LAYERS = 2
    m.MASK_FORMER.NUM_OBJECT_QUERIES = 16
    m.MASK_FORMER.TRAIN_NUM_POINTS = 64
    m.SEM_SEG_HEAD.MASK_DIM = 32
    m.SEM_SEG_HEAD.CONVS_DIM = 32
    m.SEM_SEG_HEAD.NUM_CLASSES = NCLS
    m.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = 1
    cfg.INPUT.DATASET_MAPPER_NAME = "avss_semantic"
    cfg.INPUT.AUGMENTATION = True  # ColorAugSSD + RandomFlip, no resize
    cfg.INPUT.SIZE_DIVISIBILITY = S
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.BASE_LR = 5e-4
    cfg.SOLVER.MAX_ITER = 4
    cfg.SOLVER.CHECKPOINT_PERIOD = 4
    cfg.SOLVER.AMP.ENABLED = True  # the reference's AVSS AMP regime
    cfg.TEST.EVAL_PERIOD = 0
    cfg.DATASETS.TRAIN = ("avss_sem_seg_train",)
    cfg.DATASETS.TEST = ("avss_sem_seg_val",)
    cfg.DATALOADER.NUM_WORKERS = 1
    cfg.OUTPUT_DIR = str(tmp_path_factory.mktemp("avss_out"))
    return cfg


def test_avss_records_and_flags(avss_cfg):
    recs = catalogs.DatasetCatalog["avss_sem_seg_train"]()
    assert len(recs) == 2
    r = recs[0]
    assert r["subset"] == "v1s" and r["num_frames"] == 5
    assert r["gt_temporal_mask_flag"] == [1, 0, 0, 0, 0]  # train v1s
    assert len(r["sem_seg_file_names"]) == 1
    val = catalogs.DatasetCatalog["avss_sem_seg_val"]()[0]
    assert val["gt_temporal_mask_flag"] == [1] * 5
    meta = catalogs.MetadataCatalog["avss_sem_seg_train"]
    assert meta["evaluator_type"] == "sem_seg_ss"
    assert len(meta["stuff_classes"]) == NCLS


def test_avss_train_and_eval_end_to_end(avss_cfg):
    import jax

    jax.clear_caches()
    from combo_avs_tpu.train.trainer import Trainer

    trainer = Trainer(avss_cfg, n_devices=1)
    trainer.resume_or_load(resume=False)
    state = trainer.train(log_every=1)
    assert int(np.asarray(state.step)) == avss_cfg.SOLVER.MAX_ITER
    with open(trainer.metrics_file) as f:
        losses = [json.loads(l)["total_loss"] for l in f if "total_loss" in l]
    assert len(losses) == 4 and all(np.isfinite(losses))

    results = trainer.test("avss_sem_seg_val")
    sem = results["sem_seg"]
    # the SS evaluator reports per-class-histogram mIoU/F (+ noBg variants)
    assert {"mIoU", "f_score"} <= set(sem)
    assert all(np.isfinite(v) for v in sem.values())


def test_avss_v1m_v2_flags(tmp_path):
    """v1m: 5 real frames, all annotated; v2: 10 frames, all annotated
    (ref: register_avss_sem.py:35-48)."""
    import pandas as pd  # noqa: F401  (load_avss_records imports it)

    from combo_avs_tpu.data.catalogs import load_avss_records

    root = tmp_path / "AVSS"
    root.mkdir()
    (root / "metadata.csv").write_text(
        "uid,label,split\nm1,v1m,train\nw1,v2,train\n")
    for uid, sub in (("m1", "v1m"), ("w1", "v2")):
        (root / sub / uid).mkdir(parents=True)
    recs = {r["video"]: r for r in load_avss_records(str(root), "train")}
    assert recs["m1"]["num_frames"] == 5
    assert recs["m1"]["gt_temporal_mask_flag"] == [1] * 5
    assert recs["m1"]["vid_temporal_mask_flag"] == [1] * 5
    assert recs["w1"]["num_frames"] == 10
    assert recs["w1"]["gt_temporal_mask_flag"] == [1] * 10
    assert recs["w1"]["vid_temporal_mask_flag"] == [1] * 10
