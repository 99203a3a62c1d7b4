"""End-to-end CLI tests: train_net.py main() and pred.py main() run for real
on a tiny synthetic S4 dataset laid out exactly as register_all expects
(Single-source/s4_data/{visual_frames,gt_masks,audio_log_mel}), driven by a
YAML config through setup_cfg — the same code path a user hits
(ref: train_net.py:231-291 + pred.py:211-238)."""

import json
import os
import pickle
import sys

import cv2
import numpy as np
import pytest
import torch

S = 64


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("avs_root")
    s4 = root / "Single-source" / "s4_data"
    rng = np.random.RandomState(3)
    for split in ("train", "val"):
        for vid in ("va", "vb"):
            fdir = s4 / "visual_frames" / split / "cat" / vid
            mdir = s4 / "gt_masks" / split / "cat" / vid
            adir = s4 / "audio_log_mel" / split / "cat"
            fdir.mkdir(parents=True)
            mdir.mkdir(parents=True)
            adir.mkdir(parents=True, exist_ok=True)
            n_masks = 1 if split == "train" else 5
            for i in range(5):
                img = rng.randint(0, 40, (S, S, 3), np.uint8)
                img[:, : S // 2] += 150
                cv2.imwrite(str(fdir / f"{vid}_{i + 1}.png"), img)
                if i < n_masks:
                    m = np.zeros((S, S), np.uint8)
                    m[:, : S // 2] = 255
                    cv2.imwrite(str(mdir / f"{vid}_{i + 1}.png"), m)
            with open(adir / f"{vid}.pkl", "wb") as f:
                pickle.dump(torch.randn(5, 1, 96, 64), f)

    out_dir = str(tmp_path_factory.mktemp("cli_out"))
    yml = tmp_path_factory.mktemp("cfg") / "tiny.yaml"
    yml.write_text(f"""
MODEL:
  BACKBONE:
    NAME: "tiny_resnet"
  PRE_SAM:
    USE_PRE_SAM: false
  AUDIO:
    WIDTH_MULT: 0.125
  FUSE_CONFIG:
    FUSION_STEP: "late"
    TYPE: "MHA-B"
    AUDIO_DIM: 128
    FUSED_BACKBONE: ["res2"]
    FUSED_BACKBONE_DIM: [32]
  MASK_FORMER:
    HIDDEN_DIM: 32
    NHEADS: 2
    DIM_FEEDFORWARD: 64
    DEC_LAYERS: 3
    NUM_OBJECT_QUERIES: 8
    TRAIN_NUM_POINTS: 64
  SEM_SEG_HEAD:
    MASK_DIM: 32
    CONVS_DIM: 32
    TRANSFORMER_ENC_LAYERS: 1
INPUT:
  MIN_SIZE_TRAIN: [{S}]
  MAX_SIZE_TRAIN: {S}
  COLOR_AUG_SSD: false
  SIZE_DIVISIBILITY: {S}
  CROP:
    ENABLED: false
SOLVER:
  IMS_PER_BATCH: 2
  BASE_LR: 0.0005
  MAX_ITER: 3
  CHECKPOINT_PERIOD: 2
TEST:
  EVAL_PERIOD: 2
DATASETS:
  TRAIN: ("avss4_sem_seg_train",)
  TEST: ("avss4_sem_seg_val",)
DATALOADER:
  NUM_WORKERS: 1
OUTPUT_DIR: "{out_dir}"
""")
    return str(root), str(yml), out_dir


def test_train_cli_end_to_end(cli_env, monkeypatch):
    import jax

    jax.clear_caches()
    root, yml, out_dir = cli_env
    import train_net

    monkeypatch.setattr(sys, "argv", [
        "train_net.py", "--config-file", yml, "--datasets-root", root,
        "--num-devices", "1",
    ])
    train_net.main()

    # the engine produced checkpoints, metrics, eval artifacts
    dirs = os.listdir(out_dir)
    assert "step_2" in dirs
    assert "model_best" in dirs
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    assert any("mIoU" in r for r in rows)
    assert os.path.exists(
        os.path.join(out_dir, "inference", "avss4_sem_seg_val", "sem_seg_evaluation.pth"))


def test_pred_cli_end_to_end(cli_env, monkeypatch):
    import jax

    jax.clear_caches()
    root, yml, out_dir = cli_env
    assert os.path.isdir(os.path.join(out_dir, "model_best")), \
        "train CLI test must run first (module-scoped fixture ordering)"
    import pred

    monkeypatch.setattr(sys, "argv", [
        "pred.py", "--config-file", yml, "--datasets-root", root,
        "--num-devices", "1", "--save-vis",
    ])
    results = pred.main()
    sem = results["avss4_sem_seg_val"]
    assert set(sem) >= {"mIoU", "f_score"}
    assert 0.0 <= sem["mIoU"] <= 1.0 or 0.0 <= sem["mIoU"] <= 100.0
    # --save-vis dumped one colored mask per frame (2 videos x 5 frames)
    vis = os.path.join(out_dir, "vis", "avss4_sem_seg_val")
    assert sorted(os.listdir(vis)) == sorted(
        f"{v}_{t}.png" for v in ("va", "vb") for t in range(5))
    m = cv2.imread(os.path.join(vis, "va_0.png"))
    assert m is not None and m.shape[2] == 3
