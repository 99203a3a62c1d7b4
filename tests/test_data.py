"""Data layer tests on a synthetic on-disk dataset in the AVSBench layout."""

import os
import pickle

import cv2
import numpy as np
import pytest
import torch

from combo_avs_tpu.data.catalogs import (
    load_avsms3_records,
    load_avss4_records,
    load_avss_records,
)
from combo_avs_tpu.data.loader import TrainLoader, eval_loader
from combo_avs_tpu.data.mappers import AVSSemanticDatasetMapper


@pytest.fixture(scope="module")
def s4_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("s4_data")
    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        for cat in ("dog",):
            for vid in ("v1", "v2"):
                fdir = root / "visual_frames" / split / cat / vid
                mdir = root / "gt_masks" / split / cat / vid
                pdir = root / "pre_SAM_mask" / split / cat / vid
                for d in (fdir, mdir, pdir):
                    d.mkdir(parents=True, exist_ok=True)
                n_masks = 1 if split == "train" else 5
                for i in range(5):
                    img = rng.randint(0, 255, (224, 224, 3), np.uint8)
                    cv2.imwrite(str(fdir / f"{vid}_{i + 1}.png"), img)
                    cv2.imwrite(str(pdir / f"{vid}_{i + 1}_mask_color.png"), img)
                    if i < n_masks:
                        m = (rng.rand(224, 224) > 0.5).astype(np.uint8) * 255
                        cv2.imwrite(str(mdir / f"{vid}_{i + 1}.png"), m)
                adir = root / "audio_log_mel" / split / cat
                adir.mkdir(parents=True, exist_ok=True)
                with open(adir / f"{vid}.pkl", "wb") as f:
                    pickle.dump(torch.randn(5, 1, 96, 64), f)
    return str(root)


def test_s4_catalog(s4_root):
    recs = load_avss4_records(s4_root, "train", os.path.join(s4_root, "pre_SAM_mask"))
    assert len(recs) == 2
    r = recs[0]
    assert len(r["file_names"]) == 5
    assert len(r["sem_seg_file_names"]) == 1  # train: first frame only
    assert r["gt_temporal_mask_flag"] == [1, 0, 0, 0, 0]
    assert len(r["pre_mask_file_names"]) == 5
    recs_val = load_avss4_records(s4_root, "val", None)
    assert len(recs_val[0]["sem_seg_file_names"]) == 5
    assert recs_val[0]["gt_temporal_mask_flag"] == [1] * 5


def test_mapper_train_shapes(s4_root):
    recs = load_avss4_records(s4_root, "train", os.path.join(s4_root, "pre_SAM_mask"))
    mapper = AVSSemanticDatasetMapper(is_train=True, max_instances=4, seed=1)
    out = mapper(recs[0])
    assert out["images"].shape == (5, 224, 224, 3)
    assert out["pre_masks"].shape == (5, 224, 224, 3)
    assert out["audio_log_mel"].shape == (5, 96, 64)
    assert out["labels"].shape == (5, 4)
    assert out["masks"].shape == (5, 4, 224, 224)
    # only first frame has valid targets in the train split
    assert out["valid"][0].any() and not out["valid"][1:].any()
    np.testing.assert_array_equal(out["gt_temporal_mask"], [1, 0, 0, 0, 0])
    assert out["images"].min() >= 0 and out["images"].max() <= 255
    # masks for valid slots are binary and match labels semantics
    v = out["valid"][0]
    assert set(np.unique(out["masks"][0][v])) <= {0.0, 1.0}


def test_mapper_eval_no_aug_deterministic(s4_root):
    recs = load_avss4_records(s4_root, "val", None)
    mapper = AVSSemanticDatasetMapper(is_train=False, max_instances=4)
    o1, o2 = mapper(recs[0]), mapper(recs[0])
    np.testing.assert_array_equal(o1["images"], o2["images"])
    assert o1["valid"].sum() > 0
    assert o1["sem_segs"].shape == (5, 224, 224)


def test_train_loader_batches(s4_root):
    recs = load_avss4_records(s4_root, "train", os.path.join(s4_root, "pre_SAM_mask"))
    mapper = AVSSemanticDatasetMapper(is_train=True, max_instances=4, seed=2)
    loader = TrainLoader(recs, mapper, batch_size=2, num_workers=2)
    batch = next(loader)
    assert batch["images"].shape == (2, 5, 224, 224, 3)
    assert batch["masks"].shape == (2, 5, 4, 224, 224)
    loader.close()


def test_eval_loader_one_pass(s4_root):
    recs = load_avss4_records(s4_root, "val", None)
    mapper = AVSSemanticDatasetMapper(is_train=False, max_instances=4)
    batches = list(eval_loader(recs, mapper, batch_size=1))
    assert len(batches) == 2
    assert batches[0]["images"].shape == (1, 5, 224, 224, 3)


@pytest.fixture(scope="module")
def avss_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("avss")
    rng = np.random.RandomState(1)
    rows = ["uid,label,split"]
    for vid, subset, nf in (("va", "v1s", 5), ("vb", "v2", 10)):
        rows.append(f"{vid},{subset},train")
        vdir = root / subset / vid
        (vdir / "processed_frames").mkdir(parents=True)
        (vdir / "processed_labels_semantic").mkdir(parents=True)
        for i in range(nf):
            img = rng.randint(0, 255, (224, 224, 3), np.uint8)
            cv2.imwrite(str(vdir / "processed_frames" / f"{i}.png"), img)
            lbl = rng.randint(0, 5, (224, 224)).astype(np.uint8)
            cv2.imwrite(str(vdir / "processed_labels_semantic" / f"{i}.png"), lbl)
        with open(vdir / "audio.pkl", "wb") as f:
            pickle.dump(torch.randn(10, 1, 96, 64), f)
    (root / "metadata.csv").write_text("\n".join(rows) + "\n")
    return str(root)


def test_avss_catalog_and_buckets(avss_root):
    recs = load_avss_records(avss_root, "train")
    assert {r["num_frames"] for r in recs} == {5, 10}
    v1s = next(r for r in recs if r["subset"] == "v1s")
    assert v1s["gt_temporal_mask_flag"] == [1, 0, 0, 0, 0]
    assert len(v1s["sem_seg_file_names"]) == 1
    v2 = next(r for r in recs if r["subset"] == "v2")
    assert v2["gt_temporal_mask_flag"] == [1] * 10

    # mapper with index labels (71 classes), no geometric augs (AVSS)
    mapper = AVSSemanticDatasetMapper(
        is_train=True, binary_gt=False, geometric_aug=False, use_pre_sam=False,
        max_instances=8, seed=3,
    )
    o5, o10 = mapper(v1s), mapper(v2)
    assert o5["images"].shape[0] == 5 and o10["images"].shape[0] == 10
    assert o10["audio_log_mel"].shape == (10, 96, 64)
    # loader buckets: batches never mix 5- and 10-frame videos
    loader = TrainLoader(recs, mapper, batch_size=2, num_workers=1, seed=4)
    for _ in range(4):
        b = next(loader)
        assert b["images"].shape[1] in (5, 10)
    loader.close()


def test_avss_mapper_random_flip(avss_root):
    """AVSS training keeps RandomFlip(p=0.5) even though it has no
    resize/crop (ref: avss_semantic_dataset_mapper.py:100-104 builds
    [ColorAugSSD, RandomFlip] when INPUT.AUGMENTATION). Every output frame
    must be either the original or its mirror, labels flipped in sync, and
    both cases must occur."""
    from combo_avs_tpu.data.mappers import read_image

    recs = load_avss_records(avss_root, "train")
    rec = next(r for r in recs if r["subset"] == "v1s")
    raw = read_image(rec["file_names"][0]).astype(np.float32)
    raw_lbl = read_image(rec["sem_seg_file_names"][0], gray=True).astype(np.int32)
    mapper = AVSSemanticDatasetMapper(
        is_train=True, binary_gt=False, geometric_aug=False, use_pre_sam=False,
        color_aug=False, max_instances=8, seed=11,
    )
    flipped, unflipped = 0, 0
    for _ in range(16):
        out = mapper(rec)
        img = out["images"][0]
        if np.array_equal(img, raw):
            unflipped += 1
            np.testing.assert_array_equal(out["sem_segs"][0], raw_lbl)
        elif np.array_equal(img, raw[:, ::-1]):
            flipped += 1
            np.testing.assert_array_equal(out["sem_segs"][0], raw_lbl[:, ::-1])
        else:
            raise AssertionError("frame is neither original nor mirrored")
    assert flipped > 0 and unflipped > 0


def test_ssd_color_aug_d2_semantics():
    """_apply_ssd_color is byte-faithful to d2 ColorAugSSDTransform: BGR
    workspace, per-op uint8 round-trips, separate HSV round trips for
    saturation and hue, integer hue delta."""
    import cv2

    from combo_avs_tpu.data.mappers import _apply_ssd_color

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (8, 9, 3)).astype(np.uint8)

    # saturation only: must equal a manual BGR<->HSV round trip
    p = {"brightness": None, "contrast": None, "contrast_first": True,
         "saturation": 1.3, "hue": None}
    got = _apply_ssd_color(img, p)
    bgr = img[:, :, ::-1]
    hsv = cv2.cvtColor(bgr, cv2.COLOR_BGR2HSV)
    hsv[:, :, 1] = np.clip(hsv[:, :, 1].astype(np.float32) * 1.3, 0, 255).astype(np.uint8)
    want = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[:, :, ::-1]
    np.testing.assert_array_equal(got, want)

    # hue shift by a multiple of 180 degrees is the identity
    p = {"brightness": None, "contrast": None, "contrast_first": True,
         "saturation": None, "hue": 0}
    got = _apply_ssd_color(img, p)
    ident = cv2.cvtColor(cv2.cvtColor(img[:, :, ::-1], cv2.COLOR_BGR2HSV),
                         cv2.COLOR_HSV2BGR)[:, :, ::-1]
    np.testing.assert_array_equal(got, ident)

    # brightness + contrast round-trip through uint8 between the ops
    p = {"brightness": 10.6, "contrast": 1.2, "contrast_first": True,
         "saturation": None, "hue": None}
    got = _apply_ssd_color(img, p)
    step1 = np.clip(img.astype(np.float32) + 10.6, 0, 255).astype(np.uint8)
    step2 = np.clip(step1.astype(np.float32) * 1.2, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, step2)

    # sampled hue deltas are integers (cv2 uint8 hue space is [0, 180))
    from combo_avs_tpu.data.mappers import sample_video_transform

    rng = np.random.RandomState(1)
    for _ in range(32):
        t = sample_video_transform(rng, (64, 64), [224], 896, (224, 224),
                                   color_aug=True, flip=True)
        if t.color_params is not None and t.color_params["hue"] is not None:
            assert isinstance(t.color_params["hue"], int)
            assert -18 <= t.color_params["hue"] <= 18


def test_register_all_accepts_reference_root_conventions(tmp_path):
    """A reference user's DETECTRON2_DATASETS values (.../Single-source/,
    .../AVSBench_semantic/) register the same splits as the parent-root
    convention (ref: register_avss4_sem.py:117-119,
    register_avss_sem.py:147-150)."""
    from combo_avs_tpu.data import catalogs

    # .../Single-source/ pointing directly at the benchmark
    ss = tmp_path / "AVSBench_object" / "Single-source"
    (ss / "s4_data" / "visual_frames" / "train").mkdir(parents=True)
    catalogs.register_all(str(ss) + "/")
    assert "avss4_sem_seg_train" in catalogs.DatasetCatalog

    # .../AVSBench_semantic/ with metadata.csv at its top
    sem = tmp_path / "AVSBench_semantic"
    sem.mkdir()
    (sem / "metadata.csv").write_text("uid,label,split\n")
    (sem / "label2idx.json").write_text("{}")
    catalogs.register_all(str(sem))
    assert "avss_sem_seg_train" in catalogs.DatasetCatalog
    assert catalogs.DatasetCatalog["avss_sem_seg_train"]() == []
