"""Dataset catalogs: walk the AVSBench directory layouts and register
per-video records.

Mirrors the reference registrations:
* S4  (ref: models/data/datasets/register_avss4_sem.py): visual_frames/
  <split>/<category>/<video>/*.png + gt_masks + audio_log_mel pkl +
  pre_SAM_mask *_mask_color.png; the TRAIN split annotates ONLY the first
  frame (ref :18,49-52).
* MS3 (ref: register_avsms3_sem.py): same layout, all 5 frames annotated,
  one audio pkl per video.
* AVSS (ref: register_avss_sem.py): metadata.csv + label2idx.json; per-subset
  temporal flags (v1s/v1m: 5 real frames of 10; v2: 10) (ref :35-48).

Records are plain dicts; a module-level `DatasetCatalog` maps names like
"avss4_sem_seg_train" to loader functions, like detectron2's catalog."""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List

DatasetCatalog: Dict[str, Callable[[], List[dict]]] = {}
MetadataCatalog: Dict[str, dict] = {}


def register(name: str, fn: Callable[[], List[dict]], metadata: dict):
    DatasetCatalog[name] = fn
    MetadataCatalog[name] = metadata


def _png_sorted(d: str) -> List[str]:
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith((".png", ".jpg"))
    )


def load_avss4_records(root: str, split: str, pre_mask_root: str | None = None) -> List[dict]:
    """root: .../Single-source/s4_data. Returns one record per video."""
    frame_root = os.path.join(root, "visual_frames", split)
    records = []
    for category in sorted(os.listdir(frame_root)):
        cdir = os.path.join(frame_root, category)
        if not os.path.isdir(cdir):
            continue
        for video in sorted(os.listdir(cdir)):
            vdir = os.path.join(cdir, video)
            frames = _png_sorted(vdir)
            mask_dir = os.path.join(root, "gt_masks", split, category, video)
            masks = _png_sorted(mask_dir) if os.path.isdir(mask_dir) else []
            if split == "train":
                masks = masks[:1]  # only the first frame is annotated
            audio = os.path.join(root, "audio_log_mel", split, category, f"{video}.pkl")
            rec = {
                "video": video,
                "category": category,
                "file_names": frames,
                "sem_seg_file_names": masks,
                "audio_file_name": audio,
                "num_frames": 5,
                "gt_temporal_mask_flag": [1] + [0] * 4 if split == "train" else [1] * 5,
                "vid_temporal_mask_flag": [1] * 5,
            }
            if pre_mask_root:
                pdir = os.path.join(pre_mask_root, split, category, video)
                if os.path.isdir(pdir):
                    rec["pre_mask_file_names"] = [
                        p for p in _png_sorted(pdir) if p.endswith("_mask_color.png")
                    ]
            records.append(rec)
    return records


def load_avsms3_records(root: str, split: str, pre_mask_root: str | None = None) -> List[dict]:
    """root: .../Multi-sources/ms3_data. All 5 frames annotated."""
    frame_root = os.path.join(root, "visual_frames", split)
    records = []
    for video in sorted(os.listdir(frame_root)):
        vdir = os.path.join(frame_root, video)
        if not os.path.isdir(vdir):
            continue
        frames = _png_sorted(vdir)
        mask_dir = os.path.join(root, "gt_masks", split, video)
        masks = _png_sorted(mask_dir) if os.path.isdir(mask_dir) else []
        rec = {
            "video": video,
            "file_names": frames,
            "sem_seg_file_names": masks,
            "audio_file_name": os.path.join(root, "audio_log_mel", split, f"{video}.pkl"),
            "num_frames": 5,
            "gt_temporal_mask_flag": [1] * 5,
            "vid_temporal_mask_flag": [1] * 5,
        }
        if pre_mask_root:
            pdir = os.path.join(pre_mask_root, split, video)
            if os.path.isdir(pdir):
                rec["pre_mask_file_names"] = [
                    p for p in _png_sorted(pdir) if p.endswith("_mask_color.png")
                ]
        records.append(rec)
    return records


def load_avss_records(root: str, split: str, pre_mask_root: str | None = None) -> List[dict]:
    """root: AVSS dir containing metadata.csv, label2idx.json and
    <subset>/<video>/ directories (ref: register_avss_sem.py:25-121)."""
    import pandas as pd

    df = pd.read_csv(os.path.join(root, "metadata.csv"), sep=",")
    df = df[df["split"] == split]
    records = []
    for _, row in df.iterrows():
        video, subset = row["uid"], row["label"]
        vdir = os.path.join(root, subset, video)
        img_dir = os.path.join(vdir, "processed_frames")
        lbl_dir = os.path.join(vdir, "processed_labels_semantic")
        frames = _png_sorted(img_dir) if os.path.isdir(img_dir) else []
        labels = _png_sorted(lbl_dir) if os.path.isdir(lbl_dir) else []
        if subset == "v1s":
            vid_flag = [1] * 5
            gt_flag = [1, 0, 0, 0, 0] if split == "train" else [1] * 5
        elif subset == "v1m":
            vid_flag = [1] * 5
            gt_flag = [1] * 5
        else:  # v2
            vid_flag = [1] * 10
            gt_flag = [1] * 10
        if split == "train" and subset == "v1s":
            labels = labels[:1]
        rec = {
            "video": video,
            "subset": subset,
            "file_names": frames[: len(vid_flag)],
            "sem_seg_file_names": labels,
            "audio_file_name": os.path.join(vdir, "audio.pkl"),
            "num_frames": len(vid_flag),
            "gt_temporal_mask_flag": gt_flag,
            "vid_temporal_mask_flag": vid_flag,
        }
        if pre_mask_root:
            pdir = os.path.join(pre_mask_root, subset, video, "processed_frames")
            if os.path.isdir(pdir):
                rec["pre_mask_file_names"] = [
                    p for p in _png_sorted(pdir) if p.endswith("_mask_color.png")
                ]
        records.append(rec)
    return records


def _first_dir(*candidates):
    for c in candidates:
        if c and os.path.isdir(c):
            return c
    return None


def register_all(datasets_root: str, use_pre_sam: bool = True):
    """Register the 9 standard splits given a dataset root.

    Accepts BOTH root conventions: one parent containing
    Single-source/ + Multi-sources/ + AVSS (or AVSBench_semantic), AND the
    reference's per-benchmark DETECTRON2_DATASETS values that point directly
    at .../Single-source/, .../Multi-sources/ or .../AVSBench_semantic/
    (ref: register_avss4_sem.py:117-119, register_avss_sem.py:147-150) — so
    a reference user's environment works unchanged."""
    norm = datasets_root.rstrip("/")
    s4_root = _first_dir(
        os.path.join(datasets_root, "Single-source", "s4_data"),
        os.path.join(norm, "s4_data") if norm.endswith("Single-source") else None,
    )
    ms3_root = _first_dir(
        os.path.join(datasets_root, "Multi-sources", "ms3_data"),
        os.path.join(norm, "ms3_data") if norm.endswith("Multi-sources") else None,
    )
    avss_root = _first_dir(
        os.path.join(datasets_root, "AVSS"),
        os.path.join(datasets_root, "AVSBench_semantic"),
        norm if os.path.isfile(os.path.join(norm, "metadata.csv")) else None,
    )

    if s4_root:
        pre = os.path.join(s4_root, "pre_SAM_mask") if use_pre_sam else None
        for split in ("train", "val", "test"):
            register(
                f"avss4_sem_seg_{split}",
                # bind `pre` as a default arg: the name is reassigned by the
                # MS3/AVSS blocks below, and a late-binding closure would make
                # S4 records silently lose their Maskiges whenever several
                # benchmarks register under one root
                lambda s=split, p=pre: load_avss4_records(s4_root, s, p),
                {
                    "stuff_classes": ["background", "object"],
                    "ignore_label": 255,
                    "evaluator_type": "sem_seg",
                    "num_frames": 5,
                },
            )
    if ms3_root:
        pre = os.path.join(ms3_root, "pre_SAM_mask") if use_pre_sam else None
        for split in ("train", "val", "test"):
            register(
                f"avsms3_sem_seg_{split}",
                lambda s=split, p=pre: load_avsms3_records(ms3_root, s, p),
                {
                    "stuff_classes": ["background", "object"],
                    "ignore_label": 255,
                    "evaluator_type": "sem_seg",
                    "num_frames": 5,
                },
            )
    if avss_root:
        pre = os.path.join(avss_root, "pre_SAM_mask") if use_pre_sam else None
        label2idx_path = os.path.join(avss_root, "label2idx.json")
        classes = list(range(71))
        if os.path.exists(label2idx_path):
            with open(label2idx_path) as f:
                classes = list(json.load(f).keys())
        for split in ("train", "val", "test"):
            register(
                f"avss_sem_seg_{split}",
                lambda s=split, p=pre: load_avss_records(avss_root, s, p),
                {
                    "stuff_classes": classes,
                    "ignore_label": 255,
                    "evaluator_type": "sem_seg_ss",
                    "num_frames": 10,
                },
            )
