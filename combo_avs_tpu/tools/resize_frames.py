"""Offline AVSS frame/label resizing to a fixed size.

Replicates avs_tools/process_avssimg2fixsize.py (ref :12-41): training frames
and labels are short-side-resized then center-cropped to 224 ("crop_resize"),
eval frames are plainly resized ("resize"); labels use NEAREST. Writes
`processed_frames` / `processed_labels_semantic` directories next to the
originals.

Usage:
  python -m combo_avs_tpu.tools.resize_frames --root AVS_dataset/AVSS --mode crop
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np


def crop_resize(img: np.ndarray, size: int, is_mask: bool = False) -> np.ndarray:
    h, w = img.shape[:2]
    if w > h:
        oh, ow = size, int(1.0 * w * size / h)
    else:
        ow, oh = size, int(1.0 * h * size / w)
    interp = cv2.INTER_NEAREST if is_mask else cv2.INTER_LINEAR
    img = cv2.resize(img, (ow, oh), interpolation=interp)
    h, w = img.shape[:2]
    x1 = int(round((w - size) / 2.0))
    y1 = int(round((h - size) / 2.0))
    return img[y1 : y1 + size, x1 : x1 + size]


def resize(img: np.ndarray, size: int, is_mask: bool = False) -> np.ndarray:
    interp = cv2.INTER_NEAREST if is_mask else cv2.INTER_LINEAR
    return cv2.resize(img, (size, size), interpolation=interp)


def process_video_dir(vdir: str, size: int, mode: str):
    fn = crop_resize if mode == "crop" else resize
    jobs = [("frames", "processed_frames", False),
            ("labels_semantic", "processed_labels_semantic", True)]
    n = 0
    for src_name, dst_name, is_mask in jobs:
        src = os.path.join(vdir, src_name)
        if not os.path.isdir(src):
            continue
        dst = os.path.join(vdir, dst_name)
        os.makedirs(dst, exist_ok=True)
        for f in sorted(os.listdir(src)):
            if not f.endswith((".png", ".jpg")):
                continue
            img = cv2.imread(os.path.join(src, f), cv2.IMREAD_UNCHANGED)
            out = fn(img, size, is_mask)
            cv2.imwrite(os.path.join(dst, f), out)
            n += 1
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--mode", choices=("crop", "resize"), default="crop")
    args = p.parse_args()

    n = 0
    for dirpath, dirs, _ in os.walk(args.root):
        if "frames" in dirs or "labels_semantic" in dirs:
            n += process_video_dir(dirpath, args.size, args.mode)
    print(f"processed {n} images under {args.root}")


if __name__ == "__main__":
    main()
