"""Synthetic on-disk AVSBench-layout dataset generator.

Builds a production-SHAPED dataset (224^2 PNG frames + Maskige PNGs + GT
masks + pickled log-mels) in the exact directory layouts `register_all`
walks (combo_avs_tpu/data/catalogs.py; ref layouts:
models/data/datasets/register_avss4_sem.py:17-58,
register_avss_sem.py:25-121), so the REAL CLI / Trainer / loader / mapper
path runs end to end without the (unshippable) AVSBench data.

The content is LEARNABLE, not noise: each category is a (shape, color,
audio-band) triple — frames show the shape over a smooth textured
background, the GT is the shape's mask, the Maskige paints the shape with a
palette color, and the log-mel carries a category-specific band. A model
trained on this must move loss meaningfully (used by scripts/r5_longtrain.py
to observe a multi-hundred-step production-width loss curve).

Usage:
  python scripts/make_synth_dataset.py [--root .synth/AVS_dataset]
      [--s4-train 96] [--s4-val 48] [--avss 36]
"""

import argparse
import os
import pickle
import sys

import cv2
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N_CATEGORIES = 10
FRAME = 224


def _palette(n, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(40, 255, (n, 3)).astype(np.uint8)


CAT_COLORS = _palette(N_CATEGORIES)
MASKIGE_COLORS = _palette(N_CATEGORIES + 1, seed=11)


def _background(rng):
    """Smooth textured background (realistic PNG entropy, unlike flat fills)."""
    small = rng.randint(0, 256, (14, 14, 3), np.uint8)
    bg = cv2.resize(small, (FRAME, FRAME), interpolation=cv2.INTER_CUBIC)
    noise = rng.randint(0, 25, (FRAME, FRAME, 3), np.uint8)
    return cv2.add(bg, noise)


def _shape_mask(cat, cx, cy, r):
    mask = np.zeros((FRAME, FRAME), np.uint8)
    if cat % 2 == 0:
        cv2.circle(mask, (cx, cy), r, 255, -1)
    else:
        cv2.rectangle(mask, (cx - r, cy - r), (cx + r, cy + r), 255, -1)
    return mask


def _video_frames(rng, cat, T):
    """T frames of one video: the category shape drifting over a fixed
    background. Returns (frames, masks_u8, maskiges)."""
    bg = _background(rng)
    cx, cy = rng.randint(60, FRAME - 60, 2)
    r = rng.randint(25, 55)
    dx, dy = rng.randint(-4, 5, 2)
    color = CAT_COLORS[cat]
    frames, masks, maskiges = [], [], []
    for t in range(T):
        m = _shape_mask(cat, int(cx + dx * t), int(cy + dy * t), r)
        img = bg.copy()
        img[m > 0] = (0.85 * color + 0.15 * img[m > 0]).astype(np.uint8)
        mg = np.zeros((FRAME, FRAME, 3), np.uint8)
        mg[:] = MASKIGE_COLORS[-1] // 4  # dim background segment
        mg[m > 0] = MASKIGE_COLORS[cat]
        frames.append(img)
        masks.append(m)
        maskiges.append(mg)
    return frames, masks, maskiges


def _mel(rng, cat, T):
    """[T, 1, 96, 64] log-mel with a category-specific band."""
    mel = rng.randn(T, 1, 96, 64).astype(np.float32) * 0.3 - 3.0
    band = 4 + cat * 6
    mel[:, :, :, band : band + 5] += 2.5
    return mel


def _write_png(path, arr, rgb=True):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if rgb and arr.ndim == 3:
        arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
    cv2.imwrite(path, arr)


def make_s4(root, n_train, n_val):
    s4 = os.path.join(root, "Single-source", "s4_data")
    rng = np.random.RandomState(0)
    for split, n in (("train", n_train), ("val", n_val)):
        for v in range(n):
            cat_id = v % N_CATEGORIES
            cat = f"cat{cat_id:02d}"
            vid = f"{split}_v{v:04d}"
            frames, masks, maskiges = _video_frames(rng, cat_id, 5)
            n_gt = 1 if split == "train" else 5  # ref: train has 1st-frame GT only
            for t in range(5):
                _write_png(os.path.join(s4, "visual_frames", split, cat, vid,
                                        f"{vid}_{t + 1}.png"), frames[t])
                _write_png(os.path.join(s4, "pre_SAM_mask", split, cat, vid,
                                        f"{vid}_{t + 1}_mask_color.png"), maskiges[t])
                if t < n_gt:
                    _write_png(os.path.join(s4, "gt_masks", split, cat, vid,
                                            f"{vid}_{t + 1}.png"), masks[t], rgb=False)
            mel_path = os.path.join(s4, "audio_log_mel", split, cat, f"{vid}.pkl")
            os.makedirs(os.path.dirname(mel_path), exist_ok=True)
            with open(mel_path, "wb") as f:
                pickle.dump(_mel(rng, cat_id, 5), f)
        print(f"S4 {split}: {n} videos")


def make_avss(root, n_videos):
    """v1s / v1m (5-frame) + v2 (10-frame) subsets with 71-class index GTs."""
    import json as _json

    avss = os.path.join(root, "AVSS")
    os.makedirs(avss, exist_ok=True)
    with open(os.path.join(avss, "label2idx.json"), "w") as f:
        _json.dump({f"class{i:02d}": i for i in range(71)}, f)
    rng = np.random.RandomState(1)
    rows = ["uid,label,split"]
    for v in range(n_videos):
        subset = ("v1s", "v1m", "v2")[v % 3]
        T = 10 if subset == "v2" else 5
        vid = f"synth_{subset}_{v:04d}"
        cat_id = v % N_CATEGORIES
        cls = 1 + (v % 70)  # semantic class painted into the index GT
        frames, masks, maskiges = _video_frames(rng, cat_id, T)
        vdir = os.path.join(avss, subset, vid)
        # train subsets: v1s annotates only the first frame (catalogs.py:128)
        for t in range(T):
            _write_png(os.path.join(vdir, "processed_frames", f"{t}.png"), frames[t])
            _write_png(os.path.join(avss, "pre_SAM_mask", subset, vid,
                                    "processed_frames", f"{t}_mask_color.png"),
                       maskiges[t])
            lbl = (masks[t] > 0).astype(np.uint8) * cls
            _write_png(os.path.join(vdir, "processed_labels_semantic", f"{t}.png"),
                       lbl, rgb=False)
        with open(os.path.join(vdir, "audio.pkl"), "wb") as f:
            pickle.dump(_mel(rng, cat_id, T), f)
        rows.append(f"{vid},{subset},train")
    with open(os.path.join(avss, "metadata.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"AVSS: {n_videos} videos (v1s/v1m/v2 mix)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".synth", "AVS_dataset"))
    ap.add_argument("--s4-train", type=int, default=96)
    ap.add_argument("--s4-val", type=int, default=48)
    ap.add_argument("--avss", type=int, default=36)
    args = ap.parse_args()
    if os.path.exists(os.path.join(args.root, "Single-source")):
        print(f"dataset already exists at {args.root}")
        return
    make_s4(args.root, args.s4_train, args.s4_val)
    make_avss(args.root, args.avss)
    print(f"done -> {args.root}")


if __name__ == "__main__":
    main()
