"""Offline audio preprocessing: wav -> padded log-mel pickle.

Replicates avs_tools/preprocess_avss_audio.py (ref :50-64): run the VGGish
log-mel frontend on each video's `audio.wav`, zero-pad to `pad_to` examples,
and pickle next to the wav as `audio.pkl` in the [N, 1, 96, 64] layout the
dataset mappers load.

Usage:
  python -m combo_avs_tpu.tools.preprocess_audio --root AVS_dataset/AVSS [--pad-to 10]
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from combo_avs_tpu.models.audio_frontend import wavfile_to_examples


def process_wav(path: str, pad_to: int = 10) -> np.ndarray:
    x = np.asarray(wavfile_to_examples(path))  # [N, 96, 64]
    out = np.zeros((pad_to, 1, 96, 64), np.float32)
    n = min(x.shape[0], pad_to)
    out[:n, 0] = x[:n]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="directory tree containing audio.wav files")
    p.add_argument("--pad-to", type=int, default=10)
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args()

    n = 0
    for dirpath, _, files in os.walk(args.root):
        for f in files:
            if not f.endswith(".wav"):
                continue
            wav = os.path.join(dirpath, f)
            pkl = wav[:-4] + ".pkl"
            if os.path.exists(pkl) and not args.overwrite:
                continue
            with open(pkl, "wb") as fw:
                pickle.dump(process_wav(wav, args.pad_to), fw)
            n += 1
    print(f"wrote {n} audio pickles under {args.root}")


if __name__ == "__main__":
    main()
