"""Host data-path throughput: can the loader feed the chip? (VERDICT r4
weak #3 — every recorded rate was device-only; the host side had never been
measured.)

Measures, on the synthetic production-shaped on-disk dataset
(scripts/make_synth_dataset.py):

  * mapper throughput (videos/s): decode 5 frames + 5 Maskiges + GT + mel
    unpickle + one-aug-per-video replay, native C++ decode pool vs cv2,
  * TrainLoader steady-state batches/s at bs8 for several worker counts,
  * eval_loader + sem_seg_postprocess + evaluator.process videos/s,

and compares against the device-side targets (bench records): S4 train
needs >= bs8 / 0.556 s = 14.4 videos/s; eval at 674 f/s needs 134.8
videos/s of decode+postprocess. CPU-only — run with nothing else hogging
the single core.

Usage: python scripts/r5_hostpath.py [--quick]
"""

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure_mapper(records, mapper, n, label):
    t0 = time.perf_counter()
    for r in records[:n]:
        mapper(r)
    dt = time.perf_counter() - t0
    rate = n / dt
    print(f"  {label}: {rate:.1f} videos/s ({dt / n * 1e3:.1f} ms/video)")
    return rate


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    quick = "--quick" in sys.argv

    from combo_avs_tpu import native
    from combo_avs_tpu.config import setup_cfg
    from combo_avs_tpu.data.catalogs import DatasetCatalog, register_all
    from combo_avs_tpu.data.loader import TrainLoader, eval_loader
    from combo_avs_tpu.evaluation.evaluator import SemSegEvaluator
    from combo_avs_tpu.evaluation.postprocess import (
        crop_and_resize_gt, sem_seg_postprocess)
    from combo_avs_tpu.train.trainer import build_mapper

    root = os.path.join(REPO, ".synth", "AVS_dataset")
    assert os.path.isdir(root), "run scripts/make_synth_dataset.py first"
    register_all(root)
    cfg = setup_cfg(os.path.join(
        REPO, "combo_avs_tpu/configs/avs_s4/COMBO_R50_bs8_90k.yaml"), None)
    train_recs = DatasetCatalog["avss4_sem_seg_train"]()
    val_recs = DatasetCatalog["avss4_sem_seg_val"]()
    out = {"native_io": native.get_io() is not None}
    print(f"native decode extension: {out['native_io']}")

    n = 24 if quick else 96
    mapper = build_mapper(cfg, is_train=True)
    print("mapper (train, aug+decode):")
    out["mapper_native"] = measure_mapper(train_recs, mapper, n, "native pool")
    os.environ["COMBO_NATIVE_IO"] = "0"  # get_io() checks the env per call
    assert native.get_io() is None
    out["mapper_cv2"] = measure_mapper(train_recs, mapper, n, "cv2 fallback")
    os.environ.pop("COMBO_NATIVE_IO", None)

    # TrainLoader steady state (prefetch + thread pool)
    print("TrainLoader bs8 steady-state:")
    out["train_loader"] = {}
    for workers in (2, 4, 8):
        ld = TrainLoader(train_recs, mapper, batch_size=8, num_workers=workers)
        next(ld)  # warm the pool/queue
        n_b = 4 if quick else 12
        t0 = time.perf_counter()
        for _ in range(n_b):
            next(ld)
        dt = (time.perf_counter() - t0) / n_b
        ld.close()
        out["train_loader"][workers] = round(1.0 / dt, 2)
        print(f"  workers={workers}: {1.0 / dt:.2f} batches/s "
              f"({8 / dt:.1f} videos/s; target 14.4 videos/s "
              f"for 0.556 s/step device record)")

    # eval side: decode -> (no device) -> postprocess + evaluator math
    print("eval_loader + postprocess + metrics:")
    emapper = build_mapper(cfg, is_train=False)
    ev = SemSegEvaluator()
    rng = np.random.RandomState(0)
    n_e = 12 if quick else 48
    t0 = time.perf_counter()
    done = 0
    for batch, recs in eval_loader(val_recs[:n_e], emapper, batch_size=4,
                                   with_records=True):
        B, T = batch["images"].shape[:2]
        sem = rng.rand(B * T, 2, 224, 224).astype(np.float32)  # stand-in logits
        sem = sem.reshape(B, T, 2, 224, 224)
        for b in range(B):
            hw = batch["image_size"][b]
            oh, ow = int(batch["height"][b]), int(batch["width"][b])
            pred = sem_seg_postprocess(sem[b], hw, oh, ow)
            gt = crop_and_resize_gt(batch["sem_segs"][b], hw, oh, ow)
            ev.process(pred, gt)
        done += len(recs)
    dt = time.perf_counter() - t0
    out["eval_videos_per_s"] = round(done / dt, 1)
    print(f"  {done / dt:.1f} videos/s ({done * 5 / dt:.0f} frames/s; device "
          f"record 674 f/s needs 134.8 videos/s)")

    path = os.path.join(REPO, ".synth", "hostpath_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
