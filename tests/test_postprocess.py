"""Original-size eval postprocessing (ref d2 sem_seg_postprocess, used at
maskformer_model.py:422-433) and ignore-label-aware metrics."""

import numpy as np
import torch
import torch.nn.functional as F

from combo_avs_tpu.data.mappers import AVSSemanticDatasetMapper
from combo_avs_tpu.evaluation.evaluator import SemSegEvaluator
from combo_avs_tpu.evaluation.metrics import (
    batch_miou_fscore,
    eval_fmeasure,
    mask_iou,
)
from combo_avs_tpu.evaluation.postprocess import (
    crop_and_resize_gt,
    sem_seg_postprocess,
)


def torch_sem_seg_postprocess(result, img_size, output_height, output_width):
    """d2 reference: crop the valid region then bilinear align_corners=False."""
    result = result[:, : img_size[0], : img_size[1]].expand(1, -1, -1, -1)
    return F.interpolate(
        result, size=(output_height, output_width), mode="bilinear",
        align_corners=False,
    )[0]


def test_sem_seg_postprocess_matches_d2():
    rng = np.random.RandomState(0)
    sem = rng.rand(2, 32, 32).astype(np.float32)  # [C, H_pad, W_pad]
    ours = sem_seg_postprocess(sem, (20, 26), 40, 52)
    ref = torch_sem_seg_postprocess(torch.from_numpy(sem), (20, 26), 40, 52)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)
    # identity when sizes match: pure crop
    same = sem_seg_postprocess(sem, (20, 26), 20, 26)
    np.testing.assert_array_equal(same, sem[:, :20, :26])
    # batched [N, C, H, W] form
    semb = rng.rand(3, 2, 16, 16).astype(np.float32)
    outb = sem_seg_postprocess(semb, (10, 12), 10, 12)
    np.testing.assert_array_equal(outb, semb[:, :, :10, :12])


def test_crop_and_resize_gt_nearest():
    gt = np.arange(5 * 8 * 8).reshape(5, 8, 8) % 3
    out = crop_and_resize_gt(gt, (6, 6), 6, 6)
    np.testing.assert_array_equal(out, gt[:, :6, :6])
    up = crop_and_resize_gt(gt, (6, 6), 12, 12)
    assert up.shape == (5, 12, 12)
    assert set(np.unique(up)) <= set(np.unique(gt))  # labels stay integral


def test_mask_iou_ignore_equals_crop():
    rng = np.random.RandomState(1)
    pred = rng.rand(4, 16, 16)
    gt = (rng.rand(4, 16, 16) > 0.6).astype(np.int32)
    gt[1] = 0  # empty-GT special case survives the ignore path
    # pad right/bottom border with ignore=255
    gtp = np.full((4, 20, 20), 255, np.int32)
    gtp[:, :16, :16] = gt
    predp = np.zeros((4, 20, 20))
    predp[:, :16, :16] = pred
    ign = gtp == 255
    np.testing.assert_allclose(
        mask_iou(predp, np.where(ign, 0, gtp), ignore=ign),
        mask_iou(pred, gt),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        eval_fmeasure(predp, np.where(ign, 0, gtp), ignore=ign),
        eval_fmeasure(pred, gt),
        rtol=1e-9,
    )


def test_batch_miou_ignore_label_excludes_padding():
    rng = np.random.RandomState(2)
    out = rng.rand(3, 5, 12, 12)
    tgt = rng.randint(0, 5, (3, 12, 12))
    outp = np.zeros((3, 5, 16, 16))
    outp[:, :, :12, :12] = out
    outp[:, 0, 12:, :] = 9.0  # padding region predicts class 0 strongly
    outp[:, 0, :, 12:] = 9.0
    tgtp = np.full((3, 16, 16), 255)
    tgtp[:, :12, :12] = tgt
    a = batch_miou_fscore(out, tgt, 5)
    b = batch_miou_fscore(outp, tgtp, 5, ignore_label=255)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=1e-12)


def test_evaluator_non224_record(tmp_path):
    """VERDICT item 8: a non-224 record — frames 160x200 padded to S=224 with
    ignore 255 — must evaluate identically to direct metrics on the unpadded
    region."""
    import cv2

    rng = np.random.RandomState(3)
    T, h, w, S = 2, 160, 200, 224
    fdir = tmp_path / "frames"
    mdir = tmp_path / "masks"
    fdir.mkdir()
    mdir.mkdir()
    gts = []
    for i in range(T):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(fdir / f"f{i}.png"), img)
        m = (rng.rand(h, w) > 0.5).astype(np.uint8) * 255
        gts.append((m // 255).astype(np.int32))
        cv2.imwrite(str(mdir / f"f{i}.png"), m)
    import pickle

    with open(tmp_path / "a.pkl", "wb") as f:
        pickle.dump(np.zeros((T, 1, 96, 64), np.float32), f)
    record = {
        "num_frames": T,
        "file_names": [str(fdir / f"f{i}.png") for i in range(T)],
        "sem_seg_file_names": [str(mdir / f"f{i}.png") for i in range(T)],
        "audio_file_name": str(tmp_path / "a.pkl"),
        "gt_temporal_mask_flag": [1] * T,
        "vid_temporal_mask_flag": [1] * T,
    }
    mapper = AVSSemanticDatasetMapper(
        is_train=False, max_instances=4, use_pre_sam=False, size_divisibility=S
    )
    out = mapper(record)
    assert out["images"].shape == (T, S, S, 3)
    np.testing.assert_array_equal(out["image_size"], [h, w])
    assert int(out["height"]) == h and int(out["width"]) == w
    assert (out["sem_segs"][:, h:, :] == 255).all()
    assert (out["sem_segs"][:, :, w:] == 255).all()

    # synthetic logits at padded size -> postprocess -> evaluator
    sem = rng.rand(T, 2, S, S).astype(np.float32)
    pred = sem_seg_postprocess(sem, out["image_size"], h, w)
    gt = crop_and_resize_gt(out["sem_segs"], out["image_size"], h, w)
    ev = SemSegEvaluator()
    ev.process(pred, gt)
    got = ev.evaluate()["sem_seg"]

    # direct computation on the unpadded arrays
    probs = np.exp(sem[:, :, :h, :w]) / np.exp(sem[:, :, :h, :w]).sum(1, keepdims=True)
    want_iou = mask_iou(probs[:, 1].astype(np.float64), np.stack(gts))
    want_f = eval_fmeasure(probs[:, 1].astype(np.float64), np.stack(gts))
    np.testing.assert_allclose(got["mIoU"], round(want_iou, 4), atol=1e-4)
    np.testing.assert_allclose(got["f_score"], round(want_f, 4), atol=1e-4)

    # the padded-GT trap (VERDICT weak#4): feeding the PADDED arrays through
    # the evaluator now also gives the same numbers, because 255 is excluded
    ev2 = SemSegEvaluator()
    ev2.process(sem, out["sem_segs"])
    got2 = ev2.evaluate()["sem_seg"]
    np.testing.assert_allclose(got2["mIoU"], got["mIoU"], atol=2e-3)
