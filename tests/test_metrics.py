"""Metric parity vs torch oracles implementing the reference formulas."""

import numpy as np
import torch

from combo_avs_tpu.evaluation.evaluator import SemSegEvaluator, SemSegEvaluatorSS
from combo_avs_tpu.evaluation.metrics import batch_miou_fscore, eval_fmeasure, mask_iou


def torch_mask_iou(pred, target, eps=1e-7):
    N = pred.size(0)
    p = (pred > 0.5).int()
    num_pixels = p.size(-1) * p.size(-2)
    no_obj = target.sum(2).sum(1) == 0
    inter = (p * target.int()).sum(2).sum(1)
    union = torch.max(p, target.int()).sum(2).sum(1)
    inter_no = ((1 - target.int()) * (1 - p)).sum(2).sum(1)
    inter[no_obj] = inter_no[no_obj]
    union[no_obj] = num_pixels
    return float(torch.sum(inter / (union + eps)) / N)


def torch_fmeasure(pred, gt, pr_num=255):
    beta2 = 0.3
    avg_f, img_num = 0.0, 0
    score = torch.zeros(pr_num)
    thlist = torch.linspace(0, 1 - 1e-10, pr_num)
    for i in range(pred.size(0)):
        if torch.mean(gt[i]) == 0.0:
            continue
        prec = torch.zeros(pr_num)
        rec = torch.zeros(pr_num)
        for t in range(pr_num):
            y = (pred[i] >= thlist[t]).float()
            tp = (y * gt[i]).sum()
            prec[t] = tp / (y.sum() + 1e-20)
            rec[t] = tp / (gt[i].sum() + 1e-20)
        f = (1 + beta2) * prec * rec / (beta2 * prec + rec)
        f[f != f] = 0
        avg_f += f
        img_num += 1
        score = avg_f / img_num
    return float(score.max())


def test_mask_iou_matches_torch():
    rng = np.random.RandomState(0)
    pred = rng.rand(5, 16, 16).astype(np.float32)
    gt = (rng.rand(5, 16, 16) > 0.6).astype(np.float32)
    gt[2] = 0  # empty-GT frame -> special case
    ours = mask_iou(pred, gt)
    ref = torch_mask_iou(torch.from_numpy(pred), torch.from_numpy(gt))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_fmeasure_matches_torch():
    rng = np.random.RandomState(1)
    pred = rng.rand(4, 12, 12).astype(np.float32)
    gt = (rng.rand(4, 12, 12) > 0.5).astype(np.float32)
    gt[0] = 0  # skipped frame
    ours = eval_fmeasure(pred, gt)
    ref = torch_fmeasure(torch.from_numpy(pred), torch.from_numpy(gt))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def _dense_fmeasure(pred, gt, pr_num=255, ignore=None):
    """The pre-r5 dense [pr_num, HW] sweep, kept as the oracle for the
    histogram rewrite (metrics.py eval_fmeasure)."""
    beta2 = 0.3
    thresholds = np.linspace(0, 1 - 1e-10, pr_num, dtype=np.float64)
    avg_f = np.zeros(pr_num, np.float64)
    img_num = 0
    for i in range(pred.shape[0]):
        g = (gt[i] > 0).astype(np.float64)
        p = pred[i].astype(np.float64).reshape(-1)
        gflat = g.reshape(-1)
        if ignore is not None:
            keep = ~ignore[i].astype(bool).reshape(-1)
            p, gflat = p[keep], gflat[keep]
        if gflat.size == 0 or gflat.mean() == 0.0:
            continue
        y = p[None, :] >= thresholds[:, None]
        tp = (y * gflat[None, :]).sum(-1)
        prec = tp / (y.sum(-1) + 1e-20)
        recall = tp / (gflat.sum() + 1e-20)
        with np.errstate(divide="ignore", invalid="ignore"):
            f = (1 + beta2) * prec * recall / (beta2 * prec + recall)
        avg_f += np.nan_to_num(f, nan=0.0)
        img_num += 1
    return 0.0 if img_num == 0 else float((avg_f / img_num).max())


def test_fmeasure_histogram_equals_dense_sweep():
    """Ties-heavy inputs: predictions quantized EXACTLY onto the threshold
    grid (the >= boundary case), plus values outside [t0, t254], plus an
    ignore mask — histogram sweep must match the dense sweep bitwise."""
    rng = np.random.RandomState(7)
    thresholds = np.linspace(0, 1 - 1e-10, 255)
    pred = thresholds[rng.randint(0, 255, (4, 20, 20))]
    pred[0, 0, :5] = 1.0  # above the top threshold
    pred[1, 1, :5] = -0.25  # below threshold 0 (passes none)
    gt = (rng.rand(4, 20, 20) > 0.5).astype(np.float32)
    assert eval_fmeasure(pred, gt) == _dense_fmeasure(pred, gt)

    ignore = rng.rand(4, 20, 20) > 0.8
    assert eval_fmeasure(pred, gt, ignore=ignore) == _dense_fmeasure(
        pred, gt, ignore=ignore)


def test_fmeasure_nan_pred_passes_no_threshold():
    """NaN predictions (a diverged model mid-training) must behave like the
    dense sweep's `NaN >= t == False` — counted in no threshold bin — not
    crash the arithmetic binning (NaN floors to INT64_MIN unsanitized)."""
    rng = np.random.RandomState(3)
    pred = rng.rand(2, 16, 16)
    gt = (rng.rand(2, 16, 16) > 0.5).astype(np.float32)
    nan_pred = pred.copy()
    nan_pred[0, :4, :] = np.nan
    zero_pred = pred.copy()
    zero_pred[0, :4, :] = -1.0  # also passes no threshold
    got = eval_fmeasure(nan_pred, gt)
    assert np.isfinite(got)
    assert got == eval_fmeasure(zero_pred, gt) == _dense_fmeasure(zero_pred, gt)


def test_batch_miou_fscore_matches_torch_histc():
    """Oracle: the torch.histc-based per-class computation."""
    rng = np.random.RandomState(2)
    N, C, H, W = 3, 7, 10, 10
    out = rng.rand(N, C, H, W).astype(np.float32)
    tgt = rng.randint(0, C, (N, H, W))

    ious, fs, cls = batch_miou_fscore(out, tgt, C)

    # torch spelling
    to, tt = torch.from_numpy(out), torch.from_numpy(tgt)
    predict = torch.argmax(to, 1).float() + 1
    t = tt.float() + 1
    predict = predict * (t > 0).float()
    inter = predict * (predict == t).float()
    ious_r = torch.zeros(C)
    fs_r = torch.zeros(C)
    cls_r = torch.zeros(C)
    for i in range(N):
        ai = torch.histc(inter[i], bins=C, min=1, max=C)
        ap = torch.histc(predict[i], bins=C, min=1, max=C)
        al = torch.histc(t[i], bins=C, min=1, max=C)
        au = ap + al - ai
        ious_r += ai / (2.220446049250313e-16 + au)
        cls_r[torch.nonzero(au).squeeze(-1)] += 1
        prec, rec = ai / ap, ai / al
        f = 1.3 * prec * rec / (0.3 * prec + rec)
        f[torch.isnan(f)] = 0
        fs_r += f
    np.testing.assert_allclose(ious, ious_r.numpy(), rtol=1e-5)
    np.testing.assert_allclose(fs, fs_r.numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(cls, cls_r.numpy())


def test_eval_host_keepup_production_shape():
    """Keep-up regression guard (VERDICT r4 weak #3): per-video metric math
    at the PRODUCTION eval shape (5 frames, 224x224) must stay O(HW).
    Measured ~16 ms/video on this 1-core box (docs/PROFILE_r5.md section 5);
    the pre-r5 dense [255, HW] sweep took ~300 ms/video. The 150 ms bound is
    ~10x above measured but 2x below the dense regression, so it is robust
    to load yet catches a complexity backslide."""
    import time

    rng = np.random.RandomState(11)
    sem = rng.randn(5, 2, 224, 224).astype(np.float32)
    gt = (rng.rand(5, 224, 224) > 0.5).astype(np.uint8)
    ev = SemSegEvaluator()
    ev.process(sem, gt)  # warm numpy/openblas paths
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        ev.process(sem, gt)
    per_video = (time.perf_counter() - t0) / n
    assert per_video < 0.15, f"eval metric math too slow: {per_video:.3f} s/video"


def test_evaluators_end_to_end():
    rng = np.random.RandomState(3)
    ev = SemSegEvaluator()
    for _ in range(3):
        sem = rng.randn(5, 2, 16, 16).astype(np.float32)
        gt = (rng.rand(5, 16, 16) > 0.5).astype(np.float32)
        ev.process(sem, gt)
    res = ev.evaluate()["sem_seg"]
    assert 0 <= res["mIoU"] <= 1 and 0 <= res["f_score"] <= 1

    # perfect prediction -> mIoU 1.0
    ev2 = SemSegEvaluator()
    gt = (rng.rand(5, 16, 16) > 0.5).astype(np.float32)
    sem = np.stack([1 - gt, gt], axis=1) * 20
    ev2.process(sem, gt)
    assert ev2.evaluate()["sem_seg"]["mIoU"] == 1.0

    evss = SemSegEvaluatorSS(num_classes=7)
    gt_ss = rng.randint(0, 7, (10, 16, 16))
    sem_ss = np.eye(7, dtype=np.float32)[gt_ss].transpose(0, 3, 1, 2) * 10
    evss.process(sem_ss, gt_ss)
    r = evss.evaluate()["sem_seg"]
    assert r["mIoU"] == 1.0 and r["f_score"] == 1.0

    # merge across "hosts" halves nothing (sums are additive)
    ev3 = SemSegEvaluator()
    ev3.merge(ev2)
    assert ev3.evaluate()["sem_seg"]["mIoU"] == 1.0
