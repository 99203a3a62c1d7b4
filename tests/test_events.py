"""EventStorage / writer tests (d2 EventStorage surface, SURVEY §5)."""

import json

from combo_avs_tpu.utils.events import EventStorage, JSONWriter, TensorBoardWriter


def test_event_storage_latest_and_median():
    s = EventStorage(window_size=3)
    for it, v in enumerate([1.0, 5.0, 3.0, 7.0]):
        s.iter = it
        s.put_scalar("loss", v)
    assert s.latest()["loss"] == (7.0, 3)
    # window keeps the last 3: median(5, 3, 7) = 5
    assert s.median("loss") == 5.0
    sm = s.latest_with_smoothing_hint()
    assert sm["loss"] == (5.0, 3)


def test_json_writer_format(tmp_path):
    path = str(tmp_path / "metrics.json")
    s = EventStorage()
    w = JSONWriter(path)
    s.iter = 10
    s.put_scalars(total_loss=2.5, lr=1e-4)
    w.write(s)
    s.iter = 20
    s.put_scalar("total_loss", 1.5)
    w.write(s)
    rows = [json.loads(l) for l in open(path)]
    assert rows[0]["iteration"] == 10 and rows[0]["total_loss"] == 2.5
    assert rows[1]["iteration"] == 20
    # d2 semantics: only scalars recorded since the last write are emitted —
    # a stale lr must NOT be re-attributed to iteration 20
    assert "lr" not in rows[1]
    assert rows[1]["total_loss"] == 2.5  # upper median(1.5, 2.5) over the window
    # nothing new -> no row at all
    w.write(s)
    assert len(open(path).readlines()) == 2


def test_tensorboard_writer(tmp_path):
    s = EventStorage()
    s.put_scalar("x", 1.0)
    w = TensorBoardWriter(str(tmp_path / "tb"))
    w.write(s)
    w.close()
    files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert files, "no tensorboard event file written"


def test_verify_results():
    """d2 verify_results semantics (ref: train_net.py:262): pass within
    tolerance, raise on mismatch, no-op when EXPECTED_RESULTS is empty."""
    import pytest

    from combo_avs_tpu.config import get_cfg
    from combo_avs_tpu.train.trainer import verify_results

    cfg = get_cfg()
    res = {"sem_seg": {"mIoU": 81.7, "f_score": 90.1}}
    assert verify_results(cfg, res)  # empty -> no-op

    cfg.TEST.EXPECTED_RESULTS = [["sem_seg", "mIoU", 81.5, 0.5]]
    assert verify_results(cfg, res)

    cfg.TEST.EXPECTED_RESULTS = [["sem_seg", "mIoU", 70.0, 0.5]]
    with pytest.raises(AssertionError):
        verify_results(cfg, res)
