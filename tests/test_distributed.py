"""Multi-host wiring: record/batch sharding and cross-host evaluator merge
(the reference's DDP equivalents: per-rank loaders + meter all_gather,
ref: train_net.py:284-291, sem_seg_evaluation.py:256-265)."""

import numpy as np

from combo_avs_tpu.data.loader import TrainLoader
from combo_avs_tpu.evaluation.evaluator import SemSegEvaluator, SemSegEvaluatorSS
from combo_avs_tpu.parallel import distributed
from combo_avs_tpu.train.trainer import shard_records


def test_shard_records_disjoint_covering():
    records = [{"id": i} for i in range(11)]
    shards = [shard_records(records, p, 4) for p in range(4)]
    ids = [r["id"] for s in shards for r in s]
    assert sorted(ids) == list(range(11))  # disjoint + covering
    assert len(set(map(len, shards))) <= 2  # balanced within 1
    assert shard_records(records, 0, 1) is records


def test_train_loader_host_shards_are_disjoint_slices():
    records = [{"id": i, "num_frames": 5} for i in range(64)]
    mapper = lambda r: {"x": np.array([r["id"]])}  # noqa: E731
    loaders = [
        TrainLoader(records, mapper, batch_size=8, seed=7, num_workers=1,
                    shard_index=p, num_shards=2)
        for p in range(2)
    ]
    try:
        for _ in range(3):  # same seed => same global batch; disjoint halves
            b0 = next(loaders[0])["x"].ravel()
            b1 = next(loaders[1])["x"].ravel()
            assert len(b0) == len(b1) == 4
            assert set(b0).isdisjoint(set(b1))
    finally:
        for ld in loaders:
            ld.close()


def test_evaluator_merge_equals_full_pass():
    rng = np.random.RandomState(0)
    videos = [(rng.rand(2, 2, 8, 8), rng.randint(0, 2, (2, 8, 8))) for _ in range(6)]
    full = SemSegEvaluator()
    for sem, gt in videos:
        full.process(sem, gt)
    parts = [SemSegEvaluator(), SemSegEvaluator()]
    for i, (sem, gt) in enumerate(videos):  # two fake hosts, round-robin
        parts[i % 2].process(sem, gt)
    parts[0].merge(parts[1])
    assert parts[0].evaluate() == full.evaluate()

    full_ss = SemSegEvaluatorSS(num_classes=4)
    parts_ss = [SemSegEvaluatorSS(num_classes=4), SemSegEvaluatorSS(num_classes=4)]
    for i in range(6):
        sem = rng.rand(2, 4, 8, 8)
        gt = rng.randint(0, 4, (2, 8, 8))
        full_ss.process(sem, gt)
        parts_ss[i % 2].process(sem, gt)
    parts_ss[0].merge(parts_ss[1])
    assert parts_ss[0].evaluate() == full_ss.evaluate()


def test_merge_evaluator_across_hosts_wiring(monkeypatch):
    """Fake a 2-host world where the peer holds identical accumulators: every
    accumulator must exactly double and the mean metrics stay unchanged."""
    ev = SemSegEvaluator()
    rng = np.random.RandomState(1)
    ev.process(rng.rand(2, 2, 8, 8), rng.randint(0, 2, (2, 8, 8)))
    before = ev.evaluate()
    monkeypatch.setattr(distributed.jax, "process_count", lambda: 2)
    monkeypatch.setattr(distributed, "all_sum_array", lambda x: 2 * np.asarray(x))
    distributed.merge_evaluator_across_hosts(ev)
    assert ev._count == 2
    assert ev.evaluate() == before

    ev_ss = SemSegEvaluatorSS(num_classes=3)
    ev_ss.process(rng.rand(2, 3, 8, 8), rng.randint(0, 3, (2, 8, 8)))
    before_ss = ev_ss.evaluate()
    iou_before = ev_ss._iou_pc.copy()
    distributed.merge_evaluator_across_hosts(ev_ss)
    np.testing.assert_allclose(ev_ss._iou_pc, 2 * iou_before)
    assert ev_ss.evaluate() == before_ss
