"""Trainer: config -> model/criterion/optimizer/loaders -> sharded train loop
with periodic eval, best-checkpoint tracking, and resume.

Replaces the reference's detectron2 `DefaultTrainer` subclass + hooks
(ref: train_net.py:65-226, models/engine/hooks.py:14-101,
models/evaluation/evaluator.py:106-255): one jitted train step over the data
mesh, eval every TEST.EVAL_PERIOD iters with the benchmark evaluator,
`model_best` kept on the eval metric, periodic + final orbax checkpoints,
greppable timing logs in the reference's format ("s / iter per device").
"""

from __future__ import annotations

import collections
import json
import logging
import os
import time
import warnings
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from combo_avs_tpu.data.catalogs import DatasetCatalog, MetadataCatalog
from combo_avs_tpu.data.loader import TrainLoader, eval_loader
from combo_avs_tpu.data.mappers import AVSSemanticDatasetMapper
from combo_avs_tpu.evaluation.evaluator import (
    SemSegEvaluator,
    SemSegEvaluatorSS,
    eval_video_partial,
)
from combo_avs_tpu.evaluation.postprocess import crop_and_resize_gt, sem_seg_postprocess
from combo_avs_tpu.parallel.distributed import merge_evaluator_across_hosts
from combo_avs_tpu.losses.criterion import SetCriterion, build_weight_dict
from combo_avs_tpu.losses.matcher import HungarianMatcher
from combo_avs_tpu.models.meta_arch import build_model
from combo_avs_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from combo_avs_tpu.train.checkpoint import (
    BestCheckpointer,
    load_checkpoint,
    save_checkpoint,
)
from combo_avs_tpu.train.optim import build_optimizer
from combo_avs_tpu.utils.events import EventStorage, JSONWriter, TensorBoardWriter
from combo_avs_tpu.train.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
    make_tta_eval_step,
)

logger = logging.getLogger("COMBO")


def build_mapper(cfg, is_train: bool, max_instances: Optional[int] = None):
    name = cfg.INPUT.DATASET_MAPPER_NAME
    binary_gt = name in ("avss4_semantic", "avsms3_semantic")
    if max_instances is None:
        max_instances = 3 if binary_gt else 12
    return AVSSemanticDatasetMapper(
        is_train=is_train,
        augmentation=cfg.INPUT.AUGMENTATION,
        min_sizes=tuple(cfg.INPUT.MIN_SIZE_TRAIN),
        max_size=cfg.INPUT.MAX_SIZE_TRAIN,
        crop_size=tuple(cfg.INPUT.CROP.SIZE) if cfg.INPUT.CROP.ENABLED else None,
        color_aug=cfg.INPUT.COLOR_AUG_SSD,
        size_divisibility=cfg.INPUT.SIZE_DIVISIBILITY,
        ignore_label=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
        max_instances=max_instances,
        binary_gt=binary_gt,
        use_pre_sam=cfg.MODEL.PRE_SAM.USE_PRE_SAM,
        geometric_aug=name != "avss_semantic",
    )


def build_evaluator(cfg, dataset_name: str):
    etype = MetadataCatalog.get(dataset_name, {}).get("evaluator_type", "sem_seg")
    if etype == "sem_seg_ss":
        return SemSegEvaluatorSS(num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES)
    return SemSegEvaluator()


def build_criterion(cfg) -> SetCriterion:
    mf = cfg.MODEL.MASK_FORMER
    matcher = HungarianMatcher(
        cost_class=mf.CLASS_WEIGHT,
        cost_mask=mf.MASK_WEIGHT,
        cost_dice=mf.DICE_WEIGHT,
        num_points=mf.TRAIN_NUM_POINTS,
    )
    return SetCriterion(
        num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
        matcher=matcher,
        eos_coef=mf.NO_OBJECT_WEIGHT,
        num_points=mf.TRAIN_NUM_POINTS,
        oversample_ratio=mf.OVERSAMPLE_RATIO,
        importance_sample_ratio=mf.IMPORTANCE_SAMPLE_RATIO,
        cosine_n_frame=5,  # ref: criterion.py:282-286 always n_frame=5
        exact_topk=mf.get("EXACT_TOPK_POINTS", False),
    )


def shard_records(records, process_index: int, process_count: int):
    """Round-robin split of eval records across hosts (the reference shards
    its test loader per rank and all_gathers meters,
    ref: sem_seg_evaluation.py:256-265)."""
    if process_count <= 1:
        return records
    return records[process_index::process_count]


def _worker_result(fut, timeout: float = 600.0):
    """Fetch a COMBO_EVAL_PROCS worker result with a deadlock bound: a child
    forked while another thread held a lock (e.g. periodic eval forking over
    live TrainLoader cv2 threads) would hang forever in result() — surface
    that as an actionable error instead."""
    try:
        return fut.result(timeout=timeout)
    except TimeoutError:
        raise RuntimeError(
            f"COMBO_EVAL_PROCS metric worker returned nothing within "
            f"{timeout:.0f} s — likely a lock held across fork (periodic "
            f"eval forks while TrainLoader threads are live). Re-run with "
            f"COMBO_EVAL_PROCS=0 to process metrics inline.") from None


def evaluate(cfg, model, params, frozen, dataset_name: str,
             batch_size: int = 1, max_videos: Optional[int] = None,
             process_index: Optional[int] = None,
             process_count: Optional[int] = None,
             vis_dir: Optional[str] = None,
             mesh=None) -> Dict:
    """Run inference_on_dataset (ref: evaluator.py:106-255) and return
    {"sem_seg": {...}} metrics with the reference's timing logs. Under
    jax.distributed each host evaluates its record shard and accumulators
    are summed across hosts before the final mean.

    mesh: a local Mesh(("data",)) — when its size exceeds batch_size, the
    eval batch grows to one video per chip and is sharded on "data", so all
    local chips run inference (the reference's 1-process-per-GPU eval
    equivalent, ref: pred.py:231-238); per-bucket record lists are padded by
    repeating the last video and the duplicates are skipped at process time.

    vis_dir: dump per-frame colored prediction masks there (the surface the
    reference keeps commented out, ref: evaluator.py:172-198 +
    misc/visual.py)."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    records = DatasetCatalog[dataset_name]()
    if max_videos:
        records = records[:max_videos]
    records = shard_records(records, process_index, process_count)
    if process_count > 1 and mesh is not None:
        # multi-host eval shards RECORDS per host (above) AND fans each
        # host's batches out over its own chips: drop to this host's slice
        # of the mesh (the reference runs one eval rank per GPU,
        # ref: pred.py:231-238; VERDICT r4 missing #2)
        from combo_avs_tpu.parallel.mesh import local_mesh

        mesh = local_mesh(mesh)
    if mesh is not None and mesh.size > 1:
        # round UP to a multiple of the mesh so shard_batch always divides
        # (batch_size=3 on 2 chips -> 4), growing to >=1 video per chip
        batch_size = -(-max(batch_size, mesh.size) // mesh.size) * mesh.size
    if batch_size > 1:  # pad each frame-count bucket to full batches
        n_real = len(records)
        by_t: Dict[int, list] = {}
        for r in records:
            by_t.setdefault(r["num_frames"], []).append(r)
        records = []
        for _, recs in sorted(by_t.items()):
            pad = (-len(recs)) % batch_size
            records.extend(recs + [dict(recs[-1], _pad=True)] * pad)
        if len(records) > n_real:
            logger.info(
                "Eval fan-out padding: %d duplicate videos of %d total (%.1f%% "
                "of compute) to fill batch_size=%d buckets",
                len(records) - n_real, len(records),
                100.0 * (len(records) - n_real) / len(records), batch_size)
    mapper = build_mapper(cfg, is_train=False)
    evaluator = build_evaluator(cfg, dataset_name)
    size = cfg.INPUT.SIZE_DIVISIBILITY if cfg.INPUT.SIZE_DIVISIBILITY > 0 else 224
    bf16 = cfg.TEST.get("BF16", "auto")
    if bf16 == "auto":  # bf16 on accelerators, fp32 on CPU
        bf16 = jax.default_backend() != "cpu"
    if cfg.TEST.AUG.ENABLED:
        # multi-scale + flip TTA (the reference's TEST.AUG surface,
        # ref: train_net.py:259-260 — unimplemented there)
        eval_step = make_tta_eval_step(
            model, scales=list(cfg.TEST.AUG.MIN_SIZES), flip=cfg.TEST.AUG.FLIP,
            out_size=(size, size), bf16=bool(bf16))
    else:
        eval_step = make_eval_step(model, out_size=(size, size), bf16=bool(bf16))

    if vis_dir:
        os.makedirs(vis_dir, exist_ok=True)
    params_single, frozen_single = params, frozen
    if mesh is not None and mesh.size > 1:
        params, frozen = replicate((params, frozen), mesh)

    def _run_step(batch):
        """One eval step with the reference's OOM resilience analog
        (ref: retry_if_cuda_oom, maskformer_model.py:423-433): on TPU
        RESOURCE_EXHAUSTED, retry the batch one video at a time on the
        default device — the static-shape equivalent of halving (the
        singleton recompile is cached after the first fallback batch)."""
        try:
            if mesh is not None and mesh.size > 1:
                with mesh:
                    return np.asarray(
                        eval_step(params, frozen, shard_batch(batch, mesh)))
            return np.asarray(eval_step(params, frozen, batch))
        except Exception as e:  # jaxlib.XlaRuntimeError has no stable class path
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            B = batch["images"].shape[0]
            logger.warning(
                "eval step exhausted device memory at batch_size=%d; "
                "retrying one video at a time", B)
            outs = []
            for b in range(B):
                single = {k: v[b : b + 1] for k, v in batch.items()}
                outs.append(np.asarray(
                    eval_step(params_single, frozen_single, single)))
            return np.concatenate(outs, axis=0)

    # Optional process-parallel metric math: COMBO_EVAL_PROCS=N fans the
    # per-video postprocess+metrics (host-bound at ~22 videos/s/core,
    # docs/PROFILE_r5.md section 5) over N worker processes; partials merge
    # via the same merge() protocol as multi-host eval. "fork" context: spawn
    # and forkserver both re-import the caller's __main__ in the child
    # (breaking stdin-driven scripts), and the workers never touch jax — we
    # pre-fork ALL workers right here, before the EVAL loader's thread pool
    # exists. Residual hazard: periodic eval inside Trainer.train() forks
    # while the TrainLoader's cv2-decoding threads are live; if one holds a
    # cv2/allocator lock at fork, a child could deadlock — the .result()
    # timeouts below turn that into a loud error instead of a silent hang.
    # Vis dumps need the pred in-process, so --save-vis stays inline.
    eval_procs = int(os.environ.get("COMBO_EVAL_PROCS", "0") or 0)
    pool, pending = None, collections.deque()
    if eval_procs > 0 and not vis_dir:
        import multiprocessing
        from concurrent.futures import ProcessPoolExecutor

        pool = ProcessPoolExecutor(
            eval_procs, mp_context=multiprocessing.get_context("fork"))
        with warnings.catch_warnings():
            # py3.12 warns on fork-with-threads (jax's dispatch threads
            # exist); the workers are jax-free numpy-only, so the usual
            # hazard doesn't apply — silence the per-eval spam
            warnings.simplefilter("ignore", DeprecationWarning)
            for f in [pool.submit(int, 0) for _ in range(eval_procs)]:
                f.result()  # force the forks now (executor forks lazily)
        ev_kind = "sem_seg_ss" if isinstance(evaluator, SemSegEvaluatorSS) \
            else "sem_seg"
        ev_classes = getattr(evaluator, "num_classes", 2)

    n_videos_total = len(records)
    n_done, n_frames_total = 0, 0
    # three-way phase split like the reference: data / compute /
    # eval-postprocess (ref: evaluator.py:149-244 times all three)
    t_compute, t_data, t_eval, t0 = 0.0, 0.0, 0.0, time.perf_counter()
    t_mark = t_log = time.perf_counter()
    try:
        for batch, recs in eval_loader(records, mapper, batch_size=batch_size,
                                       with_records=True):
            t_data += time.perf_counter() - t_mark
            tc = time.perf_counter()
            # ship ONLY the model inputs to the device: GT/shape metadata
            # (sem_segs, image_size, ...) are host-side and would be dead H2D
            # bytes (sem_segs alone is 25% of an AVSS eval batch)
            sem = _run_step({k: batch[k] for k in (
                "images", "audio_log_mel", "pre_masks", "vid_temporal_mask")
                if k in batch})
            t_compute += time.perf_counter() - tc
            n_done += len(recs)
            # rate-limited progress with ETA, the reference's in-loop log
            # (ref: evaluator.py:213-226 logs every >=5 s after warmup)
            now = time.perf_counter()
            if now - t_log >= 5.0 and n_done < n_videos_total:
                per_video = (now - t0) / n_done
                eta = int(per_video * (n_videos_total - n_done))
                logger.info(
                    "Inference done %d/%d. Dataloading: %.4f s/video. "
                    "Inference: %.4f s/video. Eval: %.4f s/video. "
                    "Total: %.4f s/video. ETA=%d:%02d:%02d",
                    n_done, n_videos_total, t_data / n_done, t_compute / n_done,
                    t_eval / n_done,
                    per_video, eta // 3600, eta % 3600 // 60, eta % 60)
                t_log = now
            te = time.perf_counter()
            B, T = batch["images"].shape[:2]
            sem = sem.reshape(B, T, *sem.shape[1:])
            for b in range(B):
                if recs[b].get("_pad"):
                    continue  # bucket-fill duplicate (multi-chip batch padding)
                # original-size postprocess (ref: maskformer_model.py:397-441):
                # crop the padded region, resize pred + GT to the record's (h, w)
                hw = batch["image_size"][b]
                oh, ow = int(batch["height"][b]), int(batch["width"][b])
                if pool is not None:
                    pending.append(pool.submit(
                        eval_video_partial, ev_kind, ev_classes, sem[b],
                        batch["sem_segs"][b], (int(hw[0]), int(hw[1])), oh, ow))
                    # bounded in-flight queue: drain oldest once 4 videos per
                    # worker are queued, so memory stays O(procs), not O(dataset)
                    while len(pending) > 4 * eval_procs:
                        evaluator.merge(_worker_result(pending.popleft()))
                    continue
                pred = sem_seg_postprocess(sem[b], hw, oh, ow)
                gt = crop_and_resize_gt(batch["sem_segs"][b], hw, oh, ow)
                evaluator.process(pred, gt)
                if vis_dir:
                    save_prediction_vis(vis_dir, recs[b]["video"], pred)
            # count only real videos (not bucket-fill duplicates) so the
            # reference-format s/iter logs state true per-frame throughput
            n_frames_total += sum(T for r in recs if not r.get("_pad"))
            t_eval += time.perf_counter() - te
            t_mark = time.perf_counter()

        if pool is not None:  # drain the tail and fold worker time into t_eval
            te = time.perf_counter()
            while pending:
                evaluator.merge(_worker_result(pending.popleft()))
            pool.shutdown()
            t_eval += time.perf_counter() - te
    finally:
        if pool is not None:  # idempotent; reaps workers on error paths
            pool.shutdown(wait=False, cancel_futures=True)

    total = time.perf_counter() - t0
    n_iter = max(n_frames_total, 1)
    logger.info(
        "Total inference time: %.6f s (%.6f s / iter per device, on %d devices)",
        total, total / n_iter, jax.local_device_count(),
    )
    logger.info(
        "Total inference pure compute time: %.6f s (%.6f s / iter per device, on %d devices)",
        t_compute, t_compute / n_iter, jax.local_device_count(),
    )
    logger.info(
        "Total eval (postprocess+metrics) time: %.6f s (%.6f s / iter per device, on %d devices)",
        t_eval, t_eval / n_iter, jax.local_device_count(),
    )
    merge_evaluator_across_hosts(evaluator)
    results = evaluator.evaluate()
    # artifact dump + csv summary on the main process, like the reference
    # (ref: sem_seg_evaluation.py:273-277 torch.save; pred.py:183
    # print_csv_format)
    if jax.process_index() == 0 and cfg.OUTPUT_DIR:
        # per-dataset folder like d2, so multi-dataset eval doesn't overwrite
        inference_dir = os.path.join(cfg.OUTPUT_DIR, "inference", dataset_name)
        os.makedirs(inference_dir, exist_ok=True)
        try:
            import torch

            torch.save(results["sem_seg"],
                       os.path.join(inference_dir, "sem_seg_evaluation.pth"))
        except Exception:  # torch-less deployments still get the json
            with open(os.path.join(inference_dir, "sem_seg_evaluation.json"), "w") as f:
                json.dump(results["sem_seg"], f)
        print_csv_format(results)
    return results


def save_prediction_vis(vis_dir: str, video: str, pred: np.ndarray) -> None:
    """Dump one colored PNG per frame. pred [T, C, H, W] class scores:
    argmax over classes — for C==2 this is exactly the evaluator's decision
    rule (softmax fg > 0.5 <=> fg score > bg score, metrics.py) so the
    dumped masks agree with the reported mIoU (ref: the commented vis path,
    evaluator.py:172-198; palettes from misc/visual.py)."""
    from combo_avs_tpu.evaluation.visual import (
        binary_color_map, save_mask_png, v2_pallete)

    T, C = pred.shape[:2]
    palette = binary_color_map() if C <= 2 else v2_pallete(C)
    for t in range(T):
        mask = pred[t].argmax(0).astype(np.int32)
        save_mask_png(os.path.join(vis_dir, f"{video}_{t}.png"), mask, palette)


def verify_results(cfg, results: Dict) -> bool:
    """d2's verify_results: compare metrics against
    cfg.TEST.EXPECTED_RESULTS = [[task, metric, expected, tolerance], ...]
    (ref: train_net.py:262, pred.py:222; no shipped config sets it, matching
    the reference's empty default). Raises on mismatch, like d2."""
    expected = cfg.TEST.get("EXPECTED_RESULTS", [])
    if not expected:
        return True
    ok = True
    for task, metric, expected_val, tolerance in expected:
        actual = results[task][metric]
        good = abs(actual - expected_val) <= tolerance
        ok = ok and good
        logger.info("%s: %s = %.4f (expected %.4f +/- %.4f) %s",
                    task, metric, actual, expected_val, tolerance,
                    "OK" if good else "FAILED")
    if not ok:
        raise AssertionError(f"Result verification failed: {expected}")
    logger.info("Results verification passed.")
    return ok


def print_csv_format(results: Dict) -> None:
    """d2 print_csv_format: greppable 'copypaste:' lines per task."""
    for task, metrics in results.items():
        logger.info("Evaluation results for %s:", task)
        logger.info("copypaste: Task: %s", task)
        logger.info("copypaste: %s", ",".join(metrics.keys()))
        logger.info("copypaste: %s",
                    ",".join(f"{v:.4f}" for v in metrics.values()))


class Trainer:
    """DefaultTrainer equivalent."""

    def __init__(self, cfg, n_devices: Optional[int] = None):
        self.cfg = cfg
        self.mesh = make_mesh(n_devices)
        self.model = build_model(cfg, deterministic=False)
        self.eval_model = build_model(cfg, deterministic=True)
        self.criterion = build_criterion(cfg)
        self.weight_dict = build_weight_dict(cfg)
        os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
        self.best_ckpt = BestCheckpointer(cfg.OUTPUT_DIR, metric="mIoU")
        self.metrics_file = os.path.join(cfg.OUTPUT_DIR, "metrics.jsonl")
        # d2-style event storage + writers (SURVEY §5: EventStorage,
        # metrics.json, TensorBoard) — main process only, like d2's
        # default_writers (multi-host runs share OUTPUT_DIR)
        self.storage = EventStorage()
        self.writers = [] if jax.process_index() != 0 else [
            JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json")),
            TensorBoardWriter(os.path.join(cfg.OUTPUT_DIR, "tb")),
        ]
        self.state = None
        self.start_iter = 0

    def _train_loader(self) -> Iterator:
        records = DatasetCatalog[self.cfg.DATASETS.TRAIN[0]]()
        mapper = build_mapper(self.cfg, is_train=True)
        # multi-host: each process loads its slice of the global batch
        # (ref DDP: one rank per GPU loads its own shard via the d2 sampler)
        return TrainLoader(
            records, mapper,
            batch_size=self.cfg.SOLVER.IMS_PER_BATCH,
            num_workers=self.cfg.DATALOADER.NUM_WORKERS,
            shard_index=jax.process_index(),
            num_shards=jax.process_count(),
        )

    def resume_or_load(self, resume: bool = False):
        ckpts = []
        if os.path.isdir(self.cfg.OUTPUT_DIR):
            ckpts = sorted(
                (d for d in os.listdir(self.cfg.OUTPUT_DIR) if d.startswith("step_")),
                key=lambda d: int(d.split("_")[1]),
            )
        if resume and ckpts:
            path = os.path.join(self.cfg.OUTPUT_DIR, ckpts[-1])
            logger.info("Resuming from %s", path)
            self.state = load_checkpoint(path, self._abstract_state())
            self.start_iter = int(np.asarray(self.state.step))
        # else: pretrained initial weights are loaded by the caller via
        # checkpoint.convert_* (MODEL.WEIGHTS)

    def _abstract_state(self):
        batch = self._sample_batch()
        key = jax.random.PRNGKey(0)
        # everything abstract: init is traced, never executed
        abstract_vars = jax.eval_shape(
            lambda: self._init_variables(batch, key, jit=False)
        )
        optimizer, _ = build_optimizer(self.cfg, abstract_vars["params"])
        return jax.eval_shape(
            lambda: create_train_state(self.model, optimizer, batch, key)
        )

    def _sample_batch(self):
        loader = self._train_loader()
        batch = next(loader)
        loader.close()
        return batch

    def _init_variables(self, batch, key, jit: bool = True):
        init = jax.jit(self.model.init) if jit else self.model.init
        return init(
            {"params": key, "dropout": jax.random.fold_in(key, 1)},
            batch["images"], batch["audio_log_mel"], batch.get("pre_masks"),
            batch.get("vid_temporal_mask"),
        )

    def train(self, max_iter: Optional[int] = None, log_every: int = 20):
        cfg = self.cfg
        max_iter = max_iter or cfg.SOLVER.MAX_ITER
        loader = self._train_loader()
        batch0 = next(loader)

        key0 = jax.random.PRNGKey(cfg.get("SEED", 0) or 0)
        with self.mesh:
            if self.state is None:
                variables = self._init_variables(batch0, key0)
                optimizer, schedule = build_optimizer(cfg, variables["params"])
                self.state = create_train_state(
                    self.model, optimizer, batch0, key0, variables=variables
                )
            else:  # resumed: derive the optimizer masks from the loaded params
                optimizer, schedule = build_optimizer(cfg, self.state.params)
            self.state = replicate(self.state, self.mesh)
            train_step = make_train_step(self.model, self.criterion, self.weight_dict, optimizer, amp=cfg.SOLVER.AMP.ENABLED)
            # dropout/point-sampling stream derives from cfg.SEED (folded per
            # step inside train_step), so runs are reproducible per seed
            key = jax.random.fold_in(key0, 1234)

            # train-time accounting EXCLUDES eval/checkpoint pauses (like
            # d2's per-iter timer), so the greppable s/iter lines measure
            # the train step only; n_timed resets with the timer.
            # data_time = host wait on next(loader), tracked separately like
            # d2's run_step data_time metric — a growing share flags a
            # host-bound loader (the chip idles waiting for batches)
            t0, n_timed, t_data = time.perf_counter(), 0, 0.0
            try:
                for it in range(self.start_iter, max_iter):
                    td = time.perf_counter()
                    batch = batch0 if it == self.start_iter else next(loader)
                    t_data += time.perf_counter() - td
                    batch = shard_batch(batch, self.mesh)
                    self.state, metrics = train_step(self.state, batch, key)
                    n_timed += 1

                    if (it + 1) % log_every == 0 or it + 1 == max_iter:
                        loss = float(metrics["total_loss"])
                        dt = (time.perf_counter() - t0) / max(n_timed, 1)
                        ddt = t_data / max(n_timed, 1)
                        lr = float(schedule(it))
                        logger.info(
                            "iter %d/%d total_loss %.4f lr %.2e (%.3f s/iter, "
                            "data_time %.3f s/iter)",
                            it + 1, max_iter, loss, lr, dt, ddt,
                        )
                        if jax.process_index() == 0:
                            with open(self.metrics_file, "a") as f:
                                f.write(json.dumps({"iter": it + 1, "total_loss": loss, "lr": lr, "s_per_iter": round(dt, 4), "data_time": round(ddt, 4)}) + "\n")
                        self.storage.iter = it + 1
                        self.storage.put_scalars(
                            total_loss=loss, lr=lr,
                            **{k: float(v) for k, v in metrics.items() if k != "total_loss"},
                        )
                        for w in self.writers:
                            w.write(self.storage)
                        t0, n_timed, t_data = time.perf_counter(), 0, 0.0

                    paused = False
                    if cfg.TEST.EVAL_PERIOD > 0 and (it + 1) % cfg.TEST.EVAL_PERIOD == 0:
                        self._eval_and_track(it + 1)
                        paused = True
                    if (it + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0 or it + 1 == max_iter:
                        save_checkpoint(cfg.OUTPUT_DIR, jax.device_get(self.state), it + 1)
                        paused = True
                    if paused:  # don't bill eval/ckpt time to s/iter
                        t0, n_timed, t_data = time.perf_counter(), 0, 0.0
            finally:
                # close on crashes too (the axon relay can die mid-loop),
                # so buffered TensorBoard events of the run survive
                loader.close()
                for w in self.writers:
                    w.close()
        return self.state

    def _eval_and_track(self, step: int):
        all_results = self.test()
        if "sem_seg" in all_results:  # single test dataset: un-nest
            all_results = {self.cfg.DATASETS.TEST[0]: all_results}
        primary_name = self.cfg.DATASETS.TEST[0]
        # best-checkpoint tracking follows the FIRST test dataset, like the
        # reference's BestCheckpointer on its single tracked metric
        # (ref: models/engine/hooks.py:14-101)
        improved = self.best_ckpt.update(
            all_results[primary_name], jax.device_get(self.state), step)
        multi = len(all_results) > 1
        for name, results in all_results.items():
            logger.info("eval @ %d [%s]: %s%s", step, name, results["sem_seg"],
                        "  (new best)" if improved and name == primary_name else "")
            if jax.process_index() == 0:
                with open(self.metrics_file, "a") as f:
                    row = {"iter": step, **results["sem_seg"]}
                    if multi:
                        row["dataset"] = name
                    f.write(json.dumps(row) + "\n")
            prefix = f"sem_seg/{name}/" if multi else "sem_seg/"
            self.storage.iter = step
            self.storage.put_scalars(
                **{prefix + k: v for k, v in results["sem_seg"].items()}
            )
        for w in self.writers:
            w.write(self.storage)
        return all_results[primary_name]

    def test(self, dataset_name: Optional[str] = None, max_videos: Optional[int] = None,
             vis_dir: Optional[str] = None):
        """Evaluate one dataset (returns its results dict), or — with no
        dataset_name — ALL of cfg.DATASETS.TEST like d2's DefaultTrainer.test
        (ref: train_net.py:82-101 + d2 defaults.py), returning
        {dataset: results} when there are several."""
        params = self.state.params
        frozen = self.state.frozen
        if dataset_name is not None:
            return evaluate(self.cfg, self.eval_model, params, frozen,
                            dataset_name, max_videos=max_videos,
                            vis_dir=vis_dir, mesh=self.mesh)
        results = {
            name: evaluate(self.cfg, self.eval_model, params, frozen, name,
                           max_videos=max_videos, vis_dir=vis_dir, mesh=self.mesh)
            for name in self.cfg.DATASETS.TEST
        }
        if len(results) == 1:
            return next(iter(results.values()))
        return results
