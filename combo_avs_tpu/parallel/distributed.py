"""Multi-host initialization and cross-host reductions.

The reference launches one NCCL process per GPU via detectron2 `launch`
(ref: train_net.py:284-291) and all_gathers evaluator meters
(ref: sem_seg_evaluation.py:256-265). The TPU-native equivalent:

* `initialize()` wires `jax.distributed` (coordinator discovery is automatic
  on TPU pods; explicit args supported for DCN/multi-slice setups). After it,
  `parallel.mesh.make_mesh()` spans every chip of every host and the sharded
  train step needs NO code change — XLA's collectives ride ICI/DCN.
* `all_reduce_metrics` / `merge_evaluators` replace the torch.distributed
  metric gathers using `multihost_utils`.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed when running multi-host; returns the
    process index (0 on single host)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def world_size() -> int:
    return jax.process_count()


def all_sum_array(x: np.ndarray) -> np.ndarray:
    """Sum a small numpy array across hosts (evaluator accumulators)."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(x)).sum(axis=0)
    )


def merge_evaluator_across_hosts(evaluator):
    """Sum an evaluator's accumulators across hosts in place (the reference
    all_gathers meters then averages, ref: sem_seg_evaluation.py:256-265)."""
    if jax.process_count() == 1:
        return evaluator
    for attr in ("_miou_sum", "_f_sum", "_count"):
        if hasattr(evaluator, attr):
            v = np.asarray(getattr(evaluator, attr), np.float64)
            setattr(evaluator, attr, type(getattr(evaluator, attr))(all_sum_array(v)))
    for attr in ("_iou_pc", "_f_pc", "_cls_pc"):
        if hasattr(evaluator, attr):
            setattr(evaluator, attr, all_sum_array(getattr(evaluator, attr)))
    return evaluator
