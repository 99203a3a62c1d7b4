"""REAL two-process jax.distributed test (localhost coordinator, CPU).

The fakes in test_distributed.py validate the wiring; this test executes
`jax.make_array_from_process_local_data` and `process_allgather` in an
actual 2-process world and checks the results against a single-host pass —
the TPU-native replacement for the reference's torch.distributed collectives
(ref: train_net.py:284-291, sem_seg_evaluation.py:256-265).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

from combo_avs_tpu.evaluation.evaluator import SemSegEvaluator


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_collectives():
    port = _free_port()
    addr = f"localhost:{port}"
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers use 1 CPU device each
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", addr],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # global sum over the sharded batch: both processes see the same value
    expect_total = float(np.arange(6).sum() + (np.arange(6) + 100).sum())
    assert outs[0]["total"] == outs[1]["total"] == expect_total

    # gradient of a replicated-param / batch-sharded loss: equals the
    # single-host computation over the concatenated global batch
    x = np.concatenate([
        np.arange(6, dtype=np.float64).reshape(2, 3),
        np.arange(6, dtype=np.float64).reshape(2, 3) + 100.0,
    ])
    p = np.ones(3)
    grad_ref = 2 * (x.T @ (x @ p)) / x.shape[0]
    for o in outs:
        np.testing.assert_allclose(o["grad"], grad_ref, rtol=1e-5)

    # evaluator merged across hosts == single-host pass over all videos
    full = SemSegEvaluator()
    for pid in range(2):
        rng = np.random.RandomState(pid)
        for _ in range(2):
            full.process(rng.rand(2, 2, 8, 8), rng.randint(0, 2, (2, 8, 8)))
    want = full.evaluate()
    for o in outs:
        assert o["count"] == 4
        assert o["res"] == want
