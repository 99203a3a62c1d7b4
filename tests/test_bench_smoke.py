"""Smoke-test bench.py — the driver's official metric — in --tiny mode.

bench.py is run by the round driver on the real chip; if an API drift breaks
it, the round's perf record is lost (it happened: BENCH_r03 is rc=1). These
tests run the exact measurement graphs at CPU-sized shapes in-process
(conftest forces the CPU platform) and assert the JSON contract the driver
parses: one line, keys metric/value/unit/vs_baseline.
"""

import json
import sys


def _run_bench(capsys, argv):
    import bench

    old = sys.argv
    sys.argv = ["bench.py"] + argv
    try:
        bench.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out.strip().splitlines()
    # the driver takes the first JSON line
    line = json.loads(out[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(line)
    assert line["value"] > 0
    assert "TINY-SMOKE" in line["metric"]  # tiny runs must not look real
    return line


def test_bench_eval_tiny(capsys):
    line = _run_bench(capsys, ["--tiny"])
    assert line["unit"] == "frames/s"
    assert "bf16" in line["metric"]
    # the honest unrolled-twin FLOP costing must be the path that ran — a
    # silent fallback to the rolled count corrupted the r4 MFU rows once
    # (VERDICT r4 weak #5); the artifact now self-describes its source
    assert line["flops_source"] == "unrolled", line


def test_bench_train_tiny(capsys):
    line = _run_bench(capsys, ["--train", "--tiny"])
    assert line["unit"] == "s/step"


def test_bench_train_tiny_avss(capsys):
    # the AVSS production-graph variant (71 classes, temporal masks, AMP)
    line = _run_bench(capsys, ["--train", "--tiny", "--dataset", "avss"])
    assert line["unit"] == "s/step"
    assert "AVSS" in line["metric"] and "AMP" in line["metric"]
