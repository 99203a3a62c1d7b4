"""Driver-format provenance for EVERY north-star metric in one tunnel
session (VERDICT r4 weak #1: only the default bench mode had a per-round
artifact; the PVT and train records lived in hand-copied doc tables).

Runs bench.py's measurement functions in-process for all modes:
  R50  S4 eval bf16        (the driver's default metric)
  PVT  S4 eval bf16        (BASELINE.md: beat A100 on COMBO-PVTv2 inference)
  R50  S4 train bs8 fp32   (reference recipe)
  R50  AVSS train bs8 AMP, 5-frame (v1s/v1m bucket)
  R50  AVSS train bs8 AMP, 10-frame (v2 bucket)

and writes BENCH_FULL_r{N}.json (one row per mode, same JSON schema as the
driver's bench line plus wall/compile accounting). README tables cite this
artifact.

Usage:  python scripts/bench_all.py [--round N] [--skip-pvt] [--tiny]
"""

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODES = [
    ("r50_eval_bf16", []),
    ("pvt_eval_bf16", ["--model", "pvt"]),
    ("s4_train_bs8", ["--train"]),
    ("avss_train_bs8_amp_5f", ["--train", "--dataset", "avss"]),
    # v2 bucket at the PER-CHIP batch: bs8 x 10f x 224^2 exceeds 16 GB HBM
    # single-chip (BENCH_FULL_r5 first run: RESOURCE_EXHAUSTED); the global
    # bs8 recipe runs DP over 2 chips (sharded step: tests/test_train.py)
    ("avss_train_bs4_amp_10f", ["--train", "--dataset", "avss", "--frames", "10",
                                "--bs", "4"]),
]


def run_mode(name, argv, tiny):
    import bench

    old = sys.argv
    sys.argv = ["bench.py"] + argv + (["--tiny"] if tiny else [])
    buf = io.StringIO()
    t0 = time.perf_counter()
    try:
        with contextlib.redirect_stdout(buf):
            bench.main()
        row = json.loads(buf.getvalue().strip().splitlines()[0])
        row["mode"] = name
        row["wall_s"] = round(time.perf_counter() - t0, 1)
        return row
    except Exception as e:
        return {"mode": name, "error": f"{type(e).__name__}: {e}",
                "wall_s": round(time.perf_counter() - t0, 1)}
    finally:
        sys.argv = old


def main():
    tiny = "--tiny" in sys.argv
    rnd = sys.argv[sys.argv.index("--round") + 1] if "--round" in sys.argv else "5"
    import jax

    if tiny:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    rows = []
    for name, argv in MODES:
        if "--skip-pvt" in sys.argv and name.startswith("pvt"):
            continue
        print(f"=== {name} ===", flush=True)
        row = run_mode(name, argv, tiny)
        print(json.dumps(row), flush=True)
        rows.append(row)
        jax.clear_caches()  # free HBM between modes (one exclusive chip)

    out = {
        "round": rnd,
        "platform": jax.default_backend(),
        "tiny": tiny,
        "modes": rows,
    }
    path = os.path.join(REPO, f"BENCH_FULL_r{rnd}.json" if not tiny
                        else f"BENCH_FULL_r{rnd}_tiny.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    bad = [r["mode"] for r in rows if "error" in r]
    if bad:
        print(f"MODES FAILED: {bad}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
