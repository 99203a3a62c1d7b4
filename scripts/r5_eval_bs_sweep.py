"""Eval batch-size sweep on the chip: does a bigger eval batch raise f/s?

The headline eval bench (bench.py) has always run B=4 videos x 5 frames.
Throughput benchmarking leaves the batch free, and two mechanisms could
reward a larger one: per-step fixed costs (dispatch RTT, small glue ops)
amortize, and PVT's small-matmul stages (196 tokens/frame) tile the MXU
better with more rows. Nothing in PROFILE_r3/r4 ever swept this axis.

One process, one tunnel session: full COMBO-R50 eval step at B in
{4, 8, 12} and COMBO-PVTv2-B5 at B in {4, 8}, bf16, 224^2, measured
with device_timer (on-device fori_loop + scalar fetch, iters=16). B=4 is
re-measured in-session as the anchor against BENCH_FULL_r5. B=2 was
measured in the first (tunnel-killed) run: R50 16.38 ms/step, 610.6 f/s —
strictly worse than B=4, so the sweep only explores upward. Transient
tunnel errors ("response body closed...") killed that run mid-compile;
each config now retries once.

Usage: python scripts/r5_eval_bs_sweep.py
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from combo_avs_tpu.models.meta_arch import MaskFormer, semantic_inference
    from combo_avs_tpu.utils.profiling import device_timer

    dtype = jnp.bfloat16
    T, S = 5, 224
    results = []

    def cast(tree):
        return jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree
        )

    for name, kwargs, bss in [
        ("R50", {}, (4, 8, 12)),
        ("PVT", dict(backbone_name="build_pvtv2_b5_backbone",
                     pre_sam_dim=(64, 128, 320, 512)), (4, 8)),
    ]:
        model = MaskFormer(**kwargs)
        for B in bss:
            rng = np.random.RandomState(0)
            images = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)
            mel = rng.randn(B, T, 96, 64).astype(np.float32)
            pre = (rng.rand(B, T, S, S, 3) * 255).astype(np.float32)
            v = cast(jax.jit(model.init)(jax.random.PRNGKey(0), images, mel, pre))

            def step(v, images, mel, pre):
                out = model.apply(v, images, mel, pre)
                return semantic_inference(
                    out["pred_logits"], out["pred_masks"], out_size=(S, S))

            dt = None
            for attempt in range(2):
                try:
                    dt = device_timer(step, v, *cast((images, mel, pre)),
                                      iters=16)
                    break
                except Exception as e:
                    if "RESOURCE_EXHAUSTED" in str(e):
                        print(f"{name} B={B}: OOM", flush=True)
                        results.append(dict(model=name, B=B, oom=True))
                        break
                    # transient tunnel failures (e.g. "response body closed
                    # before all bytes were read") — retry once
                    print(f"{name} B={B}: attempt {attempt} failed: {e}",
                          flush=True)
                    if attempt == 1:
                        results.append(dict(model=name, B=B,
                                            error=str(e)[:200]))
            if dt is None:
                continue
            fps = B * T / dt
            print(f"{name} B={B}: {dt*1e3:8.2f} ms/step  {fps:7.1f} f/s",
                  flush=True)
            results.append(dict(model=name, B=B, ms=round(dt * 1e3, 2),
                                fps=round(fps, 1)))

    with open("docs/eval_bs_sweep_r5.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote docs/eval_bs_sweep_r5.json")


if __name__ == "__main__":
    main()
