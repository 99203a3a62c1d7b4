"""Can the two siamese PVTv2-B5 towers run as one vmap'd pass?

docs/PROFILE_r4.md section 7: the PVT eval step is 54.7 ms of which the
two towers (visual + pre-SAM, different weights, same architecture) are
2 x 15.3 ms, and stage3 (40 blocks at 14x14, C=320) is bound by
small-matmul / per-op overhead, not FLOPs or bandwidth. The analogous R50
experiment (grouped convs via vmap) gained nothing (section 3), but PVT
is matmul-heavy: vmap over 2 stacked param trees turns each Dense into a
[2, tokens, C] batched matmul, halving the op count the step issues.

Measures, at the PVT eval production shape (B=4 x T=5, 224^2, bf16):
  * one tower fwd
  * two towers sequential (production)
  * two towers vmap'd over stacked params
  * numeric equality between the two pairings

Usage: python scripts/exp_pvt_towers.py [--tiny]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax

    if "--tiny" in sys.argv:  # CPU smoke (JAX_PLATFORMS env is ignored here)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from combo_avs_tpu.models.pvtv2 import PVTv2
    from combo_avs_tpu.utils.profiling import device_timer

    tiny = "--tiny" in sys.argv
    N, S = (4, 64) if tiny else (20, 224)
    depths = (1, 1, 2, 1) if tiny else (3, 6, 40, 3)
    rng = np.random.RandomState(0)

    model = PVTv2(depths=depths, deterministic=True)
    frames = jnp.asarray(rng.randn(N, S, S, 3).astype(np.float32), jnp.bfloat16)
    maskige = jnp.asarray(rng.randn(N, S, S, 3).astype(np.float32), jnp.bfloat16)

    v0 = jax.jit(model.init)(jax.random.PRNGKey(0), frames)
    v1 = jax.jit(model.init)(jax.random.PRNGKey(1), frames)
    cast = lambda t: jax.tree.map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
    v0, v1 = cast(v0), cast(v1)

    rows = []

    def rec(name, dt):
        rows.append((name, dt))
        print(f"{dt * 1e3:9.2f} ms  {name}", flush=True)

    def one(v, x):
        return model.apply(v, x)

    rec("one tower fwd", device_timer(one, v0, frames, iters=16))

    def sequential(v0, v1, a, b):
        return model.apply(v0, a), model.apply(v1, b)

    rec("two towers sequential", device_timer(sequential, v0, v1, frames,
                                              maskige, iters=8))

    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), v0, v1)
    xs = jnp.stack([frames, maskige])

    def paired(sv, xs):
        return jax.vmap(model.apply)(sv, xs)

    rec("two towers vmap(stacked params)", device_timer(paired, stacked, xs,
                                                        iters=8))

    # numeric equality (bf16: expect exact — same ops, different batching)
    ra, rb = jax.jit(sequential)(v0, v1, frames, maskige)
    rp = jax.jit(paired)(stacked, xs)
    for k in ra:
        da = float(jnp.max(jnp.abs(rp[k][0].astype(jnp.float32)
                                   - ra[k].astype(jnp.float32))))
        db = float(jnp.max(jnp.abs(rp[k][1].astype(jnp.float32)
                                   - rb[k].astype(jnp.float32))))
        print(f"  {k}: max |d| vmap-vs-seq = {da:.2e} / {db:.2e}", flush=True)

    print(f"\n=== PVT dual-tower experiment N={N} {S}^2 bf16 ===")
    for name, dt in rows:
        print(f"{dt * 1e3:9.2f} ms  {name}")


if __name__ == "__main__":
    main()
