"""Experiment: PointRend uncertain-point selection strategies on TPU.

profile_criterion (docs/PROFILE_r4.md) splits the 9.4 ms/layer uncertainty
selection into: 3x-oversample sampling 3.92, approx_max_k 5.05, coord
gather 3.35 (standalone). The top-k + gather pair exists only to pick the
25% most-uncertain of 37632 RANDOM points — candidates:

  a) production: approx_max_k(recall 0.95) + Pallas lane-gather of coords
  b) exact lax.top_k + lane-gather (the EXACT_TOPK_POINTS path)
  c) stratified chunk sort: reshape the random points to [294, 128] lanes,
     lax.sort each 128-wide chunk by uncertainty DESCENDING with the two
     coord channels as payload, keep the per-chunk quota (32 = 128 * 25%).
     Kills both the global top-k AND the gather (payload rides the sort).
     Points are iid uniform, so the true top-k spreads binomially over
     chunks: E[recall] = 1 - E[max(0, Bin(128,.25)-32)]/32 ~ 0.94.

Each variant reports time and recall vs the exact top-k on logits sampled
from a realistic near-zero distribution.

Usage: python scripts/exp_select_topk.py [--tiny]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax

    if "--tiny" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from combo_avs_tpu.utils.profiling import device_timer

    tiny = "--tiny" in sys.argv
    M = 8 if tiny else 120  # masks (N*K at bs8 x 5f)
    NPTS = 128 if tiny else 12544
    NS, NU = NPTS * 3, NPTS * 3 // 4
    rng = np.random.RandomState(0)
    # uncertainty = -|logit|; logits near zero are common (sigmoid masks)
    unc = jnp.asarray(-np.abs(rng.randn(M, NS)).astype(np.float32))
    cx = jnp.asarray(rng.rand(M, NS).astype(np.float32))
    cy = jnp.asarray(rng.rand(M, NS).astype(np.float32))

    exact_idx = np.asarray(jax.jit(
        lambda u: jax.lax.top_k(u, NU)[1])(unc))
    exact_sets = [set(row.tolist()) for row in exact_idx]

    def recall_of_coords(xs, ys):
        """Match selected coords back to source indices (coords are unique
        random floats, so exact-value matching is reliable)."""
        xs, ys = np.asarray(xs), np.asarray(ys)
        cxn, cyn = np.asarray(cx), np.asarray(cy)
        hits = 0
        for m in range(M):
            lookup = {(float(a), float(b)): i
                      for i, (a, b) in enumerate(zip(cxn[m], cyn[m]))}
            sel = {lookup.get((float(a), float(b)), -1)
                   for a, b in zip(xs[m], ys[m])}
            hits += len(sel & exact_sets[m]) / len(exact_sets[m])
        return hits / M

    rows = []

    def rec(name, fn, *args, iters=16):
        out = jax.jit(fn)(*args)
        dt = device_timer(fn, *args, iters=2 if tiny else iters)
        xs, ys = out
        r = recall_of_coords(xs, ys)
        rows.append((name, dt, r))
        print(f"{dt * 1e3:9.2f} ms  recall={r:.4f}  {name}", flush=True)

    # a) production: approx_max_k + lane gather
    from combo_avs_tpu.ops.dispatch import pallas_available

    if pallas_available():
        from combo_avs_tpu.ops.gather_pallas import gather_lanes

        def approx_gather(unc, cx, cy):
            _, idx = jax.lax.approx_max_k(unc, NU, recall_target=0.95)
            flat = jnp.concatenate([cx, cy], axis=0)
            sel = gather_lanes(flat, jnp.concatenate([idx, idx], axis=0))
            return sel[:M], sel[M:]
        rec("a) approx_max_k + lane gather", approx_gather, unc, cx, cy)

    # b) exact top_k + XLA take_along_axis
    def exact_take(unc, cx, cy):
        _, idx = jax.lax.top_k(unc, NU)
        return (jnp.take_along_axis(cx, idx, axis=1),
                jnp.take_along_axis(cy, idx, axis=1))
    rec("b) exact top_k + take_along_axis", exact_take, unc, cx, cy,
        iters=4)

    # c) stratified chunk sort (payload rides the sort; no gather)
    CH = 128
    nchunk = NS // CH
    quota = NU * CH // NS

    def stratified(unc, cx, cy):
        k = (-unc).reshape(M * nchunk, CH)
        a = cx.reshape(M * nchunk, CH)
        b = cy.reshape(M * nchunk, CH)
        _, sa, sb = jax.lax.sort((k, a, b), dimension=-1, num_keys=1)
        return (sa[:, :quota].reshape(M, NU), sb[:, :quota].reshape(M, NU))
    rec("c) stratified 128-chunk sort", stratified, unc, cx, cy)

    # c2) stratified with 256-wide chunks (fewer, deeper sorts)
    def stratified256(unc, cx, cy):
        k = (-unc).reshape(M * (NS // 256), 256)
        a = cx.reshape(M * (NS // 256), 256)
        b = cy.reshape(M * (NS // 256), 256)
        _, sa, sb = jax.lax.sort((k, a, b), dimension=-1, num_keys=1)
        q = NU * 256 // NS
        return (sa[:, :q].reshape(M, NU), sb[:, :q].reshape(M, NU))
    if NS % 256 == 0 and (NU * 256) % NS == 0:
        rec("c2) stratified 256-chunk sort", stratified256, unc, cx, cy)

    print("\n=== selection experiment M=%d NS=%d NU=%d ===" % (M, NS, NU))
    for name, dt, r in rows:
        print(f"{dt * 1e3:9.2f} ms  recall={r:.4f}  {name}")


if __name__ == "__main__":
    main()
