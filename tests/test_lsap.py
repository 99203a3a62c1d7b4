"""On-device LSAP vs scipy.optimize.linear_sum_assignment."""

import jax
import numpy as np
import scipy.optimize

from combo_avs_tpu.ops.lsap import solve_lsap, solve_lsap_batch


def _check(cost):
    ours = np.asarray(solve_lsap(cost))
    rows, cols = scipy.optimize.linear_sum_assignment(cost)
    # optimality: totals must match exactly (multiple optima allowed)
    ours_total = cost[np.arange(cost.shape[0]), ours].sum()
    ref_total = cost[rows, cols].sum()
    np.testing.assert_allclose(ours_total, ref_total, rtol=1e-5)
    # validity: a perfect matching of the rows
    assert len(set(ours.tolist())) == cost.shape[0]
    assert (ours >= 0).all() and (ours < cost.shape[1]).all()


def test_random_square_and_rect():
    rng = np.random.RandomState(0)
    for trial in range(30):
        R = rng.randint(1, 9)
        C = rng.randint(R, R + 30)
        _check(rng.randn(R, C).astype(np.float32) * rng.uniform(0.1, 10))


def test_degenerate_ties_and_structure():
    _check(np.zeros((3, 5), np.float32))  # all ties
    _check(np.ones((4, 4), np.float32))
    c = np.full((3, 6), 100.0, np.float32)  # forced unique optimum
    c[0, 3] = 0.0
    c[1, 1] = 0.0
    c[2, 5] = 0.0
    ours = np.asarray(solve_lsap(c))
    np.testing.assert_array_equal(ours, [3, 1, 5])
    # identity-ish with big-cost padding rows (the matcher's padding pattern)
    rng = np.random.RandomState(1)
    c2 = rng.rand(2, 8).astype(np.float32)
    pad = np.full((2, 8), 1e8, np.float32)
    full = np.concatenate([c2, pad], axis=0)
    ours_pad = np.asarray(solve_lsap(full))[:2]
    rows, cols = scipy.optimize.linear_sum_assignment(c2)
    np.testing.assert_allclose(
        c2[np.arange(2), ours_pad].sum(), c2[rows, cols].sum(), rtol=1e-6
    )


def test_batched_and_jitted():
    rng = np.random.RandomState(2)
    costs = rng.randn(16, 5, 20).astype(np.float32)
    outs = np.asarray(jax.jit(solve_lsap_batch)(costs))
    for n in range(16):
        rows, cols = scipy.optimize.linear_sum_assignment(costs[n])
        np.testing.assert_allclose(
            costs[n][np.arange(5), outs[n]].sum(), costs[n][rows, cols].sum(),
            rtol=1e-5,
        )


def test_large_matcher_shape():
    rng = np.random.RandomState(3)
    c = rng.randn(16, 100).astype(np.float32)
    _check(c)


def _check_small(cost):
    from combo_avs_tpu.ops.lsap import solve_lsap_small

    ours = np.asarray(jax.jit(solve_lsap_small)(cost))
    rows, cols = scipy.optimize.linear_sum_assignment(cost)
    ours_total = cost[np.arange(cost.shape[0]), ours].sum()
    ref_total = cost[rows, cols].sum()
    np.testing.assert_allclose(ours_total, ref_total, rtol=1e-5)
    assert len(set(ours.tolist())) == cost.shape[0]
    assert (ours >= 0).all() and (ours < cost.shape[1]).all()


def test_small_r_exhaustive_vs_scipy():
    """solve_lsap_small (candidate-reduction brute force) is exact for every
    small-R shape the matcher produces (R = padded target slots <= 5)."""
    rng = np.random.RandomState(2)
    for trial in range(60):
        R = rng.randint(1, 6)
        C = rng.randint(R, R + 100)
        _check_small(rng.randn(R, C).astype(np.float32) * rng.uniform(0.1, 10))


def test_small_r_ties_and_padding():
    _check_small(np.zeros((3, 7), np.float32))
    _check_small(np.ones((4, 4), np.float32))
    # the matcher's padding pattern: invalid slots get a large uniform cost
    rng = np.random.RandomState(3)
    for npad in (1, 2):
        c = rng.rand(3 - npad, 100).astype(np.float32)
        pad = np.full((npad, 100), 1e4, np.float32)
        full = np.concatenate([c, pad], axis=0)
        from combo_avs_tpu.ops.lsap import solve_lsap_small

        ours = np.asarray(jax.jit(solve_lsap_small)(full))
        # valid rows must reach the unrestricted optimum of their sub-problem
        rows, cols = scipy.optimize.linear_sum_assignment(full)
        np.testing.assert_allclose(
            full[np.arange(3), ours].sum(), full[rows, cols].sum(), rtol=1e-5
        )
        assert len(set(ours.tolist())) == 3


def test_batch_dispatch_small_vs_jv():
    """solve_lsap_batch routes small R to the brute solver; totals must
    agree with the JV path on the same costs."""
    rng = np.random.RandomState(4)
    cost = rng.randn(17, 3, 100).astype(np.float32)
    small = np.asarray(solve_lsap_batch(cost))
    jv = np.asarray(jax.vmap(solve_lsap)(cost))
    n = np.arange(3)
    for i in range(17):
        np.testing.assert_allclose(
            cost[i][n, small[i]].sum(), cost[i][n, jv[i]].sum(), rtol=1e-5
        )
