"""Parity tests for the Pallas lane-gather (take_along_axis equivalent)."""

import jax.numpy as jnp
import numpy as np
import pytest

from combo_avs_tpu.ops.gather_pallas import gather_lanes


import jax


@pytest.mark.parametrize("shape", [(3, 1000, 70), (8, 37632, 512),
                                   (2, 129, 5), (10, 128, 300)])
def test_gather_lanes_parity(shape):
    G, NS, P = shape
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(G, NS).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, NS, (G, P)).astype(np.int32))
    ref = jnp.take_along_axis(src, idx, axis=1)
    # HIGHEST = exact fp32 extraction
    exact = gather_lanes(src, idx, precision=jax.lax.Precision.HIGHEST,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(ref), atol=1e-6)
    # DEFAULT = single-pass bf16 value round-trip
    fast = gather_lanes(src, idx, interpret=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-2, rtol=1e-2)


def test_gather_lanes_group_chunking():
    G, NS, P = 24, 5000, 4096
    import combo_avs_tpu.ops.gather_pallas as gp
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randn(G, NS).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, NS, (G, P)).astype(np.int32))
    import combo_avs_tpu.ops.point_sample_pallas as psp
    orig = psp._MAX_OUT_BYTES
    try:
        # _group_chunks reads point_sample_pallas's module global
        psp._MAX_OUT_BYTES = 64 * 1024
        ours = gp.gather_lanes(src, idx, precision=jax.lax.Precision.HIGHEST,
                               interpret=True)
    finally:
        psp._MAX_OUT_BYTES = orig
    ref = jnp.take_along_axis(src, idx, axis=1)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-6)
