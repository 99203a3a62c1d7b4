"""ops.dispatch — the shared Pallas/XLA trace-time dispatch switch.

Every Pallas fast path (deformable attention, lane gather, point sampling,
approx-top-k selection) routes through `pallas_available()`; `force_xla()`
must flip ALL of them to the XLA composition — bench.py relies on it to
lower a FLOP-costing twin of the production model for the CPU backend
inside a TPU process (docs/PROFILE_r4.md section 6).
"""

import jax
import jax.numpy as jnp
import numpy as np

from combo_avs_tpu.ops.dispatch import force_xla, pallas_available


def test_force_xla_nests_and_restores():
    base = pallas_available()  # False on the CPU test platform
    with force_xla():
        assert not pallas_available()
        with force_xla():
            assert not pallas_available()
        assert not pallas_available()  # inner exit must not re-enable
    assert pallas_available() == base


def test_force_xla_restores_on_exception():
    try:
        with force_xla():
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert pallas_available() == (jax.devices()[0].platform == "tpu")


def test_dispatch_sites_run_under_force_xla():
    """The dispatched ops must produce identical results under force_xla on
    CPU (both branches resolve to XLA there) — guards against a dispatch
    site accidentally inverting the flag."""
    from combo_avs_tpu.ops.deform_attn_pallas import ms_deform_attn
    from combo_avs_tpu.ops.gather_pallas import take_along_axis

    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(2, 21, 2, 8).astype(np.float32))
    loc = jnp.asarray(rng.rand(2, 7, 2, 2, 3, 2).astype(np.float32))
    w = jnp.asarray(rng.rand(2, 7, 2, 2, 3).astype(np.float32))
    shapes = ((3, 4), (3, 3))
    ref = ms_deform_attn(v, shapes, loc, w)
    with force_xla():
        out = ms_deform_attn(v, shapes, loc, w)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-6)

    src = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 16, (4, 5)).astype(np.int32))
    ref = take_along_axis(src, idx)
    with force_xla():
        out = take_along_axis(src, idx)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-6)


def test_costing_twin_counts_unrolled_scans():
    """bench.py's FLOP-costing path: a scan_unroll=0 twin must count MORE
    flops than the rolled lowering (XLA counts a rolled scan body once)."""
    from combo_avs_tpu.models.pvtv2 import PVTv2

    x = np.zeros((1, 32, 32, 3), np.float32)
    rolled = PVTv2(depths=(1, 1, 3, 1), scan_unroll=1)
    unrolled = PVTv2(depths=(1, 1, 3, 1), scan_unroll=0)
    v = jax.eval_shape(lambda: rolled.init(jax.random.PRNGKey(0), x))
    v = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), v)

    def flops(m):
        def f(v, x):
            return sum(jnp.sum(o) for o in m.apply(v, x).values())

        return jax.jit(f).lower(v, x).cost_analysis()["flops"]

    f_rolled, f_unrolled = flops(rolled), flops(unrolled)
    assert f_unrolled > 1.5 * f_rolled, (f_rolled, f_unrolled)
