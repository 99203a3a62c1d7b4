"""Parity + gradient tests of the multi-scale deformable attention core.

The torch oracle below is an independent implementation of the Deformable-DETR
sampling spec (grid_sample per level, weighted sum over levels x points) — the
same semantics the reference's CUDA op and its pure-torch fallback implement
(ref: ops/functions/ms_deform_attn_func.py:53-72, ops/test.py:35-96).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from combo_avs_tpu.ops.deform_attn import level_start_index, ms_deform_attn

SHAPES = [(6, 4), (3, 2)]
B, M, D, Lq, P = 2, 4, 8, 5, 3
L = len(SHAPES)
S = sum(h * w for h, w in SHAPES)


def torch_oracle(value, shapes, loc, weights):
    """value [B,S,M,D], loc [B,Lq,M,L,P,2] in [0,1], weights [B,Lq,M,L,P]."""
    Bv, Sv, Mv, Dv = value.shape
    _, Lqv = loc.shape[:2]
    splits = [h * w for h, w in shapes]
    per_level = value.split(splits, dim=1)
    grids = 2 * loc - 1
    acc = []
    for lvl, (H, W) in enumerate(shapes):
        v = per_level[lvl].flatten(2).transpose(1, 2).reshape(Bv * Mv, Dv, H, W)
        g = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)  # [B*M, Lq, P, 2]
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        acc.append(s)  # [B*M, D, Lq, P]
    stacked = torch.stack(acc, dim=-2)  # [B*M, D, Lq, L, P]
    w = weights.transpose(1, 2).reshape(Bv * Mv, 1, Lqv, L * P)
    out = (stacked.flatten(-2) * w).sum(-1)  # [B*M, D, Lq]
    return out.view(Bv, Mv * Dv, Lqv).transpose(1, 2).contiguous()


def _random_inputs(seed=0):
    rng = np.random.RandomState(seed)
    value = rng.randn(B, S, M, D).astype(np.float32)
    # locations straddle borders: [-0.2, 1.2]
    loc = rng.uniform(-0.2, 1.2, size=(B, Lq, M, L, P, 2)).astype(np.float32)
    w = rng.rand(B, Lq, M, L, P).astype(np.float32) + 1e-3
    w = w / w.reshape(B, Lq, M, L * P).sum(-1).reshape(B, Lq, M, 1, 1)
    return value, loc, w


def test_forward_matches_torch_oracle():
    value, loc, w = _random_inputs()
    ours = np.asarray(ms_deform_attn(value, SHAPES, loc, w))
    ref = torch_oracle(
        torch.from_numpy(value), SHAPES, torch.from_numpy(loc), torch.from_numpy(w)
    ).numpy()
    assert ours.shape == (B, Lq, M * D)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_gradients_match_torch_oracle():
    value, loc, w = _random_inputs(seed=3)
    g_out = np.random.RandomState(7).randn(B, Lq, M * D).astype(np.float32)

    def f(v, l, a):
        return (ms_deform_attn(v, SHAPES, l, a) * g_out).sum()

    gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w)
    )

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(w).requires_grad_(True)
    (torch_oracle(tv, SHAPES, tl, ta) * torch.from_numpy(g_out)).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), atol=1e-4, rtol=1e-4)
    # location grads involve floor() boundaries; tolerate tiny mismatches there
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), atol=1e-3, rtol=1e-3)


def test_level_start_index():
    assert level_start_index(SHAPES) == (0, 24)


def test_jit_and_vmap_compose():
    value, loc, w = _random_inputs(seed=5)
    fn = jax.jit(lambda v, l, a: ms_deform_attn(v, SHAPES, l, a))
    out = fn(value, loc, w)
    assert out.shape == (B, Lq, M * D)
    # identical under jit
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ms_deform_attn(value, SHAPES, loc, w)), atol=1e-6
    )
