"""Parity of combo_avs_tpu.ops.grid_sample vs torch.nn.functional.grid_sample."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from combo_avs_tpu.ops.grid_sample import grid_sample, point_sample


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("shape", [(2, 7, 9, 3), (1, 16, 16, 8)])
def test_grid_sample_matches_torch(shape, align_corners):
    rng = np.random.RandomState(0)
    N, H, W, C = shape
    img = rng.randn(N, H, W, C).astype(np.float32)
    # include far out-of-bounds points to exercise zero padding
    grid = rng.uniform(-1.7, 1.7, size=(N, 5, 6, 2)).astype(np.float32)

    ours = np.asarray(grid_sample(img, grid, align_corners=align_corners))

    t = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, t, atol=1e-5, rtol=1e-5)


def test_grid_sample_exact_corners_and_edges():
    # points exactly on pixel centers and on the border
    img = np.arange(12, dtype=np.float32).reshape(1, 3, 4, 1)
    # pixel center (0,0) in align_corners=False is grid (-1 + 1/W, -1 + 1/H)
    grid = np.array([[[[-1 + 1 / 4, -1 + 1 / 3], [1.0, 1.0], [-1.0, -1.0]]]], np.float32)
    ours = np.asarray(grid_sample(img, grid))
    t = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, t, atol=1e-6)


def test_point_sample_matches_torch():
    rng = np.random.RandomState(1)
    N, H, W, C, P = 3, 14, 10, 4, 37
    feat = rng.randn(N, H, W, C).astype(np.float32)
    pts = rng.uniform(0, 1, size=(N, P, 2)).astype(np.float32)

    ours = np.asarray(point_sample(feat, pts))

    grid = 2 * torch.from_numpy(pts) - 1
    t = F.grid_sample(
        torch.from_numpy(feat).permute(0, 3, 1, 2),
        grid[:, :, None, :],
        mode="bilinear", padding_mode="zeros", align_corners=False,
    )[:, :, :, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, t, atol=1e-5, rtol=1e-5)
