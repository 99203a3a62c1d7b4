"""Sinusoidal position encodings (DETR convention).

Same math as the reference's `PositionEmbeddingSine`
(ref: models/modeling/transformer_decoder/position_encoding.py:12-60):
cumsum-normalized y/x ramps scaled to 2*pi, geometric frequency ladder of
`num_pos_feats` channels each, sin on even / cos on odd channel pairs,
concatenated (y block first). Since shapes are static under jit, the encoding
is computed in numpy at trace time and becomes an XLA constant — zero runtime
cost.
"""

from __future__ import annotations

import functools

import numpy as np

TEMPERATURE = 10000.0
EPS = 1e-6


@functools.lru_cache(maxsize=None)
def sine_position_encoding(
    h: int, w: int, num_pos_feats: int = 128, normalize: bool = True
) -> np.ndarray:
    """Returns [H, W, 2*num_pos_feats] (y-channels then x-channels), NHWC."""
    y = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :] * np.ones((h, 1), np.float32)
    if normalize:
        scale = 2 * np.pi
        y = y / (y[-1:, :] + EPS) * scale
        x = x / (x[:, -1:] + EPS) * scale

    i = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = TEMPERATURE ** (2 * np.floor(i / 2) / num_pos_feats)

    pos_y = y[:, :, None] / dim_t
    pos_x = x[:, :, None] / dim_t
    # interleave sin/cos over channel pairs, exactly as torch's
    # stack(..., dim=4).flatten(3)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3).reshape(
        h, w, num_pos_feats
    )
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3).reshape(
        h, w, num_pos_feats
    )
    return np.concatenate([pos_y, pos_x], axis=-1)


@functools.lru_cache(maxsize=None)
def sine_position_encoding_3d(
    t: int, h: int, w: int, num_pos_feats: int = 64, normalize: bool = True
) -> np.ndarray:
    """3D (temporal + spatial) sine encoding, [T, H, W, 3*num_pos_feats]
    (z/y/x channel blocks). Parity companion of the reference's unused
    `PositionEmbeddingSine3D` (ref: position_encoding.py:63-108)."""
    z = np.arange(1, t + 1, dtype=np.float32)[:, None, None] * np.ones((1, h, w), np.float32)
    y = np.arange(1, h + 1, dtype=np.float32)[None, :, None] * np.ones((t, 1, w), np.float32)
    x = np.arange(1, w + 1, dtype=np.float32)[None, None, :] * np.ones((t, h, 1), np.float32)
    if normalize:
        scale = 2 * np.pi
        z = z / (z[-1:, :, :] + EPS) * scale
        y = y / (y[:, -1:, :] + EPS) * scale
        x = x / (x[:, :, -1:] + EPS) * scale

    i = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = TEMPERATURE ** (2 * np.floor(i / 2) / num_pos_feats)

    def enc(v):
        p = v[..., None] / dim_t
        return np.stack([np.sin(p[..., 0::2]), np.cos(p[..., 1::2])], axis=-1).reshape(
            t, h, w, num_pos_feats
        )

    return np.concatenate([enc(z), enc(y), enc(x)], axis=-1)
