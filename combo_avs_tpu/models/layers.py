"""Shared neural-net building blocks."""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample.

    Same behavior as the timm `DropPath` the reference's PVTv2 uses
    (ref: models/modeling/backbone/pvtv2.py:165): at train time zero the
    branch with prob `rate` and scale survivors by 1/(1-rate).
    The rate may be passed at call time (for scanned blocks with per-depth
    decay rules).
    """

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None, rate=None):
        deterministic = nn.merge_param("deterministic", self.deterministic, deterministic)
        r = self.rate if rate is None else rate
        if deterministic or (isinstance(r, float) and r == 0.0):
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - r
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class SqueezeExcite(nn.Module):
    """SE channel gate used by the Siam-Encoder Module injection
    (ref: models/utils/misc.py:112-131, maskformer_model.py:345-352):
    GAP -> FC(dim/16) -> ReLU -> FC(dim) -> sigmoid, returned as a
    per-channel gate (NOT pre-multiplied)."""

    dim: int
    reduction: int = 16
    # None follows the input dtype (bf16 under the production bf16 path);
    # a forced fp32 here used to silently upcast every SEM-injected feature
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, H, W, C] -> gate [B, 1, 1, C]."""
        y = x.mean(axis=(1, 2))
        y = nn.Dense(self.dim // self.reduction, dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        y = nn.sigmoid(y)
        return y[:, None, None, :]


class MLP(nn.Module):
    """Simple multi-layer perceptron with ReLU (used for the mask embed head,
    ref: models/modeling/transformer_decoder/transformer_decoder.py:207-219)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype | None = None  # None = follow input dtype

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            x = nn.Dense(
                self.output_dim if last else self.hidden_dim, dtype=self.dtype, name=f"layer{i}"
            )(x)
            if not last:
                x = nn.relu(x)
        return x


def gelu_exact(x):
    """torch nn.GELU default (erf form). flax's default is the tanh
    approximation — do not use that where torch parity matters."""
    return nn.gelu(x, approximate=False)
