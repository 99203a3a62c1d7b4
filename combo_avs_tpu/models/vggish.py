"""VGGish audio embedding network (flax).

Same function as the reference's frozen audio backbone (ref: models/modeling/
audio_backbone/torchvggish/vggish.py:9-27,95-105): a VGG conv stack
[64, M, 128, M, 256, 256, M, 512, 512, M] over a [96, 64] log-mel patch,
followed by FC 512*4*6 -> 4096 -> 4096 -> 128 with ReLU after every layer.

TPU notes: the network runs in NHWC, so the reference's TF-compat double
transpose before flattening (ref: vggish.py:20-25) is a no-op here — the conv
output [N, 6, 4, 512] flattens directly into the same element order the
pretrained FC weights expect. Checkpoint import therefore only permutes conv
kernels OIHW->HWIO and transposes linear weights (see train/checkpoint.py).

The optional PCA-whitening + 8-bit `Postprocessor` (ref: vggish.py:30-92) is
provided for completeness but disabled in every shipped config
(`POSTPROCESS_LOG_MEL_WITH_PCA: False`).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

VGG_LAYERS = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M")
EMBEDDING_SIZE = 128
QUANTIZE_MIN_VAL = -2.0
QUANTIZE_MAX_VAL = 2.0


class VGGish(nn.Module):
    """[N, 96, 64, 1] log-mel -> [N, 128] embedding.

    `width_mult` scales conv channels and FC width (embedding size stays 128).
    1.0 is the parity architecture; smaller values exist only for the
    multichip dryrun / tests where compile budget matters."""

    dtype: jnp.dtype | None = None  # None = follow input dtype (bf16-able)
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv_idx = 0
        for v in VGG_LAYERS:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                ch = max(8, int(round(int(v) * self.width_mult)))
                x = nn.Conv(
                    ch, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv{conv_idx}"
                )(x)
                x = nn.relu(x)
                conv_idx += 1
        # [N, 6, 4, 512] -> [N, 12288]; element order already matches the
        # pretrained (TF-layout) FC weights, see module docstring.
        x = x.reshape(x.shape[0], -1)
        fc = max(32, int(round(4096 * self.width_mult)))
        x = nn.relu(nn.Dense(fc, dtype=self.dtype, name="fc0")(x))
        x = nn.relu(nn.Dense(fc, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(EMBEDDING_SIZE, dtype=self.dtype, name="fc2")(x))
        return x


class VGGishPostprocessor(nn.Module):
    """PCA whitening + 8-bit quantization of VGGish embeddings
    (ref: vggish.py:30-92). Parameters are loaded, never trained."""

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray) -> jnp.ndarray:
        eigen = self.param(
            "pca_eigen_vectors",
            nn.initializers.zeros,
            (EMBEDDING_SIZE, EMBEDDING_SIZE),
        )
        means = self.param("pca_means", nn.initializers.zeros, (EMBEDDING_SIZE, 1))
        applied = (eigen @ (embeddings.T - means)).T
        clipped = jnp.clip(applied, QUANTIZE_MIN_VAL, QUANTIZE_MAX_VAL)
        quantized = jnp.round(
            (clipped - QUANTIZE_MIN_VAL)
            * (255.0 / (QUANTIZE_MAX_VAL - QUANTIZE_MIN_VAL))
        )
        return quantized
