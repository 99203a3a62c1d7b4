"""ResNet-50 visual backbone (detectron2-compatible), flax / NHWC.

The reference selects detectron2's `build_resnet_backbone` with DEPTH 50,
STRIDE_IN_1X1 False, FrozenBN, FREEZE_AT 0, out features res2-res5
(ref: configs/avs_s4/R50-AVSS4-SemanticSegmentation.yaml:4,17-23). This module
reproduces that network: 7x7/2 stem + 3x3/2 maxpool, bottleneck stages
[3, 4, 6, 3] with channels 256/512/1024/2048 and the stage stride carried by
the first block's 3x3 conv (torchvision-style when STRIDE_IN_1X1 is False).

FrozenBatchNorm keeps (scale, bias, mean, var) in a separate `frozen`
variable collection so the optimizer never sees them, matching d2's FrozenBN
(affine + stats never train) while conv weights do train.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# depth 10 = one bottleneck per stage: not a reference config — used by the
# multichip dryrun / tests to exercise the full 4-stage feature pyramid at a
# compile cost 1 CPU core can afford.
BLOCKS_PER_STAGE = {10: (1, 1, 1, 1), 18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class FrozenBatchNorm(nn.Module):
    """BatchNorm with permanently frozen statistics and affine params."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        scale = self.variable("frozen", "scale", nn.initializers.ones, None, shape).value
        bias = self.variable("frozen", "bias", nn.initializers.zeros, None, shape).value
        mean = self.variable("frozen", "mean", nn.initializers.zeros, None, shape).value
        var = self.variable("frozen", "var", nn.initializers.ones, None, shape).value
        inv = (scale / jnp.sqrt(var + self.eps)).astype(x.dtype)
        return x * inv + (bias - mean * inv).astype(x.dtype)


def _conv(features, kernel, stride, name):
    pad = kernel // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        name=name,
    )


class BottleneckBlock(nn.Module):
    bottleneck: int
    out_channels: int
    stride: int = 1
    stride_in_1x1: bool = False
    has_shortcut: bool = False

    @nn.compact
    def __call__(self, x):
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = _conv(self.bottleneck, 1, s1, "conv1")(x)
        out = FrozenBatchNorm(self.bottleneck, name="norm1")(out)
        out = nn.relu(out)
        out = _conv(self.bottleneck, 3, s3, "conv2")(out)
        out = FrozenBatchNorm(self.bottleneck, name="norm2")(out)
        out = nn.relu(out)
        out = _conv(self.out_channels, 1, 1, "conv3")(out)
        out = FrozenBatchNorm(self.out_channels, name="norm3")(out)
        if self.has_shortcut:
            sc = _conv(self.out_channels, 1, self.stride, "shortcut")(x)
            sc = FrozenBatchNorm(self.out_channels, name="shortcut_norm")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet(nn.Module):
    """Returns {"res2": [B,H/4,W/4,256], ..., "res5": [B,H/32,W/32,2048]}."""

    depth: int = 50
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = False
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    remat: bool = True  # rematerialize blocks in backward (memory saver)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        x = _conv(self.stem_out_channels, 7, 2, "stem_conv1")(x)
        x = FrozenBatchNorm(self.stem_out_channels, name="stem_norm1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outputs = {}
        blocks = BLOCKS_PER_STAGE[self.depth]
        out_ch = self.res2_out_channels
        bottleneck = out_ch // 4
        # rematerialize block activations in the backward pass: only block
        # inputs are saved, which is what lets the reference bs8/224^2 train
        # regime fit one 16 GB chip
        Block = nn.remat(BottleneckBlock) if self.remat else BottleneckBlock
        for stage_idx, n_blocks in enumerate(blocks):
            name = f"res{stage_idx + 2}"
            stride = 1 if stage_idx == 0 else 2
            for b in range(n_blocks):
                x = Block(
                    bottleneck=bottleneck,
                    out_channels=out_ch,
                    stride=stride if b == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1,
                    has_shortcut=b == 0,
                    name=f"{name}_block{b}",
                )(x)
            if name in self.out_features:
                outputs[name] = x
            bottleneck *= 2
            out_ch *= 2
        return outputs

    @staticmethod
    def output_shape(depth: int = 50) -> Dict[str, Tuple[int, int]]:
        """(channels, stride) per output feature."""
        return {
            "res2": (256, 4),
            "res3": (512, 8),
            "res4": (1024, 16),
            "res5": (2048, 32),
        }
