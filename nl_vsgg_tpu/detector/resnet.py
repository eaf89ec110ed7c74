"""ResNeXt-152-C4 trunk + C5 box head (the VinVL AttrRCNN backbone), flax.

Rebuilds the external scene_graph_benchmark/maskrcnn_benchmark backbone named
by models/vinvl/vinvl_x152c4.yaml (CONV_BODY "R-152-C4", NUM_GROUPS 32,
WIDTH_PER_GROUP 8, STRIDE_IN_1X1 False, BACKBONE_OUT_CHANNELS 1024):

  * stem: 7x7/2 conv 64 + FrozenBN + relu + 3x3/2 maxpool
  * stages (3, 8, 36) bottlenecks -> C4 feature map (stride 16, 1024ch)
  * box head = stage5 (3 bottlenecks, stride 2) applied to RoI-pooled
    14x14 crops -> (7, 7, 2048), exactly the reference's
    `roi_heads.box.feature_extractor.head` (lib/extract_bbox_features.py:147)

ResNeXt 32x8d bottleneck widths: stage-2 bottleneck = NUM_GROUPS *
WIDTH_PER_GROUP = 256, doubling per stage -> mid == out
(256/512/1024/2048 for out 256/512/1024/2048). All BatchNorms are
frozen affine transforms (maskrcnn FrozenBatchNorm2d) — inference-only scale
and bias folded from running statistics at weight-conversion time.

Everything is NHWC (TPU layout); grouped conv maps to
`nn.Conv(feature_group_count=32)`, which XLA tiles onto the MXU directly.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class FrozenBN(nn.Module):
    """Inference-form BatchNorm: y = x * scale + bias with precomputed
    scale = gamma/sqrt(var+eps), bias = beta - mean*scale."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale + bias


class Bottleneck(nn.Module):
    """maskrcnn_benchmark BottleneckWithFixedBatchNorm, STRIDE_IN_1X1=False
    (stride lives in the 3x3 grouped conv)."""

    mid_channels: int
    out_channels: int
    stride: int = 1
    groups: int = 32
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        h = nn.Conv(self.mid_channels, (1, 1), use_bias=False, name="conv1")(x)
        h = FrozenBN(self.mid_channels, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.mid_channels, (3, 3), strides=self.stride,
                    padding=((1, 1), (1, 1)), feature_group_count=self.groups,
                    use_bias=False, name="conv2")(h)
        h = FrozenBN(self.mid_channels, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="conv3")(h)
        h = FrozenBN(self.out_channels, name="bn3")(h)
        if self.has_downsample:
            identity = nn.Conv(self.out_channels, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample_conv")(x)
            identity = FrozenBN(self.out_channels, name="downsample_bn")(identity)
        return nn.relu(h + identity)


class Stage(nn.Module):
    num_blocks: int
    mid_channels: int
    out_channels: int
    first_stride: int
    groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_blocks):
            x = Bottleneck(self.mid_channels, self.out_channels,
                           stride=self.first_stride if i == 0 else 1,
                           groups=self.groups,
                           has_downsample=(i == 0), name=f"block{i}")(x)
        return x


# R-152 layout; 32x8d widths (mid = out/2)
R152_BLOCKS = (3, 8, 36, 3)


class ResNeXt152C4(nn.Module):
    """Stem + stages 2-4 -> (H/16, W/16, 1024) C4 feature map."""

    groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(64, (7, 7), strides=2, padding=((3, 3), (3, 3)),
                    use_bias=False, name="stem_conv1")(x)
        h = FrozenBN(64, name="stem_bn1")(h)
        h = nn.relu(h)
        # torch MaxPool2d(3, 2, padding=1): pad with -inf so padding never wins
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        h = Stage(R152_BLOCKS[0], 256, 256, 1, self.groups, name="layer1")(h)
        h = Stage(R152_BLOCKS[1], 512, 512, 2, self.groups, name="layer2")(h)
        h = Stage(R152_BLOCKS[2], 1024, 1024, 2, self.groups, name="layer3")(h)
        return h


class ResNeXtC5Head(nn.Module):
    """Stage 5 over RoI crops: (14, 14, 1024) -> (7, 7, 2048).

    == roi_heads.box.feature_extractor.head in the reference stack."""

    groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return Stage(R152_BLOCKS[3], 2048, 2048, 2, self.groups, name="layer4")(x)
