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
`nn.Conv(feature_group_count=...)`.

Group packing. XLA's grouped conv collapses on the MXU at small
channels-per-group (measured on TPU v5 lite, tools/probe_group_pack.py:
0.9 TFLOP/s at 8 ch/group vs ~110 for the same geometry dense). A G-group
conv is EXACTLY a G'-group conv (G' | G) whose weights are block-diagonal
within each packed super-group — the extra multiplies hit stored zeros, and
adding 0.0 terms is exact in IEEE. FLOPs scale by G/G', but the measured
sweep makes a middle point fastest per stage:

  stage2 (8 ch/grp):  dense g1   4.0x    stage3 (16 ch/grp): g4   2.0x
  stage4 (32 ch/grp): g8   1.35x         stage5 (64 ch/grp): unpacked wins

`EFF_GROUPS` records the chosen effective group count per stage; the weight
converter (detector/convert.py) expands checkpoint kernels with
`pack_grouped_kernel`, so the stored zeros never exist in the .pth.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# effective feature_group_count per stage (keys = converter stage names);
# picked from the TPU v5 lite sweep in tools/probe_group_pack.py:
#   layer1 dense 4.0x, layer2 g4 2.0x, layer3 g8 1.35x over g32;
#   layer4 (64 ch/group over RoI crops) is fastest UNPACKED
EFF_GROUPS = {"layer1": 1, "layer2": 4, "layer3": 8, "layer4": 32}


def pack_grouped_kernel(w: np.ndarray, groups: int, eff_groups: int) -> np.ndarray:
    """Expand an HWIO grouped-conv kernel (kh, kw, C/groups, C) into the
    block-diagonal (kh, kw, C/eff_groups, C) form computing the IDENTICAL
    convolution with feature_group_count=eff_groups (zeros elsewhere)."""
    if eff_groups == groups:
        return w
    assert groups % eff_groups == 0, (groups, eff_groups)
    kh, kw, cg_in, c = w.shape
    cg_out = c // groups
    pack = groups // eff_groups  # original groups per super-group
    out = np.zeros((kh, kw, cg_in * pack, c), w.dtype)
    for g in range(groups):
        sub = g % pack  # position inside its super-group
        out[:, :, sub * cg_in:(sub + 1) * cg_in,
            g * cg_out:(g + 1) * cg_out] = w[..., g * cg_out:(g + 1) * cg_out]
    return out


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
    eff_groups: int | None = None  # block-diagonal packing (see module doc)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        h = nn.Conv(self.mid_channels, (1, 1), use_bias=False, name="conv1")(x)
        h = FrozenBN(self.mid_channels, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.mid_channels, (3, 3), strides=self.stride,
                    padding=((1, 1), (1, 1)),
                    feature_group_count=self.eff_groups or self.groups,
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
    eff_groups: int | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_blocks):
            x = Bottleneck(self.mid_channels, self.out_channels,
                           stride=self.first_stride if i == 0 else 1,
                           groups=self.groups, eff_groups=self.eff_groups,
                           has_downsample=(i == 0), name=f"block{i}")(x)
        return x


# R-152 layout; 32x8d widths (mid = out/2)
R152_BLOCKS = (3, 8, 36, 3)


class ResNeXt152C4(nn.Module):
    """Stem + stages 2-4 -> (H/16, W/16, 1024) C4 feature map."""

    groups: int = 32
    pack_groups: bool = True  # EFF_GROUPS block-diagonal packing (exact)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        eff = (lambda k: EFF_GROUPS[k] if self.pack_groups else None)
        h = nn.Conv(64, (7, 7), strides=2, padding=((3, 3), (3, 3)),
                    use_bias=False, name="stem_conv1")(x)
        h = FrozenBN(64, name="stem_bn1")(h)
        h = nn.relu(h)
        # torch MaxPool2d(3, 2, padding=1): pad with -inf so padding never wins
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        h = Stage(R152_BLOCKS[0], 256, 256, 1, self.groups,
                  eff_groups=eff("layer1"), name="layer1")(h)
        h = Stage(R152_BLOCKS[1], 512, 512, 2, self.groups,
                  eff_groups=eff("layer2"), name="layer2")(h)
        h = Stage(R152_BLOCKS[2], 1024, 1024, 2, self.groups,
                  eff_groups=eff("layer3"), name="layer3")(h)
        return h


class ResNeXtC5Head(nn.Module):
    """Stage 5 over RoI crops: (14, 14, 1024) -> (7, 7, 2048).

    == roi_heads.box.feature_extractor.head in the reference stack."""

    groups: int = 32
    pack_groups: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return Stage(R152_BLOCKS[3], 2048, 2048, 2, self.groups,
                     eff_groups=EFF_GROUPS["layer4"] if self.pack_groups else None,
                     name="layer4")(x)
