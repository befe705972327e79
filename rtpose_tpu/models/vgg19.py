"""VGG19 rtpose: the flagship model (reference lib/network/rtpose_vgg.py).

Architecture (reference :60-127):
  block0: VGG19 conv1_1..conv4_2 (first 10 convs) + conv4_3_CPM(512->256)
          + conv4_4_CPM(256->128), three 2x2 maxpools -> stride 8, 128ch
  stage1: two branches (L1 -> 38 PAF ch, L2 -> 19 heatmap ch)
  stages 2-6: input concat([paf, heat, feat]) = 185ch, five 7x7x128 convs
          + 1x1x128 + 1x1 out per branch

TPU-first design notes: NHWC layout, bf16 compute with fp32 params and fp32
stage outputs (losses and grouping read fp32), everything in one jitted
forward so XLA fuses the ReLUs and concat into the convolutions.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import CPMStages, ModelOutput, conv_init

# (features, num_convs) per VGG block before each pool; then the CPM neck.
_VGG_BLOCKS: Sequence = ((64, 2), (128, 2), (256, 4), (512, 2))


class VGG19Backbone(nn.Module):
    """VGG19 trunk truncated at conv4_2, plus CPM neck convs.

    Layer names mirror the caffe/openpose naming (conv1_1 .. conv4_4_CPM) so
    weight import from torchvision/reference checkpoints is unambiguous
    (reference rtpose_vgg.py:69-83, use_vgg :235-251).
    """
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for b, (feat, n_convs) in enumerate(_VGG_BLOCKS, start=1):
            for c in range(1, n_convs + 1):
                x = nn.Conv(feat, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv{b}_{c}", **conv_init())(x)
                x = nn.relu(x)
            if b < len(_VGG_BLOCKS):
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv4_3_CPM", **conv_init())(x)
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv4_4_CPM", **conv_init())(x)
        return nn.relu(x)


class VGG19RTPose(nn.Module):
    """Full rtpose model: VGG19 backbone + 6-stage CPM cascade."""
    num_stages: int = 6
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, images) -> ModelOutput:
        feat = VGG19Backbone(dtype=self.dtype, name="backbone")(
            images.astype(self.dtype))
        return CPMStages(num_stages=self.num_stages, dtype=self.dtype,
                         remat=self.remat, name="stages")(feat)

    # Parameter paths of the 10 ImageNet-pretrained VGG convs, frozen during
    # the first training phase (reference train_VGG19.py:305-320).
    @staticmethod
    def pretrained_conv_paths():
        names = []
        for b, (_, n_convs) in enumerate(_VGG_BLOCKS, start=1):
            names += [f"conv{b}_{c}" for c in range(1, n_convs + 1)]
        return [("backbone", n) for n in names]
