"""Flax ResNet family (NHWC, TPU-native layouts).

Architectural parity with the torchvision backbones the reference truncates via
``output_layer`` (reference vilmedic/blocks/vision/visual_encoder.py:43-83):
stem -> layer1..layer4 -> avgpool. Returns are keyed by the requested output
layer: feature maps are (B, H, W, C), ``avgpool`` is (B, C).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any

STAGE_SIZES = {
    "resnet18": ([2, 2, 2, 2], "basic"),
    "resnet34": ([3, 4, 6, 3], "basic"),
    "resnet50": ([3, 4, 6, 3], "bottleneck"),
    "resnet101": ([3, 4, 23, 3], "bottleneck"),
    "resnet152": ([3, 8, 36, 3], "bottleneck"),
}

OUTPUT_CHANNELS = {
    "resnet18": 512,
    "resnet34": 512,
    "resnet50": 2048,
    "resnet101": 2048,
    "resnet152": 2048,
}


class BasicBlock(nn.Module):
    filters: int
    conv: ModuleDef
    norm: ModuleDef
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (3, 3), self.strides)(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3))(y)
        y = self.norm(scale_init=nn.initializers.zeros_init())(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1), self.strides, name="conv_proj")(residual)
            residual = self.norm(name="norm_proj")(residual)
        return nn.relu(residual + y)


class BottleneckBlock(nn.Module):
    filters: int
    conv: ModuleDef
    norm: ModuleDef
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), self.strides)(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters * 4, (1, 1))(y)
        y = self.norm(scale_init=nn.initializers.zeros_init())(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters * 4, (1, 1), self.strides, name="conv_proj")(residual)
            residual = self.norm(name="norm_proj")(residual)
        return nn.relu(residual + y)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block_cls: Callable
    output_layer: str = "avgpool"  # stem | layer1..layer4 | avgpool
    capture_layer: str = None  # also return this stage's feature map (GLoRIA local)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )

        x = conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], name="conv_init")(x)
        x = norm(name="bn_init")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        captured = None
        if self.output_layer == "stem":
            return x

        for i, block_size in enumerate(self.stage_sizes):
            for j in range(block_size):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = self.block_cls(
                    64 * 2 ** i, conv=conv, norm=norm, strides=strides,
                    name=f"layer{i + 1}_block{j}",
                )(x)
            if self.capture_layer == f"layer{i + 1}":
                captured = x
            if self.output_layer == f"layer{i + 1}":
                return (x, captured) if self.capture_layer else x

        # avgpool
        out = jnp.mean(x, axis=(1, 2))
        return (out, captured) if self.capture_layer else out


def make_resnet(backbone: str, output_layer: str = "avgpool", dtype=jnp.float32) -> ResNet:
    sizes, kind = STAGE_SIZES[backbone]
    block = BasicBlock if kind == "basic" else BottleneckBlock
    # torchvision "features"-like truncations map onto named stages; 'features'
    # for a resnet means the last conv stage.
    if output_layer in (None, "features"):
        output_layer = "layer4"
    return ResNet(stage_sizes=sizes, block_cls=block, output_layer=output_layer, dtype=dtype)
