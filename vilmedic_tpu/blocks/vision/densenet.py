"""Flax DenseNet family, 2-D and 3-D (NHWC / NDHWC).

Architectural parity with the torchvision densenets (and the MONAI 3-D variants)
the reference exposes through VisualEncoder (reference visual_encoder.py:43-58,
144-158): ``features`` is the final BatchNorm output (no ReLU — torchvision
applies ReLU outside ``features``), ``avgpool`` is ReLU -> global average pool.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

CONFIGS = {
    "densenet121": (32, (6, 12, 24, 16), 64),
    "densenet169": (32, (6, 12, 32, 32), 64),
    "densenet201": (32, (6, 12, 48, 32), 64),
    "densenet264": (32, (6, 12, 64, 48), 64),
}


def output_channels(name: str) -> int:
    growth, blocks, init = CONFIGS[name]
    ch = init
    for i, n in enumerate(blocks):
        ch += n * growth
        if i < len(blocks) - 1:
            ch //= 2
    return ch


class DenseLayer(nn.Module):
    growth_rate: int
    conv: Any
    norm: Any

    @nn.compact
    def __call__(self, x):
        y = self.norm()(x)
        y = nn.relu(y)
        y = self.conv(4 * self.growth_rate, 1)(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.growth_rate, 3)(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    growth_rate: int
    block_config: Sequence[int]
    num_init_features: int
    output_layer: str = "features"  # features | avgpool
    spatial_dims: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = self.spatial_dims

        def conv(features, k, strides=1, name=None):
            return nn.Conv(
                features,
                (k,) * nd,
                strides=(strides,) * nd,
                padding=[(k // 2, k // 2)] * nd,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=name,
            )

        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )

        # Stem
        x = conv(self.num_init_features, 7, strides=2, name="conv0")(x)
        x = norm(name="norm0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3,) * nd, strides=(2,) * nd, padding=((1, 1),) * nd)

        # Dense blocks + transitions
        for i, num_layers in enumerate(self.block_config):
            for j in range(num_layers):
                x = DenseLayer(
                    self.growth_rate, conv=conv, norm=norm, name=f"block{i}_layer{j}"
                )(x)
            if i < len(self.block_config) - 1:
                x = norm(name=f"transition{i}_norm")(x)
                x = nn.relu(x)
                x = conv(x.shape[-1] // 2, 1, name=f"transition{i}_conv")(x)
                x = nn.avg_pool(x, (2,) * nd, strides=(2,) * nd)

        x = norm(name="norm_final")(x)
        if self.output_layer == "features":
            return x
        # avgpool: ReLU then global mean over spatial dims (reference :47-52)
        x = nn.relu(x)
        return jnp.mean(x, axis=tuple(range(1, 1 + nd)))


def make_densenet(
    backbone: str, output_layer: str = "features", spatial_dims: int = 2, dtype=jnp.float32
) -> DenseNet:
    name = backbone.replace("3d_", "")
    growth, blocks, init = CONFIGS[name]
    if output_layer is None:
        output_layer = "features"
    return DenseNet(
        growth_rate=growth,
        block_config=blocks,
        num_init_features=init,
        output_layer=output_layer,
        spatial_dims=spatial_dims,
        dtype=dtype,
    )
