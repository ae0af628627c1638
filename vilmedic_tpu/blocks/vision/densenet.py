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
import jax
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


class PackedConv3x3(nn.Module):
    """3x3 stride-1 SAME conv with few output channels, packed for the MXU.

    A growth-rate conv (32 output channels) uses 32 of the MXU's 128 output
    lanes — 4x padding waste, the train-MFU wall identified in ROUND2_NOTES.
    This computes the identical conv as a 2x2 VALID conv over a shifted
    space-to-depth view of the input: each 2x2 block of output pixels becomes
    one "pixel" with 4*features output channels (128 lanes full for
    features=32), and the 4x4 input window it depends on spans exactly 2x2
    space-to-depth cells when the s2d tiling is shifted by the conv's -1
    halo. The packed (2, 2, 4C, 4F) kernel embeds the original 3x3 taps at
    9/16 density (zeros elsewhere), so the packed conv does 16/9 the flops at
    ~4x the lane utilization — ~2.2x effective.

    The parameter is the unchanged ``(3, 3, C, F)`` nn.Conv kernel (same name,
    shape, and init), so torchvision converters and checkpoints are untouched;
    the packed kernel is rebuilt from it each call (36 static block copies,
    negligible next to the conv).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        f = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c, f), jnp.float32
        )
        k = kernel.astype(self.dtype)
        x = x.astype(self.dtype)

        # Packed kernel: out2[p,q,(al,be,f)] += x2[p+ka,q+kb,(a,bb,c)] * wp[...]
        # where x2[p,q,(a,bb,c)] = x[2p-1+a, 2q-1+bb, c]; the original tap is
        # W[dh+1, dw+1] with dh = a+2*ka-1-al, dw = bb+2*kb-1-be (valid iff
        # |dh|<=1, |dw|<=1 — 36 of 64 combos).
        wp = jnp.zeros((2, 2, 4 * c, 4 * f), k.dtype)
        for ka in range(2):
            for kb in range(2):
                for a in range(2):
                    for bb in range(2):
                        for al in range(2):
                            for be in range(2):
                                dh = a + 2 * ka - 1 - al
                                dw = bb + 2 * kb - 1 - be
                                if abs(dh) <= 1 and abs(dw) <= 1:
                                    ci = (a * 2 + bb) * c
                                    co = (al * 2 + be) * f
                                    wp = wp.at[
                                        ka, kb, ci:ci + c, co:co + f
                                    ].set(k[dh + 1, dw + 1])

        # Shifted space-to-depth: pad the -1 halo plus bottom/right to even.
        hp, wq = h + h % 2, w + w % 2
        xp = jnp.pad(x, ((0, 0), (1, 1 + hp - h), (1, 1 + wq - w), (0, 0)))
        x2 = xp.reshape(b, (hp + 2) // 2, 2, (wq + 2) // 2, 2, c)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, (hp + 2) // 2, (wq + 2) // 2, 4 * c
        )
        out2 = jax.lax.conv_general_dilated(
            x2, wp, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = out2.reshape(b, hp // 2, wq // 2, 2, 2, f)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wq, f)
        return out[:, :h, :w]


class DenseLayer(nn.Module):
    growth_rate: int
    conv: Any
    norm: Any
    packed: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = self.norm()(x)
        y = nn.relu(y)
        y = self.conv(4 * self.growth_rate, 1)(y)
        y = self.norm()(y)
        y = nn.relu(y)
        if self.packed:
            # explicit name keeps the param path identical to the nn.Conv it
            # replaces (autonamed Conv_1) — checkpoints/converters unchanged
            y = PackedConv3x3(self.growth_rate, dtype=self.dtype, name="Conv_1")(y)
        else:
            y = self.conv(self.growth_rate, 3)(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    growth_rate: int
    block_config: Sequence[int]
    num_init_features: int
    output_layer: str = "features"  # features | avgpool
    spatial_dims: int = 2
    dtype: Any = jnp.float32
    packed_growth: bool = False  # MXU-packed 3x3 growth convs (2-D only)

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
                    self.growth_rate, conv=conv, norm=norm,
                    packed=self.packed_growth and nd == 2, dtype=self.dtype,
                    name=f"block{i}_layer{j}",
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
    backbone: str, output_layer: str = "features", spatial_dims: int = 2,
    dtype=jnp.float32, packed_growth: bool | None = None,
) -> DenseNet:
    name = backbone.replace("3d_", "")
    growth, blocks, init = CONFIGS[name]
    if output_layer is None:
        output_layer = "features"
    # Default OFF: the packed formulation is exact and lifts the growth convs
    # to full MXU lanes, but measured e2e SLOWER on v5e (flagship RRG train
    # step, batch 128: 832 vs 1008 samples/s) — the s2d/d2s relayouts around
    # all 58 growth convs (fwd+bwd) outweigh the 4x lane win, and the
    # non-conv BN/concat bandwidth passes dominate densenet anyway
    # (ROUND3_NOTES). Kept as an opt-in for other shapes/generations.
    if packed_growth is None:
        packed_growth = False
    return DenseNet(
        growth_rate=growth,
        block_config=blocks,
        num_init_features=init,
        output_layer=output_layer,
        spatial_dims=spatial_dims,
        dtype=dtype,
        packed_growth=packed_growth,
    )
