"""MXU-packed 3x3 growth conv: exact equivalence with the plain nn.Conv path.

The packed space-to-depth formulation (blocks/vision/densenet.PackedConv3x3)
must compute the identical convolution — same params, same outputs — since it
defaults ON for 2-D densenets and pretrained torchvision weights flow through
it unchanged.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vilmedic_tpu.blocks.vision.densenet import (
    DenseNet,
    PackedConv3x3,
    make_densenet,
)


@pytest.mark.parametrize("hw", [(8, 8), (7, 7), (9, 6), (1, 1)])
@pytest.mark.parametrize("c,f", [(128, 32), (64, 16)])
def test_packed_conv_matches_nn_conv(hw, c, f):
    h, w = hw
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, w, c)), jnp.float32)

    ref = nn.Conv(f, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    params = ref.init(jax.random.key(0), x)
    want = ref.apply(params, x)

    packed = PackedConv3x3(f)
    # identical param tree: {"params": {"kernel": (3,3,c,f)}}
    got = packed.apply(params, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_densenet_packed_matches_unpacked_same_params():
    """Same param pytree drives both paths (param names preserved)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    kw = dict(growth_rate=8, block_config=(2, 2), num_init_features=16)
    plain = DenseNet(packed_growth=False, **kw)
    packed = DenseNet(packed_growth=True, **kw)
    variables = plain.init(jax.random.key(0), x)
    a = plain.apply(variables, x)
    b = packed.apply(variables, x)
    assert jax.tree.structure(packed.init(jax.random.key(0), x)) == \
        jax.tree.structure(variables)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_make_densenet_defaults():
    # packed is opt-in: measured e2e slower on v5e (see make_densenet)
    assert not make_densenet("densenet121").packed_growth
    assert not make_densenet("3d_densenet121", spatial_dims=3).packed_growth
    assert make_densenet("densenet121", packed_growth=True).packed_growth
