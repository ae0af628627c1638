"""Flash attention kernel vs reference dot-product attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vilmedic_tpu.ops.attention import dot_product_attention, make_attention_bias
from vilmedic_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("tq,tk,mask", [(128, 256, False), (100, 130, True)])
def test_flash_matches_reference(tq, tk, mask):
    rng = np.random.default_rng(0)
    b, h, d = 2, 4, 32
    q = jnp.asarray(rng.normal(size=(b, tq, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, tk, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, tk, h, d)), jnp.float32)
    key_mask = None
    if mask:
        key_mask = jnp.asarray(rng.random((b, tk)) > 0.3, jnp.int32)

    bias = make_attention_bias(key_mask=key_mask) if mask else None
    expected = dot_product_attention(q, k, v, bias=bias)
    got = flash_attention(q, k, v, key_mask=key_mask, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)
