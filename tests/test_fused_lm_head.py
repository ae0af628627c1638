"""Pallas fused lm_head + top-R + logsumexp kernel: exactness on CPU interpret."""

import numpy as np

import jax
import jax.numpy as jnp

from vilmedic_tpu.ops.fused_lm_head import NEG, lm_head_topk_lse, pad_lm_head_weights


def test_fused_lm_head_matches_unfused():
    n, h, v, r = 16, 64, 5000, 8
    rng = np.random.default_rng(0)
    hid = jnp.asarray(rng.normal(size=(n, h)) * 0.2, jnp.float32)
    w0 = jnp.asarray(rng.normal(size=(h, v)) * 0.2, jnp.float32)
    b0 = jnp.asarray(rng.normal(size=(v,)) * 0.2, jnp.float32)
    w, b = pad_lm_head_weights(w0, b0, tile_v=1024)
    assert w.shape[1] % 1024 == 0 and float(b[-1]) == np.float32(NEG)

    vals, idx, lse = lm_head_topk_lse(hid, w, b, r=r, tile_v=1024, interpret=True)
    logits = hid @ w0 + b0
    rv, ri = jax.lax.top_k(logits, r)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rv), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(jax.nn.logsumexp(logits, axis=-1)), rtol=1e-5
    )
