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


@pytest.mark.parametrize("tq,tk,mask", [(128, 128, False), (100, 130, True),
                                        (130, 130, True)])
def test_causal_flash_matches_reference(tq, tk, mask):
    """causal=True: query r sees key c iff c <= r + Tk - Tq; blocks above the
    diagonal are skipped in the kernel loop. The key mask is realistic
    suffix padding (a fully-masked QUERY row — a pad query — is semantically
    undefined and its output ignored downstream, so only valid rows compare)."""
    rng = np.random.default_rng(1)
    b, h, d = 2, 3, 32
    q = jnp.asarray(rng.normal(size=(b, tq, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, tk, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, tk, h, d)), jnp.float32)
    key_mask = None
    bias = None
    valid = tq
    if mask:
        n_valid = tk - 17
        key_mask = jnp.asarray(
            (np.arange(tk) < n_valid)[None].repeat(b, 0), jnp.int32
        )
        bias = make_attention_bias(key_mask=key_mask)
        valid = min(tq, n_valid - (tk - tq))

    expected = dot_product_attention(q, k, v, bias=bias, causal=True)
    got = flash_attention(q, k, v, key_mask=key_mask, block_q=64, block_k=64,
                          causal=True)
    np.testing.assert_allclose(np.asarray(got)[:, :valid],
                               np.asarray(expected)[:, :valid],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_is_differentiable(causal):
    """The kernel carries a custom VJP (XLA-recompute backward) so the
    long-sequence TRAIN routing is grad-safe — previously jax.grad through the
    FLASH_MIN_LEN routing raised (pallas_call has no reverse-mode rule)."""
    rng = np.random.default_rng(2)
    b, t, h, d = 1, 128, 2, 32
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    # contiguous suffix padding: under causal, every valid query row keeps at
    # least its own key, so no row is degenerate (fully masked) — pad-query
    # outputs (rows >= n_valid) differ between impls and would pollute grads
    key_mask = jnp.asarray((np.arange(t) < t - 9)[None].repeat(b, 0), jnp.int32)
    bias = make_attention_bias(key_mask=key_mask)

    def f_flash(q, k, v):
        return (flash_attention(q, k, v, key_mask=key_mask, block_q=64,
                                block_k=64, causal=causal) ** 2).sum()

    def f_ref(q, k, v):
        return (dot_product_attention(q, k, v, bias=bias, causal=causal) ** 2).sum()

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3)


def test_train_flash_threshold_routing(monkeypatch):
    """``train=True`` lowers the flash crossover to FLASH_MIN_LEN_TRAIN (512):
    the fused Pallas backward makes flash win from ~T512 on fwd+bwd steps
    (measured v5e, experiments/ab_flash_train_crossover), while fwd-only
    routing keeps the 1024 threshold. Asserts the routing itself by counting
    kernel entries, and numerical agreement between the two routes."""
    from vilmedic_tpu.ops import attention as attn_mod
    from vilmedic_tpu.ops import flash_attention as fa

    calls = []
    real = fa.flash_attention

    def spy(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(fa, "flash_attention", spy)
    rng = np.random.default_rng(11)
    t = 512
    assert attn_mod.FLASH_MIN_LEN_TRAIN <= t < attn_mod.FLASH_MIN_LEN
    q = jnp.asarray(rng.normal(size=(1, t, 2, 32)), jnp.float32)

    dense = dot_product_attention(q, q, q, causal=True)  # fwd-only: dense
    assert not calls
    flash = dot_product_attention(q, q, q, causal=True, train=True)
    assert calls
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)

    g = jax.grad(lambda q: dot_product_attention(q, q, q, causal=True,
                                                 train=True).sum())(q)
    assert np.isfinite(np.asarray(g)).all()


def test_long_seq_attention_routing_is_grad_safe():
    """dot_product_attention at >= FLASH_MIN_LEN routes to the flash kernel;
    training forwards at that length (multi-image patch concat, DINOv2-scale
    VL prefix) must be differentiable through the routing."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 1024, 2, 32)), jnp.float32)

    def f(q):
        return dot_product_attention(q, q, q, causal=True).sum()

    g = jax.grad(f)(q)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("tq,tk,causal", [(128, 128, False), (100, 130, True),
                                          (96, 160, False), (130, 130, True)])
def test_pallas_backward_matches_xla_backward(tq, tk, causal, monkeypatch):
    """The fused Pallas backward (dq / dkv kernels, lse residual) must produce
    the SAME grads as the VILMEDIC_FLASH_BWD=xla dense-recompute fallback —
    including at non-block-multiple (padded) shapes and Tq != Tk offsets."""
    from vilmedic_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(7)
    b, h, d = 2, 3, 32
    q = jnp.asarray(rng.normal(size=(b, tq, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, tk, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, tk, h, d)), jnp.float32)
    key_mask = jnp.asarray((np.arange(tk) < tk - 11)[None].repeat(b, 0),
                           jnp.int32)
    # a non-uniform cotangent so dq/dk/dv all see structure
    w = jnp.asarray(rng.normal(size=(b, tq, h, d)), jnp.float32)

    def loss(q, k, v):
        out = fa.flash_attention(q, k, v, key_mask=key_mask, block_q=64,
                                 block_k=64, causal=causal)
        return (out * w).sum()

    monkeypatch.setenv("VILMEDIC_FLASH_BWD", "pallas")
    g_pallas = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("VILMEDIC_FLASH_BWD", "xla")
    jax.clear_caches()  # the impl switch lives inside an already-traced vjp
    g_xla = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for gp, gx in zip(g_pallas, g_xla):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("causal", [False, True])
def test_pallas_backward_bias_grad(causal):
    """dbias from the dkv kernel equals the dense attention's keybias grad
    (summed over heads and query rows) — checked via _flash_diff directly,
    which takes the float bias as a differentiable input."""
    from vilmedic_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(8)
    b, tq, tk, h, d = 2, 64, 96, 2, 32
    q = jnp.asarray(rng.normal(size=(b, tq, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, tk, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, tk, h, d)), jnp.float32)
    keybias = jnp.asarray(rng.normal(size=(b, tk)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(b, tq, h, d)), jnp.float32)

    def loss_flash(bias):
        return (fa._flash_diff(q, k, v, bias, 64, 64, True, causal) * w).sum()

    def loss_ref(bias):
        return (fa._reference_attention(q, k, v, bias, causal) * w).sum()

    g_flash = jax.grad(loss_flash)(keybias)
    g_ref = jax.grad(loss_ref)(keybias)
    np.testing.assert_allclose(np.asarray(g_flash), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("h,d,causal,tq,tk", [
    (4, 32, False, 128, 128),   # hpb=4, one lane block
    (2, 64, True, 100, 130),    # hpb=2, padded shapes + offset diagonal
    (12, 64, True, 96, 96),     # HP=6 (the production ViT/VL head layout)
])
def test_flash_v2_matches_v1_and_dense(h, d, causal, tq, tk, monkeypatch):
    """The transpose-free head-packed v2 kernels must reproduce the v1 path
    and the dense reference — forward AND grads (dq/dk/dv through the packed
    dkv kernel, residuals in the (B, HP, Tq, hpb*STATS_LANES) layout)."""
    from vilmedic_tpu.ops import flash_attention as fa

    assert (h * d) % fa.LANE == 0 and fa.LANE % d == 0  # v2-eligible
    rng = np.random.default_rng(5)
    b = 2
    q = jnp.asarray(rng.normal(size=(b, tq, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, tk, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, tk, h, d)), jnp.float32)
    key_mask = jnp.asarray((np.arange(tk) < tk - 9)[None].repeat(b, 0),
                           jnp.int32)
    w = jnp.asarray(rng.normal(size=(b, tq, h, d)), jnp.float32)

    def loss(q, k, v):
        out = fa.flash_attention(q, k, v, key_mask=key_mask, block_q=64,
                                 block_k=64, causal=causal)
        return (out * w).sum(), out

    monkeypatch.setenv("VILMEDIC_FLASH_IMPL", "v2")
    (g2, o2) = jax.grad(loss, argnums=(0, 1, 2), has_aux=True)(q, k, v)
    monkeypatch.setenv("VILMEDIC_FLASH_IMPL", "v1")
    jax.clear_caches()
    (g1, o1) = jax.grad(loss, argnums=(0, 1, 2), has_aux=True)(q, k, v)
    bias = make_attention_bias(key_mask=key_mask)
    dense = dot_product_attention(q, k, v, bias=bias, causal=causal)

    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)
    for a, b_ in zip(g2, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)
