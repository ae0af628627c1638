"""Fused reorder-free beam-decode kernel (ops/beam_cache_attention.py).

Interpret-mode (CPU) checks: the kernel against a per-sample numpy oracle,
and the full Pallas beam-search path against the cache-permute path on a real
multi-layer decoder (reference semantics anchor: HF ``_reorder_cache``,
beam_search.py:312-319 — here the reorder is folded into the attention reads).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vilmedic_tpu.ops.beam_cache_attention import (
    NEG_INF,
    fused_beam_cache_attention,
    make_ancestry_mask,
)


def test_kernel_matches_numpy_oracle():
    B, K, T, H, D = 4, 4, 10, 4, 32
    N = B * K
    rng = np.random.default_rng(0)
    idx = 6

    kc = rng.normal(size=(T, N, H * D)).astype(np.float32)
    vc = rng.normal(size=(T, N, H * D)).astype(np.float32)
    q = rng.normal(size=(N, H, D)).astype(np.float32)
    k_new = rng.normal(size=(N, H, D)).astype(np.float32)
    v_new = rng.normal(size=(N, H, D)).astype(np.float32)

    anc_idx = rng.integers(0, K, (B, K, T))
    anc = np.zeros((B, K, K, T), np.float32)  # (b, kj, kq, t)
    for b in range(B):
        for qq in range(K):
            for t in range(idx):
                anc[b, anc_idx[b, qq, t], qq, t] = 1.0

    bias = make_ancestry_mask(jnp.asarray(anc), g=2)
    out, kc2, vc2 = fused_beam_cache_attention(
        jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(q),
        jnp.asarray(k_new), jnp.asarray(v_new), bias,
        jnp.asarray(idx, jnp.int32), interpret=True,
    )
    out, kc2, vc2 = np.asarray(out), np.asarray(kc2), np.asarray(vc2)

    scale = D ** -0.5
    for b in range(B):
        for qq in range(K):
            n = b * K + qq
            for h in range(H):
                sel_k = np.stack(
                    [kc[t, b * K + anc_idx[b, qq, t], h * D:(h + 1) * D]
                     for t in range(idx)] + [k_new[n, h]], 0)
                sel_v = np.stack(
                    [vc[t, b * K + anc_idx[b, qq, t], h * D:(h + 1) * D]
                     for t in range(idx)] + [v_new[n, h]], 0)
                s = sel_k @ (q[n, h] * scale)
                p = np.exp(s - s.max())
                p /= p.sum()
                np.testing.assert_allclose(
                    out[n, h], p @ sel_v, rtol=1e-5, atol=1e-5
                )

    # in-place write: position idx updated, everything else untouched
    exp_kc = kc.copy()
    exp_vc = vc.copy()
    exp_kc[idx] = k_new.reshape(N, H * D)
    exp_vc[idx] = v_new.reshape(N, H * D)
    np.testing.assert_array_equal(kc2, exp_kc)
    np.testing.assert_array_equal(vc2, exp_vc)


def test_kernel_stats_enable_exact_segment_merge():
    """return_stats=True: the per-(row, head) online-softmax (m, l) let a
    caller merge this segment's normalized output with a second attention
    segment — the joint result must equal softmax over the concatenated
    keys (the prefix-LM decode's merge, models/vision_language.py)."""
    B, K, T, H, D = 2, 4, 8, 4, 32
    N = B * K
    P = 5  # extra (prefix-like) segment length
    rng = np.random.default_rng(1)
    idx = 5

    kc = rng.normal(size=(T, N, H * D)).astype(np.float32)
    vc = rng.normal(size=(T, N, H * D)).astype(np.float32)
    q = rng.normal(size=(N, H, D)).astype(np.float32)
    k_new = rng.normal(size=(N, H, D)).astype(np.float32)
    v_new = rng.normal(size=(N, H, D)).astype(np.float32)
    pk = rng.normal(size=(N, P, H, D)).astype(np.float32)
    pv = rng.normal(size=(N, P, H, D)).astype(np.float32)

    anc_idx = rng.integers(0, K, (B, K, T))
    anc = np.zeros((B, K, K, T), np.float32)
    for b in range(B):
        for qq in range(K):
            for t in range(idx):
                anc[b, anc_idx[b, qq, t], qq, t] = 1.0

    bias = make_ancestry_mask(jnp.asarray(anc), g=2)
    out, _, _, m, l = fused_beam_cache_attention(
        jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(q),
        jnp.asarray(k_new), jnp.asarray(v_new), bias,
        jnp.asarray(idx, jnp.int32), interpret=True, return_stats=True,
    )
    out, m, l = np.asarray(out), np.asarray(m), np.asarray(l)
    assert m.shape == (N, H) and l.shape == (N, H)

    scale = D ** -0.5
    for b in range(B):
        for qq in range(K):
            n = b * K + qq
            for h in range(H):
                qs = q[n, h] * scale
                # prefix segment stats + unnormalized acc
                sp = pk[n, :, h] @ qs
                mp = sp.max()
                ep = np.exp(sp - mp)
                lp = ep.sum()
                accp = ep @ pv[n, :, h]
                # merge with the kernel segment
                M = max(m[n, h], mp)
                cg = np.exp(m[n, h] - M) * l[n, h]
                cp = np.exp(mp - M)
                merged = (cg * out[n, h] + cp * accp) / (cg + cp * lp)
                # oracle: joint softmax over concatenated keys
                sel_k = np.stack(
                    [kc[t, b * K + anc_idx[b, qq, t], h * D:(h + 1) * D]
                     for t in range(idx)] + [k_new[n, h]], 0)
                sel_v = np.stack(
                    [vc[t, b * K + anc_idx[b, qq, t], h * D:(h + 1) * D]
                     for t in range(idx)] + [v_new[n, h]], 0)
                s_all = np.concatenate([sel_k @ qs, sp])
                v_all = np.concatenate([sel_v, pv[n, :, h]], 0)
                p = np.exp(s_all - s_all.max())
                p /= p.sum()
                np.testing.assert_allclose(
                    merged, p @ v_all, rtol=1e-5, atol=1e-5
                )


def test_kernel_prefix_streaming_matches_numpy_oracle():
    """prefix=(pk, pv, p_real, beams): the beam-SHARED prefix segment streams
    through the kernel's own online softmax — the output must equal a joint
    softmax over [prefix, ancestry-selected cache, current step] per row, and
    the P_pad zero-padding must be dead (masked, not attended)."""
    from vilmedic_tpu.ops.beam_cache_attention import pack_kernel_prefix

    B, K, T, H, D = 4, 4, 10, 4, 32
    N = B * K
    P = 5
    g = 2  # items per group
    rng = np.random.default_rng(7)
    idx = 6

    kc = rng.normal(size=(T, N, H * D)).astype(np.float32)
    vc = rng.normal(size=(T, N, H * D)).astype(np.float32)
    q = rng.normal(size=(N, H, D)).astype(np.float32)
    k_new = rng.normal(size=(N, H, D)).astype(np.float32)
    v_new = rng.normal(size=(N, H, D)).astype(np.float32)
    pk = rng.normal(size=(B, P, H, D)).astype(np.float32)
    pv = rng.normal(size=(B, P, H, D)).astype(np.float32)

    anc_idx = rng.integers(0, K, (B, K, T))
    anc = np.zeros((B, K, K, T), np.float32)
    for b in range(B):
        for qq in range(K):
            for t in range(idx):
                anc[b, anc_idx[b, qq, t], qq, t] = 1.0

    bias = make_ancestry_mask(jnp.asarray(anc), g=g)
    pk_t, pv_t, p_real = pack_kernel_prefix(
        jnp.asarray(pk), jnp.asarray(pv), group_items=g
    )
    assert p_real == P and pk_t.shape[0] % 2 == 0  # padded layout
    out, kc2, vc2 = fused_beam_cache_attention(
        jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(q),
        jnp.asarray(k_new), jnp.asarray(v_new), bias,
        jnp.asarray(idx, jnp.int32), interpret=True,
        prefix=(pk_t, pv_t, p_real, K),
    )
    out, kc2, vc2 = np.asarray(out), np.asarray(kc2), np.asarray(vc2)

    scale = D ** -0.5
    for b in range(B):
        for qq in range(K):
            n = b * K + qq
            for h in range(H):
                sel_k = np.stack(
                    [pk[b, pp, h] for pp in range(P)]
                    + [kc[t, b * K + anc_idx[b, qq, t], h * D:(h + 1) * D]
                       for t in range(idx)] + [k_new[n, h]], 0)
                sel_v = np.stack(
                    [pv[b, pp, h] for pp in range(P)]
                    + [vc[t, b * K + anc_idx[b, qq, t], h * D:(h + 1) * D]
                       for t in range(idx)] + [v_new[n, h]], 0)
                s = sel_k @ (q[n, h] * scale)
                p = np.exp(s - s.max())
                p /= p.sum()
                np.testing.assert_allclose(
                    out[n, h], p @ sel_v, rtol=1e-5, atol=1e-5
                )

    # cache writes unchanged by the prefix streaming
    exp_kc = kc.copy()
    exp_vc = vc.copy()
    exp_kc[idx] = k_new.reshape(N, H * D)
    exp_vc[idx] = v_new.reshape(N, H * D)
    np.testing.assert_array_equal(kc2, exp_kc)
    np.testing.assert_array_equal(vc2, exp_vc)


def test_ensemble_generate_kernel_matches_permute(monkeypatch):
    """Two-member ensemble through make_generate_fn: the kernel-cache default
    path must reproduce the permute path (logit-sum semantics preserved)."""
    from vilmedic_tpu.blocks.transformer import TransformerConfig
    from vilmedic_tpu.models import evaluation_nlg
    from vilmedic_tpu.models.rrs import RRSModule

    enc_cfg = TransformerConfig(
        vocab_size=97, hidden_size=128, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32,
    )
    dec_cfg = TransformerConfig(
        vocab_size=4500, hidden_size=128, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32, add_cross_attention=True,
    )
    rng = np.random.default_rng(0)
    b, t = 4, 6
    ids = jnp.asarray(rng.integers(3, 97, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)
    dec_ids = jnp.asarray(rng.integers(3, 4500, (b, 5)), jnp.int32)

    models, variables_list = [], []
    for seed in (0, 1):
        module = RRSModule(enc_config=enc_cfg, dec_config=dec_cfg)
        variables = module.init(
            jax.random.key(seed), ids, mask, dec_ids,
            jnp.ones((b, 5), jnp.int32),
        )

        class _Shim:
            pass

        m = _Shim()
        m.module = module
        m.dec_config = dec_cfg
        models.append(m)
        variables_list.append(variables)

    enc_inputs = {"input_ids": ids, "attention_mask": mask}

    monkeypatch.setenv("VILMEDIC_ANCESTRY_DECODE", "0")
    plain = evaluation_nlg.make_generate_fn(
        models, beam_width=3, max_len=7, bos_id=0, eos_id=1, pad_id=2,
        length_penalty=1.0,
    )
    seq_plain = np.asarray(plain(variables_list, enc_inputs))

    monkeypatch.setenv("VILMEDIC_ANCESTRY_DECODE", "pallas")
    kern = evaluation_nlg.make_generate_fn(
        models, beam_width=3, max_len=7, bos_id=0, eos_id=1, pad_id=2,
        length_penalty=1.0,
    )
    seq_kern = np.asarray(kern(variables_list, enc_inputs))
    np.testing.assert_array_equal(seq_plain, seq_kern)


def test_pallas_beam_search_matches_permute():
    """Full beam decode through the fused kernel == the cache-permute path."""
    from vilmedic_tpu.blocks.transformer import (
        TransformerConfig,
        TransformerDecoder,
        make_blocked_head_weights,
        to_kernel_cache,
    )
    from vilmedic_tpu.decoding import beam_search, tile_for_beams

    vocab = 4608
    cfg = TransformerConfig(
        vocab_size=vocab, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
        max_position_embeddings=64, add_cross_attention=True,
        dtype=jnp.float32,
    )
    dec = TransformerDecoder(cfg)
    b, k, s, max_len = 3, 4, 7, 16
    rng = np.random.default_rng(0)
    enc_h = jnp.asarray(rng.normal(size=(b, s, 128)), jnp.float32)
    vs = dec.init(jax.random.key(0), input_ids=jnp.zeros((1, 4), jnp.int32),
                  encoder_hidden_states=jnp.zeros((1, s, 128)))
    self_c, cross_c = dec.apply(vs, encoder_hidden_states=enc_h,
                                mode="init_cache", max_len=max_len)
    self_c = tile_for_beams(self_c, k)
    cross_c = tile_for_beams(cross_c, k)
    enc_m = jnp.ones((b * k, s), jnp.int32)
    blocked = make_blocked_head_weights(vs["params"], cfg.dtype)

    def mk_step(use_blocked):
        def step_fn(tokens, sc, index, anc=None):
            kw = dict(mode="decode", decode_index=index,
                      encoder_attention_mask=enc_m)
            if use_blocked:
                kw["blocked_head"] = blocked
            if anc is not None:
                kw["ancestry"] = anc
            logits, new_self = dec.apply(vs, tokens, cache=(sc, cross_c), **kw)
            return (logits if use_blocked else logits[:, -1]), new_self
        return step_fn

    for use_blocked in (False, True):
        bv = vocab if use_blocked else None
        r0 = beam_search(mk_step(use_blocked), self_c, b, k, max_len,
                         0, 2, 1, length_penalty=1.0, blocked_vocab=bv)
        r1 = beam_search(mk_step(use_blocked), to_kernel_cache(self_c),
                         b, k, max_len, 0, 2, 1, length_penalty=1.0,
                         blocked_vocab=bv, ancestry=True,
                         ancestry_group_items=1)
        np.testing.assert_array_equal(
            np.asarray(r0.sequences), np.asarray(r1.sequences)
        )
        np.testing.assert_allclose(
            np.asarray(r0.scores), np.asarray(r1.scores), rtol=2e-6, atol=2e-6
        )


def test_pick_ancestry_group_legality():
    """TPU slab legality in one place (pick_ancestry_group): rows<=64 VMEM,
    rows%8 bitcast, and a 128-aligned t-chunk that depends on max_len's
    divisors — e.g. at t=100 only 32-multiples are legal."""
    from vilmedic_tpu.ops.beam_cache_attention import (
        kernel_rows_ok,
        pick_ancestry_group,
    )

    # bench/eval headline shapes: rows-32 slabs preferred over rows-64 (same
    # DMA bytes, half the masked score/softmax work — measured never worse,
    # +2.4% at VL-518; see the pick_ancestry_group docstring)
    assert pick_ancestry_group(128, 8, 100, interpret=False) == 4
    assert pick_ancestry_group(32, 8, 100, interpret=False) == 4
    # beam wider than 32 rows: falls back to the biggest legal group
    assert pick_ancestry_group(2, 64, 128, interpret=False) == 1
    # no legal group -> None (previously these tripped kernel trace asserts
    # on TPU: rows%8 for 3x4, the t-chunk rule for 6x8=48 rows at t=100)
    assert pick_ancestry_group(3, 4, 100, interpret=False) is None
    assert pick_ancestry_group(6, 8, 100, interpret=False) is None
    assert pick_ancestry_group(4, 8, 100, interpret=False) == 4  # rows 32
    assert not kernel_rows_ok(48, 100) and kernel_rows_ok(32, 100)
    assert kernel_rows_ok(16, 128)  # t=128: c=8 aligns 8*16
    # interpret mode (CPU tests) only keeps the VMEM bound
    assert pick_ancestry_group(3, 4, 100, interpret=True) == 3
    assert kernel_rows_ok(12, 100, interpret=True)
    assert not kernel_rows_ok(96, 100, interpret=True)


def test_generate_falls_back_when_no_legal_group(monkeypatch):
    """When no kernel group size is legal for the batch/beam/max_len, the
    eval path must fall back to the cache-permute route (same sequences)
    instead of tracing the kernel."""
    from vilmedic_tpu.blocks.transformer import TransformerConfig
    from vilmedic_tpu.models import evaluation_nlg
    from vilmedic_tpu.models.rrs import RRSModule
    from vilmedic_tpu.ops import beam_cache_attention as bca

    enc_cfg = TransformerConfig(
        vocab_size=97, hidden_size=128, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32,
    )
    dec_cfg = TransformerConfig(
        vocab_size=211, hidden_size=128, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32, add_cross_attention=True,
    )
    rng = np.random.default_rng(0)
    b, t = 3, 6
    ids = jnp.asarray(rng.integers(3, 97, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)
    module = RRSModule(enc_config=enc_cfg, dec_config=dec_cfg)
    variables = module.init(
        jax.random.key(0), ids, mask,
        jnp.asarray(rng.integers(3, 211, (b, 5)), jnp.int32),
        jnp.ones((b, 5), jnp.int32),
    )

    class _Shim:
        pass

    m = _Shim()
    m.module = module
    m.dec_config = dec_cfg
    enc_inputs = {"input_ids": ids, "attention_mask": mask}

    monkeypatch.setenv("VILMEDIC_ANCESTRY_DECODE", "0")
    plain = evaluation_nlg.make_generate_fn(
        [m], beam_width=4, max_len=7, bos_id=0, eos_id=1, pad_id=2,
        length_penalty=1.0,
    )
    seq_plain = np.asarray(plain([variables], enc_inputs))

    # force "no legal group" (as on TPU for batch 3 x beam 4) through the
    # default kernel-preferring path
    monkeypatch.setenv("VILMEDIC_ANCESTRY_DECODE", "pallas")
    monkeypatch.setattr(bca, "pick_ancestry_group", lambda *a, **k: None)
    fb = evaluation_nlg.make_generate_fn(
        [m], beam_width=4, max_len=7, bos_id=0, eos_id=1, pad_id=2,
        length_penalty=1.0,
    )
    seq_fb = np.asarray(fb([variables], enc_inputs))
    np.testing.assert_array_equal(seq_plain, seq_fb)


def test_kernel_int8_cache_matches_quantized_oracle():
    """kv_scales switches the generated cache to int8 (per-lane static
    scales): over MULTIPLE consecutive steps the kernel must (a) write this
    step's K/V quantized with round-to-nearest + saturation, and (b) produce
    attention outputs equal to a numpy oracle that reads the same
    dequantized cache — the current step's own lane stays exact (analytic,
    never read back through the cache)."""
    B, K, T, H, D = 4, 4, 12, 4, 32
    N = B * K
    HD = H * D
    rng = np.random.default_rng(3)

    ks = (rng.uniform(0.5, 2.0, HD) / 127.0).astype(np.float32)
    vs = (rng.uniform(0.5, 2.0, HD) / 127.0).astype(np.float32)
    scales = jnp.asarray(np.stack([ks, vs]))

    def quant(x, s):
        return np.clip(np.round(x / s), -127, 127).astype(np.int8)

    start = 5
    kc8 = quant(rng.normal(size=(T, N, HD)).astype(np.float32) * 0.02, ks)
    vc8 = quant(rng.normal(size=(T, N, HD)).astype(np.float32) * 0.02, vs)
    kc8[start:] = 0
    vc8[start:] = 0

    kcj, vcj = jnp.asarray(kc8), jnp.asarray(vc8)
    for step in range(3):
        idx = start + step
        q = rng.normal(size=(N, H, D)).astype(np.float32) * 0.05
        k_new = rng.normal(size=(N, H, D)).astype(np.float32) * 0.05
        v_new = rng.normal(size=(N, H, D)).astype(np.float32) * 0.05

        anc_idx = rng.integers(0, K, (B, K, T))
        anc = np.zeros((B, K, K, T), np.float32)
        for b in range(B):
            for qq in range(K):
                for t in range(idx):
                    anc[b, anc_idx[b, qq, t], qq, t] = 1.0

        bias = make_ancestry_mask(jnp.asarray(anc), g=2)
        out, kcj, vcj = fused_beam_cache_attention(
            kcj, vcj, jnp.asarray(q), jnp.asarray(k_new),
            jnp.asarray(v_new), bias, jnp.asarray(idx, jnp.int32),
            interpret=True, kv_scales=scales,
        )
        assert kcj.dtype == jnp.int8 and vcj.dtype == jnp.int8
        out = np.asarray(out)

        # (a) in-place write is the quantized projection of this step's K/V
        kc8[idx] = quant(k_new.reshape(N, HD), ks)
        vc8[idx] = quant(v_new.reshape(N, HD), vs)
        np.testing.assert_array_equal(np.asarray(kcj), kc8)
        np.testing.assert_array_equal(np.asarray(vcj), vc8)

        # (b) outputs equal the dequantized-cache oracle
        kdeq = kc8.astype(np.float32) * ks
        vdeq = vc8.astype(np.float32) * vs
        scale = D ** -0.5
        for b in range(B):
            for qq in range(K):
                n = b * K + qq
                for h in range(H):
                    sl = slice(h * D, (h + 1) * D)
                    sel_k = np.stack(
                        [kdeq[t, b * K + anc_idx[b, qq, t], sl]
                         for t in range(idx)] + [k_new[n, h]], 0)
                    sel_v = np.stack(
                        [vdeq[t, b * K + anc_idx[b, qq, t], sl]
                         for t in range(idx)] + [v_new[n, h]], 0)
                    s = sel_k @ (q[n, h] * scale)
                    p = np.exp(s - s.max())
                    p /= p.sum()
                    np.testing.assert_allclose(
                        out[n, h], p @ sel_v, rtol=2e-4, atol=2e-5,
                    )
