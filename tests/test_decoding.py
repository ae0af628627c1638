"""Decoding tests against brute-force references on toy stateless models."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from vilmedic_tpu.decoding import beam_search, greedy_search, sample, tile_for_beams

BOS, EOS, PAD = 0, 1, 2
VOCAB = 6
MAX_LEN = 6


def _toy_step_fn(table):
    """Next-token logits depend only on the current token (Markov table)."""
    table = jnp.asarray(table, jnp.float32)

    def step_fn(tokens, caches, index):
        logits = table[tokens[:, 0]]
        return logits, caches

    return step_fn


def _brute_force_beam(table, length_penalty=1.0):
    """Exhaustive search replicating HF scoring: sum logp / len**alpha, hyp
    length counted incl. BOS, excl. EOS."""
    logp = np.log(np.exp(table) / np.exp(table).sum(-1, keepdims=True))
    best_score, best_seq = -1e9, None
    # enumerate token sequences up to MAX_LEN-1 generated tokens
    for n in range(1, MAX_LEN):
        for seq in itertools.product(range(VOCAB), repeat=n):
            score = 0.0
            prev = BOS
            ok = True
            for t_i, tok in enumerate(seq):
                score += logp[prev, tok]
                prev = tok
                if tok == EOS:
                    if t_i != len(seq) - 1:
                        ok = False
                    break
            if not ok:
                continue
            if seq[-1] == EOS:
                hyp_len = len(seq)  # includes BOS (1) + (n-1) tokens before EOS
                norm = score / (hyp_len ** length_penalty)
            elif n == MAX_LEN - 1:
                norm = score / (MAX_LEN ** length_penalty)
            else:
                continue
            if norm > best_score:
                best_score, best_seq = norm, (BOS,) + seq
    return best_score, best_seq


def test_greedy_matches_argmax_chain():
    rng = np.random.default_rng(0)
    table = rng.normal(size=(VOCAB, VOCAB)).astype(np.float32)
    table[:, PAD] = -100.0  # never pick pad
    step = _toy_step_fn(table)
    out = greedy_search(step, {}, batch_size=2, max_len=MAX_LEN,
                        bos_id=BOS, eos_id=EOS, pad_id=PAD, forced_eos=False)
    seqs = np.asarray(out.sequences)
    # manual argmax chain
    for row in seqs:
        prev = row[0]
        for tok in row[1:]:
            if prev == EOS or tok == PAD:
                break
            assert tok == int(np.argmax(table[prev]))
            prev = tok


def test_beam_matches_brute_force():
    rng = np.random.default_rng(3)
    for trial in range(3):
        table = rng.normal(size=(VOCAB, VOCAB)).astype(np.float32) * 2.0
        table[:, PAD] = -100.0
        table[:, BOS] = -100.0
        lp = [0.5, 1.0, 2.0][trial]
        step = _toy_step_fn(table)
        result = beam_search(
            step, {}, batch_size=1, beam_size=VOCAB * 2, max_len=MAX_LEN,
            bos_id=BOS, eos_id=EOS, pad_id=PAD, length_penalty=lp,
        )
        expected_score, expected_seq = _brute_force_beam(table, lp)
        got = np.asarray(result.sequences[0])
        got_trimmed = tuple(t for t in got if t != PAD)
        assert result.scores[0] == np.float32(result.scores[0])
        np.testing.assert_allclose(float(result.scores[0]), expected_score, rtol=1e-4)
        assert got_trimmed == expected_seq, (got_trimmed, expected_seq, trial)


def test_beam_batch_and_tile():
    rng = np.random.default_rng(1)
    table = rng.normal(size=(VOCAB, VOCAB)).astype(np.float32)
    table[:, PAD] = -100.0
    k = 3
    # caches with a per-item payload to check tiling+gather don't crash
    caches = {"payload": jnp.arange(2 * 10, dtype=jnp.float32).reshape(2, 10)}
    tiled = tile_for_beams(caches, k)
    assert tiled["payload"].shape == (2 * k, 10)
    result = beam_search(
        _toy_step_fn(table), tiled, batch_size=2, beam_size=k, max_len=MAX_LEN,
        bos_id=BOS, eos_id=EOS, pad_id=PAD,
    )
    assert result.sequences.shape == (2, MAX_LEN)
    # batch items are independent: same table -> same best sequence
    assert np.array_equal(result.sequences[0], result.sequences[1])


def test_sample_respects_bad_words_and_eos():
    rng = np.random.default_rng(2)
    table = rng.normal(size=(VOCAB, VOCAB)).astype(np.float32)
    out = sample(
        _toy_step_fn(table), {}, batch_size=4, max_len=MAX_LEN,
        bos_id=BOS, eos_id=EOS, pad_id=PAD, rng=jax.random.key(0),
        bad_words=(PAD, BOS), top_k=4,
    )
    seqs = np.asarray(out.sequences)
    for row in seqs:
        gen = row[1:]
        # no BOS afterwards; PAD only after EOS
        assert BOS not in gen
        if EOS in gen:
            eos_pos = list(gen).index(EOS)
            assert all(t == PAD for t in gen[eos_pos + 1:])
    # forced eos: every row terminates
    lengths = np.asarray(out.lengths)
    assert (lengths <= MAX_LEN).all() and (lengths >= 2).all()


def test_batch_beam_candidates_match_two_stage():
    """The large-vocab blockwise candidate selection must be EXACTLY equivalent
    to the reference two-stage route (per-beam top-2k + pool top-2k)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from vilmedic_tpu.decoding.decode import _batch_beam_candidates

    b, k, v = 3, 8, 6021  # v >= 4096 and not a multiple of 128 (tail block)
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(b * k, v)) * 4, jnp.float32)
    alive = jnp.asarray(rng.normal(size=(b, k)), jnp.float32)
    r = 2 * k

    scores, beams, tokens = jax.jit(
        lambda l, a: _batch_beam_candidates(l, b, k, a, r)
    )(logits, alive)

    # reference: explicit log-softmax + flat top-2k per batch item
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1)).reshape(b, k, v)
    total = logp + np.asarray(alive)[:, :, None]
    flat = total.reshape(b, k * v)
    order = np.argsort(-flat, axis=1)[:, :r]
    exp_scores = np.take_along_axis(flat, order, axis=1)
    np.testing.assert_allclose(np.asarray(scores), exp_scores, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(beams), order // v)
    np.testing.assert_array_equal(np.asarray(tokens), order % v)


def test_blocked_candidates_match_two_stage():
    """_candidates_from_blocks (pre-blocked logits from a blocked LM head,
    transformer._head_blocked) is exactly the flat-path selection."""
    from vilmedic_tpu.decoding.decode import (
        _PAD_NEG,
        _batch_beam_candidates,
        _candidates_from_blocks,
    )

    b, k, v = 3, 8, 6021
    blk = 128
    nb = -(-v // blk)
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(b * k, v)) * 4, jnp.float32)
    alive = jnp.asarray(rng.normal(size=(b, k)), jnp.float32)
    r = 2 * k

    xp = jnp.pad(logits, ((0, 0), (0, nb * blk - v)), constant_values=_PAD_NEG)
    xp = xp.reshape(b * k, nb, blk)

    s1, b1, t1 = jax.jit(lambda l, a: _batch_beam_candidates(l, b, k, a, r))(
        logits, alive
    )
    s2, b2, t2 = jax.jit(lambda l, a: _candidates_from_blocks(l, b, k, a, r))(
        xp, alive
    )
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_blocked_beam_search_matches_plain():
    """End-to-end: beam_search(blocked_vocab=V) over pre-blocked step logits
    returns the same sequences and scores as the plain (N, V) path."""
    from vilmedic_tpu.decoding.decode import _PAD_NEG

    v = 4500  # >= 4096 so the plain path uses the blockwise selection too
    blk = 128
    nb = -(-v // blk)
    rng = np.random.default_rng(3)
    table = rng.normal(size=(v, v)).astype(np.float32) * 2
    table_j = jnp.asarray(table)

    def plain_step(tokens, caches, index):
        return table_j[tokens[:, 0] % v], caches

    def blocked_step(tokens, caches, index):
        logits = table_j[tokens[:, 0] % v]
        xp = jnp.pad(
            logits, ((0, 0), (0, nb * blk - v)), constant_values=_PAD_NEG
        )
        return xp.reshape(logits.shape[0], nb, blk), caches

    k = 4
    r1 = beam_search(plain_step, {}, batch_size=2, beam_size=k, max_len=6,
                     bos_id=0, eos_id=1, pad_id=2)
    r2 = beam_search(blocked_step, {}, batch_size=2, beam_size=k, max_len=6,
                     bos_id=0, eos_id=1, pad_id=2, blocked_vocab=v)
    np.testing.assert_array_equal(np.asarray(r1.sequences), np.asarray(r2.sequences))
    np.testing.assert_array_equal(np.asarray(r1.scores), np.asarray(r2.scores))


def test_ancestry_beam_search_matches_permute():
    """Reorder-free (ancestry) beam decode must reproduce the cache-permute
    path exactly: same sequences AND same scores, blocked and unblocked, on a
    real multi-layer decoder (the masked joint (slot, t) softmax is
    value-preserving, decode.py beam_search(ancestry=True))."""
    from vilmedic_tpu.blocks.transformer import (
        TransformerConfig,
        TransformerDecoder,
        make_blocked_head_weights,
    )
    from vilmedic_tpu.decoding import tile_for_beams

    vocab = 4608  # >= 4096: exercises the blocked candidate selection
    cfg = TransformerConfig(
        vocab_size=vocab, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, add_cross_attention=True,
        dtype=jnp.float32,
    )
    dec = TransformerDecoder(cfg)
    b, k, s, max_len = 3, 4, 7, 16
    rng = np.random.default_rng(0)
    enc_h = jnp.asarray(rng.normal(size=(b, s, 64)), jnp.float32)
    vs = dec.init(jax.random.key(0), input_ids=jnp.zeros((1, 4), jnp.int32),
                  encoder_hidden_states=jnp.zeros((1, s, 64)))
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
        r1 = beam_search(mk_step(use_blocked), self_c, b, k, max_len,
                         0, 2, 1, length_penalty=1.0, blocked_vocab=bv,
                         ancestry=True)
        np.testing.assert_array_equal(
            np.asarray(r0.sequences), np.asarray(r1.sequences)
        )
        np.testing.assert_array_equal(
            np.asarray(r0.scores), np.asarray(r1.scores)
        )


def test_blocked_head_logit_parity():
    """TransformerDecoder._head_blocked == _head on the real vocab columns,
    with padded lanes below any real logit (cpu: bit-exact; the TPU-side
    bit-exactness of the preferred_element_type=f32 route is asserted by the
    bench checksum)."""
    from vilmedic_tpu.blocks.transformer import (
        TransformerConfig,
        TransformerDecoder,
        make_blocked_head_weights,
    )

    cfg = TransformerConfig(
        vocab_size=1000, hidden_size=64, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=128,
        add_cross_attention=True, dtype=jnp.bfloat16,
    )
    dec = TransformerDecoder(cfg)
    rng = np.random.default_rng(0)
    enc_h = jnp.asarray(rng.normal(size=(2, 5, 64)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 1000, (2, 4)), jnp.int32)
    em = jnp.ones((2, 5), jnp.int32)
    vs = dec.init(jax.random.key(0), ids, jnp.ones((2, 4), jnp.int32), enc_h, em)
    self_c, cross_c = dec.apply(
        vs, encoder_hidden_states=enc_h, mode="init_cache", max_len=8
    )
    blocked = make_blocked_head_weights(vs["params"], cfg.dtype)
    tok = jnp.asarray([[3], [4]], jnp.int32)
    di = jnp.asarray(0, jnp.int32)
    lo, _ = dec.apply(vs, tok, encoder_attention_mask=em, mode="decode",
                      cache=(self_c, cross_c), decode_index=di)
    lb, _ = dec.apply(vs, tok, encoder_attention_mask=em, mode="decode",
                      cache=(self_c, cross_c), decode_index=di,
                      blocked_head=blocked)
    lo = np.asarray(lo)[:, -1]
    lbf = np.asarray(lb).reshape(2, -1)
    np.testing.assert_allclose(lbf[:, :1000], lo, rtol=0, atol=2e-2)
    assert lbf[:, 1000:].max() <= -1e29


def test_kernel_shard_map_decode_matches_unsharded():
    """The fused Pallas reorder-free decode under shard_map (the real
    multi-device eval path: hidden % 128 == 0 routes evaluation_nlg through
    the kernel cache) must match the unsharded kernel path and keep the loop
    collective-free."""
    import jax
    from vilmedic_tpu.blocks.transformer import TransformerConfig
    from vilmedic_tpu.models.evaluation_nlg import make_generate_fn
    from vilmedic_tpu.models.rrs import RRSModule
    from vilmedic_tpu.parallel.mesh import get_mesh

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
    module = RRSModule(enc_config=enc_cfg, dec_config=dec_cfg)
    rng = np.random.default_rng(0)
    b, t = 8, 6
    ids = jnp.asarray(rng.integers(3, 97, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)
    dec_ids = jnp.asarray(rng.integers(3, 4500, (b, 5)), jnp.int32)
    variables = module.init(
        jax.random.key(0), ids, mask, dec_ids, jnp.ones((b, 5), jnp.int32)
    )

    class _Shim:
        pass

    m = _Shim()
    m.module = module
    m.dec_config = dec_cfg
    enc_inputs = {"input_ids": ids, "attention_mask": mask}

    plain = make_generate_fn(
        [m], beam_width=3, max_len=7, bos_id=0, eos_id=1, pad_id=2,
        length_penalty=1.0,
    )
    seq_plain = np.asarray(plain([variables], enc_inputs))

    mesh = get_mesh(devices=jax.devices())
    sharded = make_generate_fn(
        [m], beam_width=3, max_len=7, bos_id=0, eos_id=1, pad_id=2,
        length_penalty=1.0, mesh=mesh,
    )
    hlo = sharded.lower([variables], enc_inputs).compile().as_text()
    for coll in ("all-gather", "all-reduce", "collective-permute", "all-to-all"):
        assert coll not in hlo, f"decode HLO contains {coll}"
    seq_sharded = np.asarray(sharded([variables], enc_inputs))
    np.testing.assert_array_equal(seq_plain, seq_sharded)


def test_blocked_shard_map_decode_matches_unsharded():
    """Large-vocab (blocked-LM-head) beam decode under shard_map: same
    sequences as the unsharded path, and the decode loop stays free of
    cross-device collectives."""
    import jax
    from jax.sharding import PartitionSpec as P

    from vilmedic_tpu.blocks.transformer import TransformerConfig
    from vilmedic_tpu.models.evaluation_nlg import make_generate_fn
    from vilmedic_tpu.models.rrs import RRSModule
    from vilmedic_tpu.parallel.mesh import get_mesh

    enc_cfg = TransformerConfig(
        vocab_size=97, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32,
    )
    dec_cfg = TransformerConfig(
        vocab_size=4500, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32, add_cross_attention=True,
    )
    module = RRSModule(enc_config=enc_cfg, dec_config=dec_cfg)
    rng = np.random.default_rng(0)
    b, t = 8, 6
    ids = jnp.asarray(rng.integers(3, 97, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)
    dec_ids = jnp.asarray(rng.integers(3, 4500, (b, 5)), jnp.int32)
    variables = module.init(
        jax.random.key(0), ids, mask, dec_ids, jnp.ones((b, 5), jnp.int32)
    )

    class _Shim:  # the surface make_generate_fn needs
        pass

    m = _Shim()
    m.module = module
    m.dec_config = dec_cfg
    enc_inputs = {"input_ids": ids, "attention_mask": mask}

    plain = make_generate_fn(
        [m], beam_width=3, max_len=7, bos_id=0, eos_id=1, pad_id=2,
        length_penalty=1.0,
    )
    seq_plain = np.asarray(plain([variables], enc_inputs))

    mesh = get_mesh(devices=jax.devices())
    assert len(jax.devices()) > 1
    sharded = make_generate_fn(
        [m], beam_width=3, max_len=7, bos_id=0, eos_id=1, pad_id=2,
        length_penalty=1.0, mesh=mesh,
    )
    hlo = sharded.lower([variables], enc_inputs).compile().as_text()
    for coll in ("all-gather", "all-reduce", "collective-permute", "all-to-all"):
        assert coll not in hlo, f"decode HLO contains {coll}"
    seq_sharded = np.asarray(sharded([variables], enc_inputs))
    np.testing.assert_array_equal(seq_plain, seq_sharded)


def test_stats_kernel_decode_matches_default_route(monkeypatch):
    """VILMEDIC_LMHEAD_KERNEL=1 (fused LM-head stats route, opt-in after the
    measured in-loop negative — ROUND3_NOTES) produces the same sequences as
    the default XLA blocked route, unsharded and under shard_map."""
    import jax
    from vilmedic_tpu.blocks.transformer import TransformerConfig
    from vilmedic_tpu.models.evaluation_nlg import make_generate_fn
    from vilmedic_tpu.models.rrs import RRSModule
    from vilmedic_tpu.parallel.mesh import get_mesh

    enc_cfg = TransformerConfig(
        vocab_size=97, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32,
    )
    dec_cfg = TransformerConfig(
        vocab_size=4500, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32, add_cross_attention=True,
    )
    module = RRSModule(enc_config=enc_cfg, dec_config=dec_cfg)
    rng = np.random.default_rng(3)
    b, t = 8, 6
    ids = jnp.asarray(rng.integers(3, 97, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)
    dec_ids = jnp.asarray(rng.integers(3, 4500, (b, 5)), jnp.int32)
    variables = module.init(
        jax.random.key(0), ids, mask, dec_ids, jnp.ones((b, 5), jnp.int32)
    )

    class _Shim:
        pass

    m = _Shim()
    m.module = module
    m.dec_config = dec_cfg
    enc_inputs = {"input_ids": ids, "attention_mask": mask}
    kw = dict(beam_width=3, max_len=7, bos_id=0, eos_id=1, pad_id=2,
              length_penalty=1.0)

    seq_default = np.asarray(make_generate_fn([m], **kw)([variables], enc_inputs))

    monkeypatch.setenv("VILMEDIC_LMHEAD_KERNEL", "1")
    seq_stats = np.asarray(make_generate_fn([m], **kw)([variables], enc_inputs))
    np.testing.assert_array_equal(seq_default, seq_stats)

    sharded = make_generate_fn([m], **kw, mesh=get_mesh(devices=jax.devices()))
    np.testing.assert_array_equal(
        seq_default, np.asarray(sharded([variables], enc_inputs))
    )


def test_greedy_and_sample_matches_separate_rollouts():
    """The fused 2x-batch SCST rollout (interleaved greedy/sampled rows)
    must reproduce greedy_search + sample exactly, given the same rng."""
    from vilmedic_tpu.decoding import (
        greedy_and_sample,
        greedy_search,
        sample,
        stack_for_rollouts,
    )

    rng = np.random.default_rng(5)
    table = rng.normal(size=(VOCAB, VOCAB)).astype(np.float32) * 2
    key = jax.random.key(7)
    b = 4
    caches = {"payload": jnp.arange(b * 3, dtype=jnp.float32).reshape(b, 3)}

    g = greedy_search(_toy_step_fn(table), caches, b, MAX_LEN, BOS, EOS, PAD,
                      forced_eos=True)
    s = sample(_toy_step_fn(table), caches, b, MAX_LEN, BOS, EOS, PAD, rng=key,
               top_k=3, bad_words=(PAD, BOS), forced_eos=True)
    g2, s2 = greedy_and_sample(
        _toy_step_fn(table), stack_for_rollouts(caches), b, MAX_LEN,
        BOS, EOS, PAD, rng=key, top_k=3, bad_words=(PAD, BOS), forced_eos=True,
    )
    np.testing.assert_array_equal(np.asarray(g.sequences), np.asarray(g2.sequences))
    np.testing.assert_array_equal(np.asarray(s.sequences), np.asarray(s2.sequences))
    np.testing.assert_array_equal(np.asarray(g.lengths), np.asarray(g2.lengths))
    np.testing.assert_array_equal(np.asarray(s.lengths), np.asarray(s2.lengths))


def test_kth_largest_blockwise_exact():
    """The blockwise top-k sampling threshold equals np.sort's k-th largest at
    large vocab (lax.top_k there lowers to a ~1.7 ms/step full sort on TPU)."""
    from vilmedic_tpu.decoding.decode import _kth_largest

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(7, 6021)), jnp.float32)
    for k in (1, 25, 50):
        got = np.asarray(jax.jit(lambda a: _kth_largest(a, k))(x))[:, 0]
        want = np.sort(np.asarray(x), axis=-1)[:, -k]
        np.testing.assert_array_equal(got, want)
