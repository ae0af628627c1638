"""Model-owned NLG evaluation loop: jitted encode + (ensembling) beam decode.

Parity with the reference eval loops (blocks/huggingface/decoder/evaluation.py:20-85
single model, evaluation_multi.py:20-89 ensembling): for every batch, run each
model's encoder, then one beam search whose per-step logits are the **sum of raw
logits across ensemble members** (reference beam_search.py:254), finally decode
hypotheses/references with the target tokenizer.

TPU-first: the whole encode+decode for a batch is ONE jitted function with static
shapes (batch padded up to the configured batch size), compiled once per run.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..decoding import beam_search, greedy_search, tile_for_beams
from .base import get_special_token_ids


def _pad_batch(arr: np.ndarray, target: int) -> np.ndarray:
    if arr.shape[0] == target:
        return arr
    reps = np.repeat(arr[-1:], target - arr.shape[0], axis=0)
    return np.concatenate([arr, reps], axis=0)


def pipelined_decode(dl, tokenizer, prepare, launch):
    """The decode/detokenize pipeline shared by the generation eval_funcs
    (RRG/RRS here, VL in models/vision_language.py).

    ``prepare(batch) -> (inputs, ref_ids, n)`` builds the device inputs (pad +
    shard included) and returns the reference token ids and the un-padded
    count; ``launch(inputs)`` dispatches the jitted generate and returns the
    device sequences. jax dispatch is async, so the device decodes batch i+1
    while the host D2H-transfers and detokenizes batch i — on tunneled hosts
    the per-batch read-back would otherwise serialize with the decode.
    """
    refs: List[str] = []
    hyps: List[str] = []

    def _flush(prev):
        if prev is None:
            return
        ref_ids, seqs_dev, n = prev
        for h, r in zip(np.asarray(seqs_dev)[:n], ref_ids):
            hyps.append(
                tokenizer.decode(h, skip_special_tokens=True, clean_up_tokenization_spaces=False)
            )
            refs.append(
                tokenizer.decode(r, skip_special_tokens=True, clean_up_tokenization_spaces=False)
            )

    prev = None
    for batch in dl:
        inputs, ref_ids, n = prepare(batch)
        seqs_dev = launch(inputs)
        _flush(prev)
        prev = (ref_ids, seqs_dev, n)
    _flush(prev)
    return {"refs": refs, "hyps": hyps}


def setup_sharded_eval(config, batch_size):
    """Shared SPMD eval policy for the generation eval_funcs (RRG/RRS here,
    VL in models/vision_language.py): data-parallel eval is the DEFAULT on
    multi-device (``shard_eval: false`` disables); batches pad up to the
    nearest device-count multiple for static even sharding; params replicate
    onto the local eval mesh once up front. Multi-host: each process decodes
    its own dataloader shard on its LOCAL devices (the reference's per-rank
    eval, validator_accelerate.py:112-119) and the trained state lives on a
    GLOBAL mesh, so replication stages through host numpy (replicated arrays
    are fully addressable per host).

    Returns ``(mesh, pad_target, replicate)`` — ``mesh`` is None when eval is
    unsharded, ``replicate(tree)`` places a param tree on the eval mesh.
    """
    import math

    devices = jax.local_devices()
    n_dev = len(devices)
    shard_eval = config.get("shard_eval", None)
    if shard_eval is None:
        shard_eval = n_dev > 1
    pad_target = int(batch_size) if batch_size else None
    if not (shard_eval and n_dev > 1 and batch_size):
        return None, pad_target, lambda tree: tree

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import get_mesh

    mesh = get_mesh(devices=devices)
    pad_target = math.ceil(int(batch_size) / n_dev) * n_dev
    repl = NamedSharding(mesh, P())

    def replicate(tree):
        if jax.process_count() > 1:
            tree = jax.tree.map(lambda x: np.asarray(x), tree)
        return jax.device_put(tree, repl)

    return mesh, pad_target, replicate


def wrap_generate_sharded(generate, mesh, uses_pallas_kernel):
    """jit ``generate(variables, inputs)``; with a mesh, run it under
    ``shard_map`` over the data axis (decode fully shard-local).

    ``uses_pallas_kernel`` scopes the CPU-INTERPRET-MODE-ONLY ``check_vma``
    workaround: discharge of the fused kernel's DMA primitives inside
    shard_map trips jax's vma matching (dynamic_slice on a varying buffer with
    unvarying scratch operands — jax hlo_interpreter limitation). On real TPU
    the pallas_call stays a custom call with vma declared from its cache
    operand, so the default multi-device path keeps full vma verification;
    CPU-path numerics are still asserted sharded-vs-unsharded in tests.
    """
    if mesh is None:
        return jax.jit(generate)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    kwargs = {}
    if uses_pallas_kernel and jax.default_backend() == "cpu":
        kwargs["check_vma"] = False
    return jax.jit(
        shard_map(
            generate,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            **kwargs,
        )
    )


def make_generate_fn(models, beam_width, max_len, bos_id, eos_id, pad_id, length_penalty,
                     mesh=None):
    """Build a jitted ensembling generate over (variables_list, encoder inputs).

    With ``mesh``, the WHOLE encode+beam-decode runs under ``shard_map`` over the
    ``data`` axis: every shard beam-searches its own batch slice with its own
    shard-local KV caches and one-hot beam reorders, so the decode loop contains
    **zero cross-device collectives** (asserted in tests/test_decoding.py
    ``test_sharded_decode_*`` and tests/test_rrs_e2e.py)
    — the SPMD analog of the reference's per-rank eval
    (validator_accelerate.py:112-162). Each shard's ``lax.while_loop`` even
    terminates independently on its own early-stop condition.
    """
    modules = [m.module for m in models]
    encode_methods = [type(m.module).encode for m in models]
    # Under shard_map, zero-initialized decode state is "unvarying" over the
    # mesh while the loop body makes it varying; promote it explicitly.
    vary_axes = ()
    if mesh is not None:
        from ..parallel.mesh import DATA_AXIS

        vary_axes = (DATA_AXIS,)

    def _pvary(tree):
        if not vary_axes:
            return tree
        return jax.tree.map(
            lambda x: jax.lax.pcast(x, vary_axes, to="varying"), tree
        )

    # Blocked LM head (pad vocab to 128-multiples ONCE, outside the decode
    # loop; beam search consumes the blocks directly — skips per-step
    # pad+reshape copies of the logits, ~10% decode at vocab 50k on v5e).
    # Bit-identical to the unblocked head (see _head_blocked); enabled when
    # every member's decode_step supports it and shares one large vocab.
    import inspect

    vocab_sizes = {
        getattr(m, "dec_config", None) and m.dec_config.vocab_size for m in models
    }
    use_blocked_vocab = None
    if (
        beam_width and beam_width > 1
        and len(vocab_sizes) == 1
        and (next(iter(vocab_sizes)) or 0) >= 4096
        and all(
            "blocked_head"
            in inspect.signature(type(m.module).decode_step).parameters
            for m in models
        )
    ):
        use_blocked_vocab = next(iter(vocab_sizes))

    # Reorder-free beam decode (ancestry folded into self-attention) — removes
    # the per-step full-cache one-hot permute from the decode loop. Default
    # ("pallas") fuses attention + in-place cache write in one Pallas kernel
    # over (T, N, H*D) caches (ops/beam_cache_attention.py): 280 -> 310
    # reports/s/chip on the v5e bench. VILMEDIC_ANCESTRY_DECODE=xla selects
    # the pure-XLA ancestry formulation (exact but SLOWER than the permute
    # path on TPU: XLA's T-minor carry layout turns the one-slab cache write
    # into a full-buffer rewrite, 122 reports/s); =0 restores the permute.
    import os

    ancestry_impl = os.environ.get("VILMEDIC_ANCESTRY_DECODE", "pallas")
    models_support_ancestry = all(
        "ancestry" in inspect.signature(type(m.module).decode_step).parameters
        for m in models
    )
    kernel_ok = all(
        getattr(m, "dec_config", None) is not None
        and (m.dec_config.hidden_size % 128 == 0)
        and (128 % m.dec_config.head_dim == 0)
        for m in models
    )
    # the kernel groups g items * beam_width rows into <= 64-row slabs, so a
    # beam wider than 64 has no valid group size — fall back to the permute
    # path instead of tripping the group-size search at trace time
    kernel_ok = kernel_ok and bool(beam_width) and beam_width <= 64
    use_ancestry = (
        bool(beam_width and beam_width > 1)
        and models_support_ancestry
        and (ancestry_impl == "1" or ancestry_impl == "xla"
             or (ancestry_impl == "pallas" and kernel_ok))
    )
    use_kernel_cache = use_ancestry and ancestry_impl == "pallas" and kernel_ok

    def generate(variables_list, enc_inputs):
        batch_size = jax.tree.leaves(enc_inputs)[0].shape[0]
        tiling = beam_width if beam_width and beam_width > 1 else 1
        # items per kernel group: biggest legal slab for THIS batch/max_len
        # (encodes rows<=64 VMEM, rows%8 bitcast, 128-aligned t-chunk); None
        # means no legal group — fall back to the cache-permute path rather
        # than tripping the kernel's trace-time asserts
        anc_g = None
        if use_kernel_cache and tiling > 1:
            from ..ops.beam_cache_attention import pick_ancestry_group

            anc_g = pick_ancestry_group(batch_size, beam_width, max_len)
        kernel_now = use_kernel_cache and anc_g is not None
        ancestry_now = use_ancestry and (
            ancestry_impl in ("1", "xla") or kernel_now
        )
        self_caches, invariants = [], []
        for module, method, variables in zip(modules, encode_methods, variables_list):
            enc_h, enc_m = module.apply(variables, **enc_inputs, method=method)
            self_cache, cross_cache = module.apply(
                variables, enc_h, max_len, method=type(module).init_cache
            )
            enc_m = enc_m.astype(jnp.int32)
            if tiling > 1:
                # only the self cache tiles to B*beam rows: cross K/V and the
                # encoder mask stay at batch size B and the cross-attention
                # folds the beam axis into its query axis (MultiHeadAttention
                # beam-shared path) — tiling them made XLA sink the repeat
                # into the decode loop and rematerialize + read a beam-tiled
                # cross K/V every step (~150 us/step at bench shapes, v5e)
                self_cache = tile_for_beams(self_cache, tiling)
            if kernel_now:
                from ..blocks.transformer import to_kernel_cache

                self_cache = to_kernel_cache(self_cache)
            self_caches.append(_pvary(self_cache))
            # cross K/V and encoder mask are beam-invariant: closed over, never
            # gathered in the decode loop (reference reorders every cache,
            # beam_search.py:312-319 — here only the self cache moves).
            invariants.append((cross_cache, enc_m))

        # Fused Pallas LM head (single-model only: per-member block stats
        # cannot be combined into ensemble logit-sum stats): the decode step
        # returns (flat logits, block max, block sumexp) computed in one pass
        # over the weight stream. AUTO by row count (override with
        # VILMEDIC_LMHEAD_KERNEL=0/1): at batch*beam >= 512 rows the XLA
        # candidate route's full-logits relayout + stats reductions scale
        # superlinearly and the kernel route wins (v5e, beam 8, vocab 50k:
        # block-major-logits build: kernel 455 vs XLA 374 rep/s at batch 64,
        # 544 vs 334 at batch 128), while below that the pallas_call's
        # fusion-boundary cost dominates (390 vs 428 at batch 32) —
        # ROUND3_NOTES.
        lmhead_env = os.environ.get("VILMEDIC_LMHEAD_KERNEL", "auto")
        rows = batch_size * tiling
        use_stats_head = (
            use_blocked_vocab is not None
            and len(modules) == 1
            and lmhead_env != "0"
            and (lmhead_env == "1" or rows >= 512)
        )

        blocked_list = [None] * len(modules)
        blocked_vocab = use_blocked_vocab
        if blocked_vocab is not None:
            from ..blocks.transformer import make_blocked_head_weights

            try:
                blocked_list = [
                    make_blocked_head_weights(
                        variables["params"]["dec"], model.dec_config.dtype
                    )
                    for model, variables in zip(models, variables_list)
                ]
            except (KeyError, TypeError):  # unexpected head structure
                blocked_list = [None] * len(modules)
                blocked_vocab = None

        if use_stats_head and blocked_list[0] is not None:
            blocked_list = [tuple(blocked_list[0]) + ("stats",)]

        def step_fn(tokens, self_caches, index, anc=None):
            logits_sum = 0.0
            new_states = []
            for module, variables, self_cache, (cross_cache, enc_m), blocked in zip(
                modules, variables_list, self_caches, invariants, blocked_list
            ):
                extra = {} if anc is None else {"ancestry": anc}
                if blocked is not None:
                    logits, new_self = module.apply(
                        variables, tokens, self_cache, cross_cache, enc_m, index,
                        blocked_head=blocked, **extra,
                        method=type(module).decode_step,
                    )
                    if isinstance(logits, tuple):  # fused head: passthrough
                        new_states.append(new_self)
                        return logits, new_states
                    step_logits = logits  # (N, nb, 128) f32 blocks
                else:
                    logits, new_self = module.apply(
                        variables, tokens, self_cache, cross_cache, enc_m, index,
                        **extra,
                        method=type(module).decode_step,
                    )
                    step_logits = logits[:, -1]
                    if len(modules) > 1:  # ensemble logit sum in f32
                        step_logits = step_logits.astype(jnp.float32)
                logits_sum = logits_sum + step_logits
                new_states.append(new_self)
            return logits_sum, new_states

        if tiling > 1:
            result = beam_search(
                step_fn, self_caches, batch_size, beam_width, max_len,
                bos_id, eos_id, pad_id, length_penalty=length_penalty,
                vary_axes=vary_axes, blocked_vocab=blocked_vocab,
                ancestry=ancestry_now, ancestry_group_items=anc_g,
            )
            return result.sequences
        return greedy_search(
            step_fn, self_caches, batch_size, max_len, bos_id, eos_id, pad_id,
            forced_eos=False, vary_axes=vary_axes,
        ).sequences

    return wrap_generate_sharded(generate, mesh, use_kernel_cache)


def evaluation(models, config, dl, from_training=True, **kwargs) -> Dict[str, Any]:
    """The ``eval_func`` for RRG/RRS-style generation models."""
    dataset = dl.dataset
    if hasattr(dataset, "tokenizer"):
        ref_key = "input_ids"
        tokenizer = dataset.tokenizer
        max_len = dataset.tokenizer_max_len
    else:
        ref_key = "decoder_input_ids"
        tokenizer = dataset.tgt_tokenizer
        max_len = dataset.tgt_tokenizer_max_len

    bos_id, eos_id, pad_id = get_special_token_ids(models[0].dec_config, tokenizer)
    beam_width = config.get("beam_width", 1)
    length_penalty = config.get("length_penalty", None)
    length_penalty = 1.0 if length_penalty is None else float(length_penalty)

    variables_list = [m.variables for m in models]
    batch_size = getattr(dl, "batch_size", None)

    # Data-parallel generation (setup_sharded_eval): shard_map'd decode,
    # device-multiple batch padding, params replicated onto the eval mesh;
    # the Validator gathers refs/hyps across processes afterwards.
    from ..parallel.mesh import shard_batch

    mesh, pad_target, replicate = setup_sharded_eval(config, batch_size)
    if mesh is not None:
        variables_list = [replicate(v) for v in variables_list]

    generate = make_generate_fn(
        models, beam_width, int(max_len), bos_id, eos_id, pad_id, length_penalty,
        mesh=mesh,
    )

    from ..data.image import prepare_batch

    def prepare(batch):
        batch = prepare_batch(batch, dataset)
        n = batch[ref_key].shape[0]
        enc_inputs = models[0].encoder_inputs(batch)
        if pad_target and n < pad_target:  # static-shape padding for XLA
            enc_inputs = {k: _pad_batch(v, pad_target) if v is not None else None
                          for k, v in enc_inputs.items()}
        if mesh is not None:
            enc_inputs = shard_batch(enc_inputs, mesh)
        return enc_inputs, batch[ref_key], n

    return pipelined_decode(
        dl, tokenizer, prepare, lambda inp: generate(variables_list, inp)
    )
