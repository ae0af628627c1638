"""RRG_SCST / RRS_SCST: reinforcement fine-tuning of trained generation models.

Parity with reference vilmedic/models/rrg/RRG_SCST.py:37-91 and rrs/RRS_SCST.py:
wrap a trained base model (checkpoint loaded at construction), run a greedy
baseline rollout and a sampled rollout, reward both with ``REWARD_COMPLIANT``
scorers, and apply the SCST policy-gradient loss.

TPU-native training step (one ``train_iteration`` per batch, SURVEY.md §7):
1. jitted no-grad rollouts (greedy + top-k sampling) over the encoder memory;
2. host-side reward computation (decode to strings -> scorers);
3. jitted gradient step: the sampled sequences are teacher-forced through the
   decoder; per-token log-probs x advantage give the REINFORCE loss (+ optional
   NLL mixing) — replacing the reference's grad-through-generate hack.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import registry
from ..blocks.rl.scst import SCST, scst_loss
from ..blocks.transformer import causal_lm_loss
from ..decoding import greedy_and_sample, stack_for_rollouts
from ..executors.checkpoint import load_checkpoint, restore_into
from .base import TaskModel, get_special_token_ids
from .evaluation_nlg import evaluation as nlg_evaluation


def scst_evaluation(models, config, dl, **kwargs):
    """Unwrap to the trained base models (reference RRG_SCST.py:13-17)."""
    return nlg_evaluation([m.model for m in models], config, dl, **kwargs)


class _SCSTBase(TaskModel):
    base_proto: str = None

    def __init__(self, dl=None, logger=None, from_training=True, scores="ROUGEL",
                 ckpt=None, scores_args=None, scores_weights=None, top_k=None,
                 use_nll=False, overlap_rollout=False, **base_kwargs):
        base_cls = registry.get("model", self.base_proto)
        self.model = base_cls(dl=dl, logger=logger, from_training=from_training,
                              **base_kwargs)
        self.module = self.model.module
        self.dec_config = self.model.dec_config
        self.frozen_prefixes = getattr(self.model, "frozen_prefixes", ())
        self._ckpt = ckpt

        dataset = dl.dataset
        if hasattr(dataset, "tokenizer"):
            tokenizer = dataset.tokenizer
            max_length = dataset.tokenizer_max_len
        elif hasattr(dataset, "tgt_tokenizer"):
            tokenizer = dataset.tgt_tokenizer
            max_length = dataset.tgt_tokenizer_max_len
        else:
            raise NotImplementedError("Where is tokenizer in dataset?")

        bos, eos, pad = get_special_token_ids(self.dec_config, tokenizer)
        self.scst = SCST(
            tokenizer=tokenizer, max_length=max_length,
            bos_token_id=bos, eos_token_id=eos, pad_token_id=pad,
            scores=scores, scores_args=scores_args, scores_weights=scores_weights,
            top_k=top_k, use_nll=use_nll,
        )
        self.eval_func = scst_evaluation
        self.variables: Optional[Dict] = None
        self._rollout_fn = None
        self._grad_fn = None
        # opt-in pipelining: rollout i+1 is dispatched BEFORE grad step i, so
        # the host's reward scoring overlaps the device rollout — at the cost
        # of sampling from a one-step-stale policy (docs/performance.md).
        # Default off: the reference SCST loop is strictly on-policy.
        self.overlap_rollout = bool(overlap_rollout)
        self._pending = None  # (batch, enc_inputs, readback_future, sampled_dev)
        self._drain_pool = None  # 1-thread executor that BLOCKS on the rollout
        # per-phase wall time split (seconds, cumulative) for bench/observability
        self.timing = {"rollout_s": 0.0, "reward_s": 0.0, "grad_s": 0.0, "iters": 0}

    # -- executor contract --------------------------------------------------
    def init_variables(self, rng, batch):
        variables = self.model.init_variables(rng, batch)
        if self._ckpt:
            state = load_checkpoint(self._ckpt)
            variables = restore_into(variables, state["model"])
        return variables

    @property
    def variables(self):
        return self.model.variables

    @variables.setter
    def variables(self, value):
        self.model.variables = value

    def encoder_inputs(self, batch):
        return self.model.encoder_inputs(batch)

    def apply_train(self, variables, batch, rng, train=True):
        # teacher-forced NLL path (used by validation_loss if requested)
        return self.model.apply_train(variables, batch, rng, train=train)

    # -- SCST training ------------------------------------------------------
    def _build_jitted(self, tx):
        module = self.module
        scst = self.scst
        max_len = int(scst.max_length)
        bos, eos, pad = scst.bos_token_id, scst.eos_token_id, scst.pad_token_id
        bad_words = (pad, bos)
        top_k = scst.top_k
        n_scores = len(scst.scores)
        weights = tuple(scst.reward_weights)
        nll_weight = scst.nll_weight
        use_nll = scst.use_nll

        @jax.jit
        def rollouts(variables, enc_inputs, rng):
            enc_h, enc_m = module.apply(
                variables, **enc_inputs, method=type(module).encode
            )
            enc_m = enc_m.astype(jnp.int32)
            batch = enc_h.shape[0]

            self_cache, cross_cache = module.apply(
                variables, enc_h, max_len, method=type(module).init_cache
            )

            # ONE decode loop for both rollouts (2x batch, interleaved
            # greedy/sampled rows): per-step cost is lm_head weight
            # streaming, so this is ~1.8x faster than two loops on v5e —
            # trajectories are bit-identical. Cross K/V and the encoder mask
            # stay UN-duplicated at batch B: the interleave is beam-major, so
            # the beam-shared cross-attention fold serves both rollouts from
            # one memory.
            self_cache2 = stack_for_rollouts(self_cache)

            def step_fn(tokens, self_cache, index):
                logits, new_self = module.apply(
                    variables, tokens, self_cache, cross_cache, enc_m, index,
                    method=type(module).decode_step,
                )
                return logits[:, -1].astype(jnp.float32), new_self

            greedy_res, sampled_res = greedy_and_sample(
                step_fn, self_cache2, batch, max_len, bos, eos, pad,
                rng=rng, top_k=top_k, bad_words=bad_words, forced_eos=True,
            )
            return greedy_res.sequences, sampled_res.sequences

        @jax.jit
        def grad_step(state, batch, enc_inputs, sampled_ids, advantages, lr, rng):
            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                enc_h, enc_m = module.apply(
                    variables, **enc_inputs, method=type(module).encode
                )
                # teacher-forced forward over the sampled sequence
                att = (sampled_ids != pad).astype(jnp.int32)
                logits = module.apply(
                    variables, sampled_ids, att, enc_h, enc_m.astype(jnp.int32),
                    method=_decoder_forward,
                )
                # lse - picked logit instead of materializing the (B, T, V)
                # f32 log-softmax (same trick as causal_lm_loss — saves the
                # full logits-sized write+read and the scatter in
                # take_along_axis's backward)
                shift_logits = logits[:, :-1, :].astype(jnp.float32)
                tok = sampled_ids[:, 1:].astype(jnp.int32)
                lse = jax.nn.logsumexp(shift_logits, axis=-1)
                iota = jax.lax.broadcasted_iota(jnp.int32, shift_logits.shape, 2)
                picked = jnp.sum(
                    jnp.where(iota == tok[..., None], shift_logits, 0.0), axis=-1
                )
                tok_logp = picked - lse
                loss = scst_loss(tok_logp, tok, advantages, weights, pad)
                if use_nll:
                    gt_logits = module.apply(
                        variables, batch["input_ids"], batch["attention_mask"],
                        enc_h, enc_m.astype(jnp.int32), method=_decoder_forward,
                    )
                    loss = loss + nll_weight * causal_lm_loss(
                        gt_logits, batch["input_ids"], batch["attention_mask"]
                    )
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            from ..executors.train_state import gated_update

            # non-finite loss keeps params + optimizer state (same on-device
            # gate as Trainor.train_step — the host's isfinite check comes
            # AFTER this jit has run, too late to prevent a poisoned update)
            params, opt_state = gated_update(
                tx, state.params, state.opt_state, grads, lr, loss
            )
            return state.replace(
                step=state.step + 1, params=params, opt_state=opt_state
            ), loss

        def _decoder_forward(mod, input_ids, attention_mask, enc_h, enc_m):
            return mod.dec(
                input_ids, attention_mask,
                encoder_hidden_states=enc_h, encoder_attention_mask=enc_m,
                deterministic=True,
            )

        return rollouts, grad_step

    def _fold_rng(self, trainor, state):
        # host-side step mirror: folding on int(state.step) would force a
        # device sync (a full tunnel round-trip) every iteration
        if not hasattr(self, "_host_step") or self._host_step is None:
            self._host_step = int(state.step)
        rng = jax.random.fold_in(trainor.rng, self._host_step)
        self._host_step += 1
        return rng

    def _score_and_grad(self, state, batch, enc_inputs, greedy_np, sampled_np,
                        sampled_dev, lr):
        """Host rewards for one rollout pair + the jitted REINFORCE step.

        Returns ``(new_state, device_loss, custom_print)`` — the loss is left
        ON DEVICE so the epoch loop can drain it one step late (the same
        pipeline-keeping trick as Trainor's supervised path); the non-finite
        gate already ran inside the jit.
        """
        import time

        t0 = time.perf_counter()
        refs_np = np.asarray(batch["input_ids"])
        reward_greedy, _, _ = self.scst.get_reward(greedy_np, refs_np)
        reward_sampling, _, _ = self.scst.get_reward(sampled_np, refs_np)
        advantages = np.stack(
            [rs - rg for rs, rg in zip(reward_sampling, reward_greedy)]
        ).astype(np.float32)  # (n_scores, B)
        t1 = time.perf_counter()

        new_state, loss = self._grad_fn(
            state, batch, enc_inputs, sampled_dev, jnp.asarray(advantages), lr,
            jax.random.key(0),  # rng unused by the deterministic grad step
        )
        t2 = time.perf_counter()
        self.timing["reward_s"] += t1 - t0
        self.timing["grad_s"] += t2 - t1  # dispatch only: execution is async
        self.timing["iters"] += 1

        delta = float(np.mean(advantages))
        custom = (
            f"reward_sampling {float(np.mean(np.concatenate(reward_sampling))):.4f}, "
            f"delta_reward: {delta:.4f}"
        )
        return new_state, loss, custom

    def train_iteration(self, trainor, state, batch, lr):
        if self._rollout_fn is None:
            self._rollout_fn, self._grad_fn = self._build_jitted(trainor.tx)
        if self.overlap_rollout:
            return self._train_iteration_overlapped(trainor, state, batch, lr)
        return self._train_iteration_serial(trainor, state, batch, lr)

    def _train_iteration_serial(self, trainor, state, batch, lr):
        """Exact on-policy SCST step (reference SCST.py:48-195 semantics):
        rollout -> host rewards -> REINFORCE grad, strictly in order. The
        device necessarily idles during reward scoring (the grad step's
        advantages depend on it); the loss is still returned un-drained so the
        epoch loop never blocks on the update itself."""
        import time

        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        enc_inputs = self.encoder_inputs(batch)
        rng = self._fold_rng(trainor, state)

        t0 = time.perf_counter()
        greedy_ids, sampled_ids = self._rollout_fn(variables, enc_inputs, rng)
        greedy_np = np.asarray(greedy_ids)  # blocks: rollout (+ prev grad tail)
        sampled_np = np.asarray(sampled_ids)
        self.timing["rollout_s"] += time.perf_counter() - t0

        return self._score_and_grad(
            state, batch, enc_inputs, greedy_np, sampled_np, sampled_ids, lr
        )

    def _train_iteration_overlapped(self, trainor, state, batch, lr):
        """Pipelined SCST (opt-in ``overlap_rollout: true``): dispatch THIS
        batch's rollout first, then score + grad-step the PREVIOUS batch while
        the device decodes — host ROUGE-L overlaps the rollout instead of
        serializing after it. The sampled sequences are one policy update old
        when their grad applies (standard async-RL staleness; the reference
        loop is strictly on-policy, hence default off — docs/performance.md).

        The rollout readback runs in a dedicated 1-thread drainer: merely
        *dispatching* device work does not start it on demand-driven backends
        (axon executes when a transfer demands the result — dispatch-only
        "overlap" measured SLOWER than serial, 38.8 vs 51.8 samples/s,
        BENCH r4), so the drainer issues the blocking demand immediately.

        Returns ``(state, None, "")`` on the warmup iteration; the epoch loop
        flushes the tail via ``finish_epoch``."""
        from concurrent.futures import ThreadPoolExecutor

        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        enc_inputs = self.encoder_inputs(batch)
        rng = self._fold_rng(trainor, state)
        greedy_dev, sampled_dev = self._rollout_fn(variables, enc_inputs, rng)
        if self._drain_pool is None:
            self._drain_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="scst-drain"
            )
        fut = self._drain_pool.submit(
            lambda g=greedy_dev, s=sampled_dev: (np.asarray(g), np.asarray(s))
        )

        prev, self._pending = self._pending, (batch, enc_inputs, fut, sampled_dev)
        if prev is None:
            return state, None, ""
        return self._consume_pending(prev, state, lr)

    def _consume_pending(self, pending, state, lr):
        import time

        p_batch, p_enc, fut, p_sampled = pending
        t0 = time.perf_counter()
        greedy_np, sampled_np = fut.result()
        self.timing["rollout_s"] += time.perf_counter() - t0
        return self._score_and_grad(
            state, p_batch, p_enc, greedy_np, sampled_np, p_sampled, lr
        )

    def finish_epoch(self, trainor, state, lr):
        """Flush the overlapped pipeline's trailing rollout (epoch boundary).
        Returns ``(state, device_loss, custom)`` or None when nothing pends."""
        if self._pending is None:
            return None
        prev, self._pending = self._pending, None
        return self._consume_pending(prev, state, lr)

    def __repr__(self):
        return f"model: {type(self).__name__}\n{self.scst}"


@registry.register("model")
class RRG_SCST(_SCSTBase):
    base_proto = "RRG"

    def __init__(self, decoder, cnn, **kwargs):
        super().__init__(decoder=decoder, cnn=cnn, **kwargs)


@registry.register("model")
class RRS_SCST(_SCSTBase):
    base_proto = "RRS"

    def __init__(self, encoder, decoder, **kwargs):
        super().__init__(encoder=encoder, decoder=decoder, **kwargs)
