"""SCST (self-critical sequence training) — TPU-native design.

Parity with reference vilmedic/blocks/rl/SCST.py:14-195, re-architected for JAX:
the reference differentiates *through* HF ``generate`` by stripping its no_grad
decorator (``inspect.unwrap``, SCST.py:142). Here sampling is a no-grad jitted
rollout; the sampled sequences are then **teacher-forced** through the decoder in
the gradient step, which yields identical per-token log-probs with one big
parallel forward instead of 100 sequential grad-carrying steps (SURVEY.md §7).

Loss semantics (reference ``scst_loss``, SCST.py:15-46):
- token mask = ``token_id > pad_token_id`` (excludes PAD and BOS for RoBERTa-style
  vocabularies, includes EOS — reproduced exactly);
- log-probs normalized by the total mask sum, then weighted by per-scorer
  advantage (r_sample - r_greedy) and summed.

Rewards are computed host-side between the two jitted calls via the
``REWARD_COMPLIANT`` scorer registry.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def scst_loss(
    token_logp: jnp.ndarray,  # (B, T) log-probs of sampled tokens
    sampled_ids: jnp.ndarray,  # (B, T)
    advantages: jnp.ndarray,  # (n_scores, B) = reward_sampling - reward_greedy
    scores_weights: Sequence[float],
    pad_token_id: int,
) -> jnp.ndarray:
    mask = (sampled_ids > pad_token_id).astype(jnp.float32)
    logp = token_logp * mask / jnp.maximum(jnp.sum(mask), 1.0)
    per_sample = -jnp.sum(logp, axis=-1)  # (B,)
    weights = jnp.asarray(scores_weights, jnp.float32)
    # sum_k w_k * sum_b adv_kb * per_sample_b
    return jnp.sum(weights[:, None] * advantages * per_sample[None, :])


class SCST:
    """Host-side reward plumbing (scorer construction + decode + reward calls)."""

    def __init__(
        self,
        tokenizer,
        max_length: int,
        bos_token_id: int,
        eos_token_id: int,
        pad_token_id: int,
        scores="ROUGEL",
        scores_args=None,
        scores_weights=None,
        top_k: Optional[int] = None,
        use_nll: bool = False,
    ):
        from ...scorers.scores import REWARD_COMPLIANT

        self.tokenizer = tokenizer
        self.max_length = int(max_length)
        self.bos_token_id = bos_token_id
        self.eos_token_id = eos_token_id
        self.pad_token_id = pad_token_id
        self.top_k = top_k
        self.use_nll = use_nll

        if not isinstance(scores, (list, tuple)):
            scores = [scores]
        scores = [s.lower() for s in scores]
        unknown = [s for s in scores if s not in REWARD_COMPLIANT]
        assert not unknown, f"{unknown} not in {sorted(REWARD_COMPLIANT)}"
        self.scores = scores

        if len(scores) > 1 or use_nll:
            assert scores_weights is not None, "You need to mention scores_weights"
            assert isinstance(scores_weights, (list, tuple)), "scores_weights must be a list"
            expected = len(scores) + (1 if use_nll else 0)
            assert len(scores_weights) == expected
            self.scores_weights = list(scores_weights)
        else:
            self.scores_weights = [1.0]

        if scores_args is not None:
            if not isinstance(scores_args, (list, tuple)):
                scores_args = [scores_args]
            assert len(scores_args) == len(scores)
        else:
            scores_args = [None] * len(scores)

        self.scorers = []
        self.scorers_index = []
        for score, args in zip(scores, scores_args):
            factory, index = REWARD_COMPLIANT[score]
            self.scorers.append(factory(**args) if args else factory())
            self.scorers_index.append(index)

    @property
    def reward_weights(self) -> List[float]:
        """Weights for the reward terms only (nll weight excluded, reference
        SCST.py:169-171 slices ``scores_weights[-len(scores):]``)."""
        return self.scores_weights[-len(self.scores):]

    @property
    def nll_weight(self) -> float:
        return self.scores_weights[0] if self.use_nll else 0.0

    def decode(self, ids: np.ndarray) -> List[str]:
        return [
            self.tokenizer.decode(
                row, skip_special_tokens=True, clean_up_tokenization_spaces=False
            )
            for row in ids
        ]

    def get_reward(
        self, rollout_ids: np.ndarray, ref_ids: np.ndarray
    ) -> Tuple[List[np.ndarray], List[str], List[str]]:
        hyp_list = self.decode(rollout_ids)
        ref_list = self.decode(ref_ids)
        rewards = [
            np.asarray(scorer(ref_list, hyp_list)[idx], np.float32)
            for scorer, idx in zip(self.scorers, self.scorers_index)
        ]
        return rewards, hyp_list, ref_list

    def __repr__(self):
        import json

        return "SCST\n" + json.dumps(
            {
                "Scores": str(self.scores),
                "scores_weights": str(self.scores_weights),
                "Generate": {"top_k": self.top_k},
                "use_nll": self.use_nll,
            },
            indent=4,
        )
