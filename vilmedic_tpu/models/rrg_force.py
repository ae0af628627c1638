"""RRG_FORCE: report generation with must-include concept constraints.

Parity with reference vilmedic/models/rrg/RRG_FORCE.py:11-52: identical to RRG in
training; at evaluation, per-sample ``concepts`` (from an ImSeqAny dataset)
become forced words for constrained decoding. The reference's
``evaluation_force`` is intentionally broken upstream
(evaluation_force.py:53-56, SURVEY.md §0); this is a working realization via
``constrained_greedy_search`` (logit-bias + EOS-hold guarantees inclusion).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .. import registry
from ..decoding.decode import constrained_greedy_search
from .base import get_special_token_ids
from .rrg import RRG


def _force_ids(tokenizer, concepts: List[str], max_forced: int = 16) -> np.ndarray:
    """Tokenize per-sample concept strings to a (B, K) -1-padded id matrix."""
    out = np.full((len(concepts), max_forced), -1, np.int32)
    for i, concept_line in enumerate(concepts):
        words = concept_line.split(",") if isinstance(concept_line, str) else concept_line
        ids: List[int] = []
        for w in words:
            ids.extend(tokenizer.encode(str(w).strip(), add_special_tokens=False))
        out[i, : min(len(ids), max_forced)] = ids[:max_forced]
    return out


def evaluation_force(models, config, dl, from_training=True, **kwargs) -> Dict:
    """Constrained-decoding eval loop (reference evaluation_force.py contract)."""
    model = models[0]
    dataset = dl.dataset
    tokenizer = dataset.tokenizer
    max_len = int(dataset.tokenizer_max_len)
    bos_id, eos_id, pad_id = get_special_token_ids(model.dec_config, tokenizer)
    module = model.module

    @jax.jit
    def generate(variables, enc_inputs, force_ids):
        enc_h, enc_m = module.apply(variables, **enc_inputs, method=type(module).encode)
        self_cache, cross_cache = module.apply(
            variables, enc_h, max_len, method=type(module).init_cache
        )
        enc_m = enc_m.astype(jnp.int32)

        def step_fn(tokens, self_cache, index):
            logits, new_self = module.apply(
                variables, tokens, self_cache, cross_cache, enc_m, index,
                method=type(module).decode_step,
            )
            return logits[:, -1].astype(jnp.float32), new_self

        return constrained_greedy_search(
            step_fn, self_cache, enc_h.shape[0], max_len, bos_id, eos_id, pad_id,
            force_ids,
        ).sequences

    ref_list, hyp_list = [], []
    for batch in dl:
        concepts = batch.get("concepts") or [""] * batch["input_ids"].shape[0]
        force = jnp.asarray(_force_ids(tokenizer, concepts))
        seqs = np.asarray(
            generate(model.variables, model.encoder_inputs(batch), force)
        )
        for h, r in zip(seqs, batch["input_ids"]):
            hyp_list.append(tokenizer.decode(h, skip_special_tokens=True,
                                             clean_up_tokenization_spaces=False))
            ref_list.append(tokenizer.decode(r, skip_special_tokens=True,
                                             clean_up_tokenization_spaces=False))
    return {"refs": ref_list, "hyps": hyp_list}


@registry.register("model")
class RRG_FORCE(RRG):
    def __init__(self, decoder, cnn, **kwargs):
        super().__init__(decoder=decoder, cnn=cnn, **kwargs)
        self.eval_func = evaluation_force

    def __repr__(self):
        return "model: RRG_FORCE (constrained decoding)"
