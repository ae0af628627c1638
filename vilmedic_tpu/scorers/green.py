"""GREEN: LLM-judge clinical error counting.

Faithful port of reference NLG/green/green.py:12-228: a causal LM is prompted
to count clinically (in)significant errors and matched findings between a
reference and candidate report; the response is regex-parsed into counts and
``green = matched / (matched + sum(significant errors))``; a global
pair->reward memo cache avoids re-judging repeated pairs (the SCST reward use).

The judge model loads from ``GREEN_MODEL`` (local HF dir) or the HF cache of
the default StanfordAIMI checkpoint — generation runs on host torch (the judge
is a generic causal LM, not part of the TPU training path).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

CATEGORIES = [
    "Clinically Significant Errors",
    "Clinically Insignificant Errors",
    "Matched Findings",
]

SUB_CATEGORIES = [
    "(a) False report of a finding in the candidate",
    "(b) Missing a finding present in the reference",
    "(c) Misidentification of a finding's anatomic location/position",
    "(d) Misassessment of the severity of a finding",
    "(e) Mentioning a comparison that isn't in the reference",
    "(f) Omitting a comparison detailing a change from a prior study",
]

#: global pair -> reward memo (reference green.py:10 ``pair_to_reward_dict``)
pair_to_reward_dict: Dict[Tuple[str, str], float] = {}


def make_prompt(text1: str, text2: str) -> str:
    """Reference green.py:59 verbatim prompt structure."""
    return (
        "Objective: Evaluate the accuracy of a candidate radiology report in "
        "comparison to a reference radiology report composed by expert "
        "radiologists.\n\n    Process Overview: You will be presented with:\n\n"
        "    1. The criteria for making a judgment.\n"
        "    2. The reference radiology report.\n"
        "    3. The candidate radiology report.\n"
        "    4. The desired format for your assessment.\n\n"
        "    1. Criteria for Judgment:\n\n    For each candidate report, "
        "determine:\n\n    The count of clinically significant errors.\n"
        "    The count of clinically insignificant errors.\n\n"
        "    Errors can fall into one of these categories:\n\n"
        "    a) False report of a finding in the candidate.\n"
        "    b) Missing a finding present in the reference.\n"
        "    c) Misidentification of a finding's anatomic location/position.\n"
        "    d) Misassessment of the severity of a finding.\n"
        "    e) Mentioning a comparison that isn't in the reference.\n"
        "    f) Omitting a comparison detailing a change from a prior study.\n"
        "    Note: Concentrate on the clinical findings rather than the "
        "report's writing style. Evaluate only the findings that appear in "
        "both reports.\n\n"
        f"    2. Reference Report:\n    {text1}\n\n"
        f"    3. Candidate Report:\n    {text2}\n\n"
        "    4. Reporting Your Assessment:\n\n"
        "    Follow this specific format for your output, even if no errors "
        "are found:\n    ```\n    [Explanation]:\n    <Explanation>\n\n"
        "    [Clinically Significant Errors]:\n"
        "    (a) <Error Type>: <The number of errors>. <Error 1>; <Error 2>; "
        "...; <Error n>\n    ....\n"
        "    (f) <Error Type>: <The number of errors>. <Error 1>; <Error 2>; "
        "...; <Error n>\n\n    [Clinically Insignificant Errors]:\n"
        "    (a) <Error Type>: <The number of errors>. <Error 1>; <Error 2>; "
        "...; <Error n>\n    ....\n"
        "    (f) <Error Type>: <The number of errors>. <Error 1>; <Error 2>; "
        "...; <Error n>\n\n    [Matched Findings]:\n"
        "    <The number of matched findings>. <Finding 1>; <Finding 2>; ...; "
        "<Finding n>\n    ```\n"
    )


def parse_error_counts(text: str, category: str,
                       return_0_if_no_green_score: bool = True):
    """Reference green.py:114-180 exact regex semantics."""
    if category not in CATEGORIES:
        raise ValueError(
            f"Category {category} is not a valid category. Please choose from "
            f"{CATEGORIES}."
        )
    pattern = rf"\[{category}\]:\s*(.*?)(?:\n\s*\n|\Z)"
    category_text = re.search(pattern, text, re.DOTALL)

    sum_counts = 0
    sub_counts = [0 for _ in range(6)]
    if not category_text:
        if return_0_if_no_green_score:
            return sum_counts, sub_counts
        return None, [None for _ in range(6)]
    if category_text.group(1).startswith("No"):
        return sum_counts, sub_counts

    if category == "Matched Findings":
        counts = re.findall(r"^\b\d+\b(?=\.)", category_text.group(1))
        if len(counts) > 0:
            sum_counts = int(counts[0])
        return sum_counts, sub_counts

    sub_categories = [s.split(" ", 1)[0] + " " for s in SUB_CATEGORIES]
    matches = sorted(re.findall(r"\([a-f]\) .*", category_text.group(1)))
    if len(matches) == 0:  # gpt-4 template numbers the subcategories
        matches = sorted(re.findall(r"\([1-6]\) .*", category_text.group(1)))
        sub_categories = [f"({i}) " for i in range(1, len(SUB_CATEGORIES) + 1)]

    for position, sub_category in enumerate(sub_categories):
        for match in matches:
            if match.startswith(sub_category):
                count = re.findall(r"(?<=: )\b\d+\b(?=\.)", match)
                if len(count) > 0:
                    sub_counts[position] = int(count[0])
    return sum(sub_counts), sub_counts


def compute_green(response: str,
                  return_0_if_no_green_score: bool = True) -> Optional[float]:
    """Reference green.py:166-180: matched / (matched + significant errors)."""
    sig_present, sig_errors = parse_error_counts(
        response, CATEGORIES[0], return_0_if_no_green_score
    )
    matched_findings, _ = parse_error_counts(
        response, CATEGORIES[2], return_0_if_no_green_score
    )
    if matched_findings == 0:
        return 0
    if sig_present is None or matched_findings is None:
        return None
    return matched_findings / (matched_findings + sum(sig_errors))


def _chat_wrap(prompt: str) -> str:
    """The judge chat framing (reference green.py:40 chat template's
    user-turn + generation-prompt shape) — shared by both backends."""
    return f"<|user|>\n{prompt}\n<|assistant|>"


class GREENImpl:
    """``__call__(refs, hyps) -> (mean_green, per_pair_scores)`` with the
    global memo cache. ``judge_fn`` is injectable for tests: a callable
    ``List[prompt] -> List[response_text]``; by default a locally provided
    causal LM generates the judgments — on the TPU via the Flax LLaMA serving
    path (``blocks/llm``, sharded over all local devices) when running on a
    TPU backend with a local checkpoint dir, host torch otherwise
    (``VILMEDIC_GREEN_BACKEND=tpu|torch`` overrides)."""

    def __init__(self, model_name: str = "StanfordAIMI/GREEN-radllama2-7b",
                 judge_fn=None, max_length: int = 2048, batch_size: int = 4,
                 return_0_if_no_green_score: bool = True, **kwargs):
        self.return_0 = return_0_if_no_green_score
        if judge_fn is None:
            from .clinical import ScorerUnavailable, _hf_model_cached

            from .weights import resolve

            model_name = resolve("GREEN_MODEL", model_name)
            if not os.path.isdir(model_name) and not _hf_model_cached(model_name):
                raise ScorerUnavailable(
                    "GREEN judge weights unavailable: set GREEN_MODEL to a "
                    "local HF causal-LM directory or cache the checkpoint"
                )
            backend = os.environ.get("VILMEDIC_GREEN_BACKEND", "auto")
            if backend == "auto":
                import jax

                backend = ("tpu" if jax.default_backend() != "cpu"
                           and os.path.isdir(model_name) else "torch")
            if backend == "tpu":
                judge_fn = self._tpu_judge(model_name, max_length, batch_size)
            else:
                judge_fn = self._hf_judge(model_name, max_length, batch_size)
        self.judge_fn = judge_fn

    @staticmethod
    def _hf_judge(model_name: str, max_length: int, batch_size: int):
        import torch
        from transformers import AutoModelForCausalLM, AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(
            model_name, local_files_only=True, padding_side="left"
        )
        if tokenizer.pad_token is None:
            tokenizer.pad_token = tokenizer.eos_token
        model = AutoModelForCausalLM.from_pretrained(
            model_name, local_files_only=True
        )
        model.eval()

        def judge(prompts: List[str]) -> List[str]:
            outs = []
            for start in range(0, len(prompts), batch_size):
                chunk = [_chat_wrap(p)
                         for p in prompts[start: start + batch_size]]
                enc = tokenizer(chunk, return_tensors="pt", padding=True,
                                truncation=True, max_length=max_length)
                with torch.no_grad():
                    # max_new_tokens (not max_length, reference green.py:96):
                    # a truncated prompt must still leave generation headroom
                    gen = model.generate(
                        **enc,
                        max_new_tokens=min(1024, max_length),
                        do_sample=False,
                        pad_token_id=tokenizer.pad_token_id,
                    )
                for g in tokenizer.batch_decode(gen, skip_special_tokens=True):
                    outs.append(g.split("<|assistant|>")[-1])
            return outs

        return judge

    @staticmethod
    def _tpu_judge(model_dir: str, max_length: int, batch_size: int,
                   tokenizer=None, max_new_tokens: Optional[int] = None):
        """Batched greedy decoding of the judge on the JAX backend.

        The checkpoint converts once (zoo/convert_llm.load_hf_llama) into the
        Flax LLaMA (blocks/llm); params are tensor-parallel-sharded over ALL
        local devices (Megatron layout, llama_param_shardings) so a 7B judge
        fits a v5e slice. Prompts are left-padded into (fixed batch, 128-
        multiple length) buckets to bound recompiles; generation returns only
        the new tokens, so decoded text is directly the judge response.
        ``tokenizer`` is injectable for tests.
        """
        import jax
        import numpy as _np

        from vilmedic_tpu.blocks.llm import (
            LlamaForCausalLM,
            greedy_generate,
            llama_param_shardings,
        )
        from vilmedic_tpu.zoo.convert_llm import load_hf_llama

        if tokenizer is None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(
                model_dir, local_files_only=True, padding_side="left"
            )
            if tokenizer.pad_token is None:
                tokenizer.pad_token = tokenizer.eos_token

        cfg, raw = load_hf_llama(model_dir)
        model = LlamaForCausalLM(cfg)
        params = {"params": raw}
        devs = jax.devices()
        if len(devs) > 1:
            mesh = jax.sharding.Mesh(_np.array(devs), ("model",))
            params = jax.device_put(params, llama_param_shardings(params, mesh))
        else:
            params = jax.device_put(params)

        # max_new_tokens (not max_length) leaves generation headroom after a
        # truncated prompt — same contract as the torch backend
        max_new = max_new_tokens or min(1024, max_length)
        eos = tokenizer.eos_token_id
        pad = tokenizer.pad_token_id if tokenizer.pad_token_id is not None else eos
        gen_cache = {}

        def gen_for(p_len):
            fn = gen_cache.get(p_len)
            if fn is None:
                fn = jax.jit(
                    lambda pr, ids, m: greedy_generate(
                        model, pr, ids, m, max_new, eos, pad
                    )
                )
                gen_cache[p_len] = fn
            return fn

        def judge(prompts: List[str]) -> List[str]:
            outs = []
            for start in range(0, len(prompts), batch_size):
                chunk = [_chat_wrap(p)
                         for p in prompts[start: start + batch_size]]
                enc = tokenizer(chunk, padding=True, truncation=True,
                                max_length=max_length, return_tensors="np")
                ids = enc["input_ids"].astype(_np.int32)
                mask = enc["attention_mask"].astype(_np.int32)
                n = ids.shape[0]
                # bucket: prompt length to a 128-multiple (extra LEFT pad),
                # batch to the fixed batch_size (duplicate row 0, sliced off)
                p_len = max(128, -(-ids.shape[1] // 128) * 128)
                lpad = p_len - ids.shape[1]
                ids = _np.pad(ids, ((0, 0), (lpad, 0)),
                              constant_values=pad)
                mask = _np.pad(mask, ((0, 0), (lpad, 0)))
                if n < batch_size:
                    reps = [ids[:1]] * (batch_size - n)
                    ids = _np.concatenate([ids] + reps, 0)
                    mask = _np.concatenate(
                        [mask] + [mask[:1]] * (batch_size - n), 0
                    )
                toks = _np.asarray(gen_for(p_len)(params, ids, mask))[:n]
                outs.extend(
                    tokenizer.batch_decode(toks, skip_special_tokens=True)
                )
            return outs

        return judge

    def __call__(self, refs: List[str], hyps: List[str]):
        assert len(refs) == len(hyps)
        final = np.zeros((len(refs),), np.float64)
        todo, idx = [], []
        for i, (ref, hyp) in enumerate(zip(refs, hyps)):
            if (ref, hyp) in pair_to_reward_dict:
                final[i] = pair_to_reward_dict[(ref, hyp)]
            else:
                todo.append((ref, hyp))
                idx.append(i)
        if todo:
            responses = self.judge_fn([make_prompt(r, h) for r, h in todo])
            for (ref, hyp), i, resp in zip(todo, idx, responses):
                green = compute_green(resp, self.return_0)
                score = float(green) if green is not None else 0.0
                pair_to_reward_dict[(ref, hyp)] = score
                final[i] = score
        return float(final.mean()), final.tolist()
