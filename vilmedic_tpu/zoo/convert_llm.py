"""HF LLaMA-family checkpoint -> Flax :class:`blocks.llm.LlamaForCausalLM`.

Serves the GREEN judge's TPU path (reference NLG/green/green.py:24-29 loads
``StanfordAIMI/GREEN-radllama2-7b`` with torch ``AutoModelForCausalLM``; here
the same weights convert once into the Flax tree). Handles single-file and
index-sharded checkpoints, safetensors or torch ``.bin``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        if t.dtype is not None and "bfloat16" in str(t.dtype):
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def convert_hf_llama(state_dict: Dict) -> Dict:
    """torch/numpy HF ``LlamaForCausalLM`` state dict -> Flax param tree.

    Linear ``weight`` (out, in) transposes into Flax ``kernel`` (in, out);
    RMSNorm weights load as f32 (the Flax module computes the norm in f32).
    """
    sd = {k: v for k, v in state_dict.items()}
    pfx = "model." if any(k.startswith("model.") for k in sd) else ""

    def lin(name):
        return {"kernel": _np(sd[f"{name}.weight"]).T}

    def norm(name):
        return {"weight": _np(sd[f"{name}.weight"]).astype(np.float32)}

    n_layers = 1 + max(
        int(k.split(".")[1 + (pfx != "")])
        for k in sd if f"{pfx}layers." in k
    )
    params = {
        "embed_tokens": {"embedding": _np(sd[f"{pfx}embed_tokens.weight"])},
        "norm": norm(f"{pfx}norm"),
    }
    for i in range(n_layers):
        lp = f"{pfx}layers.{i}"
        params[f"layers_{i}"] = {
            "self_attn": {p: lin(f"{lp}.self_attn.{p}")
                          for p in ("q_proj", "k_proj", "v_proj", "o_proj")},
            "mlp": {p: lin(f"{lp}.mlp.{p}")
                    for p in ("gate_proj", "up_proj", "down_proj")},
            "input_layernorm": norm(f"{lp}.input_layernorm"),
            "post_attention_layernorm": norm(f"{lp}.post_attention_layernorm"),
        }
    if "lm_head.weight" in sd:  # untied head
        params["lm_head"] = lin("lm_head")
    return params


def _load_state_dict(model_dir: str) -> Dict:
    """Load a local HF checkpoint dir (safetensors preferred, sharded ok)."""
    import glob

    def load_st(path):
        from safetensors.numpy import load_file

        try:
            return load_file(path)
        except Exception:
            # bf16 tensors: go through torch, which numpy loading rejects
            from safetensors.torch import load_file as load_torch

            return load_torch(path)

    sd: Dict = {}
    st = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if st:
        for path in st:
            sd.update(load_st(path))
        return sd
    bins = sorted(glob.glob(os.path.join(model_dir, "pytorch_model*.bin")))
    if bins:
        import torch

        for path in bins:
            sd.update(torch.load(path, map_location="cpu",
                                 weights_only=True))
        return sd
    raise FileNotFoundError(
        f"no *.safetensors or pytorch_model*.bin under {model_dir}"
    )


def load_hf_llama(model_dir: str, dtype=None) -> Tuple[object, Dict]:
    """(LlamaConfig, Flax params) from a local HF LLaMA checkpoint dir."""
    import jax.numpy as jnp

    from vilmedic_tpu.blocks.llm import llama_config_from_hf

    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = llama_config_from_hf(hf_cfg, dtype=dtype or jnp.bfloat16)
    params = convert_hf_llama(_load_state_dict(model_dir))
    return cfg, params
