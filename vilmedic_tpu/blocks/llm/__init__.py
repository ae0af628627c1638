from .llama import (  # noqa: F401
    LlamaConfig,
    LlamaForCausalLM,
    greedy_generate,
    llama_config_from_hf,
    llama_param_shardings,
)
