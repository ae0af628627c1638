from .attention import dot_product_attention, make_attention_bias  # noqa: F401
