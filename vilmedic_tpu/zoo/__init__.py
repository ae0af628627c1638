from .modeling_auto import AutoModel  # noqa: F401
