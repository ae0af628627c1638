from .config import (  # noqa: F401
    Config,
    apply_dotlist,
    coerce_numeric_strings,
    executor_config,
    get_args,
    load_config,
    merge_dicts,
)
