from .logger import set_logger, get_logger_directory, add_logging_level  # noqa: F401
from .seed import get_seed, jax_root_key, extract_seed_from_ckpt  # noqa: F401
