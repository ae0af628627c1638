"""Cache locations (reference vilmedic/constants.py:1-8, appdirs -> platformdirs)."""

import os

try:
    from platformdirs import user_cache_dir
except ImportError:  # pragma: no cover
    def user_cache_dir(name):
        return os.path.join(os.path.expanduser("~"), ".cache", name)

CACHE_DIR = os.environ.get("VILMEDIC_TPU_CACHE", user_cache_dir("vilmedic_tpu"))
MODEL_ZOO_CACHE_DIR = os.path.join(CACHE_DIR, "zoo", "models")
DATA_ZOO_CACHE_DIR = os.path.join(CACHE_DIR, "zoo", "data")


def offline_mode() -> bool:
    """Hard offline mode: ``VILMEDIC_OFFLINE=1`` forbids every network attempt
    (HF hub included) — missing assets fail fast instead of retrying slowly."""
    return os.environ.get("VILMEDIC_OFFLINE", "").lower() in ("1", "true", "yes")


if offline_mode():  # make transformers/hf_hub honor it globally
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
