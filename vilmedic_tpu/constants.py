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
