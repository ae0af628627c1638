"""Task models (RRG / RRS / MVQA / SELFSUP / SCST). Importing registers protos."""

from .hf_compat import RRG_HF, RRS_HF  # noqa: F401
from .mvqa import MVQA  # noqa: F401
from .rrg import RRG  # noqa: F401
from .rrg_force import RRG_FORCE  # noqa: F401
from .rrs import RRS  # noqa: F401
from .scst_models import RRG_SCST, RRS_SCST  # noqa: F401
from .selfsup import ConVIRT, GLoRIA  # noqa: F401
from .vision_language import VisionLanguage  # noqa: F401
