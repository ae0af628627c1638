"""Task models (RRG / RRS / MVQA / SELFSUP). Importing registers protos."""

from .rrg import RRG  # noqa: F401
from .rrs import RRS  # noqa: F401
