from . import losses  # noqa: F401  (registers loss protos)
from . import vision  # noqa: F401
from .classifier import Classifier  # noqa: F401
from .transformer import (  # noqa: F401
    TransformerConfig,
    TransformerDecoder,
    TransformerEncoder,
    causal_lm_loss,
)
