"""ViLMedic-TPU: a TPU-native (JAX/Flax/XLA/Pallas) medical vision-language framework.

Provides the capabilities of the reference framework (jbdel/vilmedic): config-driven
training/evaluation/ensembling for RRG / RRS / MVQA / SELFSUP workloads, an NLG +
clinical metrics stack, SCST reinforcement fine-tuning, beam search with model
ensembling, and a model-zoo API — re-designed TPU-first with SPMD sharding over a
`jax.sharding.Mesh`, one jitted train step, and `lax.scan` decoding.
"""

__version__ = "0.1.0"

from . import registry  # noqa: F401

# Importing these modules populates the registries (models, datasets, losses, ...).
from . import blocks as _blocks  # noqa: F401
from . import data as _data  # noqa: F401
from . import models as _models  # noqa: F401
from . import scorers as _scorers  # noqa: F401
