"""NLG + clinical metrics stack. Importing registers scorers."""

from .nlg.bleu import Bleu  # noqa: F401
from .nlg.ciderd import CiderD, CiderDRL  # noqa: F401
from .nlg.meteor import Meteor  # noqa: F401
from .nlg.rouge import Rouge, Rouge1, Rouge2, RougeL  # noqa: F401
from .nlg.spice import Spice  # noqa: F401
from .scores import REWARD_COMPLIANT, compute_scores  # noqa: F401
