from .scst import SCST, scst_loss  # noqa: F401
