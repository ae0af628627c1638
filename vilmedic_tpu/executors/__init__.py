from .checkpoint import CheckpointSaver, load_checkpoint, save_checkpoint  # noqa: F401
from .scheduler import TrainingScheduler  # noqa: F401
from .train_state import TrainState, create_optimizer  # noqa: F401
from .trainor import Trainor  # noqa: F401
from .utils import create_data_loader, create_model  # noqa: F401
from .validator import Validator  # noqa: F401
