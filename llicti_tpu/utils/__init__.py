from .checkpoint import CheckpointManager
from .logging_utils import RateLogger, setup_logging
