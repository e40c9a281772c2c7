from .interpolator import Interpolator, interpolator_dims
from .llicti import LLICTIModel, model_scales
