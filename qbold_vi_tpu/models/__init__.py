from .encoder import Encoder, normalise_data
from .vi import FineTuner

__all__ = ["Encoder", "FineTuner", "normalise_data"]
