from .encoder import Encoder, normalise_data
from .transfer import transfer_params
from .vi import FineTuner

__all__ = ["Encoder", "FineTuner", "normalise_data", "transfer_params"]
