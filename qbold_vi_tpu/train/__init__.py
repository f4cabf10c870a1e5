from . import data, losses, optim, steps
from .trainer import Trainer, WeightStatus

__all__ = ["data", "losses", "optim", "steps", "Trainer", "WeightStatus"]
