from . import profiling
from .profiling import StepTimer, check_finite, sync, trace

__all__ = ["profiling", "StepTimer", "check_finite", "sync", "trace"]
