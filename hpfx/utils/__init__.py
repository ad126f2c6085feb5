from .precision import highest_precision
from .timing import PhaseTimer

__all__ = ["highest_precision", "PhaseTimer"]
