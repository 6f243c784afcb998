from . import bond, filter, methods, nlist, pair, trigger
from .integrate import Integrator

__all__ = ["Integrator", "bond", "filter", "methods", "nlist", "pair", "trigger"]
