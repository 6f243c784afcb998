from . import binning, dense, evaluators, neighbor  # noqa: F401
from .aniso_force import aniso_pair_force
from .bond_force import bond_force
from .pair_force import ForceResult, dpd_pair_force, pair_force

__all__ = [
    "ForceResult",
    "aniso_pair_force",
    "binning",
    "bond_force",
    "dpd_pair_force",
    "evaluators",
    "neighbor",
    "pair_force",
]
