from .aniso import ANISO_PAIR_POTENTIALS, AnisoPairPotentialDef
from .barrier import BARRIERS, BarrierDef
from .bond import BOND_POTENTIALS, BondPotentialDef
from .pair import PAIR_POTENTIALS, PairPotentialDef
from .wall import WALL_POTENTIALS, WallPotentialDef

__all__ = [
    "ANISO_PAIR_POTENTIALS",
    "AnisoPairPotentialDef",
    "BARRIERS",
    "BarrierDef",
    "BOND_POTENTIALS",
    "BondPotentialDef",
    "PAIR_POTENTIALS",
    "PairPotentialDef",
    "WALL_POTENTIALS",
    "WallPotentialDef",
]
