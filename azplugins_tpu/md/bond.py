"""Bond potentials (user API).

Mirrors ``hoomd.azplugins.bond`` (/root/reference/src/bond.py): DoubleWell
and Quartic. Parameters are per bond type name::

    dw = DoubleWell()
    dw.params["A-A"] = dict(r_0=0.5, r_1=1.0, U_1=5.0, U_tilt=0.0)
"""

from __future__ import annotations

from ..core.typeparam import TypeParameter
from ..ops.bond_force import bond_force
from ..ops.dense import dense_bond_force
from ..ops.evaluators import BOND_POTENTIALS
from .force import Force, SimContext, tables_to_device

__all__ = ["Bond", "DoubleWell", "FENEWCA", "Harmonic", "Quartic"]


class Bond(Force):
    _evaluator_name = ""

    def __init__(self):
        super().__init__()
        self._def = BOND_POTENTIALS[self._evaluator_name]
        self.params = TypeParameter("params", 1, self._def.spec)

    def _build_tables(self, sim):
        types = sim._bond_types
        host = self.params.to_dict_tables(types)
        self._tbl = {"params": tables_to_device(self._def.precompute(host))}

    def _compute(self, state, nbr_idx, timestep, ctx: SimContext, tbl):
        return bond_force(
            self._def.energy_force,
            state.position,
            state.box,
            state.bond_group,
            state.bond_typeid,
            tbl["params"],
            state.N,
        )

    def _compute_dense(self, dense, jb, spec, slot_of, timestep, ctx, tbl, want="all", masked=True):
        if slot_of is None:
            return self._compute(dense, None, timestep, ctx, tbl)
        return dense_bond_force(
            self._def.energy_force,
            dense,
            slot_of,
            dense.bond_group,
            dense.bond_typeid,
            tbl["params"],
            want=want,
        )


class DoubleWell(Bond):
    """Double-well bond with tunable barrier and tilt.

    Parity: /root/reference/src/bond.py:13-66,
    /root/reference/src/BondEvaluatorDoubleWell.h:96-113.
    """

    _evaluator_name = "DoubleWell"


class Quartic(Bond):
    """Scissile quartic bond + WCA core; plateaus at U_0 beyond r_0.

    Parity: /root/reference/src/bond.py:68-157,
    /root/reference/src/BondEvaluatorQuartic.h:129-200. ``delta``
    defaults to 0 as in the reference (src/bond.py:153).
    """

    _evaluator_name = "Quartic"


class Harmonic(Bond):
    """Harmonic spring U = k/2 (r - r0)^2 (HOOMD-core substrate, SURVEY
    §2.13) — the default backbone bond in azplugins polymer scripts.
    """

    _evaluator_name = "Harmonic"


class FENEWCA(Bond):
    """Kremer-Grest FENE spring + WCA core on the delta-shifted distance
    (HOOMD-core substrate, SURVEY §2.13).

    U = -k/2 R0^2 ln(1 - ((r - delta)/R0)^2) + WCA(eps, sigma; r - delta).
    """

    _evaluator_name = "FENEWCA"
